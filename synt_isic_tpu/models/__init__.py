from .unet2d import UNet2D, UNet2DConfig, create_reference_unet, init_unet_params

__all__ = ["UNet2D", "UNet2DConfig", "create_reference_unet", "init_unet_params"]
