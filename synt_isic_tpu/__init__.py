"""synt_isic_tpu — TPU-native synthetic-dermatology generation + XAI framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
fims9000/SYNT_ISIC (per-class DDPM generation of ISIC-2018 skin-lesion
images plus a trajectory-level explainability engine), designed for TPU:
jitted `lax.scan` samplers, vmapped attribution batches, `jax.sharding`
meshes for multi-chip scale, and Pallas kernels on the hot ops.
"""
from .version import __version__
from .utils.config import CLASS_NAMES, NUM_CLASSES, ConfigManager, default_config


def __getattr__(name):  # lazy: keep bare `import synt_isic_tpu` light
    if name == "ImageGenerator":
        from .generator import ImageGenerator
        return ImageGenerator
    if name == "ModelManager":
        from .model_manager import ModelManager
        return ModelManager
    if name == "CacheManager":
        from .cache import CacheManager
        return CacheManager
    if name == "create_integrated_xai_analyzer":
        from .xai.integration import create_integrated_xai_analyzer
        return create_integrated_xai_analyzer
    if name == "GenerationServer":
        from .serve import GenerationServer
        return GenerationServer
    raise AttributeError(name)


__all__ = [
    "__version__",
    "CLASS_NAMES",
    "NUM_CLASSES",
    "ConfigManager",
    "default_config",
    "ImageGenerator",
    "ModelManager",
    "CacheManager",
    "create_integrated_xai_analyzer",
    "GenerationServer",
]
