from .pth import load_pth, save_pth
from .convert import torch_to_flax, flax_to_torch

__all__ = ["load_pth", "save_pth", "torch_to_flax", "flax_to_torch"]
