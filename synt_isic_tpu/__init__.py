"""synt_isic_tpu — TPU-native synthetic-dermatology generation + XAI framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
fims9000/SYNT_ISIC (per-class DDPM generation of ISIC-2018 skin-lesion
images plus a trajectory-level explainability engine), designed for TPU:
jitted `lax.scan` samplers, vmapped attribution batches, `jax.sharding`
meshes for multi-chip scale, and Pallas kernels on the hot ops.
"""
from .version import __version__
from .utils.config import CLASS_NAMES, NUM_CLASSES, ConfigManager, default_config

__all__ = [
    "__version__",
    "CLASS_NAMES",
    "NUM_CLASSES",
    "ConfigManager",
    "default_config",
]
