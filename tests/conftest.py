"""Test bootstrap.

* Forces the CPU backend (the box exposes one real TPU via the 'axon'
  plugin; tests must not grab it) with a virtual 8-device mesh for
  multi-chip sharding tests (`--xla_force_host_platform_device_count=8`).
* Enables JAX's persistent compilation cache — this host has a single CPU
  core, so avoiding recompiles across test runs matters a lot.

Note on tolerances: XLA's default matmul/conv precision trades accuracy
for speed (bf16-class accumulation even on CPU in this JAX build), so
whole-network parity tests use ~1e-2-scale tolerances; exact-math checks
live in `test_ops_exact.py` under `jax.default_matmul_precision('highest')`.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: tests must not grab the TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The env var alone is NOT honored here (the preinstalled 'axon' TPU plugin
# overrides platform selection), so force it through the config API too —
# otherwise the whole suite silently runs over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
