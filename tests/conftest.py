"""Test bootstrap: force a virtual 8-device CPU mesh before JAX loads.

Multi-chip sharding tests run on `--xla_force_host_platform_device_count=8`
as real multi-chip hardware is not present in CI.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
