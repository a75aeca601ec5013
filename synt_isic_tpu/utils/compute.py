"""Compute-environment helpers."""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Turn on JAX's persistent compilation cache.

    First compiles of the 1000-step sampling scan take minutes on TPU; the
    cache makes every later process start instant for known shapes. Safe to
    call multiple times; no-op if the config was already set elsewhere.
    """
    import jax

    path = Path(cache_dir) if cache_dir else \
        Path(os.environ.get("SYNT_ISIC_CACHE_DIR",
                            Path.home() / ".cache" / "synt_isic_tpu" / "jax"))
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a hard requirement


# Chip peaks: dense-bf16 FLOP/s and HBM bandwidth (B/s), keyed by
# jax.Device.device_kind. Single source of truth for MFU/roofline
# accounting (bench.py, scripts/profile_mfu.py).
TPU_PEAKS = {
    "TPU v5 lite": (197e12, 819e9),   # v5e
    "TPU v4": (275e12, 1228e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v6 lite": (918e12, 1640e9),  # v6e / Trillium
}
