#!/usr/bin/env python
"""ModelManager churn benchmark at the reference's production shape
(VERDICT r4 #1): 7 per-class full-size checkpoints (~101 MB each,
`/root/reference/core/cache/metadata/cache_metadata.json:61`) cycled
through load / unload / cached-reload, plus the all-resident HBM cost.

Measures, per class and aggregated:
  * cold load   — .pth parse + manifest validation + flax conversion +
                  device_put (reference anchor: torch.load+load_state_dict,
                  `core/generator/model_manager.py:89-171`);
  * cached load — converted-pytree .npz fast path (CacheManager);
  * resident    — device memory with ALL classes loaded at once (the
                  reference keeps all 7 resident: ~676 MB fp32);
  * churn       — LRU-style swap cycles under a 1-resident budget (the
                  opposite policy, for memory-constrained serving).

Usage (real chip, after scripts/train_family.py):
    python scripts/bench_model_churn.py \
        --checkpoints artifacts/family_full/checkpoints \
        --out artifacts/model_churn.json

Tiny CPU smoke (tests/test_score_family.py):
    python scripts/bench_model_churn.py --checkpoints <tiny> --size 32 \
        --width quarter --cpu --rotations 1 --out /tmp/churn.json
"""
from __future__ import annotations

import argparse
import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from e2e_loop import unet_config  # noqa: E402


def _mem_in_use(device) -> "int | None":
    try:
        stats = device.memory_stats() or {}
        return int(stats.get("bytes_in_use", 0)) or None
    except Exception:
        return None


def bench_churn(checkpoints: str, out_path: str, size: int = 128,
                width: str = "full", rotations: int = 3,
                log=print) -> dict:
    import jax
    import jax.numpy as jnp

    from synt_isic_tpu.cache import CacheManager
    from synt_isic_tpu.model_manager import ModelManager

    ckpt_dir = Path(checkpoints)
    classes = sorted(p.name[5:-9] for p in ckpt_dir.glob("unet_*_best.pth")
                     if p.name != "unet_conditional_best.pth")
    if not classes:
        raise FileNotFoundError(f"no unet_*_best.pth under {ckpt_dir}")
    sizes_mb = {c: round((ckpt_dir / f"unet_{c}_best.pth").stat().st_size
                         / 1e6, 1) for c in classes}
    cfg = unet_config(size, width)
    device = jax.devices()[0]
    cache_dir = tempfile.mkdtemp(prefix="churn_cache_")
    report: dict = {"checkpoints_dir": str(ckpt_dir), "classes": classes,
                    "checkpoint_mb": sizes_mb, "device": str(device),
                    "started": time.strftime("%Y-%m-%d %H:%M:%S")}

    def new_manager(with_cache=True):
        return ModelManager(
            checkpoints_dir=str(ckpt_dir),
            cache_manager=CacheManager(cache_dir) if with_cache else None,
            model_config=cfg, dtype=jnp.bfloat16, device=device)

    # --- 1. cold loads (fills the conversion cache as a side effect) -------
    mm = new_manager()
    mem0 = _mem_in_use(device)
    cold = {}
    for c in classes:
        t0 = time.time()
        ok = mm.load_model(c)
        jax.block_until_ready(jax.tree_util.tree_leaves(
            mm.loaded_params[c])[0])
        if not ok:
            raise RuntimeError(f"cold load failed for {c}")
        cold[c] = round(time.time() - t0, 3)
    mem_all = _mem_in_use(device)
    report["cold_load_s"] = cold
    report["cold_load_s_median"] = round(statistics.median(cold.values()), 3)
    if mem0 is not None and mem_all is not None:
        report["resident_all_classes_mb"] = round((mem_all - mem0) / 1e6, 1)
    log(f"[churn] cold loads: " + "  ".join(f"{c}:{s}s"
                                            for c, s in cold.items()))

    # --- 2. cached reloads (fresh manager, warm converted-pytree cache) ----
    mm = new_manager()
    warm = {}
    for c in classes:
        t0 = time.time()
        mm.load_model(c)
        jax.block_until_ready(jax.tree_util.tree_leaves(
            mm.loaded_params[c])[0])
        warm[c] = round(time.time() - t0, 3)
    report["cached_load_s"] = warm
    report["cached_load_s_median"] = round(statistics.median(warm.values()), 3)
    log(f"[churn] cached loads: " + "  ".join(f"{c}:{s}s"
                                              for c, s in warm.items()))

    # --- 3. LRU churn under a 1-resident budget -----------------------------
    mm = new_manager()
    swaps = []
    for _ in range(rotations):
        for c in classes:
            t0 = time.time()
            for other in list(mm.loaded_params):
                mm.unload_model(other)
            mm.load_model(c)
            jax.block_until_ready(jax.tree_util.tree_leaves(
                mm.loaded_params[c])[0])
            swaps.append(time.time() - t0)
    report["swap_s_p50"] = round(statistics.median(swaps), 3)
    report["swap_s_max"] = round(max(swaps), 3)
    report["swaps"] = len(swaps)

    # --- 4. already-resident re-request (must be ~free) ---------------------
    t0 = time.time()
    mm.load_model(classes[-1])
    report["resident_reload_s"] = round(time.time() - t0, 6)

    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    log(f"[churn] report -> {out}")
    print(json.dumps({"classes": len(classes),
                      "cold_median_s": report["cold_load_s_median"],
                      "cached_median_s": report["cached_load_s_median"],
                      "swap_p50_s": report["swap_s_p50"],
                      "resident_all_mb": report.get(
                          "resident_all_classes_mb")}))
    return report


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoints", required=True)
    p.add_argument("--out", default="artifacts/model_churn.json")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--width", choices=("quarter", "full"), default="full")
    p.add_argument("--rotations", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from synt_isic_tpu.utils.compute import enable_compilation_cache

    enable_compilation_cache()
    bench_churn(args.checkpoints, args.out, size=args.size, width=args.width,
                rotations=args.rotations)
    return 0


if __name__ == "__main__":
    sys.exit(main())
