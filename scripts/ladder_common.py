"""Shared scoring battery for the quality ladders.

One home for the pieces `scripts/sampler_ladder.py` and
`scripts/distill_ladder.py` previously each carried a copy of (and had
already started to drift): the feature-stats closure, the
warm-every-executable rule, and the warm+timed scoring of one rung.

Two measurement rules live here, both load-bearing:

* **Warm EVERY executable the timed run will use.** `generate_images`
  dispatches device blocks of `batch_size` plus one remainder block when
  `count % batch_size != 0`; each block SIZE is its own jitted executable,
  so a warm pass of a single full block would leave the remainder block's
  XLA compile inside the timed window, billing minutes of compile to that
  rung's img/s (`warm_images` returns the count that covers both shapes).
* **Warm with a DIFFERENT seed than the timed run.** The device tunnel
  coalesces byte-identical execution requests (see the verify skill
  notes), so a replayed-seed warm pass would let the timed run be served
  from the coalescer and fake its rate.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Dict

import numpy as np

# seed offset for warm passes: far outside any rung's per-index seed range
WARM_SEED_OFFSET = 100_000


def make_stats_fn(extractor) -> Callable:
    """(N,H,W,C) images -> (mean, cov) of the extractor's features."""

    def stats(imgs):
        f = np.asarray(extractor(imgs), np.float64)
        return f.mean(axis=0), np.cov(f, rowvar=False)

    return stats


def warm_images(total: int, batch: int) -> int:
    """Warm-pass image count that compiles every executable of a timed
    `generate_images([(cls, total)])` run at device batch `batch`: one
    full block plus the remainder block when the division is uneven."""
    if total <= batch:
        return total
    rem = total % batch
    return batch + rem  # rem == 0 -> just the full block


def score_rung(gen, class_name: str, count: int, run_dir: Path, *,
               seed: int, stats: Callable, s_held, tag: str,
               log=print) -> Dict:
    """Warm + timed generation of one ladder rung through the production
    ImageGenerator; returns Fréchet-vs-heldout, img/s and wall seconds."""
    from synt_isic_tpu.metrics.fid import frechet_distance

    from e2e_loop import load_generated_images

    run_dir = Path(run_dir)
    gen.save_trajectory = False
    gen.set_generation_seed(seed + WARM_SEED_OFFSET)
    gen.generate_images(
        [(class_name, warm_images(count, gen.batch_size))],
        str(run_dir.with_name(run_dir.name + "_warm")), postprocess=False)
    gen.set_generation_seed(seed)
    t0 = time.time()
    result = gen.generate_images([(class_name, count)], str(run_dir),
                                 postprocess=False)
    if "error" in result:
        raise RuntimeError(f"{tag} failed: {result['error']}")
    wall = time.time() - t0
    imgs = load_generated_images(run_dir / class_name, count)
    fd = float(frechet_distance(*stats(imgs), *s_held))
    log(f"[ladder] {tag}: frechet={fd:.3f} "
        f"{result['images_per_second']} img/s")
    return {"tag": tag, "frechet_vs_heldout": round(fd, 3),
            "img_per_s": result["images_per_second"],
            "wall_s": round(wall, 1)}
