"""Pre-compile the production executables into the persistent compile cache.

First jit compile of the full-size sampler is minutes-scale on a cold
cache; in production that lands on the first unlucky request. This tool
compiles the standard configurations AHEAD of traffic — run it while
building a container image (or once per deploy) and ship `.jax_cache`
(DEPLOYMENT.md). Weights don't matter for compilation (the cache keys on
HLO, not values), so random params are used and nothing is written outside
the cache.

    python scripts/warm_cache.py                     # default config set
    python scripts/warm_cache.py --configs ddim:50:64 dpm_solver:20:64
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT_CONFIGS = ["ddim:50:64", "ddpm:1000:8", "dpm_solver:20:64"]


def main() -> int:
    p = argparse.ArgumentParser(description="pre-compile sampler executables")
    p.add_argument("--configs", nargs="*", default=DEFAULT_CONFIGS,
                   metavar="SCHED:STEPS:BATCH",
                   help=f"default: {' '.join(DEFAULT_CONFIGS)}")
    p.add_argument("--classifier-batches", nargs="*", type=int,
                   default=[64, 256], help="classifier forward batch sizes")
    p.add_argument("--image-size", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from synt_isic_tpu.utils.compute import enable_compilation_cache

    enable_compilation_cache()

    from synt_isic_tpu.diffusion import (DiffusionSampler, DiffusionSchedule,
                                         SamplerConfig)
    from synt_isic_tpu.models.classifier import LesionClassifier
    from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params

    model = UNet2D(config=UNet2DConfig(sample_size=args.image_size),
                   dtype=jnp.bfloat16)
    params = init_unet_params(model, jax.random.PRNGKey(0))
    apply_fn = lambda p_, x, t: model.apply({"params": p_}, x, t)
    schedule = DiffusionSchedule.create()

    for spec in args.configs:
        sched, steps, batch = spec.split(":")
        t0 = time.time()
        sampler = DiffusionSampler(
            apply_fn, schedule,
            SamplerConfig(num_inference_steps=int(steps), scheduler=sched,
                          image_size=args.image_size))
        out = sampler.sample(params, np.arange(int(batch), dtype=np.uint32))
        jax.block_until_ready(out["images"])
        print(f"  {spec}: compiled+ran in {time.time() - t0:.1f}s", flush=True)

    clf = LesionClassifier.random_init()
    for b in args.classifier_batches:
        t0 = time.time()
        x = jnp.zeros((b, args.image_size, args.image_size, 3), jnp.float32)
        jax.block_until_ready(clf.get_probabilities(x))
        print(f"  classifier b{b}: compiled+ran in {time.time() - t0:.1f}s",
              flush=True)
    print("cache warm.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
