"""Pre-compile the production executables into the persistent compile cache.

First jit compile of the full-size sampler is minutes-scale on a cold
cache; in production that lands on the first unlucky request. This tool
compiles the standard configurations AHEAD of traffic — run it while
building a container image (or once per deploy) and ship `.jax_cache`
(DEPLOYMENT.md).

Fidelity matters: the cache is keyed on HLO, so warming must build the
EXACT executables the server runs. This tool therefore goes through
`ImageGenerator` itself (the serve daemon's engine — same ModelManager
flags: fused attention + fast_norm on TPU, bf16) with a fabricated
random-weight checkpoint (weights don't affect compilation), and warms the
serve default batch (128) plus any extra configs given.

    python scripts/warm_cache.py                     # default config set
    python scripts/warm_cache.py --configs ddim:50:128 dpm_solver:20:128
"""
from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT_CONFIGS = ["ddim:50:128", "ddpm:1000:8", "dpm_solver:20:128"]


def main() -> int:
    p = argparse.ArgumentParser(description="pre-compile production executables")
    p.add_argument("--configs", nargs="*", default=DEFAULT_CONFIGS,
                   metavar="SCHED:STEPS:BATCH",
                   help=f"default: {' '.join(DEFAULT_CONFIGS)}")
    p.add_argument("--classifier-batches", nargs="*", type=int,
                   default=[64, 256], help="classifier forward batch sizes")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16",
                   help="must match the serve daemon's --dtype")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from synt_isic_tpu.utils.compute import enable_compilation_cache

    enable_compilation_cache()

    from synt_isic_tpu.generator import ImageGenerator
    from synt_isic_tpu.models.classifier import LesionClassifier
    from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params
    from synt_isic_tpu.train.train_ddpm import save_checkpoint_torch_format

    work = Path(tempfile.mkdtemp(prefix="warm_cache_"))
    ckpt_dir = work / "ckpt"
    ckpt_dir.mkdir()
    t0 = time.time()
    params = init_unet_params(UNet2D(config=UNet2DConfig()),
                              jax.random.PRNGKey(0))
    save_checkpoint_torch_format(params, str(ckpt_dir / "unet_NV_best.pth"))
    print(f"  fabricated checkpoint ({time.time() - t0:.1f}s)", flush=True)

    # the serve daemon's engine: same ModelManager model flags, same sampler
    gen = ImageGenerator(
        checkpoints_dir=str(ckpt_dir),
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32)
    for spec in args.configs:
        sched, steps, batch = spec.split(":")
        t0 = time.time()
        gen.set_inference_steps(int(steps))
        gen.scheduler_kind = sched
        seeds = np.arange(int(batch), dtype=np.uint32)
        out = gen._sample_batch("NV", seeds, capture_trajectory=False)
        jax.block_until_ready(out["images"])
        print(f"  {spec}: compiled+ran in {time.time() - t0:.1f}s", flush=True)

    clf = LesionClassifier.random_init()
    for b in args.classifier_batches:
        t0 = time.time()
        x = jnp.zeros((b, 128, 128, 3), jnp.float32)
        jax.block_until_ready(clf.get_probabilities(x))
        print(f"  classifier b{b}: compiled+ran in {time.time() - t0:.1f}s",
              flush=True)
    print("cache warm.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
