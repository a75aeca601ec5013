"""A/B the fused-kernel variants of the full UNet forward on the TPU."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))

from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def chain_time(fn, x0, n=20):
    x = fn(x0)
    x.block_until_ready()
    t0 = time.time()
    for _ in range(n):
        x = fn(x)
    x.block_until_ready()
    return (time.time() - t0) / n


def main():
    params = init_unet_params(UNet2D(config=UNet2DConfig(), dtype=jnp.bfloat16),
                              jax.random.PRNGKey(0))
    t = jnp.full((B,), 500, jnp.int32)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, 128, 128, 3), jnp.bfloat16)
    for attn, norm in [(False, False), (True, False), (False, True), (True, True)]:
        model = UNet2D(config=UNet2DConfig(), dtype=jnp.bfloat16,
                       use_fused_attention=attn, use_fused_norm=norm)
        fn = jax.jit(lambda x, m=model: m.apply({"params": params}, x, t)
                     .astype(jnp.bfloat16))
        dt = chain_time(fn, x0)
        print(f"fwd b{B} fused_attn={attn} fused_norm={norm}: {dt*1000:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
