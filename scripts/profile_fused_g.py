"""A/B: full UNet forward with grouped-heads fused attention (G=1 vs 2, 4)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import flax.linen as nn
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))

from synt_isic_tpu.models import unet2d as U

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
    params = U.init_unet_params(U.UNet2D(config=U.UNet2DConfig(),
                                         dtype=jnp.bfloat16),
                                jax.random.PRNGKey(0))
    t = jnp.full((B,), 500, jnp.int32)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, 128, 128, 3), jnp.bfloat16)
    for g in (1, 2, 4):
        # monkeypatch the default G through the AttentionBlock dataclass default
        blk = U.AttentionBlock
        orig = blk.fused_heads_per_program
        try:
            blk.fused_heads_per_program = g
            model = U.UNet2D(config=U.UNet2DConfig(), dtype=jnp.bfloat16,
                             use_fused_attention=True)
            fn = jax.jit(lambda x, m=model: m.apply({"params": params}, x, t)
                         .astype(jnp.bfloat16))
            dt = chain_time(fn, x0)
            print(f"fwd b{B} fused G={g}: {dt*1000:8.2f} ms", flush=True)
        finally:
            blk.fused_heads_per_program = orig


if __name__ == "__main__":
    main()
