"""Fused-Pallas vs einsum attention on the real TPU (chained timing)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))

from synt_isic_tpu.models.unet2d import AttentionBlock

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
    for (hh, ww) in [(32, 32), (16, 16)]:
        x0 = jax.random.normal(jax.random.PRNGKey(0), (B, hh, ww, 256),
                               jnp.bfloat16)
        for fused in (False, True):
            attn = AttentionBlock(256, head_dim=8, dtype=jnp.bfloat16,
                                  use_fused=fused)
            params = AttentionBlock(256, head_dim=8, dtype=jnp.bfloat16,
                                    use_fused=False).init(
                jax.random.PRNGKey(0), x0)["params"]
            fn = jax.jit(lambda x: attn.apply({"params": params}, x)
                         .astype(jnp.bfloat16))
            t = chain_time(fn, x0)
            print(f"attn {hh}x{ww}x256 b{B} fused={fused}: {t*1000:8.2f} ms")
        # numerical agreement
        a = AttentionBlock(256, head_dim=8, dtype=jnp.bfloat16, use_fused=False)
        b_ = AttentionBlock(256, head_dim=8, dtype=jnp.bfloat16, use_fused=True)
        pa = a.init(jax.random.PRNGKey(0), x0)["params"]
        ya = np.asarray(a.apply({"params": pa}, x0), np.float32)
        yb = np.asarray(b_.apply({"params": pa}, x0), np.float32)
        print(f"  max |diff| fused vs einsum: {np.abs(ya-yb).max():.5f}")


if __name__ == "__main__":
    main()
