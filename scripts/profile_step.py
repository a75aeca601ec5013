"""Step-time breakdown on the real TPU.

Measurements chain each iteration's output into the next input (forcing
real sequential execution — the axon backend appears to coalesce identical
async dispatches, which makes naive repeat-timing report impossible
numbers).

Run: python scripts/profile_step.py [batch]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))

from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_ITERS = 20


def chain_time(fn, x0, n=N_ITERS):
    """fn: x -> y with y.shape == x.shape; returns seconds/iter."""
    x = fn(x0)
    x.block_until_ready()
    t0 = time.time()
    for _ in range(n):
        x = fn(x)
    x.block_until_ready()
    return (time.time() - t0) / n


def main():
    model = UNet2D(config=UNet2DConfig(), dtype=jnp.bfloat16)
    params = init_unet_params(model, jax.random.PRNGKey(0))
    t = jnp.full((B,), 500, jnp.int32)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 128, 128, 3), jnp.bfloat16)

    fwd = jax.jit(lambda x: model.apply({"params": params}, x, t)
                  .astype(jnp.bfloat16))
    t_fwd = chain_time(fwd, x)
    print(f"unet fwd chained      b{B}: {t_fwd*1000:8.2f} ms "
          f"-> {B/(t_fwd*1000):.3f} img/s at T=1000")

    # attention at 32x32x256 (5 of these per forward) — chained
    from synt_isic_tpu.models.unet2d import AttentionBlock
    attn = AttentionBlock(256, head_dim=8, dtype=jnp.bfloat16)
    a_in = jax.random.normal(jax.random.PRNGKey(2), (B, 32, 32, 256), jnp.bfloat16)
    a_params = attn.init(jax.random.PRNGKey(0), a_in)["params"]
    attn_fn = jax.jit(lambda x: attn.apply({"params": a_params}, x)
                      .astype(jnp.bfloat16))
    t_attn = chain_time(attn_fn, a_in)
    print(f"attn 32x32x256 chained b{B}: {t_attn*1000:8.2f} ms (x5/fwd)")

    # mid-size attention 16x16x256 (1 per forward)
    a16 = jax.random.normal(jax.random.PRNGKey(3), (B, 16, 16, 256), jnp.bfloat16)
    attn16_fn = jax.jit(lambda x: attn.apply({"params": a_params}, x)
                        .astype(jnp.bfloat16))
    t_attn16 = chain_time(attn16_fn, a16)
    print(f"attn 16x16x256 chained b{B}: {t_attn16*1000:8.2f} ms (x1/fwd)")

    # resnet block at the widest spatial stage 128x128x64 — chained
    from synt_isic_tpu.models.unet2d import ResnetBlock2D
    res = ResnetBlock2D(64, 64, dtype=jnp.bfloat16)
    r_in = jax.random.normal(jax.random.PRNGKey(4), (B, 128, 128, 64), jnp.bfloat16)
    temb = jnp.zeros((B, 256), jnp.bfloat16)
    r_params = res.init(jax.random.PRNGKey(0), r_in, temb)["params"]
    res_fn = jax.jit(lambda x: res.apply({"params": r_params}, x, temb)
                     .astype(jnp.bfloat16))
    t_res = chain_time(res_fn, r_in)
    print(f"resnet 128x128x64      b{B}: {t_res*1000:8.2f} ms")

    print(f"\nattention share estimate: "
          f"{(5*t_attn + t_attn16)/t_fwd*100:.0f}% of forward")


if __name__ == "__main__":
    main()
