"""Step-time breakdown on the real TPU: UNet fwd vs RNG vs full sampler step.

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
from synt_isic_tpu.diffusion import DiffusionSchedule
from synt_isic_tpu.diffusion.ddpm import DDPMParams, ddpm_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_ITERS = 20


def timeit(fn, *args, n=N_ITERS):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.time() - t0) / n


def main():
    model = UNet2D(config=UNet2DConfig(), dtype=jnp.bfloat16)
    params = init_unet_params(model, jax.random.PRNGKey(0))
    x = jnp.zeros((B, 128, 128, 3), jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)

    fwd = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))
    t_fwd = timeit(fwd, params, x, t)
    print(f"unet fwd           b{B}: {t_fwd*1000:8.2f} ms")

    # threefry per-step noise (what the sampler does today)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))

    @jax.jit
    def noise_threefry(keys, k):
        return jax.vmap(lambda key: jax.random.normal(
            jax.random.fold_in(key, k), (128, 128, 3), jnp.bfloat16))(keys)

    t_rng = timeit(noise_threefry, keys, jnp.int32(3))
    print(f"threefry noise     b{B}: {t_rng*1000:8.2f} ms")

    # rbg noise
    rbg_keys = jax.vmap(lambda s: jax.random.key(s, impl="rbg"))(
        jnp.arange(B, dtype=jnp.uint32))

    @jax.jit
    def noise_rbg(keys, k):
        return jax.vmap(lambda key: jax.random.normal(
            jax.random.fold_in(key, k), (128, 128, 3), jnp.bfloat16))(keys)

    t_rbg = timeit(noise_rbg, rbg_keys, jnp.int32(3))
    print(f"rbg noise          b{B}: {t_rbg*1000:8.2f} ms")

    # ddpm update math only
    sched = DDPMParams.create(DiffusionSchedule.create(), 1000)
    eps = jnp.zeros_like(x)
    z = jnp.zeros_like(x)
    upd = jax.jit(lambda x, e, k, z: ddpm_step(x, e, k, sched, z))
    t_upd = timeit(upd, x, eps, jnp.int32(5), z)
    print(f"ddpm update        b{B}: {t_upd*1000:8.2f} ms")

    # attention block standalone at 32x32x256 (the biggest attention)
    from synt_isic_tpu.models.unet2d import AttentionBlock
    attn = AttentionBlock(256, head_dim=8, dtype=jnp.bfloat16)
    a_in = jnp.zeros((B, 32, 32, 256), jnp.bfloat16)
    a_params = attn.init(jax.random.PRNGKey(0), a_in)["params"]
    attn_fn = jax.jit(lambda p, x: attn.apply({"params": p}, x))
    t_attn = timeit(attn_fn, a_params, a_in)
    print(f"attn 32x32x256     b{B}: {t_attn*1000:8.2f} ms (x5 layers/fwd)")

    print(f"\nstep estimate: fwd {t_fwd*1000:.1f} + rng {t_rng*1000:.1f} + "
          f"upd {t_upd*1000:.1f} ms; x1000 steps = "
          f"{(t_fwd+t_rng+t_upd)*1000:.1f} s/batch -> "
          f"{B/((t_fwd+t_rng+t_upd)*1000):.3f} img/s")


if __name__ == "__main__":
    main()
