"""A/B: fast-math (bf16 exp) attention inside the full UNet forward."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))

from synt_isic_tpu.ops.pallas.attention import fused_attention

B = 8


def chain_time(fn, x0, n=20):
    x = fn(x0)
    x.block_until_ready()
    t0 = time.time()
    for _ in range(n):
        x = fn(x)
    x.block_until_ready()
    return (time.time() - t0) / n


def main():
    # inside the full forward (monkeypatched default through a wrapper model)
    from synt_isic_tpu.models import unet2d as U
    import functools

    params = U.init_unet_params(U.UNet2D(config=U.UNet2DConfig(),
                                         dtype=jnp.bfloat16),
                                jax.random.PRNGKey(0))
    t = jnp.full((B,), 500, jnp.int32)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, 128, 128, 3), jnp.bfloat16)

    import synt_isic_tpu.ops.pallas.attention as A
    orig = A.fused_attention
    for fast in (False, True):
        A_wrapped = functools.partial(orig, fast_math=fast)
        # patch the symbol the model imports at call time
        A.fused_attention = A_wrapped if fast else orig
        try:
            model = U.UNet2D(config=U.UNet2DConfig(), dtype=jnp.bfloat16,
                             use_fused_attention=True)
            fn = jax.jit(lambda x, m=model: m.apply({"params": params}, x, t)
                         .astype(jnp.bfloat16))
            dt = chain_time(fn, x0)
            print(f"fwd b{B} fast_math={fast}: {dt*1000:8.2f} ms", flush=True)
            if fast:
                A.fused_attention = orig
                base_model = U.UNet2D(config=U.UNet2DConfig(), dtype=jnp.bfloat16,
                                      use_fused_attention=True)
                ya = np.asarray(base_model.apply({"params": params}, x0, t),
                                np.float32)
                A.fused_attention = A_wrapped
                yb = np.asarray(model.apply({"params": params}, x0, t),
                                np.float32)
                print(f"  output max|diff| fast vs exact: {np.abs(ya-yb).max():.4f}")
        finally:
            A.fused_attention = orig


if __name__ == "__main__":
    main()
