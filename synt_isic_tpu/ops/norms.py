"""GroupNorm(+SiLU) variants for the bf16 sampling path.

The standard path (Flax GroupNorm at dtype=f32) materializes an f32 copy
of every activation tensor just to normalize it — on the UNet's bf16
sampling path that is pure HBM traffic (the on-device trace shows the
convert+reduce fusions at ~25% of step time, PERFORMANCE.md). The fast
path here keeps ALL tensor arithmetic in bf16 and computes only the
per-(batch, group) statistics in f32 via reduces with f32 accumulation —
XLA fuses the widening convert into the reduction, so no f32 tensor is
ever materialized.

Numerics: statistics are exact-as-f32; the normalization multiply-add and
SiLU run in bf16, i.e. results differ from the f32 path by bf16 rounding
only (the f32 path's output is cast to bf16 immediately afterward anyway).
The f32 model path is untouched — golden/parity tests run there.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm_silu_fast(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                         groups: int, eps: float = 1e-5,
                         silu: bool = True) -> jnp.ndarray:
    """GroupNorm (+ optional SiLU) with f32 statistics and bf16 arithmetic.

    x: (B, H, W, C) or (B, T, C), any float dtype (bf16 intended).
    Returns x.dtype.
    """
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    cg = c // groups
    xg = x.reshape(b, -1, groups, cg)

    # f32-accumulated statistics without materializing f32 activations
    mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)               # (B, G)
    mean_sq = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 3))
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)                                    # (B, G)

    # fold everything into per-(B, C) affine coefficients in f32, then do a
    # single bf16 fused multiply-add over the tensor
    scale_f = scale.astype(jnp.float32).reshape(groups, cg)
    bias_f = bias.astype(jnp.float32).reshape(groups, cg)
    a = (inv[:, :, None] * scale_f[None]).reshape(b, c)               # (B, C)
    d = (bias_f[None] - (mean * inv)[:, :, None] * scale_f[None]).reshape(b, c)

    bshape = (b,) + (1,) * (len(orig_shape) - 2) + (c,)
    y = x * a.reshape(bshape).astype(x.dtype) + d.reshape(bshape).astype(x.dtype)
    if silu:
        y = jax.nn.silu(y)
    return y
