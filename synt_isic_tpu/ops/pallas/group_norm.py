"""Pallas TPU kernels: fused GroupNorm(+FiLM)+SiLU.

The UNet's ResNet blocks interleave GroupNorm -> SiLU -> conv and a FiLM
timestep shift (h + temb) -> GroupNorm -> SiLU -> conv
(`models/unet2d.py:ResnetBlock2D`). These kernels fuse the normalization
statistics, affine, FiLM add and SiLU into one VMEM-resident pass per
batch element — one HBM read and one write for the whole chain, fp32
statistics regardless of data dtype (parity with the model's fp32-norm
policy).

Mosaic implementation notes:
  * group statistics use a (C, G) one-hot channel->group matmul — a
    (HW, G, C/G) reshape has a tiny last dim and fails TPU lowering, while
    (HW, C) x (C, G) rides the MXU;
  * the image is processed in row chunks (two fori_loop passes: accumulate
    sums/sumsq, then normalize+write) so fp32 temporaries stay ~1 MB even
    at the 128x128x64 stage — a whole-tile fp32 copy blows the 16 MB VMEM
    scoped limit.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot(c: int, groups: int) -> jnp.ndarray:
    chan = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (chan // (c // groups) == grp).astype(jnp.float32)


def _rows_per_chunk(h: int, w: int, c: int, budget_bytes: int = 1 << 19) -> int:
    rows = h
    while rows > 8 and rows * w * c * 4 > budget_bytes:
        rows //= 2
    while h % rows != 0:  # h is a power of two in all UNet stages
        rows //= 2
    return max(rows, 1)


def _gn_kernel_body(x_ref, temb_row, scale_ref, bias_ref, o_ref, *,
                    groups: int, eps: float, with_silu: bool):
    """Shared body; temb_row is a (1, C)-shaped fp32 value or None."""
    _, h, w, c = x_ref.shape
    rows = _rows_per_chunk(h, w, c)
    n_chunks = h // rows
    onehot = _onehot(c, groups)
    denom = float(h * w * (c // groups))

    def load_chunk(i):
        xc = x_ref[0, pl.ds(i * rows, rows)].astype(jnp.float32)
        xc = xc.reshape(rows * w, c)
        if temb_row is not None:
            xc = xc + temb_row
        return xc

    def pass1(i, acc):
        sums, sumsq = acc
        xc = load_chunk(i)
        s = jnp.sum(jnp.dot(xc, onehot, preferred_element_type=jnp.float32),
                    axis=0, keepdims=True)
        s2 = jnp.sum(jnp.dot(xc * xc, onehot,
                             preferred_element_type=jnp.float32),
                     axis=0, keepdims=True)
        return sums + s, sumsq + s2

    zeros = jnp.zeros((1, groups), jnp.float32)
    sums, sumsq = jax.lax.fori_loop(0, n_chunks, pass1, (zeros, zeros))
    mean_g = sums / denom
    var_g = jnp.maximum(sumsq / denom - mean_g * mean_g, 0.0)
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    inv_c = jax.lax.rsqrt(jnp.dot(var_g, onehot.T,
                                  preferred_element_type=jnp.float32) + eps)
    scale_c = inv_c * scale_ref[:].astype(jnp.float32)[None, :]
    bias_c = bias_ref[:].astype(jnp.float32)[None, :] - mean_c * scale_c

    def pass2(i, _):
        xc = load_chunk(i)
        y = xc * scale_c + bias_c
        if with_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * rows, rows)] = y.reshape(rows, w, c).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, pass2, 0)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int,
                    eps: float, with_silu: bool):
    _gn_kernel_body(x_ref, None, scale_ref, bias_ref, o_ref, groups=groups,
                    eps=eps, with_silu=with_silu)


def _gn_film_silu_kernel(x_ref, temb_ref, scale_ref, bias_ref, o_ref, *,
                         groups: int, eps: float, with_silu: bool):
    # select row program_id via a one-hot matmul — Mosaic cannot lower a
    # strided single-row bf16 vector load from the (B, C) block
    b = pl.program_id(0)
    n = temb_ref.shape[0]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) == b).astype(jnp.float32)
    temb_row = jnp.dot(sel, temb_ref[:].astype(jnp.float32),
                       preferred_element_type=jnp.float32)  # (1, C)
    _gn_kernel_body(x_ref, temb_row, scale_ref, bias_ref, o_ref, groups=groups,
                    eps=eps, with_silu=with_silu)


@functools.partial(jax.jit,
                   static_argnames=("groups", "eps", "with_silu", "interpret"))
def fused_group_norm_silu(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                          groups: int = 32, eps: float = 1e-5,
                          with_silu: bool = True,
                          interpret: bool = False) -> jnp.ndarray:
    """silu(GroupNorm(x) * scale + bias); x: (B, H, W, C)."""
    b, h, w, c = x.shape
    kernel = functools.partial(_gn_silu_kernel, groups=groups, eps=eps,
                               with_silu=with_silu)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale, bias)


@functools.partial(jax.jit,
                   static_argnames=("groups", "eps", "with_silu", "interpret"))
def fused_film_group_norm_silu(x: jnp.ndarray, temb: jnp.ndarray,
                               scale: jnp.ndarray, bias: jnp.ndarray,
                               groups: int = 32, eps: float = 1e-5,
                               with_silu: bool = True,
                               interpret: bool = False) -> jnp.ndarray:
    """silu(GroupNorm(x + temb[:, None, None, :]) * scale + bias)."""
    b, h, w, c = x.shape
    kernel = functools.partial(_gn_film_silu_kernel, groups=groups, eps=eps,
                               with_silu=with_silu)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole (B, C) temb in VMEM; rows picked by program_id (a per-row
            # block would violate the (8, 128) tiling constraint for small C)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, temb, scale, bias)
