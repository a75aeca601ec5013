"""Pallas TPU kernels: fused GroupNorm(+FiLM)+SiLU.

The UNet's ResNet blocks interleave GroupNorm -> SiLU -> conv and a FiLM
timestep shift (h + temb) -> GroupNorm -> SiLU -> conv
(`models/unet2d.py:ResnetBlock2D`, reference math in diffusers'
ResnetBlock2D). These kernels fuse the normalization statistics, affine,
FiLM add and SiLU into one VMEM pass per batch element — one HBM read and
one write for the whole chain, fp32 statistics regardless of the data
dtype (parity with the model's fp32-norm policy).

Grid: one program per batch element; the full (H, W, C) activation tile
lives in VMEM (<= 4 MB for every UNet stage at 128² base resolution).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int,
                    eps: float, with_silu: bool):
    x = x_ref[0].astype(jnp.float32)            # (H, W, C)
    h, w, c = x.shape
    cg = c // groups
    xg = x.reshape(h * w, groups, cg)
    mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(0, 2), keepdims=True)
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(h, w, c) * scale_ref[:].astype(jnp.float32) \
        + bias_ref[:].astype(jnp.float32)
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_film_silu_kernel(x_ref, temb_ref, scale_ref, bias_ref, o_ref, *,
                         groups: int, eps: float, with_silu: bool):
    x = x_ref[0].astype(jnp.float32) + temb_ref[0].astype(jnp.float32)[None, None, :]
    h, w, c = x.shape
    cg = c // groups
    xg = x.reshape(h * w, groups, cg)
    mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(0, 2), keepdims=True)
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(h, w, c) * scale_ref[:].astype(jnp.float32) \
        + bias_ref[:].astype(jnp.float32)
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


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
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, temb, scale, bias)
