"""Pallas TPU kernel: fused spatial self-attention for the UNet attn blocks.

The UNet's attention (deprecated-attn-block semantics, see
`models/unet2d.py:AttentionBlock`) runs at 32x32 (T=1024) and 16x16
(T=256) feature maps with 32 heads of dim 8. The XLA einsum path
materializes the (B, 32, T, T) logits AND probs in HBM — ~0.5 GB of
traffic per 32x32 attention at batch 8, which dominates the layer cost.

This kernel keeps the whole per-(batch, head) attention resident in VMEM:
Q/K/V tiles are tiny (T x 8), the T x T logits live only in a VMEM scratch,
and HBM sees just the inputs and the output. Softmax is computed in fp32
(parity with the model's upcast-softmax semantics).

Memory per program: logits fp32 T² = 4 MB at T=1024 — fits VMEM with the
Q/K/V tiles alongside.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                      heads_per_program: int = 1, fast_math: bool = False):
    # blocks: (1, G, T, D). Inputs stay in their storage dtype (bf16 on the
    # sampling path) so both matmuls run at full MXU rate; accumulation and
    # softmax are fp32 (parity with the model's upcast-softmax semantics).
    # G > 1 amortizes grid/DMA overhead over several heads (static unroll).
    # fast_math: exponentials in bf16 and the 1/sum normalization folded
    # into the PV result (bf16-level output deviation; opt-in).
    for h in range(heads_per_program):
        q = q_ref[0, h]                           # (T, D)
        k = k_ref[0, h]
        v = v_ref[0, h]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (T, T) f32
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        if fast_math:
            exp = jnp.exp(logits.astype(jnp.bfloat16))
            denom = jnp.sum(exp.astype(jnp.float32), axis=-1, keepdims=True)
            pv = jnp.dot(exp.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
            out = pv / denom
        else:
            exp = jnp.exp(logits)
            probs = (exp / jnp.sum(exp, axis=-1, keepdims=True)).astype(v.dtype)
            out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
        o_ref[0, h] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "heads_per_program",
                                             "fast_math"))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = False,
                    heads_per_program: int = 1,
                    fast_math: bool = False) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D)) v, fused in VMEM.

    q, k, v: (B, H, T, D). Returns (B, H, T, D) in q's dtype.
    `heads_per_program` groups G heads per grid program (must divide H).
    `fast_math` runs the exponentials in bf16 (opt-in, bf16-level output
    deviation).
    """
    b, h, t, d = q.shape
    g = heads_per_program if h % heads_per_program == 0 else 1
    scale = 1.0 / math.sqrt(d)
    kernel = functools.partial(_attention_kernel, scale=scale,
                               heads_per_program=g, fast_math=fast_math)
    block = pl.BlockSpec((1, g, t, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, h // g),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.2 * (4 * t * t + 4 * 3 * g * t * max(d, 128))
                                 + (1 << 20))),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * t * t * d,
            bytes_accessed=b * h * t * d * 4 * 2,
            transcendentals=b * h * t * t),
        interpret=interpret,
    )(q, k, v)
