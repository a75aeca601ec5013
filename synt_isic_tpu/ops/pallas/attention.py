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


def _attention_kernel_tm(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                         heads_per_program: int = 1, fast_math: bool = False):
    # blocks: (1, G, D, T) — token-minor storage. This is the physical
    # layout XLA prefers for the tensors surrounding the call (measured:
    # with (…, T, D) operands XLA inserts ~10 8MB relayout copies per step,
    # trace artifacts/profile/), so operands/results bitcast instead of
    # copying. Math is identical to `_attention_kernel` on transposed tiles.
    for h in range(heads_per_program):
        q = q_ref[0, h]                           # (D, T)
        k = k_ref[0, h]
        v = v_ref[0, h]
        logits = jax.lax.dot_general(
            q, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (T, T) f32
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        if fast_math:
            exp = jnp.exp(logits.astype(jnp.bfloat16))
            denom = jnp.sum(exp.astype(jnp.float32), axis=-1)   # (T,)
            pv = jax.lax.dot_general(v, exp.astype(v.dtype),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            out = pv / denom[None, :]
        else:
            exp = jnp.exp(logits)
            probs = (exp / jnp.sum(exp, axis=-1, keepdims=True)).astype(v.dtype)
            out = jax.lax.dot_general(v, probs, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        o_ref[0, h] = out.astype(o_ref.dtype)     # (D, T)


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
                                             "fast_math", "token_minor"))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = False,
                    heads_per_program: int = 1,
                    fast_math: bool = False,
                    token_minor: bool = True) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D)) v, fused in VMEM.

    q, k, v: (B, H, T, D). Returns (B, H, T, D) in q's dtype.
    `heads_per_program` groups G heads per grid program (must divide H).
    `fast_math` runs the exponentials in bf16 (opt-in, bf16-level output
    deviation).
    `token_minor` (default) runs the kernel on (B, H, D, T)-shaped blocks:
    under jit the wrapping transposes become layout assignments, and since
    token-minor is the physical layout XLA prefers for the surrounding
    fusions, the 8MB relayout copies at the custom-call boundary disappear
    (measured: 10 copies/step in the DDIM-50 b8 trace without it).
    """
    b, h, t, d = q.shape
    g = heads_per_program if h % heads_per_program == 0 else 1
    scale = 1.0 / math.sqrt(d)
    vmem_bytes = int(1.2 * (4 * t * t + 4 * 3 * g * t * max(d, 128)) + (1 << 20))
    cost = pl.CostEstimate(
        flops=2 * 2 * b * h * t * t * d,
        bytes_accessed=b * h * t * d * 4 * 2,
        transcendentals=b * h * t * t)

    if token_minor:
        kernel = functools.partial(_attention_kernel_tm, scale=scale,
                                   heads_per_program=g, fast_math=fast_math)
        block = pl.BlockSpec((1, g, d, t), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
        qt, kt, vt = (z.transpose(0, 1, 3, 2) for z in (q, k, v))
        out_t = pl.pallas_call(
            kernel,
            grid=(b, h // g),
            in_specs=[block, block, block],
            out_specs=block,
            out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
            cost_estimate=cost,
            interpret=interpret,
        )(qt, kt, vt)
        return out_t.transpose(0, 1, 3, 2)

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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v)


def _attention_bwd_kernel(q_ref, k_ref, v_ref, do_ref,
                          dq_ref, dk_ref, dv_ref, *, scale: float,
                          heads_per_program: int = 1):
    # blocks: (1, G, T, D). Recompute-style backward (flash-attention
    # pattern): probs are rebuilt from q/k in VMEM, so HBM never sees a
    # (T, T) tensor in either direction. Live VMEM peak at T=1024:
    # probs bf16 (2 MB) + dp f32 (4 MB) + ds f32 (4 MB) ≈ 10 MB — probs
    # are kept in the PRIMAL's storage dtype, both to bound VMEM and so
    # dv matches the forward's actual (rounded) product probs·v.
    for h in range(heads_per_program):
        q = q_ref[0, h]                            # (T, D)
        k = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # (T, T) f32
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        exp = jnp.exp(logits)
        probs = (exp / jnp.sum(exp, axis=-1, keepdims=True)).astype(v.dtype)
        # dv[kt, d] = Σ_qt probs[qt, kt] · do[qt, d]
        dv = jax.lax.dot_general(probs, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dp[qt, kt] = Σ_d do[qt, d] · v[kt, d]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        pf = probs.astype(jnp.float32)
        row = jnp.sum(dp * pf, axis=-1, keepdims=True)
        ds = pf * (dp - row) * scale               # (T, T) f32, dL/d(qk^T)
        dq = jax.lax.dot_general(ds.astype(q.dtype), k,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds.astype(q.dtype), q,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "heads_per_program"))
def fused_attention_bwd(q, k, v, do, interpret: bool = False,
                        heads_per_program: int = 1):
    """(dq, dk, dv) for softmax(q k^T / sqrt(D)) v — one fused VMEM pass."""
    b, h, t, d = q.shape
    g = heads_per_program if h % heads_per_program == 0 else 1
    scale = 1.0 / math.sqrt(d)
    # probs (primal dtype) + dp + ds f32 live together; ×1.2 headroom
    pbytes = jnp.dtype(q.dtype).itemsize
    vmem_bytes = int(1.2 * g * (t * t * (2 * 4 + pbytes)
                                + 7 * t * max(d, 128) * 4) + (1 << 20))
    cost = pl.CostEstimate(
        flops=2 * 5 * b * h * t * t * d,   # 5 T×T-sized matmuls per head
        bytes_accessed=b * h * t * d * 4 * 7,
        transcendentals=b * h * t * t)
    block = pl.BlockSpec((1, g, t, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_attention_bwd_kernel, scale=scale,
                               heads_per_program=g)
    shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(b, h // g),
        in_specs=[block, block, block, block],
        out_specs=(block, block, block),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_attention_trainable(q, k, v, interpret: bool = False,
                              heads_per_program: int = 1,
                              fast_math: bool = False,
                              token_minor: bool = True):
    """`fused_attention` with a Pallas backward: the training path gets the
    same VMEM-resident kernel the sampling path uses (the plain
    `fused_attention` is a pallas_call and has no autodiff rule, which is
    why trainers historically fell back to the XLA einsum attention and
    its HBM-resident (B, H, T, T) logits in BOTH directions).

    The backward recomputes probs in VMEM (flash-attention pattern) — no
    residual larger than q/k/v is saved, so training memory drops too.
    Gradients are the exact derivatives of the recomputed-softmax forward;
    they differ from autodiff of the primal by primal-storage rounding only
    (same contract as every flash-attention implementation). With
    `fast_math=True` the primal uses bf16 exponentials while the backward
    keeps the standard f32 softmax derivative (approximation documented)."""
    return fused_attention(q, k, v, interpret=interpret,
                           heads_per_program=heads_per_program,
                           fast_math=fast_math, token_minor=token_minor)


def _fat_fwd(q, k, v, interpret, heads_per_program, fast_math, token_minor):
    out = fused_attention(q, k, v, interpret=interpret,
                          heads_per_program=heads_per_program,
                          fast_math=fast_math, token_minor=token_minor)
    return out, (q, k, v)


def _fat_bwd(interpret, heads_per_program, fast_math, token_minor, res, do):
    q, k, v = res
    dq, dk, dv = fused_attention_bwd(q, k, v, do.astype(q.dtype),
                                     interpret=interpret,
                                     heads_per_program=heads_per_program)
    return dq, dk, dv


fused_attention_trainable.defvjp(_fat_fwd, _fat_bwd)
