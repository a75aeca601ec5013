"""Experiment: attention kernel variant with all heads in one program."""
import functools
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))

from synt_isic_tpu.ops.pallas.attention import fused_attention


def _kernel_v2(q_ref, k_ref, v_ref, o_ref, *, scale, heads, head_dim):
    # blocks: (1, T, C); loop heads inside the program
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    t = q.shape[0]

    # static unroll: Mosaic has no dynamic_slice on values
    outs = []
    for h in range(heads):
        qh = q[:, h * head_dim:(h + 1) * head_dim]
        kh = k[:, h * head_dim:(h + 1) * head_dim]
        vh = v[:, h * head_dim:(h + 1) * head_dim]
        logits = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(jnp.dot(p, vh, preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads",))
def attn_v2(q, k, v, heads=32):
    b, t, c = q.shape
    head_dim = c // heads
    kernel = functools.partial(_kernel_v2, scale=1.0 / math.sqrt(head_dim),
                               heads=heads, head_dim=head_dim)
    block = pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(kernel, grid=(b,), in_specs=[block] * 3,
                          out_specs=block,
                          out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype))(q, k, v)


def chain(fn, x, n=20):
    y = fn(x)
    y.block_until_ready()
    t0 = time.time()
    for _ in range(n):
        y = fn(y)
    y.block_until_ready()
    return (time.time() - t0) / n


def main():
    B, T, C, H = 8, 1024, 256, 32
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, C), jnp.bfloat16)

    # v1: (B,H,T,D) grid over b*h
    def v1(x):
        xh = x.reshape(B, T, H, C // H).transpose(0, 2, 1, 3)
        out = fused_attention(xh, xh, xh)
        return out.transpose(0, 2, 1, 3).reshape(B, T, C).astype(jnp.bfloat16)

    t1 = chain(jax.jit(v1), q)
    print(f"v1 per-(b,h) grid : {t1*1000:8.2f} ms", flush=True)

    def v2(x):
        return attn_v2(x, x, x).astype(jnp.bfloat16)

    t2 = chain(jax.jit(v2), q)
    print(f"v2 heads-in-prog  : {t2*1000:8.2f} ms", flush=True)

    # correctness
    y1 = np.asarray(jax.jit(v1)(q), np.float32)
    y2 = np.asarray(jax.jit(v2)(q), np.float32)
    print("max diff:", np.abs(y1 - y2).max())


if __name__ == "__main__":
    main()
