"""Experiment: G heads per Pallas program (static in-block indexing) vs the
per-(b,h) grid kernel. Chained timing on the TPU."""
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

B, H, T, D = 8, 32, 1024, 8


def grouped_attention(q, k, v, group: int):
    scale = 1.0 / math.sqrt(D)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for h in range(group):  # static indices into the block
            qh = q_ref[0, h]
            kh = k_ref[0, h]
            vh = v_ref[0, h]
            logits = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32) * scale
            logits = logits - jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(vh.dtype)
            o_ref[0, h] = jnp.dot(p, vh,
                                  preferred_element_type=jnp.float32
                                  ).astype(o_ref.dtype)

    block = pl.BlockSpec((1, group, T, D), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(kernel, grid=(B, H // group),
                          in_specs=[block] * 3, out_specs=block,
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
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, T, D), jnp.bfloat16)
    base = jax.jit(lambda q: fused_attention(q, q, q).astype(jnp.bfloat16))
    t = chain(base, x)
    print(f"per-(b,h) grid      : {t*1000:8.2f} ms", flush=True)
    for g in (2, 4):
        fn = jax.jit(functools.partial(
            lambda q, g: grouped_attention(q, q, q, g).astype(jnp.bfloat16), g=g))
        tg = chain(fn, x)
        ok = np.allclose(np.asarray(base(x), np.float32),
                         np.asarray(fn(x), np.float32), atol=0.03)
        print(f"grouped G={g}         : {tg*1000:8.2f} ms  match={ok}", flush=True)


if __name__ == "__main__":
    main()
