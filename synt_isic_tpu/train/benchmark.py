"""Shared steady-state training-step timing harness.

Both `bench.py` (the train_b32 rung) and `scripts/profile_remat.py` (the
remat-mode x batch sweep) time the SAME thing: the jitted donated train
step on the flagship topology, device-resident inputs whose contents vary
per step (the tunnel coalesces byte-identical execution requests), steady
state after one compile+run. Keeping the harness in one place keeps the
two numbers provably comparable — any tweak (warmup count, varying-input
scheme) lands in both.
"""
import time
from typing import Any, Dict, Union

__all__ = ["measure_train_step"]


def measure_train_step(remat_mode: Union[bool, str] = False,
                       batch: int = 32, steps: int = 30,
                       size: int = 128) -> Dict[str, Any]:
    """Time the flagship training step; returns raw (unrounded) metrics.

    Fused-attention custom-vjp backward + fast_norm on TPU (the same
    Pallas kernels as the sampling path); reference-parity TrainConfig —
    constant lr, NO EMA. Keys: sec_per_step, img_per_s, loss, remat,
    batch, plus the device memory stats when the backend exposes them.
    """
    import jax
    import jax.numpy as jnp

    from ..diffusion.schedules import DiffusionSchedule
    from ..models.unet2d import UNet2D, UNet2DConfig
    from .train_ddpm import TrainConfig, create_train_state, make_train_step

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    model = UNet2D(config=UNet2DConfig(sample_size=size), dtype=jnp.bfloat16,
                   remat=remat_mode, use_fused_attention=on_tpu,
                   fast_norm=on_tpu)
    cfg = TrainConfig(batch_size=batch, image_size=size)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, DiffusionSchedule.create(), tx, cfg)
    key = jax.random.PRNGKey(1)
    # device-resident fake batch; contents vary per step via a scale (the
    # tunnel coalesces byte-identical execution requests)
    base = jax.device_put(
        jax.random.normal(key, (batch, size, size, 3), jnp.float32))

    def batch_at(i):
        return base * (1.0 + 1e-4 * i)

    # XLA's own cost analysis of the HLO actually benchmarked — the honest
    # numerator for train MFU (includes bwd, optimizer, min-SNR weighting,
    # NOT a fwd-times-3 approximation). Lower/compile happens once anyway;
    # .lower() on the jitted fn reuses the same cache entry.
    flops_per_step = None
    try:
        cost = (step_fn.lower(state, batch_at(0), jax.random.fold_in(key, 0))
                .compile().cost_analysis())
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_step = float(cost["flops"])
    except Exception:
        pass
    state, loss = step_fn(state, batch_at(0), jax.random.fold_in(key, 0))
    jax.block_until_ready(loss)  # compile + first step
    t0 = time.time()
    for i in range(1, steps + 1):
        state, loss = step_fn(state, batch_at(i), jax.random.fold_in(key, i))
    jax.block_until_ready(loss)
    sec = (time.time() - t0) / steps
    mem: Dict[str, int] = {}
    try:
        stats = dev.memory_stats() or {}
        mem = {k: int(v) for k, v in stats.items()
               if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}
    except Exception:
        pass
    return {"remat": (remat_mode if isinstance(remat_mode, str)
                      else ("all" if remat_mode else "none")),
            "batch": batch, "sec_per_step": sec,
            "img_per_s": batch / sec, "loss": float(loss),
            "flops_per_step": flops_per_step, **mem}
