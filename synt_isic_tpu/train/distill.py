"""Progressive distillation: halve sampling steps while keeping quality.

Beyond-reference performance feature (the reference has no distillation —
its only speed lever is the raw `inference_timesteps` spin box,
`core/config/config_manager.py:54`). After the round-2/3 traces proved the
per-step cost intrinsic to the checkpoint architecture (32 heads x dim 8
attention = 45% of step time), the remaining throughput lever is the STEP
COUNT — and the measured sampler ladder showed plain few-step sampling
pays real quality (Frechet 2.5 -> 5.7 from DDIM-50 to DDIM/DPM-20 on the
e2e checkpoint). Progressive distillation (Salimans & Ho, "Progressive
Distillation for Fast Sampling of Diffusion Models", ICLR 2022) closes
that gap: a student is trained so ONE of its DDIM steps reproduces TWO
teacher DDIM steps, then step counts halve phase by phase (N -> N/2 ->
N/4 ...).

Design constraints honored here:

  * **Checkpoint compatibility** — the student stays an EPSILON-predicting
    UNet2D in the reference's torch `.pth` format, so distilled models load
    through the production `ModelManager` path and sample with the existing
    DDIM sampler at low step counts; the reference app itself could load
    them (`core/generator/model_manager.py:89-171`). The paper's v-param
    reformulation is avoided by computing the distillation target in
    x0-space and training through the epsilon head (same information,
    different basis).
  * **Exact single-step algebra** — for a student DDIM step t -> t'' the
    target x0 is the unique value that makes the student step land exactly
    on the teacher's two-step endpoint z'':

        eps_implied = (z_t - a_t * x0) / s_t            (DDIM inversion)
        z''         = a'' * x0 + s'' * eps_implied
        =>  x0_target = (z'' - (s''/s_t) z_t) / (a'' - (s''/s_t) a_t)

    with a = sqrt(alpha_bar), s = sqrt(1 - alpha_bar). The denominator is
    positive whenever SNR(t'') > SNR(t), i.e. for any forward-in-sampling
    step (verified by `tests/test_distill.py::test_target_algebra`).
  * **Truncated-SNR loss** (paper eq. 9): L = max(SNR(t), snr_floor) *
    ||x0_pred - x0_target||^2. In x0-space the weight is bounded at high t
    (where plain epsilon-MSE is ill-conditioned for few-step students).
  * **One dispatch per scan block** on tunneled devices — the phase loop
    runs as a `lax.scan` over stacked batches (same lesson as
    `train_ddpm.make_epoch_step`: per-step dispatch costs ~1 s through the
    axon tunnel and would dominate a seconds-scale compute step).

Inference grids match training grids: the phase's (t, t_mid, t'') tables
are built from the SAME `spaced_timesteps` spacing the sampler will use at
the student's step count, so a model distilled for trailing-N is consumed
with `timestep_spacing="trailing", num_inference_steps=N` — nothing else
in the pipeline changes and sidecar reproduction keeps working.
"""
from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.schedules import DiffusionSchedule, spaced_timesteps
from ..models.unet2d import UNet2D, UNet2DConfig
from .train_ddpm import (ema_update, save_checkpoint_torch_format,
                         warmup_cosine_schedule)


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    num_train_timesteps: int = 1000
    # spacing of the student's inference grid; 'trailing' is the measured
    # few-step winner (NOTES_ROUND3.md) and the recommended default for
    # distilled models
    timestep_spacing: str = "trailing"
    batch_size: int = 32
    steps_per_phase: int = 2000
    learning_rate: float = 5e-5
    warmup_steps: int = 100
    # cosine decay to lr_end_factor * lr across the phase (the paper
    # anneals per phase as well)
    lr_end_factor: float = 0.1
    ema_decay: float = 0.999          # student EMA; 0 = export raw params
    snr_floor: float = 1.0            # truncated-SNR weight max(SNR, floor)
    # global-norm gradient clip (0 = off). The implied-x0 target amplifies
    # teacher-prediction error by ~1/denom at the highest-noise steps, so
    # early-phase gradients can spike; clipping keeps Adam on the rails.
    grad_clip: float = 1.0
    clip_teacher_x0: bool = False     # clip pred_x0 in teacher substeps
    # deterministic held-out validation for best-export selection (0 = off
    # = export the final EMA/raw params). Every eval_every optimizer steps
    # the EXPORT params are scored with the phase's own objective on a
    # fixed probe (eval_probe_images images x eval_keys fixed PRNG keys —
    # zero sampling variance between calls, same rationale as
    # TrainConfig.eval_every) and the best-scoring snapshot is exported.
    eval_every: int = 0
    eval_probe_images: int = 16
    eval_keys: int = 4
    bf16_compute: bool = True
    seed: int = 0


class DistillState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Any = None


def phase_tables(schedule: DiffusionSchedule, n_student: int,
                 spacing: str = "trailing") -> Dict[str, np.ndarray]:
    """Per-student-step coefficient tables for one distillation phase.

    Returns float64 host arrays of length n_student:
      ts      — student timesteps (the sampler's own grid at n_student)
      t_mid   — teacher midpoint timestep for each student step
      a_t,s_t — sqrt(ab), sqrt(1-ab) at ts
      a_m,s_m — at t_mid
      a_p,s_p — at the student step's destination (1, 0 past the end)
      denom   — a_p - (s_p/s_t) * a_t  (single-step inversion denominator)
      snr     — alpha_bar/(1-alpha_bar) at ts
    """
    ts = spaced_timesteps(schedule.num_train_timesteps, n_student, spacing)
    ab = schedule.alphas_cumprod
    ab_t = ab[ts]
    if spacing == "leading":
        ab_p = schedule.alphas_cumprod_prev(ts, n_student)
        stride = schedule.num_train_timesteps // n_student
        t_prev = ts - stride
    else:
        ab_p = schedule.alphas_cumprod_prev_from(ts)
        t_prev = np.concatenate([ts[1:], np.asarray([-1], ts.dtype)])
    # midpoint on the training-timestep axis; destination -1 (the clean
    # endpoint) midpoints to t//2
    t_mid = (ts + np.maximum(t_prev, -1)) // 2
    t_mid = np.clip(t_mid, 0, schedule.num_train_timesteps - 1)
    ab_m = ab[t_mid]
    a_t, s_t = np.sqrt(ab_t), np.sqrt(1.0 - ab_t)
    a_m, s_m = np.sqrt(ab_m), np.sqrt(1.0 - ab_m)
    a_p, s_p = np.sqrt(ab_p), np.sqrt(np.clip(1.0 - ab_p, 0.0, None))
    denom = a_p - (s_p / s_t) * a_t
    if np.any(denom <= 0):
        raise ValueError("non-increasing SNR along the student grid")
    return {
        "ts": ts.astype(np.int32), "t_mid": t_mid.astype(np.int32),
        "a_t": a_t, "s_t": s_t, "a_m": a_m, "s_m": s_m,
        "a_p": a_p, "s_p": s_p, "denom": denom,
        "snr": ab_t / (1.0 - ab_t),
    }


def implied_x0(z_t: jnp.ndarray, z_end: jnp.ndarray, a_t, s_t, a_p, s_p,
               denom=None) -> jnp.ndarray:
    """The x0 for which one DDIM step from (z_t, t) lands exactly on z_end."""
    ratio = s_p / s_t
    if denom is None:
        denom = a_p - ratio * a_t
    return (z_end - ratio * z_t) / denom


def make_distill_loss(model: UNet2D, schedule: DiffusionSchedule,
                      config: DistillConfig, n_student: int) -> Callable:
    """The phase's distillation objective as a standalone function:
    (student_params, teacher_params, batch_x0, key) -> scalar loss.
    Used by the train step and directly by tests/validation (held-out
    distillation loss is the honest student-quality probe)."""
    tab = phase_tables(schedule, n_student, config.timestep_spacing)
    ts = jnp.asarray(tab["ts"])
    t_mid = jnp.asarray(tab["t_mid"])
    f32 = lambda name: jnp.asarray(tab[name], jnp.float32)  # noqa: E731
    a_t, s_t = f32("a_t"), f32("s_t")
    a_m, s_m = f32("a_m"), f32("s_m")
    a_p, s_p = f32("a_p"), f32("s_p")
    denom, snr = f32("denom"), f32("snr")

    def apply_f32(params, z, t):
        return model.apply({"params": params}, z, t).astype(jnp.float32)

    def loss_fn(student_params, teacher_params, batch, key):
        k_idx, k_eps = jax.random.split(key)
        b = batch.shape[0]
        k = jax.random.randint(k_idx, (b,), 0, n_student)
        eps = jax.random.normal(k_eps, batch.shape, jnp.float32)
        col = lambda tbl: tbl[k].reshape(b, 1, 1, 1)  # noqa: E731
        at, st = col(a_t), col(s_t)
        am, sm = col(a_m), col(s_m)
        ap, sp = col(a_p), col(s_p)

        z = at * batch + st * eps
        # teacher: two deterministic DDIM substeps t -> t_mid -> t''
        e1 = apply_f32(teacher_params, z, ts[k])
        x0_1 = (z - st * e1) / at
        if config.clip_teacher_x0:
            x0_1 = jnp.clip(x0_1, -1.0, 1.0)
        z_mid = am * x0_1 + sm * e1
        e2 = apply_f32(teacher_params, z_mid, t_mid[k])
        x0_2 = (z_mid - sm * e2) / am
        if config.clip_teacher_x0:
            x0_2 = jnp.clip(x0_2, -1.0, 1.0)
        z_end = ap * x0_2 + sp * e2
        x0_target = jax.lax.stop_gradient(
            implied_x0(z, z_end, at, st, ap, sp, denom=col(denom)))

        e_s = apply_f32(student_params, z, ts[k])
        x0_s = (z - st * e_s) / at
        w = jnp.maximum(snr[k], config.snr_floor)
        per_img = jnp.mean((x0_s - x0_target) ** 2, axis=(1, 2, 3))
        return jnp.mean(w * per_img)

    return loss_fn


def _make_distill_core(model: UNet2D, schedule: DiffusionSchedule,
                       tx: optax.GradientTransformation,
                       config: DistillConfig, n_student: int) -> Callable:
    """(state, teacher_params, batch_x0, key) -> (state, loss)."""
    loss_fn = make_distill_loss(model, schedule, config, n_student)

    def step_core(state: DistillState, teacher_params, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, teacher_params, batch, key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = (ema_update(state.ema_params, new_params, state.step,
                          config.ema_decay)
               if state.ema_params is not None else None)
        return DistillState(new_params, new_opt, state.step + 1, ema), loss

    return step_core


def make_distill_step(model: UNet2D, schedule: DiffusionSchedule,
                      tx: optax.GradientTransformation,
                      config: DistillConfig, n_student: int) -> Callable:
    """Jitted single distillation step; student state donated, teacher
    params replicated/read-only."""
    return jax.jit(_make_distill_core(model, schedule, tx, config, n_student),
                   donate_argnums=(0,))


def make_distill_scan(model: UNet2D, schedule: DiffusionSchedule,
                      tx: optax.GradientTransformation,
                      config: DistillConfig, n_student: int) -> Callable:
    """Whole block of steps as ONE compiled program:
    (state, teacher_params, batches (S,B,H,W,C), key) -> (state, losses (S,)).
    Same tunneled-dispatch rationale as `train_ddpm.make_epoch_step`."""
    step_core = _make_distill_core(model, schedule, tx, config, n_student)

    def scan_fn(state, teacher_params, batches, key):
        keys = jax.random.split(key, batches.shape[0])

        def body(carry, inp):
            batch, k = inp
            new_state, loss = step_core(carry, teacher_params, batch, k)
            return new_state, loss

        return jax.lax.scan(body, state, (batches, keys))

    return jax.jit(scan_fn, donate_argnums=(0,))


def distill_phase(model: UNet2D, schedule: DiffusionSchedule,
                  teacher_params: Any, dataset, n_student: int,
                  config: DistillConfig = DistillConfig(),
                  mesh=None,
                  log=print) -> Dict[str, Any]:
    """One halving phase: train a student (init = teacher) whose n_student
    DDIM steps match the teacher's 2x-step trajectories. Returns
    {'params': export params (EMA when enabled), 'history': losses}.

    `mesh`: optional `jax.sharding.Mesh` with a 'data' axis — batches shard
    over it (dp) while student/teacher params replicate; XLA inserts the
    gradient psum from the annotations alone (same design as
    `train_ddpm.train_class`). The loss sequence is layout-independent."""
    if len(dataset) < config.batch_size:
        # both phase loops draw full batches; an undersized dataset would
        # yield zero batches and the while-loop would spin forever
        raise ValueError(
            f"dataset has {len(dataset)} images < batch_size "
            f"{config.batch_size} — shrink batch_size or grow the dataset")
    lr = warmup_cosine_schedule(config.learning_rate, config.warmup_steps,
                                config.steps_per_phase,
                                config.lr_end_factor)
    tx = (optax.chain(optax.clip_by_global_norm(config.grad_clip),
                      optax.adam(lr))
          if config.grad_clip > 0 else optax.adam(lr))
    student = jax.tree_util.tree_map(jnp.array, teacher_params)
    state = DistillState(
        params=student, opt_state=tx.init(student),
        step=jnp.zeros((), jnp.int32),
        ema_params=(jax.tree_util.tree_map(jnp.array, student)
                    if config.ema_decay > 0 else None))
    if mesh is not None:
        from ..parallel import multihost as _mh
        from ..parallel.mesh import replicated_sharding

        if config.batch_size % mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_size {config.batch_size} must be a multiple of the "
                f"mesh data axis size ({mesh.shape['data']}) for dp distill")
        state = jax.device_put(state, replicated_sharding(mesh))
        teacher_params = jax.device_put(teacher_params,
                                        replicated_sharding(mesh))

    key = jax.random.PRNGKey(config.seed + n_student)
    data_rng = np.random.default_rng(config.seed + n_student)
    history: List[float] = []
    done = 0
    use_scan = (hasattr(dataset, "epoch_batches")
                and jax.process_count() == 1 and mesh is None)

    # deterministic held-out best-export selection (see DistillConfig)
    eval_fn = None
    val_history: List[float] = []
    best_val = float("inf")
    best_snapshot = None
    last_eval_at = 0
    if config.eval_every > 0:
        probe_rng = np.random.default_rng(config.seed + n_student + 1)
        chunks, have = [], 0
        for b in dataset.batches(min(config.eval_probe_images,
                                     config.batch_size), probe_rng):
            chunks.append(np.asarray(b))
            have += len(chunks[-1])
            if have >= config.eval_probe_images:
                break
        probe = jnp.asarray(
            np.concatenate(chunks)[:config.eval_probe_images])
        loss_probe = jax.jit(
            make_distill_loss(model, schedule, config, n_student))
        eval_keys = [jax.random.PRNGKey(config.seed + 0xD15 + i)
                     for i in range(config.eval_keys)]

        def eval_fn(export_params):
            return float(np.mean([loss_probe(export_params, teacher_params,
                                             probe, k) for k in eval_keys]))

    def maybe_eval(state):
        """Score the export params and keep the best snapshot (device-side;
        materialized once at phase end)."""
        nonlocal best_val, best_snapshot, last_eval_at
        if eval_fn is None:
            return
        if (done - last_eval_at < config.eval_every
                and done < config.steps_per_phase):
            return
        last_eval_at = done
        export = (state.ema_params if state.ema_params is not None
                  else state.params)
        val = eval_fn(export)
        val_history.append(val)
        if val < best_val:
            best_val = val
            best_snapshot = jax.tree_util.tree_map(jnp.array, export)
    if use_scan:
        scan_fn = make_distill_scan(model, schedule, tx, config, n_student)
        while done < config.steps_per_phase:
            t0 = time.time()
            batches = dataset.epoch_batches(config.batch_size, data_rng)
            take = min(int(batches.shape[0]), config.steps_per_phase - done)
            batches = batches[:take]
            key, sub = jax.random.split(key)
            state, losses = scan_fn(state, teacher_params, batches, sub)
            done += take
            block_loss = float(jnp.mean(losses))
            history.append(block_loss)
            maybe_eval(state)
            log(f"[distill:{n_student}] step {done}/{config.steps_per_phase} "
                f"loss={block_loss:.5f} ({time.time() - t0:.1f}s)")
    else:
        step_fn = make_distill_step(model, schedule, tx, config, n_student)
        # multi-host mesh: every process draws the same global batch (same
        # data_rng seed) and feeds ONLY its own slice — global_batch_array
        # treats its input as the per-process slice, so passing the full
        # batch would silently inflate the global batch to
        # n_proc x batch_size with every image duplicated on all hosts.
        # Datasets whose `batches` supports `local_range` load/augment only
        # this process's rows; others materialize the full batch and slice
        # (same contract as train_ddpm.train_class).
        import inspect

        local_bounds = None
        dataset_slices = False
        if mesh is not None and jax.process_count() > 1:
            local_bounds = _mh.local_batch_bounds(config.batch_size)
            try:
                dataset_slices = ("local_range" in inspect.signature(
                    dataset.batches).parameters)
            except (TypeError, ValueError):
                dataset_slices = False
        while done < config.steps_per_phase:
            batch_iter = (dataset.batches(config.batch_size, data_rng,
                                          local_range=local_bounds)
                          if dataset_slices
                          else dataset.batches(config.batch_size, data_rng))
            for batch in batch_iter:
                key, sub = jax.random.split(key)
                if mesh is not None:
                    batch = np.asarray(batch)
                    if not dataset_slices and local_bounds is not None:
                        batch = batch[local_bounds[0]:local_bounds[1]]
                    batch = _mh.global_batch_array(batch, mesh)
                else:
                    batch = jnp.asarray(batch)
                state, loss = step_fn(state, teacher_params, batch, sub)
                history.append(float(loss))
                done += 1
                maybe_eval(state)
                if done >= config.steps_per_phase:
                    break
    export = (state.ema_params if state.ema_params is not None
              else state.params)
    result = {"params": best_snapshot if best_snapshot is not None else export,
              "history": history, "n_student": n_student}
    if eval_fn is not None:
        result["val_history"] = val_history
        result["best_val"] = best_val
    return result


def progressive_distill(teacher_params: Any, dataset, class_name: str,
                        checkpoint_dir: str, start_steps: int,
                        end_steps: int = 4,
                        config: DistillConfig = DistillConfig(),
                        model: Optional[UNet2D] = None,
                        image_size: int = 128,
                        mesh=None,
                        log=print) -> Dict[str, Any]:
    """Full halving ladder: start_steps -> start/2 -> ... -> end_steps.

    Each phase's student becomes the next phase's teacher. Every phase
    writes `unet_<CLASS>_distill<N>.pth` (torch format — loads through
    `ModelManager` / the reference app alike); sample it with
    num_inference_steps=N and the config's timestep_spacing.
    """
    if start_steps % 2 or start_steps < 2:
        raise ValueError("start_steps must be even and >= 2")
    if start_steps // 2 < end_steps:
        raise ValueError(
            f"start_steps {start_steps} halves to {start_steps // 2} < "
            f"end_steps {end_steps} — no phase would run (start_steps must "
            f"be at least 2 x end_steps)")
    from .train_ddpm import default_fused_flags

    fused = default_fused_flags()
    model = model or UNet2D(
        config=UNet2DConfig(sample_size=image_size),
        dtype=jnp.bfloat16 if config.bf16_compute else jnp.float32,
        use_fused_attention=fused, fast_norm=fused)
    schedule = DiffusionSchedule.create(config.num_train_timesteps)
    ckpt_dir = Path(checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    # Per-phase checkpoint writes: multi-host keeps the barriered
    # host0_only contract; single-process goes through the async writer so
    # the ~100 MB device->host pull overlaps the NEXT phase's compute
    # instead of stalling between phases (train/async_ckpt.py; submit takes
    # a device-side copy, so the next phase donating the teacher buffers
    # cannot invalidate a queued write).
    async_writer = None
    if mesh is not None and jax.process_count() > 1:
        from ..parallel import multihost as _mh
        write = lambda fn, tree, path: _mh.host0_only(fn, tree, path)  # noqa: E731
    else:
        from .async_ckpt import AsyncCheckpointer

        async_writer = AsyncCheckpointer(log=log)
        write = lambda fn, tree, path: async_writer.submit(tree, fn, path)  # noqa: E731

    phases = []
    n = start_steps // 2
    teacher = teacher_params
    _loop_ok = False
    try:
        while n >= end_steps:
            t0 = time.time()
            result = distill_phase(model, schedule, teacher, dataset, n,
                                   config, mesh=mesh, log=log)
            path = ckpt_dir / f"unet_{class_name}_distill{n}.pth"
            write(save_checkpoint_torch_format, result["params"], str(path))
            log(f"[distill:{n}] phase done in {time.time() - t0:.1f}s "
                f"-> {path}")
            record = {"n_student": n, "checkpoint": str(path),
                      "final_loss": result["history"][-1]}
            if "best_val" in result:
                record["best_val"] = result["best_val"]
            phases.append(record)
            teacher = result["params"]
            if n == end_steps:
                break
            n = max(n // 2, end_steps)
        _loop_ok = True
    finally:
        # flush queued writes; don't let a writer error mask a phase error
        # (local flag, not sys.exc_info() — see train_ddpm.train_class)
        if async_writer is not None:
            try:
                async_writer.close()
            except Exception:
                if _loop_ok:
                    raise
    return {"class": class_name, "phases": phases,
            "timestep_spacing": config.timestep_spacing}
