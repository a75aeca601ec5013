"""Per-class DDPM training: noise-prediction MSE with optax Adam.

Parity with reference `train_class` (`diffusion/train_diffusion.py:201-266`):
uniform random timesteps, forward-process noising via the schedule's
alpha-bar tables, MSE on epsilon, Adam lr=1e-4, best-loss checkpointing to
`unet_<CLASS>_best.pth` (torch-readable format via `io.pth.save_pth` +
`io.convert.flax_to_torch` — the reference app can load our checkpoints),
every-5-epoch snapshots.

TPU-native (NOT a port of the torch AMP loop):
  * ONE jitted `train_step` with donated (params, opt_state) — update math,
    noising, and the UNet fwd/bwd fuse into a single XLA program;
  * mixed precision is bf16 compute dtype on the model (MXU-native) with
    fp32 params and fp32 loss/grad accumulation — no GradScaler needed
    because bf16 keeps fp32's exponent range (torch AMP's scaler exists for
    fp16 underflow);
  * data parallelism: batches sharded over the mesh 'data' axis; gradients
    are averaged by XLA-inserted psum from sharding annotations alone.
"""
from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.schedules import DiffusionSchedule
from ..io.convert import flax_to_torch
from ..io.pth import save_pth
from ..models.unet2d import UNet2D, UNet2DConfig, init_unet_params




def default_fused_flags() -> bool:
    """Trainers default the model to the fused attention (custom-vjp
    backward) + fast_norm path on TPU — measured 4.5x train-step speedup
    on the flagship model (PERFORMANCE.md round 4); CPU stays on the exact
    einsum/f32-norm path for golden tests."""
    import jax

    return jax.devices()[0].platform == "tpu"

@dataclasses.dataclass(frozen=True)
class TrainConfig:
    image_size: int = 128
    batch_size: int = 2
    learning_rate: float = 1e-4
    epochs: int = 50
    num_train_timesteps: int = 1000
    snapshot_every: int = 5
    bf16_compute: bool = True
    seed: int = 0
    # Exponential moving average of the weights (beyond-reference quality
    # option, standard for DDPMs; 0.0 = off = exact reference behavior).
    # When on, best/snapshot checkpoints are written from the EMA weights
    # with the usual warmup schedule d_t = min(decay, (1+t)/(10+t)).
    ema_decay: float = 0.0
    # Learning-rate schedule (beyond-reference quality options; defaults =
    # exact reference behavior, constant Adam 1e-4):
    #   * "constant" — reference parity;
    #   * "cosine"   — linear warmup over `warmup_steps` then cosine decay
    #     to `lr_end_factor * learning_rate` across the run. Short DDPM
    #     runs sharpen noticeably when the LR anneals instead of jittering
    #     around the optimum at a constant step size.
    # Requires the total step count, which `train_class` derives from
    # (epochs, len(dataset), batch_size).
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    lr_end_factor: float = 0.05
    # Min-SNR loss weighting (Hang et al. 2023; 0.0 = off = reference
    # parity). In the epsilon parameterization the per-timestep weight is
    # min(SNR(t), gamma) / SNR(t): low-noise steps (huge SNR) stop
    # dominating the gradient, which measurably speeds convergence of the
    # perceptually-relevant mid/high-noise steps. gamma=5.0 is the paper's
    # recommendation.
    min_snr_gamma: float = 0.0
    # Deterministic validation for best-checkpoint selection (0 = off =
    # reference parity, which selects on the running TRAIN loss). With
    # seconds-scale epochs of ~8 random-t steps, per-epoch train loss is
    # dominated by the timestep draw — "best loss" then picks a lucky
    # epoch, possibly mid-training, and exports ITS (stale) EMA weights.
    # When eval_every > 0, a fixed probe (eval_probe_images images x
    # eval_t_points stratified timesteps x fixed noise) is scored every
    # eval_every epochs on the EXPORT weights (EMA when enabled) and best
    # selection uses that deterministic value instead.
    eval_every: int = 0
    eval_probe_images: int = 16
    eval_t_points: int = 8
    # Class-conditional training (used only when batches carry labels —
    # see train_conditional.py): probability of dropping an image's label
    # to the NULL embedding row (num_class_embeds - 1) so the model also
    # learns the unconditional score, enabling classifier-free guidance at
    # sampling time (Ho & Salimans 2022; 0.1 is the paper's value).
    cond_dropout: float = 0.1
    # Offset noise (beyond-reference quality option; 0.0 = off = exact
    # reference behavior): adds `offset_noise * N(0,1)` PER CHANNEL to the
    # training noise. Rationale: with the reference's linear beta schedule,
    # alpha_bar(T) > 0, and while per-pixel terminal SNR is tiny (~0.006),
    # the IMAGE-MEAN channel averages the noise over H*W pixels, so its
    # terminal SNR is ~0.006*sqrt(H*W) ~ 1 at 128^2 — the model never
    # learns to set the global mean/hue from pure noise, which shows up as
    # low-frequency color shifts in samples (the failure mode the
    # reference's color postprocessing stage papers over). Offset noise
    # gives the mean channel real noise power during training so the model
    # learns to control it. Sampling/checkpoint format are unchanged.
    offset_noise: float = 0.0


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Any = None      # None when ema_decay == 0


def ema_update(ema_params: Any, new_params: Any, step: jnp.ndarray,
               decay: float) -> Any:
    """EMA with warmup: d_t = min(decay, (1+t)/(10+t)) — small effective
    decay early so the average is not biased toward the random init."""
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree_util.tree_map(lambda e, p: d * e + (1.0 - d) * p,
                                  ema_params, new_params)


def warmup_cosine_schedule(peak_lr: float, warmup_steps: int,
                           total_steps: int, end_factor: float):
    """Linear warmup (clamped to total/10) then cosine decay to
    end_factor * peak — shared by the trainer and the distiller."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=peak_lr,
        warmup_steps=min(warmup_steps, max(1, total_steps // 10)),
        decay_steps=total_steps, end_value=end_factor * peak_lr)


def make_lr_schedule(config: TrainConfig, total_steps: Optional[int] = None):
    """Scalar or optax schedule per TrainConfig. `total_steps` is required
    for the cosine schedule (train_class derives it from the dataset)."""
    if config.lr_schedule == "constant":
        if config.warmup_steps > 0:
            return optax.linear_schedule(0.0, config.learning_rate,
                                         config.warmup_steps)
        return config.learning_rate
    if config.lr_schedule == "cosine":
        if not total_steps:
            raise ValueError("cosine lr_schedule needs total_steps "
                             "(epochs x steps-per-epoch)")
        return warmup_cosine_schedule(config.learning_rate,
                                      config.warmup_steps, total_steps,
                                      config.lr_end_factor)
    raise ValueError(f"unknown lr_schedule {config.lr_schedule!r}")


def create_train_state(model: UNet2D, config: TrainConfig,
                       rng: Optional[jax.Array] = None,
                       params: Optional[Any] = None,
                       total_steps: Optional[int] = None
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = optax.adam(make_lr_schedule(config, total_steps))
    if params is None:
        if rng is None:
            rng = jax.random.PRNGKey(config.seed)
        params = init_unet_params(model, rng, image_size=config.image_size)
    ema = (jax.tree_util.tree_map(jnp.array, params)
           if config.ema_decay > 0 else None)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32), ema_params=ema), tx


def _make_step_core(model: UNet2D, schedule: DiffusionSchedule,
                    tx: optax.GradientTransformation,
                    config: TrainConfig) -> Callable:
    """The un-jitted step body shared by the per-step and epoch-scan paths:
    (state, batch_nhwc, key) -> (state, loss)."""
    ab = jnp.asarray(schedule.alphas_cumprod, jnp.float32)
    T = schedule.num_train_timesteps

    def loss_fn(params, batch, key):
        # labeled batches ((images, labels) pytrees) train the conditional
        # UNet; plain arrays keep the reference-parity unconditional path.
        # The unconditional stream stays split(key, 3) — widening the split
        # for everyone would silently change every (t, eps, offset) draw
        # and break seed-pinned reproduction of earlier training runs.
        labels = None
        if isinstance(batch, (tuple, list)):
            batch, labels = batch
            k_t, k_eps, k_off, k_drop = jax.random.split(key, 4)
        else:
            k_t, k_eps, k_off = jax.random.split(key, 3)
            k_drop = None
        b = batch.shape[0]
        t = jax.random.randint(k_t, (b,), 0, T)
        eps = jax.random.normal(k_eps, batch.shape, jnp.float32)
        if config.offset_noise > 0.0:
            # per-(image, channel) constant component; the model predicts
            # the TOTAL noise, so it learns to resolve the mean channel
            eps = eps + config.offset_noise * jax.random.normal(
                k_off, (b, 1, 1, batch.shape[-1]), jnp.float32)
        ab_t = ab[t].reshape(b, 1, 1, 1)
        noisy = jnp.sqrt(ab_t) * batch + jnp.sqrt(1.0 - ab_t) * eps
        if labels is not None:
            if config.cond_dropout > 0.0:
                # CFG label dropout: the null row (last index) learns the
                # unconditional score alongside the per-class ones
                null = jnp.int32(model.config.num_class_embeds - 1)
                drop = jax.random.bernoulli(k_drop, config.cond_dropout, (b,))
                labels = jnp.where(drop, null, labels.astype(jnp.int32))
            pred = model.apply({"params": params}, noisy, t, labels)
        else:
            pred = model.apply({"params": params}, noisy, t)
        err = jnp.mean((pred.astype(jnp.float32) - eps) ** 2,
                       axis=(1, 2, 3))
        if config.min_snr_gamma > 0.0:
            snr = (ab_t / (1.0 - ab_t)).reshape(b)
            err = err * (jnp.minimum(snr, config.min_snr_gamma) / snr)
        return jnp.mean(err)

    def step_core(state: TrainState, batch: jnp.ndarray,
                  key: jax.Array) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = (ema_update(state.ema_params, new_params, state.step,
                          config.ema_decay)
               if state.ema_params is not None else None)
        return TrainState(new_params, new_opt, state.step + 1, ema), loss

    return step_core


def make_train_step(model: UNet2D, schedule: DiffusionSchedule,
                    tx: optax.GradientTransformation,
                    config: TrainConfig) -> Callable:
    """Builds the jitted train step: (state, batch_nhwc, key) -> (state, loss)."""
    return jax.jit(_make_step_core(model, schedule, tx, config),
                   donate_argnums=(0,))


def make_epoch_step(model: UNet2D, schedule: DiffusionSchedule,
                    tx: optax.GradientTransformation,
                    config: TrainConfig) -> Callable:
    """Whole-epoch training as ONE compiled program:
    (state, batches (S,B,H,W,C), key) -> (state, losses (S,)).

    The S steps run as a `lax.scan` over the stacked epoch batches with
    per-step keys folded in on device — one dispatch per EPOCH instead of
    per step. On a remote/tunneled accelerator the per-dispatch host cost
    (~0.1–1 s) otherwise dominates small-model training entirely (measured
    ~1.4 s/step for a 6M-param UNet whose compute is ~0.1 s). Used by
    `train_class` when the dataset is device-resident (exposes
    `epoch_batches`) and no multi-host mesh is involved."""
    step_core = _make_step_core(model, schedule, tx, config)

    def epoch_fn(state, batches, key):
        # batches: (S,B,...) array, or a ((S,B,...), (S,B)) tuple for
        # labeled (conditional) epochs — count steps from the first leaf
        n_steps = jax.tree_util.tree_leaves(batches)[0].shape[0]
        keys = jax.random.split(key, n_steps)

        def body(carry, inp):
            batch, k = inp
            new_state, loss = step_core(carry, batch, k)
            return new_state, loss

        state, losses = jax.lax.scan(body, state, (batches, keys))
        return state, losses

    return jax.jit(epoch_fn, donate_argnums=(0,))


# convenience alias used by __graft_entry__
train_step = make_train_step


def make_eval_fn(model: UNet2D, schedule: DiffusionSchedule,
                 config: TrainConfig, probe_images: jnp.ndarray,
                 probe_labels: Optional[jnp.ndarray] = None) -> Callable:
    """Deterministic validation loss: params -> scalar.

    Scores UNWEIGHTED epsilon-MSE on a fixed probe — `eval_probe_images`
    images x `eval_t_points` timesteps stratified over [0, T) x noise fixed
    from PRNGKey(seed+0x5eed). Zero sampling variance between calls, so
    best-checkpoint selection compares models, not timestep luck.
    `probe_labels` (fixed (n_img,) ids) scores a conditional model."""
    ab = jnp.asarray(schedule.alphas_cumprod, jnp.float32)
    T = schedule.num_train_timesteps
    n_img = probe_images.shape[0]
    n_t = config.eval_t_points
    # stratified mid-bucket timesteps: T//(2n), 3T//(2n), ...
    t_grid = ((2 * jnp.arange(n_t) + 1) * T) // (2 * n_t)
    eps = jax.random.normal(jax.random.PRNGKey(config.seed + 0x5EED),
                            (n_t,) + tuple(probe_images.shape), jnp.float32)

    def eval_fn(params):
        def per_t(carry, inp):
            t_val, eps_t = inp
            ab_t = ab[t_val]
            noisy = jnp.sqrt(ab_t) * probe_images + jnp.sqrt(1.0 - ab_t) * eps_t
            t_b = jnp.full((n_img,), t_val, jnp.int32)
            if probe_labels is not None:
                pred = model.apply({"params": params}, noisy, t_b, probe_labels)
            else:
                pred = model.apply({"params": params}, noisy, t_b)
            return carry, jnp.mean((pred.astype(jnp.float32) - eps_t) ** 2)

        _, losses = jax.lax.scan(per_t, 0.0, (t_grid, eps))
        return jnp.mean(losses)

    return jax.jit(eval_fn)


def save_train_state(state: TrainState, path: str) -> None:
    """Full mid-run checkpoint (params + optimizer state + step) — training
    resume the reference lacks (its best-loss `.pth` drops optimizer state,
    `train_diffusion.py:251-258`)."""
    leaves, _ = jax.tree_util.tree_flatten(state)
    np.savez(path, n_leaves=len(leaves),
             **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)})


def restore_train_state(template: TrainState, path: str) -> TrainState:
    """Restore into a freshly built state of identical structure."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as data:
        n = int(data["n_leaves"])
        if n != len(leaves):
            raise ValueError(f"checkpoint has {n} leaves, state needs {len(leaves)}")
        new_leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    for old, new in zip(leaves, new_leaves):
        if np.shape(old) != np.shape(new):
            raise ValueError(f"leaf shape mismatch: {np.shape(old)} vs {np.shape(new)}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def dataset_color_statistics(dataset, max_images: int = 256):
    """Per-class RGB mean/std for the generator's color postprocessing.

    Datasets with a materialized `.images` stack (ProceduralDataset,
    [-1,1]) use it directly; lazy datasets exposing `load_raw` ([0,1],
    SingleClassDataset) load up to `max_images`. Returns None when the
    dataset supports neither."""
    from ..io.color_stats import compute_color_statistics

    imgs = getattr(dataset, "images", None)
    if imgs is not None:
        return compute_color_statistics(np.asarray(imgs[:max_images]),
                                        value_range=(-1.0, 1.0))
    if hasattr(dataset, "load_raw") and len(dataset) > 0:
        n = min(max_images, len(dataset))
        arr = np.stack([dataset.load_raw(i) for i in range(n)])
        return compute_color_statistics(arr, value_range=(0.0, 1.0))
    return None


def save_checkpoint_torch_format(params: Any, path: str) -> None:
    """Write params as a torch-style state_dict `.pth` the reference app
    can `torch.load` + `load_state_dict` directly."""
    host = jax.tree_util.tree_map(lambda a: np.asarray(a, dtype=np.float32), params)
    save_pth(flax_to_torch(host), path)


def train_class(class_name: str, dataset, checkpoint_dir: str,
                config: TrainConfig = TrainConfig(),
                model: Optional[UNet2D] = None,
                resume: bool = False,
                mesh=None,
                log=print) -> Dict[str, Any]:
    """Full per-class training loop with best-loss + periodic checkpoints
    and optional mid-run resume (params + optimizer state).

    Resume semantics: the restored optimizer count drives the LR schedule
    AND the epoch loop — a run interrupted at epoch E continues at E+1 and
    completes the ORIGINAL cosine trajectory with no overshoot (at least
    one epoch always runs so history/best-selection stay well-formed).
    The per-epoch data/rng streams restart from the seed rather than
    fast-forwarding E splits, so a resumed run's batch order differs from
    the uninterrupted run's — training quality is unaffected (random
    batches are random), but crash-resumed runs are not step-for-step
    reproductions of uninterrupted ones.

    `mesh`: optional `jax.sharding.Mesh` with a 'data' axis — batches are
    sharded over it (multi-chip dp; on a `multihost.hybrid_mesh` the data
    axis spans hosts over DCN) while params replicate; XLA inserts the
    gradient psum. Checkpoint writes then go through process 0 only.

    Multi-host input scaling: when the dataset's `batches` supports
    `local_range` (SingleClassDataset does), each process loads and
    augments ONLY its 1/n of every global batch — per-image rng streams
    make the epoch's randomness independent of who materializes which rows,
    so the loss sequence still matches the single-device run exactly.
    Datasets without `local_range` fall back to full-batch-then-slice
    (host input work constant per process, fine at reference data scale).
    """
    fused = default_fused_flags()
    model = model or UNet2D(
        config=UNet2DConfig(sample_size=config.image_size),
        dtype=jnp.bfloat16 if config.bf16_compute else jnp.float32,
        use_fused_attention=fused, fast_norm=fused)
    schedule = DiffusionSchedule.create(config.num_train_timesteps)
    steps_per_epoch = max(1, len(dataset) // config.batch_size)
    state, tx = create_train_state(
        model, config, total_steps=config.epochs * steps_per_epoch)
    step_fn = make_train_step(model, schedule, tx, config)
    if mesh is not None:
        from ..parallel import multihost as _mh
        from ..parallel.mesh import replicated_sharding

        if config.batch_size % mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_size {config.batch_size} must be a multiple of the "
                f"mesh data axis size ({mesh.shape['data']}) for dp training")
        state = jax.device_put(state, replicated_sharding(mesh))

    ckpt_dir = Path(checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    best_path = ckpt_dir / f"unet_{class_name}_best.pth"
    resume_path = ckpt_dir / f"train_state_{class_name}.npz"
    start_epoch = 1
    if resume and resume_path.exists():
        state = restore_train_state(state, str(resume_path))
        epochs_done = int(state.step) // steps_per_epoch
        start_epoch = max(1, min(epochs_done + 1, config.epochs))
        log(f"[train:{class_name}] resumed from {resume_path} "
            f"(step {int(state.step)}, continuing at epoch "
            f"{start_epoch}/{config.epochs})")

    key = jax.random.PRNGKey(config.seed)
    data_rng = np.random.default_rng(config.seed)
    best_loss = float("inf")
    best_val = float("inf")
    best_snapshot = None   # device-side best params (epoch-scan path)
    history = []

    # deterministic-validation best selection (see TrainConfig.eval_every)
    eval_fn = None
    if config.eval_every > 0:
        n_probe = config.eval_probe_images
        probe_labels = None
        imgs = getattr(dataset, "images", None)
        if imgs is not None:
            labs = getattr(dataset, "labels", None)
            if labs is not None and model.config.num_class_embeds:
                # labeled pools are class-concatenated (LabeledMixtureDataset)
                # — a [:n_probe] prefix would probe ONLY the first class and
                # best-checkpoint selection would ignore the rest. Evenly
                # spaced indices cover every class proportionally, still
                # fully deterministic.
                idx = np.linspace(0, len(np.asarray(labs)) - 1, n_probe)
                idx = np.unique(idx.astype(np.int64))
                probe = jnp.asarray(np.asarray(imgs)[idx])
                probe_labels = jnp.asarray(np.asarray(labs, np.int32)[idx])
            else:
                probe = jnp.asarray(np.asarray(imgs[:n_probe]))
        else:
            # any dataset: materialize the probe from a dedicated rng stream
            probe_rng = np.random.default_rng(config.seed + 1)
            chunks, label_chunks, have = [], [], 0
            for b in dataset.batches(min(n_probe, config.batch_size),
                                     probe_rng):
                if isinstance(b, (tuple, list)):   # labeled (imgs, labels)
                    label_chunks.append(np.asarray(b[1], np.int32))
                    b = b[0]
                chunks.append(np.asarray(b))
                have += len(chunks[-1])
                if have >= n_probe:
                    break
            probe = jnp.asarray(np.concatenate(chunks)[:n_probe])
            if label_chunks and model.config.num_class_embeds:
                probe_labels = jnp.asarray(
                    np.concatenate(label_chunks)[:n_probe])
        eval_fn = make_eval_fn(model, schedule, config, probe, probe_labels)

    def select_best(epoch, improved_train, export_params):
        """True when export_params should become the best checkpoint."""
        nonlocal best_val
        if eval_fn is None:
            return improved_train
        if epoch % config.eval_every and epoch != config.epochs:
            return False
        val = float(eval_fn(export_params))
        if val >= best_val:
            return False
        best_val = val
        return True

    # emit per-class color statistics alongside the checkpoints so the
    # generator's postprocessing stage (io/color_stats.py) has real targets —
    # written up front (data-derived, not model-derived) and keyed by class
    color_stats = dataset_color_statistics(dataset)
    if color_stats is not None:
        from ..io.color_stats import update_color_statistics_file

        def _write_stats():
            update_color_statistics_file(
                ckpt_dir / "color_statistics.json", class_name, color_stats)

        if mesh is not None and jax.process_count() > 1:
            _mh.host0_only(_write_stats)
        else:
            _write_stats()  # tiny host-side JSON, no device pull involved

    from .data import prefetch

    # multi-host feeding: datasets whose `batches` supports `local_range`
    # load/augment ONLY this process's rows of every global batch (per-image
    # rng streams keep the epoch's randomness process-independent); others
    # materialize the full batch and slice (every process must still consume
    # the same data_rng draws)
    import inspect

    local_bounds = None
    dataset_slices = False
    if mesh is not None and jax.process_count() > 1:
        local_bounds = _mh.local_batch_bounds(config.batch_size)
        try:
            dataset_slices = ("local_range"
                              in inspect.signature(dataset.batches).parameters)
        except (TypeError, ValueError):
            dataset_slices = False

    # epoch-scan fast path: device-resident dataset + single process —
    # one compiled dispatch per EPOCH (see make_epoch_step)
    use_epoch_scan = (mesh is None and jax.process_count() == 1
                      and hasattr(dataset, "epoch_batches"))
    epoch_fn = (make_epoch_step(model, schedule, tx, config)
                if use_epoch_scan else None)

    # Checkpoint writes: single-process runs go through the async writer
    # (device-side snapshot + background D2H/serialize — on a tunneled
    # device a synchronous ~100 MB pull re-serializes training, see
    # async_ckpt.py). Multi-host runs keep the synchronous host0_only
    # path: its barrier + failure broadcast ARE the contract there.
    async_writer = None
    if mesh is not None and jax.process_count() > 1:
        write = lambda fn, tree, path, coalesce=None: (  # noqa: E731
            _mh.host0_only(fn, tree, path))
    else:
        from .async_ckpt import AsyncCheckpointer

        async_writer = AsyncCheckpointer(log=log)
        write = lambda fn, tree, path, coalesce=None: (  # noqa: E731
            async_writer.submit(tree, fn, path, coalesce))

    _loop_ok = False
    try:
        for epoch in range(start_epoch, config.epochs + 1):
            t0 = time.time()
            if use_epoch_scan:
                key, sub = jax.random.split(key)
                batches = dataset.epoch_batches(config.batch_size, data_rng)
                state, losses_arr = epoch_fn(state, batches, sub)
                epoch_loss = float(jnp.mean(losses_arr))
                history.append(epoch_loss)
                if epoch % max(1, config.snapshot_every) == 0 or epoch == 1:
                    log(f"[train:{class_name}] epoch {epoch}/{config.epochs} "
                        f"loss={epoch_loss:.5f} ({time.time() - t0:.1f}s)")
                export_params = (state.ema_params if state.ema_params is not None
                                 else state.params)
                improved = epoch_loss < best_loss
                best_loss = min(best_loss, epoch_loss)
                if select_best(epoch, improved, export_params):
                    # device-side snapshot only: at seconds-scale epochs a disk
                    # best-write (device->host pull) per improvement would
                    # dominate; materialized at snapshot boundaries + at end
                    best_snapshot = jax.tree_util.tree_map(jnp.array, export_params)
                if epoch % config.snapshot_every == 0:
                    write(save_checkpoint_torch_format,
                          best_snapshot if best_snapshot is not None
                          else export_params, str(best_path), "best")
                    snap = ckpt_dir / f"unet_{class_name}_epoch{epoch}.pth"
                    write(save_checkpoint_torch_format, export_params, str(snap))
                    write(save_train_state, state, str(resume_path), "resume")
                continue
            losses = []
            batch_iter = (dataset.batches(config.batch_size, data_rng,
                                          local_range=local_bounds)
                          if dataset_slices
                          else dataset.batches(config.batch_size, data_rng))
            for batch in prefetch(batch_iter):
                key, sub = jax.random.split(key)
                # labeled batches are (images, labels) tuples (conditional
                # training) — apply the same placement to every element
                parts = (tuple(batch) if isinstance(batch, (tuple, list))
                         else (batch,))
                if mesh is not None:
                    placed = []
                    for part in parts:
                        part = np.asarray(part)
                        if not dataset_slices and local_bounds is not None:
                            part = part[local_bounds[0]:local_bounds[1]]
                        placed.append(_mh.global_batch_array(part, mesh))
                    parts = tuple(placed)
                else:
                    parts = tuple(jnp.asarray(p) for p in parts)
                batch = parts if len(parts) > 1 else parts[0]
                state, loss = step_fn(state, batch, sub)
                # keep the DEVICE value — a float() here would sync every step
                # (one tunnel round-trip per step dominates small-model epochs);
                # the whole epoch's dispatches pipeline and we materialize once
                losses.append(loss)
            # ONE device->host transfer for the whole epoch (a float()
            # per element is a blocking round-trip per step on a tunneled
            # link)
            epoch_loss = (float(np.mean(jax.device_get(jnp.stack(losses))))
                          if losses else float("nan"))
            history.append(epoch_loss)
            log(f"[train:{class_name}] epoch {epoch}/{config.epochs} "
                f"loss={epoch_loss:.5f} ({time.time() - t0:.1f}s)")
            # checkpoints ship the EMA weights when enabled (sampling quality),
            # raw params keep training either way
            export_params = (state.ema_params if state.ema_params is not None
                             else state.params)
            improved = np.isfinite(epoch_loss) and epoch_loss < best_loss
            best_loss = min(best_loss, epoch_loss) if improved else best_loss
            if select_best(epoch, improved, export_params):
                write(save_checkpoint_torch_format, export_params,
                      str(best_path), "best")
                log(f"[train:{class_name}] new best "
                    f"({best_val if eval_fn is not None else best_loss:.5f}) "
                    f"-> {best_path}")
            if epoch % config.snapshot_every == 0:
                snap = ckpt_dir / f"unet_{class_name}_epoch{epoch}.pth"
                write(save_checkpoint_torch_format, export_params, str(snap))
                write(save_train_state, state, str(resume_path), "resume")
        if best_snapshot is not None:
            write(save_checkpoint_torch_format, best_snapshot, str(best_path),
                  "best")
        write(save_train_state, state, str(resume_path), "resume")
        _loop_ok = True
    finally:
        # always flush queued checkpoint writes; if the loop itself raised,
        # don't let a writer error mask the original failure (a local flag,
        # not sys.exc_info(): the trainer may itself run inside a caller's
        # except block, where exc_info() reports the OUTER exception and
        # would silently swallow a real flush error)
        if async_writer is not None:
            try:
                async_writer.close()
            except Exception:
                if _loop_ok:
                    raise
    result = {"class": class_name, "best_loss": best_loss, "history": history,
              "checkpoint": str(best_path), "steps": int(state.step)}
    if eval_fn is not None:
        result["best_val"] = best_val
    return result
