"""Jitted DDPM/DDIM sampler: the TPU replacement of the reference hot loop.

The reference denoises with a Python loop of `model(latents, t)` +
`scheduler.step(...)` host calls per step (reference
`core/generator/image_generator.py:395-438`, `xai/XAI.py:798-844`). Here the
whole reverse trajectory is ONE compiled `lax.scan`: the UNet forward, the
posterior update (precomputed tables, `ddpm.py`/`ddim.py`) and the per-step
noise draw fuse into a single XLA program — zero host round-trips, one
compile per (batch, steps, capture) signature, cached.

Seed discipline preserves the reference bookkeeping exactly
(`image_generator.py:368-389,586-637`): one integer seed per image, initial
noise drawn from that seed, per-step posterior noise from `fold_in(seed, k)`,
and a SHA-256 hash of the initial noise recorded for reproducibility
(`noise_hash` sidecar field). Bit-level parity with torch's RNG is
impossible by construction; parity is at the artifact/distribution level
(see SURVEY.md §7 "Hard parts").

Trajectory capture ('all') stacks every post-step latent as scan ys on
device and is subsampled host-side (`save_indices`, reference
`XAI.py:750-779` semantics incl. the absolute-t mode).
"""
from __future__ import annotations

import dataclasses
import hashlib
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .ddim import DDIMParams, ddim_step
from .ddpm import DDPMParams, ddpm_step
from .dpm import DPMSolverParams, dpm_solver_step
from .schedules import DiffusionSchedule
from .unipc import UniPCParams, unipc_step


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num_inference_steps: int = 50
    scheduler: str = "ddpm"   # ddpm | ddim | dpm_solver | dpm_solver_sde | unipc
    ddim_eta: float = 0.0
    image_size: int = 128
    channels: int = 3
    dtype: Any = jnp.float32          # compute dtype inside the scan
    clip_sample: bool = True
    deterministic_posterior: bool = False  # skip the DDPM posterior noise
                                           # (golden tests / mean-path mode)
    # 'leading' = reference scheduler parity; 'trailing' = beyond-reference
    # few-step fix (always visits t = T-1; see schedules.trailing_timesteps)
    timestep_spacing: str = "leading"
    # Classifier-free guidance weight for CONDITIONAL samplers (Ho &
    # Salimans 2022): eps = eps_uncond + s * (eps_cond - eps_uncond).
    # 0.0 or 1.0 = plain conditional forward (one UNet eval per step);
    # > 1.0 = guided (the cond and null branches run as ONE 2B-batched
    # forward — MXU-friendly, no extra dispatches). Ignored for
    # unconditional samplers.
    guidance_scale: float = 0.0
    # Per-class guidance (round 5, VERDICT r4 #2a): a static tuple indexed
    # by class id (label). When set on a conditional sampler it OVERRIDES
    # guidance_scale: every step runs the 2B-batched cond+null forward and
    # each sample combines with its own g = table[label] — one gathered
    # (B,1,1,1) multiply, so a mixed-class block samples every class at its
    # measured-best guidance in one compiled program. The table is part of
    # the executable (static), matching how rarely serving defaults change.
    guidance_table: Optional[Tuple[float, ...]] = None

    def __post_init__(self):
        if self.scheduler not in ("ddpm", "ddim", "dpm_solver",
                                  "dpm_solver_sde", "unipc"):
            raise ValueError(f"unknown scheduler: {self.scheduler}")
        if self.timestep_spacing not in ("leading", "trailing"):
            raise ValueError(f"unknown timestep_spacing: {self.timestep_spacing!r}")
        if self.guidance_scale < 0.0:
            raise ValueError(f"guidance_scale must be >= 0, got {self.guidance_scale}")
        if self.guidance_table is not None:
            if not isinstance(self.guidance_table, tuple):
                # frozen dataclass: normalize via object.__setattr__
                object.__setattr__(self, "guidance_table",
                                   tuple(float(g) for g in self.guidance_table))
            if any(g < 0.0 for g in self.guidance_table):
                raise ValueError("guidance_table entries must be >= 0, got "
                                 f"{self.guidance_table}")


def save_indices(num_steps: int, save_every: int,
                 timesteps: Optional[np.ndarray] = None,
                 num_train_timesteps: Optional[int] = None) -> List[int]:
    """Frame indices the XAI trajectory keeps (reference `XAI.py:750-779`).

    Normal mode: every `save_every`-th step index plus always the last.
    Absolute-t mode (save_every >= num_steps): indices whose train-timestep
    is closest to each multiple of save_every, plus t=0 and t_max. The
    train-t walk is bounded by the schedule's actual horizon (the reference
    hardcodes its fixed T_train=1000); when unspecified it falls back to
    the largest timestep present.
    """
    idx = set(range(0, num_steps, save_every))
    idx.add(num_steps - 1)
    if save_every >= num_steps and timesteps is not None:
        t_list = [int(t) for t in timesteps]
        horizon = int(num_train_timesteps) if num_train_timesteps else max(t_list)
        desired = {0, max(t_list)}
        k = 0
        while k <= horizon:
            desired.add(k)
            k += max(1, int(save_every))
        for dt in desired:
            idx.add(min(range(len(t_list)), key=lambda i: abs(t_list[i] - dt)))
    return sorted(idx)


def noise_hash(noise: np.ndarray) -> str:
    """SHA-256 (first 16 hex chars) of the initial noise, matching the
    reference reproducibility sidecar (`image_generator.py:383-389`)."""
    return hashlib.sha256(np.ascontiguousarray(noise, dtype=np.float32).tobytes()).hexdigest()[:16]


def _hash_batch(noise) -> List[str]:
    """Per-image noise hashes from a (B,H,W,C) device/host array. Callers
    enqueue `copy_to_host_async()` before the sampling dispatch, so the
    materialization here finds the transfer already done (or in flight)
    rather than paying a synchronous round-trip."""
    noise_np = np.asarray(noise)
    return [noise_hash(noise_np[i]) for i in range(noise_np.shape[0])]


class DiffusionSampler:
    """Compiles and caches the sampling scan per (batch, capture) signature.

    `apply_fn(params, x_nhwc, t_batch) -> eps` is any jittable epsilon
    predictor (the Flax UNet2D's bound apply by default).

    `conditional=True` switches the predictor contract to
    `apply_fn(params, x, t_batch, class_labels) -> eps` (the conditional
    UNet2D); `sample()` then requires `class_labels`, and
    `config.guidance_scale > 1` additionally runs classifier-free guidance
    against `null_label` (the trained models' unconditional embedding row).
    """

    def __init__(self, apply_fn: Callable, schedule: DiffusionSchedule,
                 config: SamplerConfig = SamplerConfig(),
                 conditional: bool = False,
                 null_label: Optional[int] = None):
        self.apply_fn = apply_fn
        self.schedule = schedule
        self.config = config
        self.conditional = bool(conditional)
        self.null_label = null_label
        if (self.conditional and null_label is None
                and (config.guidance_scale > 1.0
                     or config.guidance_table is not None)):
            raise ValueError("guided sampling (guidance_scale > 1 or a "
                             "guidance_table) requires null_label "
                             "(the unconditional embedding index)")
        if config.scheduler == "ddpm":
            self.params = DDPMParams.create(schedule, config.num_inference_steps,
                                            clip_sample=config.clip_sample,
                                            timestep_spacing=config.timestep_spacing)
            self._step = ddpm_step
        elif config.scheduler in ("dpm_solver", "dpm_solver_sde"):
            self.params = DPMSolverParams.create(schedule, config.num_inference_steps,
                                                 clip_sample=config.clip_sample,
                                                 timestep_spacing=config.timestep_spacing,
                                                 sde=config.scheduler == "dpm_solver_sde")
            self._step = None  # multistep: stepped via dpm_solver_step in _build
        elif config.scheduler == "unipc":
            self.params = UniPCParams.create(schedule, config.num_inference_steps,
                                             clip_sample=config.clip_sample,
                                             timestep_spacing=config.timestep_spacing)
            self._step = None  # multistep: stepped via unipc_step in _build
        else:
            self.params = DDIMParams.create(schedule, config.num_inference_steps,
                                            eta=config.ddim_eta,
                                            clip_sample=config.clip_sample,
                                            timestep_spacing=config.timestep_spacing)
            self._step = ddim_step
        self.timesteps = np.asarray(self.params.timesteps)
        # scan-carry family: 'simple' carries x; 'dpm' carries (x, x0_prev);
        # 'unipc' carries (x_pred, x_prev_corrected, x0_prev)
        self._family = ("unipc" if config.scheduler == "unipc"
                        else "dpm" if config.scheduler.startswith("dpm_solver")
                        else "simple")
        self._multistep = self._family != "simple"
        self._compiled: Dict[Tuple[int, bool], Callable] = {}
        self._stream_compiled: Dict[int, Callable] = {}
        self._i2i_compiled: Dict[Tuple[int, bool, int, bool], Callable] = {}

    # -- seed plumbing ------------------------------------------------------------
    @staticmethod
    def keys_for_seeds(seeds: Union[int, np.ndarray]) -> jax.Array:
        seeds = np.atleast_1d(np.asarray(seeds, dtype=np.uint32))
        return jax.vmap(jax.random.PRNGKey)(seeds)

    def initial_noise(self, seeds: Union[int, np.ndarray]) -> jax.Array:
        """(B, H, W, C) standard normal, one independent stream per seed."""
        keys = self.keys_for_seeds(seeds)
        shape = (self.config.image_size, self.config.image_size, self.config.channels)
        return jax.vmap(lambda k: jax.random.normal(k, shape, jnp.float32))(keys)

    # -- epsilon predictor (conditional / CFG dispatch) ----------------------------
    def _make_predict(self) -> Callable:
        """(model_params, x, t_batch, labels) -> eps in cfg.dtype.

        Unconditional samplers ignore `labels`. Conditional samplers with
        guidance_scale > 1 evaluate the cond and null branches as one
        2B-batched forward and combine eps_u + s*(eps_c - eps_u)."""
        cfg = self.config
        apply_fn = self.apply_fn
        if not self.conditional:
            return lambda mp, x, t_b, labels: apply_fn(mp, x, t_b).astype(cfg.dtype)
        if cfg.guidance_table is not None:
            # per-class guidance: each sample combines with its OWN
            # g = table[label]. The table rides the executable as a
            # constant; the per-sample weight is one gather + a broadcast
            # multiply. g cast to cfg.dtype so a table row g equals the
            # scalar-branch math bit-for-bit at the same value.
            null = int(self.null_label)
            table = jnp.asarray(cfg.guidance_table, jnp.float32)

            def predict_table(mp, x, t_b, labels):
                b = x.shape[0]
                eps2 = apply_fn(
                    mp, jnp.concatenate([x, x], axis=0),
                    jnp.concatenate([t_b, t_b], axis=0),
                    jnp.concatenate([labels, jnp.full_like(labels, null)],
                                    axis=0)).astype(cfg.dtype)
                g_b = table[labels].astype(cfg.dtype).reshape(b, 1, 1, 1)
                return eps2[b:] + g_b * (eps2[:b] - eps2[b:])

            return predict_table
        g = float(cfg.guidance_scale)
        if g > 1.0:
            null = int(self.null_label)

            def predict(mp, x, t_b, labels):
                b = x.shape[0]
                eps2 = apply_fn(
                    mp, jnp.concatenate([x, x], axis=0),
                    jnp.concatenate([t_b, t_b], axis=0),
                    jnp.concatenate([labels, jnp.full_like(labels, null)],
                                    axis=0)).astype(cfg.dtype)
                return eps2[b:] + g * (eps2[:b] - eps2[b:])

            return predict
        return lambda mp, x, t_b, labels: apply_fn(mp, x, t_b, labels).astype(cfg.dtype)

    # -- compiled core -------------------------------------------------------------
    def _build(self, batch: int, capture) -> Callable:
        """capture: False (no trajectory) | True (every step) | int n
        (windowed: frames at save_indices(steps, n), computed with O(S/n)
        device memory via segmented scans — SURVEY.md §7 'windowed
        capture')."""
        cfg = self.config
        sched = self.params
        step_fn = self._step
        apply_fn = self.apply_fn
        num_steps = cfg.num_inference_steps
        shape = (cfg.image_size, cfg.image_size, cfg.channels)

        # dpm_solver threads the previous x0 prediction through the scan
        # carry (second-order multistep); unipc additionally threads the
        # corrected previous sample (predictor-corrector); ddpm/ddim carry
        # only x. The SDE variant additionally draws per-step noise from the
        # same fold_in(seed, k+1) streams as ancestral DDPM, so batching and
        # sharding never change results.
        family = self._family

        def init_carry(x):
            if family == "dpm":
                return (x, jnp.zeros_like(x))
            if family == "unipc":
                return (x, x, jnp.zeros_like(x))
            return x

        def carry_x(carry):
            return carry[0] if family != "simple" else carry

        def posterior_noise(keys, k):
            if cfg.deterministic_posterior:
                return None
            return jax.vmap(
                lambda key: jax.random.normal(jax.random.fold_in(key, k + 1),
                                              shape, cfg.dtype))(keys)

        predict = self._make_predict()

        def advance(carry, k, model_params, keys, labels):
            x = carry_x(carry)
            t = sched.timesteps[k]
            eps = predict(model_params, x, jnp.broadcast_to(t, (batch,)), labels)
            if family == "unipc":
                return unipc_step(carry[0], carry[1], carry[2], eps, k, sched)
            if family == "dpm":
                z = posterior_noise(keys, k) if sched.sde else None
                return dpm_solver_step(carry[0], carry[1], eps, k, sched, z)
            return step_fn(x, eps, k, sched, posterior_noise(keys, k))

        def run_segment(model_params, carry, keys, labels, start, length: int):
            def seg_body(carry, k):
                return advance(carry, k, model_params, keys, labels), None

            carry, _ = jax.lax.scan(seg_body, carry, start + jnp.arange(length))
            return carry

        if isinstance(capture, bool):
            def sample_fn(model_params, noise, keys, labels):
                carry = init_carry(noise.astype(cfg.dtype))

                def full_body(carry, k):
                    carry = advance(carry, k, model_params, keys, labels)
                    return carry, (carry_x(carry).astype(jnp.float32)
                                   if capture else None)

                carry, traj = jax.lax.scan(full_body, carry, jnp.arange(num_steps))
                return carry_x(carry).astype(jnp.float32), traj
        else:
            every = int(capture)
            # timesteps enable the absolute-t mode (save_every >= steps):
            # frames nearest each multiple of save_every in train-t units,
            # still compiled as segmented scans with O(saved) device memory
            saves = save_indices(num_steps, every, self.timesteps,
                                 self.schedule.num_train_timesteps)
            # segment lengths between save points (first starts at step 0)
            bounds = [-1] + saves
            segments = [(bounds[i] + 1, bounds[i + 1] - bounds[i])
                        for i in range(len(saves))]
            # group the equal-length middle run into one scan-of-scans
            def sample_fn(model_params, noise, keys, labels):
                carry = init_carry(noise.astype(cfg.dtype))
                frames = []
                i = 0
                while i < len(segments):
                    start, length = segments[i]
                    # batch together consecutive segments of the same length
                    j = i
                    while j + 1 < len(segments) and segments[j + 1][1] == length:
                        j += 1
                    n_rep = j - i + 1
                    if n_rep == 1:
                        carry = run_segment(model_params, carry, keys, labels,
                                            start, length)
                        frames.append(carry_x(carry).astype(jnp.float32)[None])
                    else:
                        def outer(carry, rep):
                            carry = run_segment(model_params, carry, keys, labels,
                                                start + rep * length, length)
                            return carry, carry_x(carry).astype(jnp.float32)

                        carry, ys = jax.lax.scan(outer, carry, jnp.arange(n_rep))
                        frames.append(ys)
                    i = j + 1
                traj = jnp.concatenate(frames, axis=0)
                return carry_x(carry).astype(jnp.float32), traj

        # no donation of the noise arg: the caller hashes the SAME buffer
        # asynchronously while the scan runs (the sidecar noise-hash
        # contract, `image_generator.py:383-389`) — donating would
        # invalidate it before the hash fetch. The buffer is 192 KB/image;
        # the scan's own carry dominates memory either way.
        if self.conditional:
            return jax.jit(sample_fn)
        # unconditional: keep the historical 3-arg compiled signature
        return jax.jit(lambda model_params, noise, keys:
                       sample_fn(model_params, noise, keys, None))

    def _get(self, batch: int, capture: bool) -> Callable:
        key = (batch, capture)
        if key not in self._compiled:
            self._compiled[key] = self._build(batch, capture)
        return self._compiled[key]

    # -- streaming capture (async host offload) -----------------------------------
    def _get_stream(self, batch: int) -> Callable:
        """Jitted segment runner for host-streamed capture: advances the
        carry over `length` steps (static; one compile per distinct segment
        length) and emits the reached frame. Device memory stays O(1)
        frames — the host assembles the trajectory while later segments
        compute (the dispatch is async, so transfers overlap compute)."""
        if batch not in self._stream_compiled:
            cfg = self.config
            sched = self.params
            step_fn = self._step
            family = self._family
            shape = (cfg.image_size, cfg.image_size, cfg.channels)
            predict = self._make_predict()

            def advance(carry, k, model_params, keys, labels):
                x = carry[0] if family != "simple" else carry
                t = sched.timesteps[k]
                eps = predict(model_params, x, jnp.broadcast_to(t, (batch,)),
                              labels)
                if cfg.deterministic_posterior:
                    noise = None
                else:
                    noise = jax.vmap(
                        lambda key: jax.random.normal(jax.random.fold_in(key, k + 1),
                                                      shape, cfg.dtype))(keys)
                if family == "unipc":
                    return unipc_step(carry[0], carry[1], carry[2], eps, k, sched)
                if family == "dpm":
                    z = noise if sched.sde else None
                    return dpm_solver_step(carry[0], carry[1], eps, k, sched, z)
                return step_fn(x, eps, k, sched, noise)

            def seg(model_params, carry, keys, labels, start, length: int):
                def body(c, k):
                    return advance(c, k, model_params, keys, labels), None

                carry, _ = jax.lax.scan(body, carry, start + jnp.arange(length))
                x = carry[0] if family != "simple" else carry
                return carry, x.astype(jnp.float32)

            # no donation: the first segment's carry aliases the caller's
            # noise array (astype is a no-op at matching dtype)
            if self.conditional:
                jitted = jax.jit(seg, static_argnames=("length",))
            else:
                jitted = jax.jit(
                    lambda model_params, carry, keys, start, length:
                    seg(model_params, carry, keys, None, start, length),
                    static_argnames=("length",))
            self._stream_compiled[batch] = jitted
        return self._stream_compiled[batch]

    def _sample_streamed(self, model_params, noise, keys, seeds_arr,
                         noise_for_hash, every: int,
                         labels=None) -> Dict[str, Any]:
        cfg = self.config
        saves = save_indices(cfg.num_inference_steps, every, self.timesteps,
                             self.schedule.num_train_timesteps)
        bounds = [-1] + saves
        segments = [(bounds[i] + 1, bounds[i + 1] - bounds[i])
                    for i in range(len(saves))]
        seg = self._get_stream(int(seeds_arr.shape[0]))
        xi = noise.astype(cfg.dtype)
        carry = ((xi, jnp.zeros_like(xi)) if self._family == "dpm"
                 else (xi, xi, jnp.zeros_like(xi)) if self._family == "unipc"
                 else xi)
        frames = []
        for start, length in segments:
            if self.conditional:
                carry, frame = seg(model_params, carry, keys, labels,
                                   start, length)
            else:
                carry, frame = seg(model_params, carry, keys, start, length)
            frame.copy_to_host_async()
            frames.append(frame)
        final = carry[0] if self._multistep else carry
        # the noise transfer was enqueued before any segment — by now it's
        # long complete; hashing overlaps the remaining segment fetches
        hashes = _hash_batch(noise_for_hash)
        traj = np.stack([np.asarray(f) for f in frames])
        return {
            "images": final.astype(jnp.float32),
            "noise_hashes": hashes,
            "timesteps": self.timesteps.copy(),
            "seeds": seeds_arr.copy(),
            "trajectory": traj,            # host numpy (n_saved, B, H, W, C)
            "save_indices": saves,
        }

    # -- public API ------------------------------------------------------------------
    def sample(self, model_params, seeds: Union[int, np.ndarray],
               capture_trajectory: Union[bool, int] = False,
               initial_noise: Optional[jax.Array] = None,
               stream_to_host: bool = False,
               class_labels: Optional[Union[int, np.ndarray]] = None
               ) -> Dict[str, Any]:
        """Denoise from seed(s). Returns final images (B,H,W,C) float32 in
        ~[-1,1], plus the trajectory when requested: `True` captures every
        step ((S,B,H,W,C)); an int n captures only the frames at
        `save_indices(steps, n)` with O(S/n) device memory, returning
        `save_indices` alongside.

        `stream_to_host=True` (with any capture mode) runs the scan as
        per-segment dispatches and asynchronously offloads each saved frame
        to host RAM while later segments compute: O(1) frames of device
        memory, trajectory returned as host numpy — the async host↔device
        pipeline from SURVEY.md §2.3 (replaces the reference's per-step
        `.cpu().clone()`, `xai/XAI.py:825`).

        `initial_noise` overrides the seed-derived noise (exact-parity mode
        for golden tests with externally generated noise).

        `class_labels` (scalar or (B,) int ids) is REQUIRED for conditional
        samplers and forbidden otherwise; a scalar broadcasts to the batch.
        """
        seeds_arr = np.atleast_1d(np.asarray(seeds, dtype=np.uint32))
        batch = int(seeds_arr.shape[0])
        if self.conditional:
            if class_labels is None:
                raise ValueError("conditional sampler requires class_labels")
            labels = jnp.broadcast_to(
                jnp.asarray(class_labels, jnp.int32).reshape(-1), (batch,))
        else:
            if class_labels is not None:
                raise ValueError("class_labels passed to an unconditional sampler")
            labels = None
        keys = self.keys_for_seeds(seeds_arr)
        noise = self.initial_noise(seeds_arr) if initial_noise is None else initial_noise
        if getattr(noise, "is_fully_addressable", True):
            noise_for_hash = noise
        else:
            # a global array on a multi-process mesh can't be materialized
            # on one host; such noise is always seed-derived
            # (ShardedSampler), so recompute it host-side for the hashes
            noise_for_hash = self.initial_noise(seeds_arr)
        # enqueue the device->host transfer for hashing BEFORE dispatching
        # the scan: the copy rides the queue ahead of the compute, so the
        # hash fetch after dispatch costs ~0 instead of a blocking
        # round-trip per call (~0.1-0.2 s through a tunneled link — was
        # ~26% of a b8 call, NOTES_ROUND2). Hash values are unchanged:
        # same per-seed noise, same SHA-256 sidecar contract.
        if hasattr(noise_for_hash, "copy_to_host_async"):
            noise_for_hash.copy_to_host_async()

        if stream_to_host and capture_trajectory:
            every = (1 if capture_trajectory is True else int(capture_trajectory))
            return self._sample_streamed(model_params, noise, keys, seeds_arr,
                                         noise_for_hash, every, labels=labels)

        capture_key = (capture_trajectory if isinstance(capture_trajectory, bool)
                       else int(capture_trajectory))
        fn = self._get(batch, capture_key)
        if self.conditional:
            final, traj = fn(model_params, noise, keys, labels)  # async dispatch
        else:
            final, traj = fn(model_params, noise, keys)   # async dispatch
        out: Dict[str, Any] = {
            "images": final,
            "noise_hashes": _hash_batch(noise_for_hash),
            "timesteps": self.timesteps.copy(),
            "seeds": seeds_arr.copy(),
        }
        if capture_trajectory is True:
            out["trajectory"] = traj  # (S, B, H, W, C) float32, device
        elif capture_trajectory:
            out["trajectory"] = traj  # (n_saved, B, H, W, C)
            out["save_indices"] = save_indices(self.config.num_inference_steps,
                                               int(capture_trajectory),
                                               self.timesteps,
                                               self.schedule.num_train_timesteps)
        return out

    # -- img2img / inpainting (beyond-reference augmentation path) -----------------
    def _build_img2img(self, batch: int, capture: bool, start_k: int,
                       masked: bool) -> Callable:
        """Compiled partial reverse walk from step index `start_k`, optionally
        re-imposing the known region after every step (RePaint-style
        inpainting, Lugmayr et al. 2022, single forward pass — no resampling
        loops). Simple-carry schedulers only (ddpm/ddim): the multistep
        solvers' history carries would need re-priming at `start_k`."""
        cfg = self.config
        sched = self.params
        step_fn = self._step
        num_steps = cfg.num_inference_steps
        shape = (cfg.image_size, cfg.image_size, cfg.channels)
        predict = self._make_predict()
        # noise level the latent sits at AFTER step k: ab of the next (lower)
        # timestep on the grid; clean (ab = 1) after the final step
        ab_np = np.asarray(self.schedule.alphas_cumprod, dtype=np.float32)
        ab_after = jnp.asarray(
            np.append(ab_np[self.timesteps[1:]], np.float32(1.0)))

        def sample_fn(model_params, x_start, keys, labels, init_img, mask):
            def body(x, k):
                t = sched.timesteps[k]
                eps = predict(model_params, x, jnp.broadcast_to(t, (batch,)),
                              labels)
                if cfg.deterministic_posterior:
                    pn = None
                else:
                    pn = jax.vmap(
                        lambda key: jax.random.normal(
                            jax.random.fold_in(key, k + 1), shape,
                            cfg.dtype))(keys)
                x = step_fn(x, eps, k, sched, pn)
                if masked:
                    # known-region noise from a stream disjoint from the
                    # posterior's fold_in(key, k+1), k+1 in [1, num_steps]
                    z = jax.vmap(
                        lambda key: jax.random.normal(
                            jax.random.fold_in(key, num_steps + 1 + k), shape,
                            cfg.dtype))(keys)
                    ab = ab_after[k].astype(cfg.dtype)
                    known = (jnp.sqrt(ab) * init_img.astype(cfg.dtype)
                             + jnp.sqrt(1.0 - ab) * z)
                    x = mask.astype(cfg.dtype) * x + (1.0 - mask.astype(cfg.dtype)) * known
                return x, (x.astype(jnp.float32) if capture else None)

            x, traj = jax.lax.scan(body, x_start.astype(cfg.dtype),
                                   start_k + jnp.arange(num_steps - start_k))
            return x.astype(jnp.float32), traj

        if masked and self.conditional:
            return jax.jit(sample_fn)
        if masked:
            return jax.jit(lambda mp, x, keys, init_img, mask:
                           sample_fn(mp, x, keys, None, init_img, mask))
        if self.conditional:
            return jax.jit(lambda mp, x, keys, labels:
                           sample_fn(mp, x, keys, labels, None, None))
        return jax.jit(lambda mp, x, keys:
                       sample_fn(mp, x, keys, None, None, None))

    def img2img(self, model_params, seeds: Union[int, np.ndarray],
                init_image, strength: float = 0.6, mask=None,
                capture_trajectory: bool = False,
                class_labels: Optional[Union[int, np.ndarray]] = None
                ) -> Dict[str, Any]:
        """SDEdit-style image-to-image (Meng et al. 2022) with optional
        RePaint-style inpainting — the augmentation path the reference lacks
        (its generator is noise-only, `image_generator.py:395-438`).

        `init_image`: (H,W,C) or (B,H,W,C) float32 in [-1,1]. It is
        forward-noised to the grid timestep closest to `strength` of the
        walk (x = sqrt(ab)*init + sqrt(1-ab)*noise, noise from the SAME
        per-seed streams as `sample` — so the sidecar `noise_hashes`
        contract carries over verbatim) and denoised for the remaining
        `round(strength * num_inference_steps)` steps.

        `mask`: optional (H,W) / (H,W,1) / (B,H,W,1) float, 1 = regenerate,
        0 = keep `init_image`. After every step the known region is
        re-imposed at the step's noise level, so the final image equals
        `init_image` exactly where mask == 0.

        Single-step-state schedulers only (ddpm/ddim); raises for the
        multistep solvers (their carries would need history re-priming).
        Returns the `sample()` dict plus `strength`, `start_index`, and
        `t_start`; a captured trajectory holds the executed steps only.
        """
        if self._multistep:
            raise NotImplementedError(
                "img2img/inpainting requires a single-step-state scheduler "
                "(ddpm or ddim); multistep solver histories cannot start "
                "mid-walk")
        cfg = self.config
        s = float(strength)
        if not 0.0 < s <= 1.0:
            raise ValueError(f"strength must be in (0, 1], got {strength}")
        seeds_arr = np.atleast_1d(np.asarray(seeds, dtype=np.uint32))
        batch = int(seeds_arr.shape[0])
        if self.conditional:
            if class_labels is None:
                raise ValueError("conditional sampler requires class_labels")
            labels = jnp.broadcast_to(
                jnp.asarray(class_labels, jnp.int32).reshape(-1), (batch,))
        else:
            if class_labels is not None:
                raise ValueError("class_labels passed to an unconditional sampler")
            labels = None
        shape = (cfg.image_size, cfg.image_size, cfg.channels)
        init = jnp.asarray(init_image, jnp.float32)
        if init.ndim == 3:
            init = init[None]
        if init.shape != (batch,) + shape and init.shape != (1,) + shape:
            raise ValueError(f"init_image shape {init.shape} incompatible "
                             f"with batch {batch} and image shape {shape}")
        init = jnp.broadcast_to(init, (batch,) + shape)
        m = None
        if mask is not None:
            m = jnp.asarray(mask, jnp.float32)
            if m.ndim == 2:
                m = m[None, :, :, None]
            elif m.ndim == 3:
                m = m[None]
            if (m.shape[1:3] != shape[:2]
                    or m.shape[-1] not in (1, cfg.channels)
                    or m.shape[0] not in (1, batch)):
                raise ValueError(f"mask shape {m.shape} incompatible with "
                                 f"image shape {shape} and batch {batch}")

        steps_to_run = max(1, int(round(s * cfg.num_inference_steps)))
        k0 = cfg.num_inference_steps - steps_to_run
        t_start = int(self.timesteps[k0])
        ab0 = float(np.asarray(self.schedule.alphas_cumprod,
                               dtype=np.float64)[t_start])

        keys = self.keys_for_seeds(seeds_arr)
        noise = self.initial_noise(seeds_arr)
        if hasattr(noise, "copy_to_host_async"):
            noise.copy_to_host_async()  # same async-hash path as sample()
        x_start = (np.sqrt(ab0).astype(np.float32) * init
                   + np.sqrt(1.0 - ab0).astype(np.float32) * noise)

        fn = self._i2i_compiled.setdefault(
            (batch, bool(capture_trajectory), k0, m is not None),
            self._build_img2img(batch, bool(capture_trajectory), k0,
                                m is not None))
        if m is not None and self.conditional:
            final, traj = fn(model_params, x_start, keys, labels, init, m)
        elif m is not None:
            final, traj = fn(model_params, x_start, keys, init, m)
        elif self.conditional:
            final, traj = fn(model_params, x_start, keys, labels)
        else:
            final, traj = fn(model_params, x_start, keys)
        out: Dict[str, Any] = {
            "images": final,
            "noise_hashes": _hash_batch(noise),
            "timesteps": self.timesteps.copy(),
            "seeds": seeds_arr.copy(),
            "strength": s,
            "start_index": k0,
            "t_start": t_start,
        }
        if capture_trajectory:
            out["trajectory"] = traj  # (steps_to_run, B, H, W, C)
        return out

    def sample_single(self, model_params, seed: int,
                      capture_trajectory: bool = False,
                      class_labels: Optional[int] = None) -> Dict[str, Any]:
        return self.sample(model_params, np.asarray([seed], dtype=np.uint32),
                           capture_trajectory=capture_trajectory,
                           class_labels=class_labels)


def to_uint8_images(images) -> np.ndarray:
    """[-1,1] NHWC float -> uint8, the reference's de-normalization
    (`image_generator.py:440-448`). Pure numpy — routing this through jnp
    costs a device round-trip per call (~100 ms each on a tunneled link),
    which dominated the artifact-write loop."""
    arr = np.asarray(images, dtype=np.float32)
    arr = np.clip((arr + 1.0) / 2.0, 0.0, 1.0)
    return (arr * 255.0).astype(np.uint8)
