"""ImageGenerator — the end-to-end generation engine and public facade.

API parity with reference `ImageGenerator`
(`core/generator/image_generator.py:28-835`): `set_progress_callback`,
`set_log_callback`, `set_xai_hook`, `set_xai_frequency`,
`set_save_trajectory`, `set_xai_analyzer`, `set_generation_seed`,
`get_available_classes`, `validate_models`, `generate_single_image`,
`generate_images`, `stop_generation`, `get_generation_status`, `cleanup`.

Behavioral parity:
  * seed bookkeeping — per-class offset = MD5(class)[:8] & 0x7fffffff,
    per-image seed = (base + offset + i) & 0x7fffffff; random mode draws a
    *recorded* seed via `secrets.randbelow(0x7fffffff)`
    (`image_generator.py:586-637`);
  * artifacts — `ISIC_%07d.png` per-class numbering, sidecar JSON with the
    SHA-256 noise hash, `synthetic_dataset.csv` rows, per-class color
    postprocessing, cooperative `stop_requested` cancellation, per-N-images
    integrated XAI trigger (`class_image_count % xai_frequency == 0`).

TPU-native redesign (NOT a port):
  * the denoise loop is the jitted `lax.scan` sampler (`diffusion/sampler.py`)
    — one device program per image batch instead of `inference_steps` host
    round-trips per image;
  * images are generated in BATCHES: seeds for a whole block of images go
    through one compiled sampler call. Noise is derived per-seed
    (`fold_in` streams), so batched output matches one-at-a-time
    generation up to XLA's batch-dependent float tiling — batching is
    pure throughput, not a semantic change;
  * trajectory capture is the scan's stacked ys (device), sliced per image
    for the XAI hook.
"""
from __future__ import annotations

import hashlib
import secrets
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .io.color_stats import load_color_statistics, apply_color_postprocessing
from .io.csv_io import append_synthetic_row, initialize_synthetic_csv
from .io.images import save_image, write_sidecar_metadata
from .model_manager import ModelManager
from .cache import CacheManager
from .diffusion.sampler import to_uint8_images
from .utils.config import ConfigManager
from .utils.logging import Logger
from .utils.paths import PathManager


def parse_guidance_map(spec: Optional[str]) -> Optional[Dict[str, float]]:
    """Parse a CLI per-class guidance spec: 'MEL=2.5,NV=2' -> {...}.

    Empty/None -> None (scalar guidance path). Raises ValueError on
    malformed entries so surfaces fail loudly at argument time."""
    if not spec:
        return None
    out: Dict[str, float] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"guidance-map entry {part!r} is not CLASS=G")
        name, val = part.split("=", 1)
        g = float(val)
        if g < 0.0:
            raise ValueError(f"guidance must be >= 0, got {part!r}")
        out[name.strip()] = g
    return out or None


def class_seed_offset(class_name: str) -> int:
    """MD5-derived 31-bit per-class offset (`image_generator.py:586-592`)."""
    h = hashlib.md5(class_name.encode("utf-8")).hexdigest()
    return int(h[:8], 16) & 0x7FFFFFFF


class ImageGenerator:
    def __init__(self, config: Optional[ConfigManager] = None,
                 checkpoints_dir: Optional[str] = None,
                 device: Optional[jax.Device] = None,
                 compute_dtype=jnp.float32,
                 model_config=None,
                 model_variant: str = "best",
                 conditional: Optional[bool] = None,
                 guidance_scale: Optional[float] = None,
                 guidance_map: Optional[Dict[str, float]] = None):
        self.config = config
        project_root = config.project_root if config else None
        self.path_manager = PathManager(project_root)
        log_dir = config.get_path("logs") if config else None
        self.logger = Logger("image_generator", log_dir=log_dir)
        cache_dir = config.get_path("cache") if config else None
        self.cache_manager = CacheManager(cache_dir) if cache_dir else None
        ckpt_dir = checkpoints_dir or (config.get_path("checkpoints") if config
                                       else str(self.path_manager.get_checkpoints_dir()))
        # class-conditional single-checkpoint mode (+ CFG weight): an
        # EXPLICIT ctor arg wins — including explicit False/0.0 (the GUI's
        # family switch back to per-class must override a conditional-
        # enabled config); None means "defer to the config's compute
        # section" (the reference-parity default is off)
        if conditional is None:
            conditional = bool(config.get("compute.conditional", False)) \
                if config is not None else False
        if guidance_scale is None:
            guidance_scale = float(config.get("compute.guidance_scale", 0.0)) \
                if config is not None else 0.0
        self.guidance_scale = float(guidance_scale)
        # per-class guidance defaults (conditional mode only): a
        # {class_name: g} map — classes not listed fall back to
        # guidance_scale. Measured per-class optima come from
        # scripts/e2e_conditional.py's per_class_best_guidance table.
        if guidance_map is None and config is not None:
            guidance_map = config.get("compute.guidance_map", None)
        self.guidance_map = ({str(k): float(v) for k, v in guidance_map.items()}
                             if guidance_map else None)
        self.model_manager = ModelManager(
            checkpoints_dir=ckpt_dir, cache_manager=self.cache_manager,
            logger=self.logger, device=device, dtype=compute_dtype,
            model_config=model_config, variant=model_variant,
            conditional=conditional)
        # PNG encode speed knob (None = PIL default = reference parity).
        # Level 1 is ~3x faster on lesion-like images — the write stage
        # bounds few-step production throughput on a 1-core host. Changes
        # PNG bytes, so it is recorded in sidecars and honored by
        # --reproduce (same contract pattern as dtype / fast_math).
        self.png_compress_level: Optional[int] = (
            config.get("compute.png_compress_level", None) if config else None)

        self.inference_steps = int(config.get_generation_param("inference_timesteps")) \
            if config else 50
        self.inference_steps = max(1, min(1000, self.inference_steps))
        self.batch_size = int(config.get("generation.batch_size", 1)) if config else 1
        self.scheduler_kind = (config.get("compute.scheduler", "ddpm")
                               if config else "ddpm")
        self.ddim_eta = float(config.get("compute.ddim_eta", 0.0)) if config else 0.0
        # 'leading' = reference parity; 'trailing' = few-step quality fix
        # (schedules.trailing_timesteps) — recorded in sidecars
        self.timestep_spacing = (config.get("compute.timestep_spacing", "leading")
                                 if config else "leading")

        stats_path = Path(ckpt_dir) / "color_statistics.json"
        self.color_statistics = load_color_statistics(stats_path)

        self.base_seed: Optional[int] = None
        self.save_trajectory = True
        self.xai_frequency = int(config.get_generation_param("xai_frequency")) \
            if config else 1
        self.xai_analyzer = None
        self.xai_hook: Optional[Callable] = None
        self.xai_hook_every_n = 10

        self.progress_callback: Optional[Callable[[int, int, str], None]] = None
        self.log_callback: Optional[Callable[[str, str], None]] = None

        self.mesh = None  # set_mesh() enables multi-chip data-parallel sampling
        self.is_generating = False
        self.stop_requested = False
        # called between device blocks of a long generate_images run (same
        # thread) — the serving layer uses it to slip interactive requests
        # in ahead of the remaining bulk work (priority without preemption)
        self.between_blocks_hook: Optional[Callable[[], None]] = None

    # -- wiring (reference image_generator.py:85-140) -----------------------------
    def set_progress_callback(self, cb: Callable[[int, int, str], None]) -> None:
        self.progress_callback = cb

    def set_log_callback(self, cb: Callable[[str, str], None]) -> None:
        self.log_callback = cb

    def set_xai_hook(self, hook: Callable, every_n: int = 10) -> None:
        """Legacy hook surface kept for API parity (the reference keeps it
        wired but inactive, `image_generator.py:714-715`)."""
        self.xai_hook = hook
        self.xai_hook_every_n = every_n

    def set_xai_frequency(self, n: int) -> None:
        self.xai_frequency = max(1, int(n))

    def set_save_trajectory(self, flag: bool) -> None:
        self.save_trajectory = bool(flag)

    def set_xai_analyzer(self, analyzer) -> None:
        """analyzer must expose `analyze_trajectory(trajectory, class_name,
        seed, inference_steps, filename, file_path)` (the integrated-XAI
        adapter protocol, `xai/xai_integration.py:84`)."""
        self.xai_analyzer = analyzer

    def set_generation_seed(self, seed: Optional[int]) -> None:
        self.base_seed = None if seed is None else int(seed)

    def set_inference_steps(self, steps: int) -> None:
        self.inference_steps = max(1, min(1000, int(steps)))

    def set_mesh(self, mesh) -> None:
        """Shard sampling batches over a `jax.sharding.Mesh` ('data' axis).
        Per-seed RNG streams keep outputs independent of the layout. A mesh
        with a 'model' axis > 1 additionally channel-shards the UNet
        weights over it (tensor parallelism — cuts per-call latency where
        dp only scales throughput; see `parallel.mesh.tp_param_shardings`)."""
        self.mesh = mesh

    # -- logging / progress ----------------------------------------------------------
    def _log(self, msg: str, level: str = "info") -> None:
        getattr(self.logger, f"log_{level}", self.logger.log_info)(msg)
        if self.log_callback:
            try:
                self.log_callback(msg, level)
            except Exception:
                pass

    def _progress(self, done: int, total: int, msg: str) -> None:
        if self.progress_callback:
            try:
                self.progress_callback(done, total, msg)
            except Exception:
                pass

    # -- discovery / validation ---------------------------------------------------------
    def get_available_classes(self) -> List[str]:
        return self.model_manager.get_available_classes()

    def validate_models(self, class_names: Optional[List[str]] = None) -> Dict[str, bool]:
        class_names = class_names or self.get_available_classes()
        results = {}
        for cls in class_names:
            ok = self.model_manager.load_model(cls)
            results[cls] = bool(ok and self.model_manager.validate_model(cls))
        return results

    # -- seed plumbing ---------------------------------------------------------------------
    def _seed_for(self, class_name: str, index: int,
                  offsets: Dict[str, int]) -> int:
        if self.base_seed is not None:
            return (int(self.base_seed) + offsets.get(class_name, 0) + index) & 0x7FFFFFFF
        return secrets.randbelow(0x7FFFFFFF)

    def _guidance_table(self) -> Optional[Tuple[float, ...]]:
        """Per-class-id guidance tuple for the conditional sampler, built
        from `guidance_map`; None when no map is set, keeping the scalar
        fast path and its byte contract.

        Weights follow the scalar `guidance_scale` convention everywhere
        in this package: g <= 1 means NO guidance (plain conditional
        forward), so such entries — including the default
        guidance_scale=0.0 fallback for classes absent from the map —
        normalize to an effective combine weight of 1.0 rather than
        leaking raw 0.0 into `eps_null + g*(eps_cond - eps_null)`, which
        would silently sample unlisted classes UNCONDITIONALLY. A table
        whose every row normalizes to 1.0 collapses to None (the single-
        forward scalar path — same prediction, half the compute). The
        normalization is a pure function of (map, guidance_scale), so
        sidecar `--reproduce` rebuilds the identical executable."""
        mm = self.model_manager
        if not (mm.conditional and self.guidance_map):
            return None

        def effective(g: float) -> float:
            return float(g) if float(g) > 1.0 else 1.0

        n = int(mm.model.config.num_class_embeds)
        table = [effective(self.guidance_scale)] * n
        for cname in mm.get_available_classes():
            table[mm.class_id(cname)] = effective(
                self.guidance_map.get(cname, self.guidance_scale))
        if all(g == 1.0 for g in table):
            return None
        return tuple(table)

    # -- core generation --------------------------------------------------------------------
    def _sample_batch(self, class_name: str, seeds: np.ndarray,
                      capture_trajectory: bool) -> Optional[Dict[str, Any]]:
        return self._sample_block([class_name] * len(seeds), seeds,
                                  capture_trajectory)

    def _sample_block(self, classes: List[str], seeds: np.ndarray,
                      capture_trajectory: bool) -> Optional[Dict[str, Any]]:
        """One device batch; `classes[j]` is image j's class. Per-class
        models require a single-class block (the batch driver never builds
        a spanning one); the conditional model takes per-image labels, so
        a block may mix classes — that is the point of the single
        class-conditional checkpoint (mixed-class device batches instead of
        the reference's one-class-at-a-time loop)."""
        for cls in dict.fromkeys(classes):
            if cls not in self.model_manager.loaded_params:
                if not self.model_manager.load_model(cls):
                    return None
        sampler = self.model_manager.create_sampler(
            self.inference_steps, scheduler=self.scheduler_kind,
            ddim_eta=self.ddim_eta, timestep_spacing=self.timestep_spacing,
            guidance_scale=self.guidance_scale,
            guidance_table=self._guidance_table())
        params = self.model_manager.loaded_params[classes[0]]
        labels = None
        if self.model_manager.conditional:
            labels = np.asarray([self.model_manager.class_id(c)
                                 for c in classes], np.int32)
        elif len(set(classes)) > 1:
            raise ValueError("mixed-class block requires conditional mode")
        if self.mesh is not None:
            from .parallel.sharded_sampler import ShardedSampler
            return ShardedSampler(sampler, self.mesh).sample(
                params, seeds, capture_trajectory=capture_trajectory,
                class_labels=labels)
        return sampler.sample(params, seeds, capture_trajectory=capture_trajectory,
                              class_labels=labels)

    def generate_single_image(self, class_name: str, output_path: str,
                              postprocess: bool = True,
                              seed: Optional[int] = None
                              ) -> Tuple[bool, Optional[np.ndarray]]:
        """One image end-to-end. Returns (success, trajectory or None);
        trajectory is (S, H, W, C) float32 — every denoise step, matching
        the integrated-XAI capture (`image_generator.py:406-407`)."""
        if self.stop_requested:
            return False, None
        try:
            seed = int(seed) if seed is not None else secrets.randbelow(0x7FFFFFFF)
            out = self._sample_batch(class_name, np.asarray([seed], np.uint32),
                                     self.save_trajectory)
            if out is None:
                return False, None
            self._write_image_artifacts(out, 0, class_name, output_path,
                                        postprocess, seed)
            traj = np.asarray(out["trajectory"][:, 0]) if self.save_trajectory else None
            self._log(f"image generated for class {class_name}: {output_path}")
            return True, traj
        except Exception as exc:
            self._log(f"generation failed for {class_name}: {exc}", "error")
            return False, None

    def regenerate_block_image(self, class_name: str, output_path: str,
                               postprocess: bool,
                               block: Dict[str, Any]) -> bool:
        """Rebuild the EXACT device block a sidecar's `block` field records
        and re-write one image from it. The reproduce contract (reference
        `image_generator.py:456-477`) pins seed + steps + scheduler, but on
        TPU the float tiling XLA picks is batch-shape-dependent, so byte
        identity additionally requires the original block layout — the same
        seeds in the same order, extracting the recorded index."""
        seeds = np.asarray(block["seeds"], np.uint32)
        idx = int(block["index"])
        classes = list(block.get("classes") or [class_name] * len(seeds))
        if not (0 <= idx < len(seeds)) or classes[idx] != class_name:
            self._log(f"sidecar block is inconsistent (index {idx}, "
                      f"{len(seeds)} seeds, classes {classes})", "error")
            return False
        out = self._sample_block(classes, seeds, False)
        if out is None:
            return False
        self._write_image_artifacts(
            out, idx, class_name, output_path, postprocess, int(seeds[idx]),
            extra={"block": {"seeds": [int(s) for s in seeds], "index": idx,
                             **({"classes": classes}
                                if self.model_manager.conditional else {}),
                             **({"dp_mesh": int(self.mesh.devices.size)}
                                if self.mesh is not None else {})}})
        self._log(f"image regenerated from its recorded device block "
                  f"(size {len(seeds)}, index {idx}): {output_path}")
        return True

    # -- img2img / inpainting augmentation (beyond reference) -------------------------
    @staticmethod
    def _load_source_image(source, image_size: int):
        """Path or array -> ((H,W,C) float32 in [-1,1], name, sha256).

        A path is hashed over its FILE BYTES (the reproduce contract pins
        the exact input file); an array over its float32 pixel bytes."""
        from PIL import Image as PILImage

        if isinstance(source, (str, Path)):
            data = Path(source).read_bytes()
            digest = hashlib.sha256(data).hexdigest()
            pil = PILImage.open(Path(source)).convert("RGB")
            if pil.size != (image_size, image_size):
                pil = pil.resize((image_size, image_size), PILImage.BILINEAR)
            arr = np.asarray(pil, np.float32) / 127.5 - 1.0
            return arr, Path(source).name, digest
        raw = np.asarray(source)
        # rescale decision comes from the ORIGINAL dtype: a very dark uint8
        # image (all pixels <= 1) must still be treated as 0-255 range; the
        # value heuristic only remains for float inputs of unknown range
        is_int = np.issubdtype(raw.dtype, np.integer)
        arr = raw.astype(np.float32)
        if arr.ndim == 4:
            arr = arr[0]
        if is_int or arr.max() > 1.5:
            arr = arr / 127.5 - 1.0
        digest = hashlib.sha256(
            np.ascontiguousarray(arr, np.float32).tobytes()).hexdigest()
        return arr, None, digest

    @staticmethod
    def _load_mask(mask, image_size: int):
        """Path or array -> ((H,W) float32 in [0,1], name, sha256) or
        (None, None, None). 1 = regenerate, 0 = keep the source pixel."""
        from PIL import Image as PILImage

        if mask is None:
            return None, None, None
        if isinstance(mask, (str, Path)):
            data = Path(mask).read_bytes()
            digest = hashlib.sha256(data).hexdigest()
            pil = PILImage.open(Path(mask)).convert("L")
            if pil.size != (image_size, image_size):
                pil = pil.resize((image_size, image_size), PILImage.NEAREST)
            return np.asarray(pil, np.float32) / 255.0, Path(mask).name, digest
        arr = np.asarray(mask, np.float32)
        digest = hashlib.sha256(
            np.ascontiguousarray(arr, np.float32).tobytes()).hexdigest()
        return arr, None, digest

    def augment_single_image(self, class_name: str, source_image,
                             output_path: str, strength: float = 0.6,
                             mask=None, postprocess: bool = False,
                             seed: Optional[int] = None
                             ) -> Tuple[bool, Optional[np.ndarray]]:
        """img2img / inpainting through the production artifact path — the
        augmentation surface the reference lacks (its generator is
        noise-only, `core/generator/image_generator.py:395-438`).

        `source_image` (path or array, any range) is forward-noised to
        `strength` of the walk and denoised with the generator's configured
        sampler (ddpm/ddim only); `mask` (path or array; 1 = regenerate,
        0 = keep) turns it into inpainting. Artifacts match
        `generate_single_image` plus an `img2img` sidecar block recording
        strength + source/mask SHA-256 (and filenames when given as paths),
        so `cli --reproduce` can rebuild the exact bytes from the sidecar
        plus the original source file. Postprocess defaults OFF here: the
        mean-shift would recolor the preserved source region.
        """
        if self.stop_requested:
            return False, None
        try:
            seed = int(seed) if seed is not None else secrets.randbelow(0x7FFFFFFF)
            if not self.model_manager.load_model(class_name):
                return False, None
            size = self.model_manager.model.config.sample_size
            init, src_name, src_sha = self._load_source_image(source_image, size)
            m, mask_name, mask_sha = self._load_mask(mask, size)
            sampler = self.model_manager.create_sampler(
                self.inference_steps, scheduler=self.scheduler_kind,
                ddim_eta=self.ddim_eta, timestep_spacing=self.timestep_spacing,
                guidance_scale=self.guidance_scale,
                guidance_table=self._guidance_table())
            labels = (self.model_manager.class_id(class_name)
                      if self.model_manager.conditional else None)
            out = sampler.img2img(
                self.model_manager.loaded_params[class_name],
                np.asarray([seed], np.uint32), init, strength=float(strength),
                mask=m, capture_trajectory=self.save_trajectory,
                class_labels=labels)
            extra = {"img2img": {
                "strength": float(strength),
                "t_start": int(out["t_start"]),
                # recorded so --reproduce needs no postprocess guesswork
                "postprocess": bool(postprocess),
                "source_sha256": src_sha,
                **({"source": src_name,
                    "source_path": str(Path(source_image).resolve())}
                   if src_name else {}),
                **({"mask_sha256": mask_sha} if mask_sha else {}),
                **({"mask": mask_name,
                    "mask_path": str(Path(mask).resolve())}
                   if mask_name else {}),
            }}
            self._write_image_artifacts(out, 0, class_name, output_path,
                                        postprocess, seed, extra=extra)
            traj = (np.asarray(out["trajectory"][:, 0])
                    if self.save_trajectory else None)
            self._log(f"augmented image for class {class_name} "
                      f"(strength={strength}): {output_path}")
            return True, traj
        except Exception as exc:
            self._log(f"augmentation failed for {class_name}: {exc}", "error")
            return False, None

    def _write_image_artifacts(self, sample_out: Dict[str, Any], idx: int,
                               class_name: str, output_path: str,
                               postprocess: bool, seed: int,
                               extra: Optional[Dict[str, Any]] = None) -> None:
        img = np.asarray(sample_out["images"][idx])
        arr = to_uint8_images(img[None])[0]
        if postprocess:
            arr = apply_color_postprocessing(
                arr, self.color_statistics.get(class_name))
        from PIL import Image as PILImage
        save_image(PILImage.fromarray(arr), output_path,
                   png_compress_level=self.png_compress_level)
        write_sidecar_metadata(
            output_path, class_name=class_name, seed=seed,
            inference_steps=self.inference_steps,
            model_metadata=self.model_manager.model_metadata.get(class_name, {}),
            device=str(self.model_manager.device),
            noise_hash=sample_out["noise_hashes"][idx],
            scheduler={
                # the reference's static field set (image_generator.py:463-467)
                "num_train_timesteps": 1000,
                "beta_schedule": "squaredcos_cap_v2",
                "prediction_type": "epsilon",
                # additive fields: the SAMPLER actually used — without these
                # a sidecar cannot pin the reverse process (--reproduce)
                "kind": self.scheduler_kind,
                "ddim_eta": self.ddim_eta,
                "timestep_spacing": self.timestep_spacing,
                # compute dtype: bf16 (the serving default) and f32 produce
                # different bytes, so reproduce must rebuild with the same
                "dtype": jnp.dtype(self.model_manager.dtype).name,
                # checkpoint variant (e.g. a distilled student) — reproduce
                # must sample the same weights
                "model_variant": self.model_manager.variant,
                # bf16-exponential attention changes output bytes — record
                # it ONLY when enabled so pre-existing sidecars stay
                # byte-identical (reproduce rebuilds with the same setting)
                **({"attention_fast_math": True}
                   if self.model_manager.attention_fast_math else {}),
                # conditional single-checkpoint mode: reproduce must rebuild
                # a conditional generator with the same guidance weight
                # (class id re-derives from class_name + checkpoint metadata).
                # With a per-class guidance_map the FULL map is recorded —
                # a mixed-class device block's bytes depend on every row's
                # weight, so reproduce must rebuild the same table (the
                # scalar field still carries this image's effective g)
                **({"conditional": True,
                    "guidance_scale": (
                        self.guidance_map.get(class_name, self.guidance_scale)
                        if self.guidance_map else self.guidance_scale),
                    **({"guidance_map": dict(self.guidance_map)}
                       if self.guidance_map else {})}
                   if self.model_manager.conditional else {}),
                # non-default PNG encoder settings change output BYTES —
                # recorded ONLY when set so pre-existing sidecars stay
                # byte-identical (reproduce rebuilds with the same level)
                **({"png_compress_level": int(self.png_compress_level)}
                   if self.png_compress_level is not None else {}),
            },
            extra=extra)

    def generate_images(self, class_configs: List[Tuple[str, int]],
                        output_dir: str, postprocess: bool = True) -> Dict[str, Any]:
        """Batch driver (reference `generate_images`,
        `image_generator.py:547-740`), with device-batched sampling."""
        if self.is_generating:
            self._log("generation already running", "warning")
            return {"error": "generation already running"}
        self.is_generating = True
        self.stop_requested = False
        t_start = time.time()
        try:
            output_path = Path(output_dir)
            output_path.mkdir(parents=True, exist_ok=True)
            csv_path = output_path / "synthetic_dataset.csv"
            initialize_synthetic_csv(csv_path)

            offsets = {cls: class_seed_offset(cls) for cls, _ in class_configs} \
                if self.base_seed is not None else {}
            total_images = sum(count for _, count in class_configs)
            generated = 0
            self._log(f"starting generation of {total_images} images")

            need_traj = self.save_trajectory and self.xai_analyzer is not None
            # flat work list: (class, per-class image index). Per-class
            # models require single-class device blocks (blocks break at
            # class boundaries — identical batching to the per-class loop
            # this replaces); the conditional single checkpoint takes
            # per-image labels, so blocks SPAN classes: a [(MEL,3),(NV,3),
            # (VASC,2)] request is ONE b8 device batch instead of three
            # partial ones (per-image step cost is batch-flat through b8,
            # PERFORMANCE.md — mixed-class batching is the conditional
            # family's throughput case). The index CONTINUES across
            # duplicate entries of the same class (serve routinely builds
            # one entry per coalesced request): restarting it would hand a
            # fixed base seed the same seed+index pairs twice, producing
            # byte-identical images recorded as distinct samples.
            items: List[Tuple[str, int]] = []
            _next_idx: Dict[str, int] = {}
            for cls, count in class_configs:
                start = _next_idx.get(cls, 0)
                items.extend((cls, start + i) for i in range(count))
                _next_idx[cls] = start + count
            mixed = self.model_manager.conditional
            class_totals: Dict[str, int] = {}
            for cls, count in class_configs:
                class_totals[cls] = class_totals.get(cls, 0) + count
            class_counts: Dict[str, int] = {}  # ISIC numbering + XAI cadence
            dead: set = set()       # classes whose model failed to load
            announced: set = set()

            def block_at(start: int):
                block = min(self.batch_size, len(items) - start)
                # trajectory capture holds (steps, block, H, W, C) fp32
                # on device — cap the block so HBM stays bounded
                if need_traj:
                    size = self.model_manager.model.config.sample_size
                    frame_bytes = size * size * 3 * 4  # 192KB at 128²
                    max_traj_block = max(1, (4 << 30) //
                                         (self.inference_steps * frame_bytes))
                    block = min(block, max_traj_block)
                if not mixed:
                    cls0 = items[start][0]
                    run = 1
                    while run < block and items[start + run][0] == cls0:
                        run += 1
                    block = run
                blk = items[start:start + block]
                # never batch items of a known-dead class (a later duplicate
                # entry of a failed class must not poison its block-mates)
                for k, (cls, _) in enumerate(blk):
                    if cls in dead:
                        return blk[:k]
                return blk

            def dispatch_block(start: int):
                blk = block_at(start)
                for cls in dict.fromkeys(c for c, _ in blk):
                    if cls not in announced:
                        announced.add(cls)
                        self._log(f"generating {class_totals[cls]} images "
                                  f"for class {cls}")
                        (output_path / cls).mkdir(exist_ok=True)
                seeds = np.asarray([self._seed_for(cls, i, offsets)
                                    for cls, i in blk], dtype=np.uint32)
                return self._sample_block([c for c, _ in blk], seeds,
                                          need_traj), seeds, blk

            # two-stage software pipeline: the sampler dispatch is async
            # (jit results are futures), so block k's PNG/sidecar/CSV
            # writes run WHILE block k+1 computes on the device. Not
            # used in trajectory mode — two in-flight trajectories
            # would double the capped HBM footprint.
            pipeline = not need_traj
            index = 0
            pending = None  # (out, seeds, blk)
            while ((index < len(items) or pending is not None)
                   and not self.stop_requested):
                if self.between_blocks_hook is not None:
                    try:
                        self.between_blocks_hook()
                    except Exception as exc:
                        self._log(f"between-blocks hook failed: {exc}",
                                  "warning")
                while index < len(items) and items[index][0] in dead:
                    index += 1
                nxt = None
                if index < len(items):
                    out, seeds, blk = dispatch_block(index)
                    if out is None:
                        # a model in the block is unavailable: probe each
                        # class individually and drop ONLY the failures —
                        # in a conditional mixed-class block one unknown
                        # class must not poison its block-mates (the loop
                        # re-attempts the block with the survivors; the
                        # reference semantics is per-class continue)
                        for cls in dict.fromkeys(c for c, _ in blk):
                            if (cls not in self.model_manager.loaded_params
                                    and not self.model_manager.load_model(cls)):
                                self._log(f"model unavailable for {cls}",
                                          "error")
                                dead.add(cls)
                        if not any(c in dead for c, _ in blk):
                            # every class loads individually yet the block
                            # failed — a sampling error, not a missing
                            # model; drop the block to avoid spinning
                            for cls in dict.fromkeys(c for c, _ in blk):
                                self._log(f"sampling failed for {cls}",
                                          "error")
                                dead.add(cls)
                    else:
                        nxt = (out, seeds, blk)
                        index += len(blk)
                if not pipeline and nxt is not None:
                    pending, nxt = nxt, None
                if pending is None:
                    pending = nxt
                    continue
                out, seeds, blk = pending
                pending = nxt
                # ONE device->host transfer for the whole block — a
                # per-image `images[idx]` fetch costs a device slice +
                # round-trip each (~100 ms/image through a tunneled
                # link, dominating the write loop)
                out = dict(out, images=np.asarray(out["images"]))
                for j, (class_name, _) in enumerate(blk):
                    if self.stop_requested:
                        break
                    class_counts[class_name] = class_counts.get(class_name, 0) + 1
                    isic_number = class_counts[class_name]
                    filename = self.path_manager.get_isic_filename(isic_number)
                    file_path = output_path / class_name / filename
                    # multi-image device blocks record their exact layout:
                    # XLA float tiling is batch-shape-dependent, so byte
                    # reproduction must rebuild the SAME block, not just the
                    # same seed (regenerate_block_image / cli --reproduce).
                    # Single-image blocks stay unannotated — their sidecars
                    # are unchanged and reproduce at batch 1 as before.
                    block_extra = None
                    if len(blk) > 1 or self.mesh is not None:
                        # a mesh-sharded block is additionally layout-
                        # dependent (per-device shard shapes change XLA's
                        # float tiling), so the device count joins the
                        # reproduce contract — even 1-image blocks
                        # pad+shard across the mesh
                        block_extra = {"block": {
                            "seeds": [int(s) for s in seeds],
                            "index": j,
                            **({"classes": [c for c, _ in blk]}
                               if mixed else {}),
                            **({"dp_mesh": int(self.mesh.devices.size)}
                               if self.mesh is not None else {}),
                        }}
                    self._write_image_artifacts(out, j, class_name,
                                                str(file_path), postprocess,
                                                int(seeds[j]),
                                                extra=block_extra)
                    append_synthetic_row(csv_path, {
                        "filename": filename,
                        "class": class_name,
                        "isic_number": isic_number,
                        "source": "synthetic",
                        "generated_at": str(file_path.stat().st_mtime),
                    })
                    generated += 1
                    # progress in denoise-step units (reference scale:
                    # total_images x inference_steps,
                    # image_generator.py:422-438)
                    self._progress(generated * self.inference_steps,
                                   total_images * self.inference_steps,
                                   f"generated {generated}/{total_images}")

                    if (self.xai_analyzer is not None and need_traj
                            and isic_number % self.xai_frequency == 0):
                        try:
                            self._log(f"integrated XAI for {class_name} "
                                      f"(image {isic_number})")
                            traj = np.asarray(out["trajectory"][:, j])
                            xai_results = self.xai_analyzer.analyze_trajectory(
                                trajectory=traj, class_name=class_name,
                                seed=int(seeds[j]),
                                inference_steps=self.inference_steps,
                                filename=filename, file_path=str(file_path))
                            if xai_results:
                                self._save_xai_results(xai_results, class_name,
                                                       filename, str(file_path))
                        except Exception as exc:
                            self._log(f"integrated XAI failed: {exc}", "warning")

            elapsed = time.time() - t_start
            result = {
                "generated": generated,
                "requested": total_images,
                "elapsed_seconds": round(elapsed, 2),
                "images_per_second": round(generated / elapsed, 3) if elapsed > 0 else 0,
                "stopped": self.stop_requested,
                "output_dir": str(output_path),
            }
            self._log(f"generation finished: {result}")
            return result
        except Exception as exc:
            self._log(f"generation error: {exc}", "error")
            return {"error": str(exc)}
        finally:
            self.is_generating = False

    def _save_xai_results(self, xai_results: Dict[str, Any], class_name: str,
                          filename: str, file_path: str) -> None:
        """`xai_results/<class>/xai_<stem>_<ts>.json`
        (reference `image_generator.py:866-886`)."""
        import json
        from datetime import datetime

        xai_dir = Path(file_path).parent.parent / "xai_results" / class_name
        xai_dir.mkdir(parents=True, exist_ok=True)
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        out = xai_dir / f"xai_{Path(filename).stem}_{stamp}.json"
        from .xai.pipeline import json_safe
        with open(out, "w", encoding="utf-8") as f:
            json.dump(json_safe(xai_results), f, indent=2, ensure_ascii=False,
                      default=str)
        self._log(f"XAI results saved: {out}")

    def generate_batch_images(self, class_name: str, output_dir: str,
                              count: int, batch_size: Optional[int] = None,
                              postprocess: bool = True) -> Dict[str, Any]:
        """Batch API carried forward from the reference's legacy generator
        shape (`diffusion/diffusion_generator.py:175-257` — dead code there,
        first-class here: one class, explicit device batch size)."""
        if batch_size is not None:
            old, self.batch_size = self.batch_size, max(1, int(batch_size))
            try:
                return self.generate_images([(class_name, count)], output_dir,
                                            postprocess)
            finally:
                self.batch_size = old
        return self.generate_images([(class_name, count)], output_dir, postprocess)

    # -- control ---------------------------------------------------------------------------
    def stop_generation(self) -> None:
        self.stop_requested = True
        self._log("stop requested")

    def get_generation_status(self) -> Dict[str, Any]:
        return {
            "is_generating": self.is_generating,
            "stop_requested": self.stop_requested,
            "loaded_models": list(self.model_manager.loaded_params.keys()),
            "device": str(self.model_manager.device),
        }

    def cleanup(self) -> None:
        self.stop_generation()
        self.model_manager.cleanup()
        if self.cache_manager:
            self.cache_manager.cleanup_temp_files()
        self._log("ImageGenerator cleaned up")
