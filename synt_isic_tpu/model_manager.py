"""Model registry: per-class UNet checkpoints -> device parameter pytrees.

Parity with reference `ModelManager` (`core/generator/model_manager.py`):
`get_available_classes` (glob `unet_*_best.pth`, :39), cache-first
`load_model` (:89-171), scheduler/sampler creation with the training
config (:196-226), `unload_model`/`unload_all_models` (:228-273),
`validate_model` (:275-303), `get_loaded_models_info` with parameter
counts (:305-317), `change_device` (:319-345), `cleanup` (:347).

TPU-native: a "loaded model" is an immutable params pytree placed on the
target JAX device plus one shared UNet2D module definition — no stateful
nn.Module, no eval()/device drift to validate away (validation checks
device placement of the arrays and architecture-shape consistency
instead). Conversion (zip-pickle parse + OIHW->HWIO transposes) happens
once per checkpoint content hash; the converted arrays are cached as .npz
by `CacheManager` and memory-mapped on later loads.
"""
from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cache import CacheManager
from .diffusion import DiffusionSchedule, DiffusionSampler, SamplerConfig
from .io.convert import torch_to_flax
from .io.manifest import expected_unet2d_state_shapes, validate_state_dict
from .io.pth import load_pth, unwrap_state_dict
from .models.unet2d import UNet2D, UNet2DConfig
from .utils.logging import Logger
from .utils.paths import PathManager


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


class ModelManager:
    def __init__(self, checkpoints_dir: Optional[str] = None,
                 cache_manager: Optional[CacheManager] = None,
                 logger: Optional[Logger] = None,
                 device: Optional[jax.Device] = None,
                 model_config: Optional[UNet2DConfig] = None,
                 dtype: Any = jnp.float32,
                 variant: str = "best",
                 conditional: bool = False):
        self.path_manager = PathManager()
        self.checkpoints_dir = Path(checkpoints_dir) if checkpoints_dir \
            else self.path_manager.get_checkpoints_dir()
        # checkpoint variant: 'best' = reference naming (unet_<CLASS>_best.pth,
        # `model_manager.py:103`); progressive distillation writes additional
        # same-architecture variants (unet_<CLASS>_distill<N>.pth,
        # train/distill.py) selectable here — recorded in sidecars so
        # --reproduce rebuilds with the same weights
        self.variant = variant
        self.cache = cache_manager
        self.logger = logger or Logger("model_manager")
        self.device = device or jax.devices()[0]
        self.dtype = dtype  # compute dtype; recorded in sidecars (reproduce)
        # Conditional mode: ONE class-conditional checkpoint
        # (unet_conditional_<variant>.pth + .json metadata listing its
        # classes, written by train/train_conditional.py) serves every
        # class — one resident parameter set instead of the reference's
        # per-class 101 MB files (`core/generator/model_manager.py:89-171`).
        # load_model(<class>) aliases the shared pytree under each class
        # key, so the generator/serve surfaces work unchanged.
        self.conditional = bool(conditional)
        self._cond_classes: List[str] = []
        if self.conditional:
            meta = self._read_conditional_metadata()
            self._cond_classes = list(meta["classes"])
            model_config = dataclasses.replace(
                model_config or UNet2DConfig(),
                num_class_embeds=int(meta.get("num_class_embeds",
                                              len(self._cond_classes) + 1)))
        self.model = UNet2D(config=model_config or UNet2DConfig(), dtype=dtype)
        # sampling variant: Pallas fused attention + fast GroupNorm (f32
        # stats, bf16 arithmetic) on TPU — identical param tree, bf16-level
        # output deviation only (ops/norms.py); fast_norm engages only for
        # sub-f32 compute dtypes
        on_tpu = self.device.platform == "tpu"
        # fused-attention tuning (ops/pallas/attention.py knobs):
        # heads-per-program grouping is bit-identical math; fast_math (bf16
        # exponentials) CHANGES output bytes and is therefore recorded in
        # sidecars when enabled (see generator._write_image_artifacts)
        self.attention_heads_per_program = 1
        self.attention_fast_math = False
        self.sample_model = UNet2D(config=self.model.config, dtype=dtype,
                                   use_fused_attention=on_tpu,
                                   fast_norm=on_tpu and dtype != jnp.float32)
        self.schedule = DiffusionSchedule.create()
        self.loaded_params: Dict[str, Any] = {}
        self.model_metadata: Dict[str, Dict[str, Any]] = {}
        self._samplers: Dict[int, DiffusionSampler] = {}

    # -- conditional-mode helpers ---------------------------------------------------
    def _conditional_checkpoint_path(self) -> Path:
        return self.checkpoints_dir / f"unet_conditional_{self.variant}.pth"

    def _read_conditional_metadata(self) -> Dict[str, Any]:
        """The class list / embedding-table size of the conditional
        checkpoint, from its sidecar JSON (written next to the .pth by the
        conditional trainer). Fails loudly — without it class ids are
        meaningless."""
        import json

        meta_path = self._conditional_checkpoint_path().with_suffix(".json")
        if not meta_path.exists():
            raise FileNotFoundError(
                f"conditional checkpoint metadata not found: {meta_path} "
                "(train/train_conditional.py writes it next to the .pth)")
        with open(meta_path, "r", encoding="utf-8") as f:
            meta = json.load(f)
        if not meta.get("classes"):
            raise ValueError(f"no classes listed in {meta_path}")
        return meta

    def class_id(self, class_name: str) -> int:
        """Embedding row for a class (conditional mode)."""
        return self._cond_classes.index(class_name)

    @property
    def null_label(self) -> int:
        """The unconditional/CFG-dropout embedding row (last index)."""
        return int(self.model.config.num_class_embeds) - 1

    # -- discovery ----------------------------------------------------------------
    def get_available_classes(self) -> List[str]:
        if self.conditional:
            return list(self._cond_classes)
        return self.path_manager.get_available_classes(str(self.checkpoints_dir))

    def checkpoint_path(self, class_name: str) -> Path:
        if self.conditional:
            return self._conditional_checkpoint_path()
        return self.checkpoints_dir / f"unet_{class_name}_{self.variant}.pth"

    def available_variants(self, class_name: str) -> List[str]:
        """Checkpoint variants present for a class ('best' plus any
        distilled students etc.), by filename convention."""
        prefix = f"unet_{class_name}_"
        return sorted(p.stem[len(prefix):]
                      for p in self.checkpoints_dir.glob(f"{prefix}*.pth"))

    # -- load / unload ---------------------------------------------------------------
    def load_model(self, class_name: str,
                   checkpoint_path: Optional[str] = None) -> bool:
        if class_name in self.loaded_params:
            return True
        if self.conditional:
            if class_name not in self._cond_classes:
                self.logger.log_error(
                    f"class {class_name} not in the conditional checkpoint's "
                    f"classes {self._cond_classes}")
                return False
            # the shared pytree may already be resident under another class
            # key — alias it (same device arrays, zero extra HBM)
            for other in list(self.loaded_params):
                self.loaded_params[class_name] = self.loaded_params[other]
                self.model_metadata[class_name] = dict(self.model_metadata[other])
                return True
        path = Path(checkpoint_path) if checkpoint_path else self.checkpoint_path(class_name)
        if not path.exists():
            self.logger.log_error(f"checkpoint not found for {class_name}: {path}")
            return False
        # one conversion cache entry for the shared conditional checkpoint
        cache_key = "conditional" if self.conditional else class_name
        try:
            t0 = time.time()
            tree = None
            if self.cache is not None:
                flat = self.cache.get_converted(cache_key, str(path))
                if flat is not None:
                    tree = _unflatten(flat)
            if tree is None:
                state = unwrap_state_dict(load_pth(str(path)))
                # full key/shape validation against the diffusers manifest —
                # a checkpoint that doesn't match the architecture must fail
                # loudly here, never sample garbage silently
                manifest = expected_unet2d_state_shapes(
                    **dataclasses.asdict(self.model.config))
                problems = validate_state_dict(state, manifest)
                if problems:
                    preview = "; ".join(problems[:8])
                    more = f" (+{len(problems) - 8} more)" if len(problems) > 8 else ""
                    raise ValueError(
                        f"checkpoint does not match the UNet2D architecture: "
                        f"{preview}{more}")
                tree = torch_to_flax(state)
                if self.cache is not None:
                    self.cache.cache_model(cache_key, str(path))
                    self.cache.cache_converted(cache_key, str(path), _flatten(tree))
            params = jax.device_put(
                jax.tree_util.tree_map(jnp.asarray, tree), self.device)
            self.loaded_params[class_name] = params
            self.model_metadata[class_name] = {
                "model_path": str(path),
                "loaded_at": time.time(),
                "device": str(self.device),
                "load_seconds": round(time.time() - t0, 3),
            }
            self.logger.log_info(f"model loaded for class {class_name} "
                                 f"({self.model_metadata[class_name]['load_seconds']}s)")
            return True
        except Exception as exc:
            self.logger.log_error(f"failed to load model for {class_name}: {exc}")
            return False

    def unload_model(self, class_name: str) -> bool:
        if class_name not in self.loaded_params:
            return False
        del self.loaded_params[class_name]
        self.model_metadata.pop(class_name, None)
        self.logger.log_info(f"model unloaded for class {class_name}")
        return True

    def unload_all_models(self) -> bool:
        for cls in list(self.loaded_params):
            self.unload_model(cls)
        return True

    # -- samplers -------------------------------------------------------------------------
    def create_sampler(self, inference_steps: int = 50,
                       scheduler: str = "ddpm", ddim_eta: float = 0.0,
                       dtype: Any = jnp.float32,
                       timestep_spacing: str = "leading",
                       guidance_scale: float = 0.0,
                       guidance_table=None) -> DiffusionSampler:
        """Sampler with the training schedule (T=1000, squaredcos_cap_v2,
        epsilon) and clamped inference steps (reference
        `model_manager.py:196-209`). Cached per step count.

        In conditional mode the sampler takes per-image `class_labels` and
        `guidance_scale > 1` enables classifier-free guidance against the
        checkpoint's null embedding row; `guidance_table` (tuple indexed by
        class id) instead gives every class its OWN weight — the per-class
        serving defaults scripts/e2e_conditional.py measures."""
        steps = max(1, min(1000, int(inference_steps)))
        table = (tuple(float(g) for g in guidance_table)
                 if (guidance_table is not None and self.conditional) else None)
        key = (steps, scheduler, ddim_eta, str(dtype), timestep_spacing,
               float(guidance_scale) if self.conditional else 0.0, table)
        if key not in self._samplers:
            cfg = SamplerConfig(num_inference_steps=steps, scheduler=scheduler,
                                ddim_eta=ddim_eta,
                                timestep_spacing=timestep_spacing,
                                image_size=self.model.config.sample_size,
                                channels=self.model.config.in_channels,
                                dtype=dtype,
                                guidance_scale=(float(guidance_scale)
                                                if self.conditional else 0.0),
                                guidance_table=table)
            if self.conditional:
                apply_fn = lambda params, x, t, y: self.sample_model.apply(
                    {"params": params}, x, t, y)
                self._samplers[key] = DiffusionSampler(
                    apply_fn, self.schedule, cfg, conditional=True,
                    null_label=self.null_label)
            else:
                apply_fn = lambda params, x, t: self.sample_model.apply(
                    {"params": params}, x, t)
                self._samplers[key] = DiffusionSampler(apply_fn, self.schedule, cfg)
        return self._samplers[key]

    def set_attention_tuning(self, heads_per_program: Optional[int] = None,
                             fast_math: Optional[bool] = None) -> None:
        """Rebuild the sampling model with fused-attention tuning knobs.

        `heads_per_program` groups G heads per Pallas grid program —
        bit-identical math, amortizes grid/DMA overhead. `fast_math` runs
        the softmax exponentials in bf16 — output changes at bf16 level, so
        it is recorded in sidecars and honored by `--reproduce`. Clears the
        sampler cache: cached executables traced the previous model."""
        if heads_per_program is not None:
            self.attention_heads_per_program = int(heads_per_program)
        if fast_math is not None:
            self.attention_fast_math = bool(fast_math)
        on_tpu = self.device.platform == "tpu"
        self.sample_model = UNet2D(
            config=self.model.config, dtype=self.dtype,
            use_fused_attention=on_tpu,
            fused_heads_per_program=self.attention_heads_per_program,
            fused_fast_math=self.attention_fast_math,
            fast_norm=on_tpu and self.dtype != jnp.float32)
        self._samplers.clear()

    # -- validation / info ------------------------------------------------------------------
    def validate_model(self, class_name: str) -> bool:
        if class_name not in self.loaded_params:
            self.logger.log_warning(f"model for {class_name} not loaded")
            return False
        params = self.loaded_params[class_name]
        leaves = jax.tree_util.tree_leaves(params)
        if not leaves:
            return False
        devices = {list(leaf.devices())[0] for leaf in leaves}
        if devices != {self.device}:
            self.logger.log_warning(
                f"model {class_name} on wrong device(s): {devices} != {self.device}")
            return False
        # architecture consistency: conv_in kernel must match config
        try:
            kern = params["conv_in"]["kernel"]
            cfg = self.model.config
            if kern.shape != (3, 3, cfg.in_channels, cfg.block_out_channels[0]):
                return False
        except (KeyError, TypeError):
            return False
        return True

    def get_loaded_models_info(self) -> Dict[str, Dict[str, Any]]:
        info = {}
        for cls, params in self.loaded_params.items():
            n_params = sum(int(np.prod(l.shape))
                           for l in jax.tree_util.tree_leaves(params))
            info[cls] = {
                "parameters": n_params,
                "parameters_millions": round(n_params / 1e6, 2),
                **self.model_metadata.get(cls, {}),
            }
        return info

    def change_device(self, device: jax.Device) -> bool:
        """Move all loaded params to another device (reference
        `model_manager.py:319-345`)."""
        try:
            self.device = device
            for cls in list(self.loaded_params):
                self.loaded_params[cls] = jax.device_put(self.loaded_params[cls],
                                                         device)
                self.model_metadata[cls]["device"] = str(device)
            return True
        except Exception as exc:
            self.logger.log_error(f"change_device failed: {exc}")
            return False

    def cleanup(self) -> None:
        self.unload_all_models()
        self._samplers.clear()
