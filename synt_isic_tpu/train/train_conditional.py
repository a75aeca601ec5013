"""Class-conditional DDPM training: ONE model for every ISIC class.

The reference trains seven separate per-class UNets and the app swaps
101 MB checkpoints between classes (`diffusion/train_diffusion.py:201-266`,
`core/generator/model_manager.py:89-171`). This trainer is the TPU-first
alternative: a single UNet2D with a class-embedding table
(`models/unet2d.py`, diffusers `num_class_embeds` semantics) trained on the
mixed-class stream with classifier-free-guidance label dropout (Ho &
Salimans 2022). One resident parameter set then serves every class — no
per-class HBM swaps in the serve daemon, mixed-class device batches, and a
CFG quality knob at sampling time (`SamplerConfig.guidance_scale`).

Reuses the whole `train_class` machinery (epoch-scan dispatch, EMA,
deterministic eval best-selection, async torch-format checkpointing,
dp-mesh support): labeled batches ride through it as (images, labels)
tuples. Artifacts:
  * `unet_conditional_best.pth` — torch-format state dict (includes
    `class_embedding.weight`); loads through ModelManager(conditional=True)
    and through diffusers `UNet2DModel(num_class_embeds=N)` alike;
  * `unet_conditional_best.json` — the class list / embedding-table
    metadata the ModelManager needs to map class names to embedding rows;
  * per-class color statistics for the generator's postprocessing stage.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..models.unet2d import UNet2D, UNet2DConfig
from .data import augment_image
from .train_ddpm import TrainConfig, dataset_color_statistics, train_class


class LabeledMixtureDataset:
    """Mixes per-class datasets into one labeled stream.

    Accepts the same per-class dataset protocols `train_class` does:
    materialized sets exposing `.images` ((N,H,W,C) in [-1,1],
    ProceduralDataset) are pooled directly; lazy sets exposing
    `load_raw(i)` ([0,1], SingleClassDataset) are loaded + augmented
    per image with per-image rng streams (order-independent randomness,
    same discipline as SingleClassDataset.batches).

    Labels are indices into `class_names` (insertion order of the input
    dict) — the embedding-row mapping recorded in the checkpoint metadata.
    `epoch_batches` (the one-dispatch-per-epoch scan path) is bound only
    when every class is materialized.
    """

    def __init__(self, class_datasets: Dict[str, Any], image_size: int = 128):
        if not class_datasets:
            raise ValueError("no class datasets given")
        self.class_names = list(class_datasets)
        self.datasets = class_datasets
        self.image_size = image_size
        pools = [getattr(class_datasets[c], "images", None)
                 for c in self.class_names]
        self._materialized = all(p is not None for p in pools)
        if self._materialized:
            self.images = np.concatenate([np.asarray(p) for p in pools])
            self.labels = np.concatenate(
                [np.full(len(p), ci, np.int32) for ci, p in enumerate(pools)])
            # device-resident inputs (ProceduralDataset(device=True)) keep
            # their pool on device so epoch gathers upload only indices —
            # pool the DEVICE copies too, or the mixture's epoch_batches
            # would re-upload the full epoch every epoch (fatal on a
            # tunneled accelerator: ~144 MB/epoch at 3x256 128² images)
            dev_pools = [getattr(class_datasets[c], "_device_images", None)
                         for c in self.class_names]
            self._device_images = None
            if all(p is not None for p in dev_pools):
                self._device_images = jnp.concatenate(dev_pools)
            # train_class detects the epoch-scan fast path via hasattr —
            # bind it only when the whole mixture is materialized
            self.epoch_batches = self._epoch_batches
        else:
            self._index = [(ci, ii) for ci, c in enumerate(self.class_names)
                           for ii in range(len(class_datasets[c]))]

    def __len__(self) -> int:
        return (len(self.images) if self._materialized else len(self._index))

    def batches(self, batch_size: int, rng: np.random.Generator):
        """Yields (images (B,H,W,C) [-1,1] float32, labels (B,) int32)."""
        order = rng.permutation(len(self))
        if self._materialized:
            pool = (self._device_images if self._device_images is not None
                    else self.images)
            for start in range(0, len(order) - batch_size + 1, batch_size):
                idx = order[start:start + batch_size]
                yield pool[idx], self.labels[idx]
            return
        img_seeds = rng.integers(0, np.iinfo(np.int64).max, size=len(order))
        for start in range(0, len(order) - batch_size + 1, batch_size):
            imgs, labels = [], []
            for k in range(start, start + batch_size):
                ci, ii = self._index[int(order[k])]
                ds = self.datasets[self.class_names[ci]]
                img_rng = np.random.default_rng(int(img_seeds[k]))
                imgs.append(augment_image(ds.load_raw(ii), img_rng,
                                          self.image_size))
                labels.append(ci)
            yield np.stack(imgs), np.asarray(labels, np.int32)

    def _epoch_batches(self, batch_size: int, rng: np.random.Generator):
        """Whole epoch stacked ((S,B,H,W,C), (S,B)) for the scan path;
        draws the SAME permutation as `batches`. Device-resident pools
        gather on device (index upload only)."""
        order = rng.permutation(len(self))
        s = len(order) // batch_size
        idx = order[: s * batch_size].reshape(s, batch_size)
        pool = (self._device_images if self._device_images is not None
                else self.images)
        return pool[idx], self.labels[idx]


def conditional_metadata_path(checkpoint_dir: str, variant: str = "best") -> Path:
    return Path(checkpoint_dir) / f"unet_conditional_{variant}.json"


def write_conditional_metadata(checkpoint_dir: str, class_names,
                               cond_dropout: float,
                               variant: str = "best") -> Path:
    """The class-id mapping ModelManager(conditional=True) reads — written
    BEFORE training starts so a crashed run never leaves an unloadable
    checkpoint behind."""
    n_embed = len(class_names) + 1
    path = conditional_metadata_path(checkpoint_dir, variant)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps({
        "classes": list(class_names),
        "num_class_embeds": n_embed,
        "null_label": n_embed - 1,
        "cond_dropout": cond_dropout,
    }, indent=2), encoding="utf-8")
    return path


def train_conditional(class_datasets: Dict[str, Any], checkpoint_dir: str,
                      config: TrainConfig = TrainConfig(),
                      model: Optional[UNet2D] = None,
                      resume: bool = False, mesh=None,
                      log=print) -> Dict[str, Any]:
    """Train the single conditional model on the mixed-class stream.

    `class_datasets`: {class_name: dataset} — insertion order defines the
    embedding-row ids (recorded in the metadata JSON). Returns the
    `train_class` result dict plus the class list."""
    classes = list(class_datasets)
    n_embed = len(classes) + 1  # + the CFG null row
    from .train_ddpm import default_fused_flags

    fused = default_fused_flags()
    model = model or UNet2D(
        config=UNet2DConfig(sample_size=config.image_size,
                            num_class_embeds=n_embed),
        dtype=jnp.bfloat16 if config.bf16_compute else jnp.float32,
        use_fused_attention=fused, fast_norm=fused)
    if int(model.config.num_class_embeds or 0) != n_embed:
        raise ValueError(
            f"model.num_class_embeds={model.config.num_class_embeds} does not "
            f"fit {len(classes)} classes + 1 null row")
    write_conditional_metadata(checkpoint_dir, classes, config.cond_dropout)

    mixture = LabeledMixtureDataset(class_datasets, image_size=config.image_size)
    result = train_class("conditional", mixture, checkpoint_dir, config,
                         model=model, resume=resume, mesh=mesh, log=log)

    # per-class color statistics for the generator's postprocessing stage
    # (the mixture's own stats land under 'conditional'; the generator looks
    # classes up by NAME, so write each class's real statistics too)
    from ..io.color_stats import update_color_statistics_file

    for cls, ds in class_datasets.items():
        stats = dataset_color_statistics(ds)
        if stats is not None:
            update_color_statistics_file(
                Path(checkpoint_dir) / "color_statistics.json", cls, stats)
    return {**result, "classes": classes, "num_class_embeds": n_embed}
