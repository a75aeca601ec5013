"""Lesion-classifier training: ResNet18 with trainable BatchNorm.

The reference consumes a torch-trained `classifier.pth` and ships no
training code for it (`xai/XAI.py:479-558` only loads). This module makes
the framework self-sufficient: a trainable ResNet18 (flax BatchNorm with
running statistics), a cross-entropy optax loop over the ISIC ground-truth
CSV, and export to BOTH our frozen-inference parameter layout
(`models/resnet18.ResNet18`) and the torch `.pth` format the reference
loads.

TPU-native: one jitted train step (donated state), bf16 compute on the
conv path with fp32 BatchNorm statistics and logits.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..io.convert import flax_to_torch
from ..io.pth import save_pth


class TrainBasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=jnp.float32, name=name)
        identity = x
        out = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(norm("bn1")(out))
        out = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = norm("bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_0")(x)
            identity = norm("downsample_1")(identity)
        return nn.relu(out + identity.astype(out.dtype))


class ResNet18Trainable(nn.Module):
    """Same topology/param layout as `models/resnet18.ResNet18`, but with
    live BatchNorm (params: scale/bias; batch_stats: mean/var)."""
    num_classes: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        stage_feats = (64, 128, 256, 512)
        for stage, feats in enumerate(stage_feats, start=1):
            for i in range(2):
                strides = 2 if (stage > 1 and i == 0) else 1
                x = TrainBasicBlock(feats, strides=strides,
                                    downsample=stage > 1 and i == 0,
                                    dtype=self.dtype,
                                    name=f"layer{stage}_{i}")(x, train)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)


class ClassifierTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ClassifierTrainConfig:
    num_classes: int = 7
    image_size: int = 224
    batch_size: int = 16
    learning_rate: float = 1e-4
    epochs: int = 20
    bf16_compute: bool = True
    seed: int = 0


def create_classifier_train_state(config: ClassifierTrainConfig
                                  ) -> Tuple[ResNet18Trainable,
                                             ClassifierTrainState,
                                             optax.GradientTransformation]:
    model = ResNet18Trainable(
        num_classes=config.num_classes,
        dtype=jnp.bfloat16 if config.bf16_compute else jnp.float32)
    variables = model.init(jax.random.PRNGKey(config.seed),
                           jnp.zeros((1, config.image_size, config.image_size, 3)),
                           train=False)
    tx = optax.adam(config.learning_rate)
    state = ClassifierTrainState(params=variables["params"],
                                 batch_stats=variables["batch_stats"],
                                 opt_state=tx.init(variables["params"]),
                                 step=jnp.zeros((), jnp.int32))
    return model, state, tx


def make_classifier_train_step(model: ResNet18Trainable,
                               tx: optax.GradientTransformation):
    def loss_fn(params, batch_stats, images, labels):
        logits, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=True,
            mutable=["batch_stats"])
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
        return loss, (updates["batch_stats"], acc)

    def step(state: ClassifierTrainState, images, labels):
        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   images, labels)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return ClassifierTrainState(new_params, new_stats, new_opt,
                                    state.step + 1), loss, acc

    return jax.jit(step, donate_argnums=(0,))


def to_inference_tree(state: ClassifierTrainState) -> Dict[str, Any]:
    """(params, batch_stats) -> the frozen-BN tree `models/resnet18.ResNet18`
    consumes (mean/var as plain params next to scale/bias)."""
    import copy

    tree = copy.deepcopy(jax.tree_util.tree_map(np.asarray, state.params))

    def merge(dst: Dict[str, Any], stats: Dict[str, Any]) -> None:
        for key, val in stats.items():
            if isinstance(val, dict):
                merge(dst.setdefault(key, {}), val)
            else:
                dst[key] = np.asarray(val)

    merge(tree, state.batch_stats)
    return tree


def export_classifier_pth(state: ClassifierTrainState, path: str) -> None:
    """Write `classifier.pth` in torchvision-style layout (what the
    reference's partial loader expects, `XAI.py:515-531`)."""
    flat = flax_to_torch(to_inference_tree(state))
    save_pth(flat, path)


def train_classifier(dataset_iter_fn, config: ClassifierTrainConfig,
                     checkpoint_path: str = "checkpoints/classifier.pth",
                     log=print) -> Dict[str, Any]:
    """dataset_iter_fn(epoch) must yield (images_nhwc_[-1,1]-or-norm, labels)
    batches; images are expected already preprocessed to classifier space."""
    from .async_ckpt import AsyncCheckpointer

    model, state, tx = create_classifier_train_state(config)
    step_fn = make_classifier_train_step(model, tx)
    best_acc = 0.0
    history = []
    # best-checkpoint writes ride the async writer (train/async_ckpt.py):
    # a ~45 MB ResNet18 pull per improving epoch would otherwise stall the
    # loop at link speed on a tunneled device; only the newest queued best
    # matters (coalesce key)
    async_writer = AsyncCheckpointer(log=log)
    _loop_ok = False
    try:
        for epoch in range(1, config.epochs + 1):
            losses, accs = [], []
            for images, labels in dataset_iter_fn(epoch):
                state, loss, acc = step_fn(state, jnp.asarray(images),
                                           jnp.asarray(labels))
                # keep DEVICE values — a float() here syncs every step (one
                # tunnel round-trip per step); materialize once per epoch
                losses.append(loss)
                accs.append(acc)
            # ONE device->host transfer per epoch (a float() per element
            # is a blocking round-trip per step on a tunneled link)
            epoch_loss = (float(np.mean(jax.device_get(jnp.stack(losses))))
                          if losses else float("nan"))
            epoch_acc = (float(np.mean(jax.device_get(jnp.stack(accs))))
                         if accs else 0.0)
            history.append({"loss": epoch_loss, "acc": epoch_acc})
            log(f"[clf] epoch {epoch}/{config.epochs} loss={epoch_loss:.4f} "
                f"acc={epoch_acc:.3f}")
            if epoch_acc >= best_acc:
                best_acc = epoch_acc
                Path(checkpoint_path).parent.mkdir(parents=True, exist_ok=True)
                async_writer.submit(state, export_classifier_pth,
                                    checkpoint_path, coalesce="best")
        _loop_ok = True
    finally:
        # flush queued writes; don't mask a training error with a writer
        # one (local flag, not sys.exc_info() — see train_ddpm.train_class)
        try:
            async_writer.close()
        except Exception:
            if _loop_ok:
                raise
    return {"best_acc": best_acc, "history": history,
            "checkpoint": checkpoint_path, "state": state}
