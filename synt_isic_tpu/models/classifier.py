"""Lesion classifier adapter: diffusion-space images -> class scores.

Parity with the reference `MelanomaClassifierAdaptive` (`xai/XAI.py:357-471`):
  * preprocess: [-1,1] 128² -> clamp to [0,1] -> bilinear resize to 224² ->
    ImageNet normalization (`XAI.py:399-431`);
  * `get_probabilities` = softmax(logits), `get_per_class_score` =
    log(p_c + 1e-8) (`XAI.py:443-459`), `predict` = argmax, `get_confidence`;
  * checkpoint loading with shape-compatible partial state-dict merge and
    pretrained/random fallback (`XAI.py:479-558`), including the
    NUM_CLASSES+1 = 8-output quirk of the XAI path (`XAI.py:489-493`).

TPU-native: the whole preprocess+forward chain is one jitted pure function
of (params, batch) — XAI workloads (IG α-grids, SHAP mask batches,
Time-SHAP frame batches) vmap/batch straight through it instead of looping
single images on host like the reference.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.convert import torch_to_flax
from ..io.pth import load_pth
from .resnet18 import ResNet18, ResNet18Config, init_resnet_params

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)
CLASSIFIER_IMAGE_SIZE = 224
SCORE_EPS = 1e-8


def preprocess_for_classifier(x: jnp.ndarray,
                              size: int = CLASSIFIER_IMAGE_SIZE) -> jnp.ndarray:
    """(B,H,W,3) in [-1,1] -> (B,size,size,3) ImageNet-normalized."""
    x = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
    if x.shape[1] != size or x.shape[2] != size:
        x = jax.image.resize(x, (x.shape[0], size, size, x.shape[3]),
                             method="bilinear")
    mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 1, 1, 3)
    std = jnp.asarray(IMAGENET_STD).reshape(1, 1, 1, 3)
    return (x - mean) / std


class LesionClassifier:
    """Holds a ResNet18 + params and exposes the reference scoring API."""

    def __init__(self, params: Any, num_classes: int = 7, dtype: Any = jnp.float32):
        self.num_classes = num_classes
        self.model = ResNet18(config=ResNet18Config(num_classes=num_classes),
                              dtype=dtype)
        self.params = params
        self._logits = jax.jit(self._logits_impl)
        self._grad_score = jax.jit(jax.grad(self._score_sum, argnums=1),
                                   static_argnums=2)

    # -- constructors --------------------------------------------------------------
    @classmethod
    def random_init(cls, num_classes: int = 7, seed: int = 0,
                    dtype: Any = jnp.float32) -> "LesionClassifier":
        model = ResNet18(config=ResNet18Config(num_classes=num_classes), dtype=dtype)
        params = init_resnet_params(model, jax.random.PRNGKey(seed))
        return cls(params, num_classes=num_classes, dtype=dtype)

    @classmethod
    def from_checkpoint(cls, path: str, num_classes: int = 7,
                        dtype: Any = jnp.float32,
                        seed: int = 0) -> Tuple["LesionClassifier", Dict[str, int]]:
        """Shape-compatible partial load over a fresh init, mirroring
        `load_classifier_with_fallback` (`XAI.py:515-531`). Returns the
        classifier and {loaded, skipped} counts."""
        clf = cls.random_init(num_classes=num_classes, seed=seed, dtype=dtype)
        state = load_pth(path)
        if "model_state_dict" in state and isinstance(state["model_state_dict"], dict):
            state = state["model_state_dict"]
        tree = torch_to_flax(state)
        # the torch module nests the backbone under `model.` (stripped by
        # torch_to_flax's default prefixes), so tree now mirrors our layout
        loaded, skipped = _merge_compatible(clf.params, tree)
        clf.params = clf.params  # merged in place via _merge_compatible
        clf._logits = jax.jit(clf._logits_impl)
        return clf, {"loaded": loaded, "skipped": skipped}

    # -- core forwards --------------------------------------------------------------
    def _logits_impl(self, params, x):
        return self.model.apply({"params": params}, preprocess_for_classifier(x))

    def _score_sum(self, params, x, target_class: int):
        probs = jax.nn.softmax(self._logits_impl(params, x), axis=-1)
        return jnp.sum(jnp.log(probs[:, target_class] + SCORE_EPS))

    def logits(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._logits(self.params, self._ensure_batch(x))

    def get_probabilities(self, x: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.softmax(self.logits(x), axis=-1)

    def get_per_class_score(self, x: jnp.ndarray, target_class: int) -> jnp.ndarray:
        """y = log p(c|x) + eps-stabilized (`XAI.py:443-459`)."""
        probs = self.get_probabilities(x)
        return jnp.log(probs[:, target_class] + SCORE_EPS)

    def predict(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.argmax(self.logits(x), axis=-1)

    def get_confidence(self, x: jnp.ndarray, target_class: int) -> jnp.ndarray:
        return self.get_probabilities(x)[:, target_class]

    # -- functional views for XAI -----------------------------------------------------
    def score_fn(self, target_class: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
        """Pure per-image score function for grad-based attribution."""
        params = self.params

        def fn(x: jnp.ndarray) -> jnp.ndarray:
            probs = jax.nn.softmax(self._logits_impl(params, x), axis=-1)
            return jnp.log(probs[:, target_class] + SCORE_EPS)

        return fn

    def input_gradient(self, x: jnp.ndarray, target_class: int) -> jnp.ndarray:
        """d score / d input, summed over batch (per-sample grads since the
        score is a per-sample sum)."""
        return self._grad_score(self.params, self._ensure_batch(x), int(target_class))

    def gradcam_tensors(self, x: jnp.ndarray):
        """(logits, target-layer activation, block input) for Grad-CAM."""
        return self.model.apply({"params": self.params}, preprocess_for_classifier(
            self._ensure_batch(x)), method=self.model.features_and_logits)

    def logits_from_activation(self, act: jnp.ndarray, block_input: jnp.ndarray):
        return self.model.apply({"params": self.params}, act, block_input,
                                method=self.model.logits_from_activation)

    @staticmethod
    def _ensure_batch(x: jnp.ndarray) -> jnp.ndarray:
        return x[None] if x.ndim == 3 else x


def _merge_compatible(dst: Dict[str, Any], src: Dict[str, Any]) -> Tuple[int, int]:
    """Copy leaves from src into dst where path+shape match; count the rest."""
    loaded = skipped = 0

    def walk(d: Dict[str, Any], s: Dict[str, Any]) -> None:
        nonlocal loaded, skipped
        for key, sval in s.items():
            if key not in d:
                skipped += _count_leaves(sval)
                continue
            dval = d[key]
            if isinstance(sval, dict) and isinstance(dval, dict):
                walk(dval, sval)
            elif not isinstance(sval, dict) and not isinstance(dval, dict):
                if tuple(np.shape(sval)) == tuple(np.shape(dval)):
                    d[key] = jnp.asarray(sval, dtype=jnp.asarray(dval).dtype)
                    loaded += 1
                else:
                    skipped += 1
            else:
                skipped += _count_leaves(sval)

    def _count_leaves(x) -> int:
        if isinstance(x, dict):
            return sum(_count_leaves(v) for v in x.values())
        return 1

    walk(dst, src)
    return loaded, skipped
