"""Grad-CAM over the classifier's final conv layer — hook-free, via vjp.

Parity target: the reference's pytorch_grad_cam block
(`xai/XAI.py:2941-3170`) — CAM on `classifier.model.layer4[-1].conv2`
(`XAI.py:2947`), per-trajectory-frame CAMs, CAM at the Time-SHAP
most-important step, the mean CAM over all steps, and jet-overlay
rendering (`show_cam_on_image` equivalent in `overlay_cam_on_image`).

TPU-native design: torch hooks don't exist in JAX; instead the ResNet
exposes `features_and_logits` (activation surfaced as an output) and
`logits_from_activation` (tail re-run from a perturbed activation), so the
activation gradient is a plain `jax.grad` — jittable and vmappable over
whole frame batches (the reference loops frames one at a time).

GradCAM math (Selvaraju et al. 2017, as implemented by pytorch_grad_cam):
    w_c  = mean over spatial of dy/dA_c
    CAM  = relu(Σ_c w_c · A_c), then per-image min-max normalization,
    upscaled to the classifier input resolution (224²).
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.classifier import LesionClassifier


def compute_gradcam(classifier: LesionClassifier, images: jnp.ndarray,
                    target_class: int, output_size: int = 224,
                    mesh: Optional[Mesh] = None,
                    mesh_axis: str = "data") -> np.ndarray:
    """images: (B,H,W,C) in [-1,1] diffusion space. Returns (B, output_size,
    output_size) CAMs normalized to [0,1].

    With a mesh the frame batch shards over `mesh_axis` (params replicated,
    zero collectives — each CAM is per-image: own vjp, own min-max
    normalization). The reference computes them one frame at a time with
    pytorch_grad_cam hooks (`xai/XAI.py:2941-3170`)."""
    if images.ndim == 3:
        images = images[None]
    if mesh is not None:
        shards = mesh.shape[mesh_axis]
        b = images.shape[0]
        pad = (-b) % shards
        if pad:
            images = jnp.concatenate(
                [images, jnp.repeat(images[-1:], pad, axis=0)])
        fn = _get_jitted(classifier, int(target_class), images.shape,
                         output_size, mesh, mesh_axis)
        placed = jax.device_put(images, NamedSharding(mesh, P(mesh_axis)))
        return np.asarray(fn(classifier.params, placed))[:b]
    fn = _get_jitted(classifier, int(target_class), images.shape, output_size)
    return np.asarray(fn(classifier.params, images))


# bounded LRU of compiled CAM kernels: a long-lived serve/GUI process
# running XAI on trajectories of varying frame counts would otherwise
# accumulate one executable per (model, shape, target) combination forever
_CACHE: "OrderedDict" = OrderedDict()
_CACHE_MAX = 16


def _get_jitted(classifier: LesionClassifier, target_class: int, shape,
                output_size: int, mesh: Optional[Mesh] = None,
                mesh_axis: str = "data"):
    key = (id(classifier.model), target_class, tuple(shape), output_size,
           id(mesh) if mesh is not None else None, mesh_axis)
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]

    from ..models.classifier import preprocess_for_classifier

    # capture the module DEFINITION only — closing over `classifier` would
    # pin its params (the weights are passed as a call argument instead)
    model = classifier.model

    def cam_fn(params, images):
        x = preprocess_for_classifier(images)
        logits, act, block_input = model.apply(
            {"params": params}, x, method=model.features_and_logits)

        def target_score(a):
            out = model.apply(
                {"params": params}, a, block_input,
                method=model.logits_from_activation)
            return jnp.sum(out[:, target_class])

        grads = jax.grad(target_score)(act)              # (B, h, w, C)
        weights = jnp.mean(grads, axis=(1, 2))           # (B, C)
        cam = jnp.maximum(jnp.einsum("bhwc,bc->bhw", act, weights), 0.0)
        # per-image min-max normalization (pytorch_grad_cam's scale step)
        lo = jnp.min(cam, axis=(1, 2), keepdims=True)
        hi = jnp.max(cam, axis=(1, 2), keepdims=True)
        cam = (cam - lo) / (hi - lo + 1e-7)
        cam = jax.image.resize(cam, (cam.shape[0], output_size, output_size),
                               method="bilinear")
        return jnp.clip(cam, 0.0, 1.0)

    if mesh is not None:
        fn = jax.jit(jax.shard_map(cam_fn, mesh=mesh,
                                   in_specs=(P(), P(mesh_axis)),
                                   out_specs=P(mesh_axis)))
    else:
        fn = jax.jit(cam_fn)
    _CACHE[key] = fn
    if len(_CACHE) > _CACHE_MAX:
        _CACHE.popitem(last=False)
    return fn


def overlay_cam_on_image(rgb01: np.ndarray, cam: np.ndarray,
                         alpha: float = 0.5) -> np.ndarray:
    """`show_cam_on_image` equivalent: jet-colormapped CAM blended onto the
    RGB image. rgb01: (H,W,3) floats in [0,1]; cam: (H,W) in [0,1].
    Returns uint8 (H,W,3)."""
    import matplotlib.cm as mpl_cm

    heat = mpl_cm.jet(np.clip(cam, 0, 1))[..., :3]
    blended = alpha * heat + (1 - alpha) * np.clip(rgb01, 0, 1)
    blended = blended / max(blended.max(), 1e-7)
    return (blended * 255).astype(np.uint8)
