"""Counterfactual interventions: x̃ = x·(1−M) + intervention·M.

Parity with reference `counterfactual_intervention_advanced`
(`xai/XAI.py:1454-1597`): the 7 intervention types (noise, gaussian_noise
with adaptive std, zero, mean, blur via stride-1 average pooling, inpaint
via a 5×5 mean convolution, in-mask pixel shuffle), blending with the mask,
clamp to [-1,1], and the same statistics dict.

TPU-native: all interventions are pure jnp ops on NHWC batches; the shuffle
uses a sort-based permutation (masked pixels ordered by random keys, values
gathered back through the inverse order) so it stays shape-static and
jittable instead of the reference's per-channel Python loop.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

INTERVENTION_TYPES = ["noise", "gaussian_noise", "zero", "mean", "blur",
                      "inpaint", "shuffle"]

NOISE_STD = 0.5
BLUR_KERNEL_SIZE = 5


def _avg_pool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """stride-1 zero-padded average (count_include_pad=True, matching
    torch's `F.avg_pool2d(..., padding=k//2)` in the reference blur)."""
    pad = k // 2
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1),
                                   (1, 1, 1, 1),
                                   [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return summed / (k * k)


def _shuffle_in_mask(x: jnp.ndarray, mask: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Permute pixel values within the mask, independently per image+channel.

    Shape-static trick: sort pixels by (unmasked-last, random); permute the
    masked prefix by a second random order; scatter back.
    """
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    m = mask.reshape(1, h * w, 1) if mask.ndim == 2 else mask.reshape(b, h * w, c)
    m = jnp.broadcast_to(m, flat.shape)

    def per_slice(values, mask_col, k):
        r1 = jax.random.uniform(k, values.shape)
        # masked pixels get keys in [0,1), unmasked get 2 — masked sort first
        order = jnp.argsort(jnp.where(mask_col, r1, 2.0))
        gathered = values[order]
        # rotate the gathered sequence; for the masked prefix this is a
        # derangement-ish permutation, unmasked suffix unchanged positions
        n_masked = jnp.sum(mask_col)
        idx = jnp.arange(values.shape[0])
        rotated_idx = jnp.where(idx < n_masked, (idx + 1) % jnp.maximum(n_masked, 1), idx)
        shuffled = gathered[rotated_idx]
        out = jnp.zeros_like(values).at[order].set(shuffled)
        return jnp.where(mask_col, out, values)

    keys = jax.random.split(key, b * c).reshape(b, c, 2)
    out = jax.vmap(lambda vb, mb, kb: jax.vmap(per_slice, in_axes=(1, 1, 0), out_axes=1)(
        vb, mb, kb))(flat, m, keys)
    return out.reshape(b, h, w, c)


def counterfactual_intervention_advanced(image: jnp.ndarray, mask,
                                         intervention_type: str = "noise",
                                         key: Optional[jax.Array] = None,
                                         **kwargs) -> Dict[str, Any]:
    """image: (B,H,W,C) in [-1,1]; mask: (H,W) bool/float or broadcastable."""
    noise_std = kwargs.get("noise_std", NOISE_STD)
    blur_kernel = kwargs.get("blur_kernel", BLUR_KERNEL_SIZE)
    if key is None:
        key = jax.random.PRNGKey(0)
    if image.ndim == 3:
        image = image[None]

    mask_t = jnp.asarray(np.asarray(mask), dtype=image.dtype)
    while mask_t.ndim < image.ndim:
        mask_t = mask_t[None] if mask_t.ndim != 2 else mask_t[..., None]
    if mask_t.ndim == 3:  # (H, W, 1)
        mask_t = mask_t[None]
    mask_t = jnp.broadcast_to(mask_t, image.shape)

    if intervention_type == "noise":
        intervention = jax.random.normal(key, image.shape, image.dtype) * noise_std
    elif intervention_type == "gaussian_noise":
        adaptive_std = jnp.maximum(noise_std, jnp.std(image) * 0.5)
        intervention = jax.random.normal(key, image.shape, image.dtype) * adaptive_std
    elif intervention_type == "zero":
        intervention = jnp.zeros_like(image)
    elif intervention_type == "mean":
        intervention = jnp.broadcast_to(
            jnp.mean(image, axis=(1, 2), keepdims=True), image.shape)
    elif intervention_type == "blur":
        k = blur_kernel + 1 if blur_kernel % 2 == 0 else blur_kernel
        intervention = _avg_pool_same(image, k)
    elif intervention_type == "inpaint":
        intervention = _avg_pool_same(image, 5)
    elif intervention_type == "shuffle":
        intervention = _shuffle_in_mask(image, jnp.asarray(np.asarray(mask)) > 0.5, key)
    else:  # default: noise (reference fallback)
        intervention = jax.random.normal(key, image.shape, image.dtype) * noise_std

    modified = jnp.clip(image * (1 - mask_t) + intervention * mask_t, -1.0, 1.0)
    diff = jnp.abs(image - modified)
    return {
        "modified_image": modified,
        "intervention": intervention,
        "mask_tensor": mask_t,
        "difference": diff,
        "statistics": {
            "intervention_type": intervention_type,
            "mask_coverage": float(jnp.mean(mask_t)),
            "mean_difference": float(jnp.mean(diff)),
            "max_difference": float(jnp.max(diff)),
            "intervention_strength": float(jnp.mean(jnp.abs(intervention))),
        },
        "parameters": dict(kwargs),
    }
