"""Fréchet distance between image-set feature distributions (FID).

Needed for the rebuild's benchmark contract ("FID parity with the PyTorch
reference at fixed seeds", BASELINE.md). Two embeddings:

  * STANDARD: InceptionV3 pool3 (2048-d) — `InceptionFeatureExtractor`,
    used automatically when `checkpoints/inception_v3.pth` (torchvision
    weights, see `scripts/convert_inception.py`) is present. These numbers
    are comparable to published torchvision-FID figures.
  * FALLBACK: the lesion classifier's penultimate 512-d features
    (`ResNet18.penultimate`) — `FeatureExtractor`. With the SAME extractor
    on both sides the Fréchet distance remains a valid comparison metric
    between sample sets, but absolute values are NOT comparable to
    Inception-FID and results are labeled accordingly.

Feature extraction is a jitted batched device computation (chunked);
Fréchet math (covariance sqrtm) runs on host via scipy.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from ..models.classifier import LesionClassifier, preprocess_for_classifier
from ..models.inception_v3 import (InceptionV3, init_inception_params,
                                   load_inception_params,
                                   preprocess_for_inception)


class FeatureExtractor:
    """Batched image -> feature embedding on device."""

    def __init__(self, classifier: Optional[LesionClassifier] = None,
                 batch_size: int = 64):
        self.classifier = classifier or LesionClassifier.random_init()
        self.batch_size = batch_size
        model = self.classifier.model

        def feats(params, x):
            return model.apply({"params": params},
                               preprocess_for_classifier(x),
                               method=model.penultimate)

        self._feats = jax.jit(feats)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images: (N,H,W,3) float in [-1,1] -> (N,512) float32."""
        chunks = []
        for start in range(0, len(images), self.batch_size):
            x = jnp.asarray(images[start:start + self.batch_size])
            chunks.append(np.asarray(self._feats(self.classifier.params, x)))
        return np.concatenate(chunks) if chunks else np.zeros((0, 512), np.float32)


class InceptionFeatureExtractor:
    """Standard FID embedding: InceptionV3 pool3, 2048-d, batched on device.

    `params_path=None` uses random-init weights (structurally valid FID for
    tests; NOT comparable to published numbers — pass real torchvision
    weights for that).
    """

    def __init__(self, params_path: Optional[str] = None, batch_size: int = 32,
                 dtype: Any = jnp.float32):
        self.model = InceptionV3(dtype=dtype)
        if params_path:
            self.params = load_inception_params(params_path)
            self.pretrained = True
        else:
            self.params = init_inception_params(jax.random.PRNGKey(0), dtype)
            self.pretrained = False
        self.batch_size = batch_size

        def feats(params, x):
            return self.model.apply({"params": params},
                                    preprocess_for_inception(x),
                                    method=self.model.pool3_features)

        self._feats = jax.jit(feats)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images: (N,H,W,3) float in [-1,1] -> (N,2048) float32."""
        chunks = []
        for start in range(0, len(images), self.batch_size):
            x = jnp.asarray(images[start:start + self.batch_size])
            chunks.append(np.asarray(self._feats(self.params, x)))
        return np.concatenate(chunks) if chunks else np.zeros((0, 2048), np.float32)


class PixelFeatureExtractor:
    """Deterministic, weight-free embedding for Fréchet comparisons:
    average-pool each image to a (grid × grid) RGB thumbnail and flatten
    (grid²·3 dims).

    Captures the color distribution and coarse spatial structure with NO
    learned weights. This exists because a random-init CNN embedding is an
    unreliable judge — it can rank pure noise closer to data than visibly
    structured samples — so when neither Inception weights nor a trained
    classifier are available this is the trustworthy convergence check.
    Values are NOT comparable to Inception-FID."""

    def __init__(self, grid: int = 8):
        self.grid = int(grid)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images: (N,H,W,3) float in [-1,1] -> (N, grid²·3) float32.

        Cells are near-equal index buckets (no cropping), so the feature
        dimension is grid²·3 for ANY input size — image sets of different
        resolutions embed into the same space, like the CNN extractors."""
        arr = np.asarray(images, np.float32)
        g = self.grid
        # images smaller than the grid: nearest-neighbor upsample first
        if arr.shape[1] < g:
            arr = np.repeat(arr, -(-g // arr.shape[1]), axis=1)
        if arr.shape[2] < g:
            arr = np.repeat(arr, -(-g // arr.shape[2]), axis=2)
        n, h, w, c = arr.shape
        edges_r = np.linspace(0, h, g + 1).astype(np.int64)
        edges_c = np.linspace(0, w, g + 1).astype(np.int64)
        pooled = (np.add.reduceat(arr, edges_r[:-1], axis=1)
                  / np.diff(edges_r)[None, :, None, None])
        pooled = (np.add.reduceat(pooled, edges_c[:-1], axis=2)
                  / np.diff(edges_c)[None, None, :, None])
        return pooled.reshape(n, g * g * c)


def pixel_frechet(images_a: np.ndarray, images_b: np.ndarray,
                  grid: int = 8) -> float:
    """Fréchet distance in pooled-pixel space (see PixelFeatureExtractor)."""
    return compute_fid(images_a, images_b, PixelFeatureExtractor(grid))


def default_extractor(checkpoints_dir: str = "checkpoints",
                      require_standard: bool = False):
    """Standard Inception-FID when the weights exist, classifier-feature
    fallback (clearly second) otherwise.

    `require_standard=True` turns the silent fallback into a hard error —
    for callers whose contract IS standard FID ("FID parity", BASELINE.md),
    a proxy number must never masquerade as it (VERDICT r2 #7). The error
    names the one-command bootstrap."""
    path = os.path.join(checkpoints_dir, "inception_v3.pth")
    if os.path.exists(path):
        return InceptionFeatureExtractor(path)
    if require_standard:
        raise FileNotFoundError(
            f"standard FID requested but {path} is missing — run "
            f"`python -m synt_isic_tpu.app.download_models` (fetches + "
            f"checksums + manifest-validates the torchvision InceptionV3 "
            f"weights) or scripts/convert_inception.py on a machine with "
            f"torchvision, then copy the file here. Refusing to fall back "
            f"to the classifier-feature proxy.")
    return FeatureExtractor()


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray,
                     eps: float = 1e-6) -> float:
    """||mu1-mu2||² + Tr(S1 + S2 - 2 (S1 S2)^{1/2})."""
    diff = mu1 - mu2
    # scipy >= 1.17 deprecates sqrtm(disp=) (removal in 1.18) and returns
    # the bare array from a plain call; older scipys returned a tuple only
    # when disp=False was passed, so the plain call is portable both ways
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if isinstance(covmean, tuple):  # pre-1.17 compat, should not trigger
        covmean = covmean[0]
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def compute_fid(images_a: np.ndarray, images_b: np.ndarray,
                extractor: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                require_standard: bool = False) -> float:
    """Fréchet distance between two image sets ((N,H,W,3) in [-1,1]).

    Default extractor: standard Inception pool3 when
    `checkpoints/inception_v3.pth` exists, classifier-feature fallback
    otherwise (see `default_extractor`). `require_standard=True` raises
    instead of silently falling back."""
    extractor = extractor or default_extractor(require_standard=require_standard)
    fa = np.asarray(extractor(images_a), np.float64)
    fb = np.asarray(extractor(images_b), np.float64)
    mu_a, mu_b = fa.mean(axis=0), fb.mean(axis=0)
    sigma_a = np.cov(fa, rowvar=False)
    sigma_b = np.cov(fb, rowvar=False)
    return frechet_distance(mu_a, sigma_a, mu_b, sigma_b)
