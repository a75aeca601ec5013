"""Frame-batched IG/SHAP must match the per-frame implementations."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synt_isic_tpu.xai.attribution import XAIAnalyzer
from tests.test_xai import DummyClassifier, H, W


@pytest.fixture(scope="module")
def ana():
    return XAIAnalyzer(DummyClassifier(), ig_n_steps=16, shap_n_samples=32,
                       shap_patch_size=8, batch_size=64, seed=0)


def test_ig_frames_matches_per_frame(ana):
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(3, H, W, 3)).astype(np.float32) * 0.3)
    batched = np.asarray(ana.compute_ig_frames(frames, 1, baseline_type="zero"))
    for i in range(3):
        single = np.asarray(ana.compute_integrated_gradients(
            frames[i][None], 1, baseline_type="zero"))[0]
        np.testing.assert_allclose(batched[i], single, rtol=1e-4, atol=1e-6)


def test_shap_frames_statistical_agreement(ana):
    """Mask draws differ between the two paths, so compare expectations: for
    a linear patch-classifier the SHAP estimate concentrates on the active
    patch in both implementations."""
    class PatchClassifier(DummyClassifier):
        def __init__(self):
            super().__init__()
            w = np.zeros((H, W, 3, 4), np.float32)
            w[:8, :8, :, 1] = 1.0
            self.params = {"w": jnp.asarray(w.reshape(-1, 4)),
                           "b": jnp.zeros((4,), jnp.float32)}

    clf = PatchClassifier()
    a = XAIAnalyzer(clf, shap_n_samples=128, shap_patch_size=8, seed=2,
                    batch_size=64)
    frames = jnp.ones((2, H, W, 3)) * 0.5
    batched = np.asarray(a.compute_shap_frames(frames, 1))
    for i in range(2):
        attr = batched[i, :, :, 0]
        inside = attr[:8, :8].mean()
        outside = np.delete(attr.reshape(-1), np.ravel_multi_index(
            np.mgrid[0:8, 0:8].reshape(2, -1), (H, W))).mean()
        assert inside > outside + 1e-3


def test_ig_frames_shapes_and_odd_counts(ana):
    frames = jnp.asarray(np.random.default_rng(1)
                         .normal(size=(5, H, W, 3)).astype(np.float32))
    out = ana.compute_ig_frames(frames, 0)
    assert out.shape == frames.shape
    out2 = ana.compute_shap_frames(frames, 0)
    assert out2.shape == frames.shape
