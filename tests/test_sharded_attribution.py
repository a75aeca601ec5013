"""Mesh-sharded heavy attribution must be layout-independent.

VERDICT r2 #1: the frame-batched IG / patch-SHAP kernels (the dominant XAI
cost — the reference's hottest loops, `xai/XAI.py:1039-1177`) and the
Grad-CAM vjp batch must fan out over the device mesh with output matching
the single-device run — per-frame `fold_in` RNG streams and per-frame
compiled bodies make the result independent of the device layout, exactly
like the sampler's seed streams.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synt_isic_tpu.parallel.mesh import create_mesh
from synt_isic_tpu.xai.attribution import XAIAnalyzer
from tests.test_xai import DummyClassifier, H, W

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the virtual 8-device mesh")


def _analyzers():
    single = XAIAnalyzer(DummyClassifier(), ig_n_steps=16, shap_n_samples=32,
                         shap_patch_size=8, batch_size=64, seed=0)
    mesh = create_mesh({"data": 8})
    sharded = XAIAnalyzer(DummyClassifier(), ig_n_steps=16, shap_n_samples=32,
                          shap_patch_size=8, batch_size=64, seed=0, mesh=mesh)
    return single, sharded


def test_ig_frames_bitwise_layout_independent():
    single, sharded = _analyzers()
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(8, H, W, 3)).astype(np.float32) * 0.3)
    a = np.asarray(single.compute_ig_frames(frames, 1, baseline_type="zero"))
    b = np.asarray(sharded.compute_ig_frames(frames, 1, baseline_type="zero"))
    np.testing.assert_array_equal(a, b)


def test_shap_frames_bitwise_layout_independent():
    """fold_in(key, global_frame_index) mask streams: the sharded estimate
    must equal the single-device one bit-for-bit."""
    single, sharded = _analyzers()
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.normal(size=(8, H, W, 3)).astype(np.float32) * 0.3)
    a = np.asarray(single.compute_shap_frames(frames, 2))
    b = np.asarray(sharded.compute_shap_frames(frames, 2))
    np.testing.assert_array_equal(a, b)


def test_sharded_attribution_pads_odd_frame_counts():
    """5 frames on an 8-way mesh: padded to 8, padding dropped."""
    single, sharded = _analyzers()
    rng = np.random.default_rng(2)
    frames = jnp.asarray(rng.normal(size=(5, H, W, 3)).astype(np.float32) * 0.3)
    a = np.asarray(single.compute_ig_frames(frames, 0, baseline_type="zero"))
    b = np.asarray(sharded.compute_ig_frames(frames, 0, baseline_type="zero"))
    assert b.shape == (5, H, W, 3)
    np.testing.assert_array_equal(a, b)
    a = np.asarray(single.compute_shap_frames(frames, 0))
    b = np.asarray(sharded.compute_shap_frames(frames, 0))
    assert b.shape == (5, H, W, 3)
    np.testing.assert_array_equal(a, b)


def test_time_shap_sharded_matches(small_shapes=True):
    single, sharded = _analyzers()
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.normal(size=(8, H, W, 3)).astype(np.float32) * 0.3)
    ts = list(range(8))
    imp_a, raw_a = single.compute_time_shap(frames, ts, 1)
    imp_b, raw_b = sharded.compute_time_shap(frames, ts, 1)
    np.testing.assert_allclose(imp_a, imp_b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(raw_a["confidence_scores"],
                               raw_b["confidence_scores"], rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_gradcam_sharded_matches():
    """Grad-CAM per-frame vjp + per-image normalization shard cleanly; the
    real ResNet path is exercised (features_and_logits protocol)."""
    from synt_isic_tpu.models.classifier import LesionClassifier
    from synt_isic_tpu.xai.gradcam import compute_gradcam

    clf = LesionClassifier.random_init(num_classes=7, seed=0)
    rng = np.random.default_rng(4)
    images = jnp.asarray(
        np.clip(rng.normal(0, 0.4, (8, 64, 64, 3)), -1, 1).astype(np.float32))
    mesh = create_mesh({"data": 8})
    a = compute_gradcam(clf, images, 3, output_size=64)
    b = compute_gradcam(clf, images, 3, output_size=64, mesh=mesh)
    assert b.shape == (8, 64, 64)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pipeline_accepts_mesh(tmp_path):
    """Full pipeline runs with mesh= threaded through; IG/SHAP maps equal
    the meshless run (figures off for speed)."""
    from synt_isic_tpu.xai.pipeline import run_comprehensive_xai_pipeline

    clf = DummyClassifier()
    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.normal(size=(8, H, W, 3)).astype(np.float32) * 0.3)
    ts = [float(t) for t in range(8)]
    mesh = create_mesh({"data": 8})

    def run(mesh_arg, seed=0):
        ana = XAIAnalyzer(clf, ig_n_steps=8, shap_n_samples=16,
                          shap_patch_size=8, batch_size=64, seed=seed)
        return run_comprehensive_xai_pipeline(
            frames, ts, ana, clf, 1, "NV", save_results=False,
            save_figures=False, with_gradcam=False, with_sanity=False,
            n_bootstrap=50, n_permutations=100, mesh=mesh_arg)

    res_plain = run(None)
    res_mesh = run(mesh)
    for key in res_plain["xai_maps"]:
        np.testing.assert_array_equal(
            res_plain["xai_maps"][key]["attribution_map"],
            res_mesh["xai_maps"][key]["attribution_map"])
