"""FID machinery + fairness audit + profiling utils + train resume tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synt_isic_tpu.metrics.fid import compute_fid, frechet_distance
from synt_isic_tpu.xai.fairness import FairnessAuditor, estimate_phototype_mask
from synt_isic_tpu.models.classifier import LesionClassifier
from synt_isic_tpu.utils.profiling import StepTimer, device_memory_stats


def test_frechet_distance_identity():
    mu = np.zeros(4)
    sigma = np.eye(4)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-8)
    assert frechet_distance(mu + 1, sigma, mu, sigma) == pytest.approx(4.0, abs=1e-6)
    # scale difference: Tr(2I + 0.5I - 2*I) with sqrt(2*0.5)=1 per dim
    d = frechet_distance(mu, 2 * sigma, mu, 0.5 * sigma)
    assert d == pytest.approx(4 * (2 + 0.5 - 2), abs=1e-6)


def test_compute_fid_separates_distributions():
    class ToyExtractor:
        def __call__(self, images):
            flat = images.reshape(len(images), -1)
            return np.stack([flat.mean(axis=1), flat.std(axis=1),
                             flat.min(axis=1), flat.max(axis=1)], axis=1)

    rng = np.random.default_rng(0)
    a1 = rng.normal(0, 0.3, (64, 8, 8, 3)).astype(np.float32)
    a2 = rng.normal(0, 0.3, (64, 8, 8, 3)).astype(np.float32)
    b = rng.normal(0.5, 0.6, (64, 8, 8, 3)).astype(np.float32)
    ext = ToyExtractor()
    d_same = compute_fid(a1, a2, ext)
    d_diff = compute_fid(a1, b, ext)
    assert d_diff > d_same * 5


@pytest.fixture(scope="module")
def small_clf():
    return LesionClassifier.random_init(num_classes=7, seed=0)


def test_fairness_audit(small_clf):
    rng = np.random.default_rng(1)
    # group images darker than rest
    rest = np.clip(rng.normal(0.3, 0.2, (24, 128, 128, 3)), -1, 1).astype(np.float32)
    group = np.clip(rng.normal(-0.5, 0.2, (24, 128, 128, 3)), -1, 1).astype(np.float32)
    images = np.concatenate([group, rest])
    mask = np.asarray([True] * 24 + [False] * 24)
    auditor = FairnessAuditor(small_clf, batch_size=16)
    res = auditor.audit(images, mask, target_class=0,
                        labels=np.zeros(48, np.int64))
    assert res["n_group"] == 24 and res["n_rest"] == 24
    assert len(res["prediction_distribution"]["group"]) == 7
    assert res["confidence"]["statistics"] is not None
    assert "verdict" in res
    assert res["accuracy"]["group"] is not None
    assert res["group_source"] == "provided_labels"


def test_fairness_audit_marks_heuristic_masks(small_clf):
    """Heuristic-mask audits must be labeled so their conclusions are never
    mistaken for curated-phototype-label results (VERDICT r2 weak #5)."""
    rng = np.random.default_rng(3)
    images = np.clip(rng.normal(0, 0.4, (12, 128, 128, 3)), -1, 1).astype(np.float32)
    mask = np.asarray([True] * 6 + [False] * 6)
    res = FairnessAuditor(small_clf, batch_size=8).audit(
        images, mask, group_source="luminance_heuristic")
    assert res["group_source"] == "luminance_heuristic"
    assert "indicative only" in res["group_source_caveat"]


def test_fairness_audit_empty_group_is_underrepresented(small_clf):
    """An (almost-)empty group must NOT fabricate a ~1.0 parity gap out of
    an all-zeros distribution — it is its own verdict. (The 8000-sample
    chip audit hit exactly this: the luminance heuristic flagged 0 of the
    generated images, and the old report still said 'parity_gap'.)"""
    rng = np.random.default_rng(4)
    images = np.clip(rng.normal(0.3, 0.2, (16, 128, 128, 3)),
                     -1, 1).astype(np.float32)
    res = FairnessAuditor(small_clf, batch_size=8).audit(
        images, np.zeros(16, bool))
    assert res["verdict"] == "group_underrepresented"
    pd = res["prediction_distribution"]
    assert pd["group"] is None and pd["max_parity_gap"] is None
    assert pd["rest"] is not None and len(pd["rest"]) == 7
    assert "underrepresentation" in res["verdict_caveat"]


def test_phototype_mask_heuristic():
    light = np.full((4, 32, 32, 3), 0.5, np.float32)
    dark = np.full((4, 32, 32, 3), -0.6, np.float32)
    mask = estimate_phototype_mask(np.concatenate([dark, light]))
    assert mask[:4].all() and not mask[4:].any()


def test_fairness_uint8_matches_float(small_clf):
    """uint8 corpora (device-side dequant, 4x fewer transfer bytes) must
    score identically to their float [-1,1] equivalents."""
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (12, 128, 128, 3), dtype=np.uint8)
    f32 = u8.astype(np.float32) / 127.5 - 1.0
    aud = FairnessAuditor(small_clf, batch_size=8)
    np.testing.assert_allclose(aud.probabilities(u8), aud.probabilities(f32),
                               rtol=1e-5, atol=1e-6)
    # the phototype heuristic accepts uint8 too
    m1 = estimate_phototype_mask(u8)
    m2 = estimate_phototype_mask(f32)
    assert (m1 == m2).all()


def test_step_timer():
    import time

    timer = StepTimer()
    with timer.phase("a"):
        time.sleep(0.01)
    with timer.phase("a"):
        time.sleep(0.01)
    s = timer.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0.02
    assert "a:" in timer.report()


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU


def test_train_state_resume(tmp_path):
    from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig
    from synt_isic_tpu.train.train_ddpm import (
        TrainConfig, create_train_state, save_train_state, restore_train_state)

    cfg = UNet2DConfig(sample_size=8, layers_per_block=1,
                       block_out_channels=(8, 8), attention_head_dim=4,
                       norm_num_groups=2,
                       down_block_types=("DownBlock2D", "DownBlock2D"),
                       up_block_types=("UpBlock2D", "UpBlock2D"))
    model = UNet2D(config=cfg)
    tcfg = TrainConfig(image_size=8, bf16_compute=False)
    state, _ = create_train_state(model, tcfg)
    state = state._replace(step=jnp.asarray(17, jnp.int32))
    path = str(tmp_path / "ts.npz")
    save_train_state(state, path)
    fresh, _ = create_train_state(model, tcfg, rng=jax.random.PRNGKey(99))
    restored = restore_train_state(fresh, path)
    assert int(restored.step) == 17
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_auditor_scores_with_current_params(small_clf):
    """The jitted scorer takes params as a CALL argument — replacing
    classifier.params (checkpoint reload) must change the scores, not
    silently keep the weights baked in at first trace."""
    from synt_isic_tpu.models.classifier import LesionClassifier

    rng = np.random.default_rng(3)
    imgs = np.clip(rng.normal(0, 0.4, (4, 64, 64, 3)), -1, 1).astype(np.float32)
    auditor = FairnessAuditor(small_clf, batch_size=4)
    p1 = auditor.probabilities(imgs)
    saved = small_clf.params
    try:
        small_clf.params = LesionClassifier.random_init(
            num_classes=7, seed=9).params
        p2 = auditor.probabilities(imgs)
    finally:
        small_clf.params = saved
    assert not np.allclose(p1, p2)


def test_fairness_small_group_caveat_is_accurate(small_clf):
    """A 3-7 sample group still gets parity/confidence numbers computed in
    the report body; the verdict caveat must say they are noise-level and
    unused — not falsely claim they 'were not evaluated' — and the
    machine-readable comparisons_reliable flag must be False."""
    rng = np.random.default_rng(0)
    imgs = np.clip(rng.normal(0, 0.4, (40, 128, 128, 3)),
                   -1, 1).astype(np.float32)
    mask = np.zeros(40, bool)
    mask[:5] = True  # 5-sample group: above the stats guard, below MIN_SIDE
    res = FairnessAuditor(small_clf, batch_size=16).audit(imgs, mask)
    assert res["verdict"] == "group_underrepresented"
    assert res["comparisons_reliable"] is False
    assert "noise-level" in res["verdict_caveat"]
    assert "were not evaluated" not in res["verdict_caveat"]

    mask2 = np.zeros(40, bool)
    mask2[:20] = True
    res2 = FairnessAuditor(small_clf, batch_size=16).audit(imgs, mask2)
    assert res2["comparisons_reliable"] is True
