"""Comprehensive XAI pipeline smoke test: tiny trajectory, reduced budgets,
all stages, artifact contract checks (names match the reference's outputs).
"""
import json
import pickle
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synt_isic_tpu.models.classifier import LesionClassifier
from synt_isic_tpu.xai.attribution import XAIAnalyzer
from synt_isic_tpu.xai.pipeline import run_comprehensive_xai_pipeline
from synt_isic_tpu.xai.integration import IntegratedXAIAnalyzer


@pytest.fixture(scope="module")
def clf():
    return LesionClassifier.random_init(num_classes=7, seed=0)


@pytest.mark.slow
def test_full_pipeline_artifacts(clf, tmp_path):
    rng = np.random.default_rng(0)
    frames = jnp.asarray(np.clip(rng.normal(size=(5, 128, 128, 3)) * 0.4, -1, 1)
                         .astype(np.float32))
    timesteps = [980.0, 740.0, 500.0, 260.0, 0.0]
    analyzer = XAIAnalyzer(clf, ig_n_steps=4, shap_n_samples=8,
                           shap_patch_size=32, seed=0)
    out_dir = tmp_path / "run1"
    results = run_comprehensive_xai_pipeline(
        trajectory=frames, timesteps=timesteps, xai_analyzer=analyzer,
        classifier=clf, target_class_id=1, target_class_name="NV",
        save_results=True, results_dir=out_dir,
        intervention_types=("blur", "zero"),
        n_bootstrap=50, n_permutations=100,
        with_sanity=False,  # 3x more IG runs — covered by test_xai sanity test
        log=lambda *a: None)

    # stage results present
    assert len(results["xai_maps"]) == 5
    assert len(results["region_analysis"]) == 5
    assert results["time_shap"]["importance"].shape == (5,)
    assert "gradcam" in results and len(results["gradcam"]) == 5
    assert "gradcam_summary" in results
    assert results["statistical_validation"]["overall_conclusion"] is not None
    # interventions at key steps (5 frames -> dedup of [0,2,1,2,3,4])
    assert len(results["cfi_analysis"]) >= 4
    for step_cfi in results["cfi_analysis"].values():
        for key in step_cfi:
            assert key.split("_")[-1] in ("blur", "zero")

    # artifact contract (names the reference produces)
    names = {p.name for p in out_dir.iterdir()}
    assert "analysis_results.json" in names
    assert "full_results.pkl" in names
    assert "time_shap_analysis.png" in names
    assert "statistical_analysis.png" in names
    assert "gradcam_overview.png" in names
    assert "gradcam_summary_all_timesteps.png" in names
    assert "trajectory_all_steps.png" in names
    assert "xai_step_t_980.png" in names
    assert "xai_step_t_980_IG.png" in names
    assert "xai_step_t_980_SHAP.png" in names
    assert any(n.startswith("interventions_t_") for n in names)
    assert any(n.startswith("gradcam_t_") for n in names)
    assert any(n.startswith("gradcam_most_important_t") for n in names)

    # JSON is valid and tensor-free
    data = json.loads((out_dir / "analysis_results.json").read_text())
    assert data["metadata"]["target_class_name"] == "NV"
    assert "attribution_map" not in next(iter(data["xai_maps"].values()))
    # pickle holds the full arrays
    full = pickle.loads((out_dir / "full_results.pkl").read_bytes())
    assert "attribution_map" in next(iter(full["xai_maps"].values()))


@pytest.mark.slow
def test_integrated_adapter(clf, tmp_path):
    rng = np.random.default_rng(1)
    traj = np.clip(rng.normal(size=(3, 128, 128, 3)) * 0.3, -1, 1).astype(np.float32)
    adapter = IntegratedXAIAnalyzer(classifier=clf, verbose=False,
                                    ig_n_steps=2, shap_n_samples=4,
                                    with_gradcam=False, with_sanity=False,
                                    n_bootstrap=20, n_permutations=50)
    img_dir = tmp_path / "out" / "NV"
    img_dir.mkdir(parents=True)
    file_path = img_dir / "ISIC_0000001.png"
    res = adapter.analyze_trajectory(traj, "NV", seed=77, inference_steps=3,
                                     filename="ISIC_0000001.png",
                                     file_path=str(file_path))
    assert res is not None
    json.dumps(res)  # fully JSON-serializable
    out_dir = tmp_path / "out" / "xai_results" / "NV" / "ISIC_0000001_77"
    assert out_dir.exists()
    assert (out_dir / "analysis_results.json").exists()
    assert res["artifacts"]["trajectory_all_steps"].endswith("trajectory_all_steps.png")


def test_run_xai_analysis_preview(clf, tmp_path):
    """GUI preview helper returns an artifact when one exists."""
    from synt_isic_tpu.xai.integration import run_xai_analysis
    from PIL import Image

    img_dir = tmp_path / "out" / "NV"
    img_dir.mkdir(parents=True)
    img_path = img_dir / "ISIC_0000002.png"
    Image.new("RGB", (16, 16)).save(img_path)
    # no artifacts -> original returned
    img, path = run_xai_analysis(str(img_path))
    assert path == str(img_path)
    # with artifact -> artifact returned
    art_dir = tmp_path / "out" / "xai_results" / "NV" / "ISIC_0000002_5"
    art_dir.mkdir(parents=True)
    art = art_dir / "xai_step_t_0.png"
    Image.new("RGB", (8, 8)).save(art)
    img, path = run_xai_analysis(str(img_path))
    assert path == str(art)


@pytest.mark.slow
def test_pipeline_coalitional_time_shap_stage(clf, tmp_path):
    """Opt-in coalitional Time-SHAP stage (VERDICT r3 #4): φ-values +
    efficiency gap land in analysis_results.json and the plot artifact is
    emitted; default-off keeps reference-parity output."""
    rng = np.random.default_rng(1)
    frames = jnp.asarray(np.clip(rng.normal(size=(4, 64, 64, 3)) * 0.4, -1, 1)
                         .astype(np.float32))
    timesteps = [900.0, 600.0, 300.0, 0.0]
    analyzer = XAIAnalyzer(clf, ig_n_steps=2, shap_n_samples=4,
                           shap_patch_size=32, seed=0)
    out_dir = tmp_path / "coal"
    results = run_comprehensive_xai_pipeline(
        trajectory=frames, timesteps=timesteps, xai_analyzer=analyzer,
        classifier=clf, target_class_id=1, target_class_name="NV",
        save_results=True, results_dir=out_dir,
        n_bootstrap=20, n_permutations=30,
        with_gradcam=False, with_sanity=False,
        coalitional_shap=True, coalitional_permutations=64,
        log=lambda *a: None)

    coal = results["time_shap"]["coalitional"]
    phi = np.asarray(coal["shapley_values"])
    assert phi.shape == (4,)
    # efficiency axiom: Σφ = v(full) − v(∅) up to estimator fp error
    scores = np.asarray(coal["frame_scores"])
    assert abs(phi.sum() - (scores[-1] - scores[0])) < 1e-4
    assert abs(coal["efficiency_gap"]) < 1e-4
    assert (out_dir / "time_shap_coalitional.png").exists()
    js = json.loads((out_dir / "analysis_results.json").read_text())
    assert "coalitional" in js["time_shap"]
    assert len(js["time_shap"]["coalitional"]["shapley_values"]) == 4
    assert js["metadata"]["parameters"]["coalitional_shap"] is True

    # default-off: no coalitional block, no artifact
    out2 = tmp_path / "nocoal"
    r2 = run_comprehensive_xai_pipeline(
        trajectory=frames, timesteps=timesteps, xai_analyzer=analyzer,
        classifier=clf, target_class_id=1, target_class_name="NV",
        save_results=True, results_dir=out2,
        n_bootstrap=20, n_permutations=30,
        with_gradcam=False, with_sanity=False, log=lambda *a: None)
    assert "coalitional" not in r2["time_shap"]
    assert not (out2 / "time_shap_coalitional.png").exists()


def test_pipeline_viz_every_n_throttles_figures(clf, tmp_path):
    """viz_every_n=3 on 7 frames: step figures only at frames 0, 3, 6
    (first/last always), numerics still present for EVERY frame."""
    rng = np.random.default_rng(3)
    frames = jnp.asarray(np.clip(rng.normal(size=(7, 32, 32, 3)) * 0.4, -1, 1)
                         .astype(np.float32))
    timesteps = [900.0, 750.0, 600.0, 450.0, 300.0, 150.0, 0.0]
    analyzer = XAIAnalyzer(clf, ig_n_steps=2, shap_n_samples=4,
                           shap_patch_size=16, seed=0)
    out_dir = tmp_path / "run_throttle"
    results = run_comprehensive_xai_pipeline(
        trajectory=frames, timesteps=timesteps, xai_analyzer=analyzer,
        classifier=clf, target_class_id=1, target_class_name="NV",
        save_results=True, results_dir=out_dir,
        n_bootstrap=20, n_permutations=40,
        with_gradcam=True, with_sanity=False, viz_every_n=3,
        log=lambda *a: None)

    # numerics: every frame analyzed
    assert len(results["xai_maps"]) == 7
    assert len(results["region_analysis"]) == 7
    assert len(results["gradcam"]) == 7

    names = {p.name for p in out_dir.iterdir()}
    step_figs = sorted(n for n in names
                       if n.startswith("xai_step_t_") and "_IG" not in n
                       and "_SHAP" not in n)
    # frames 0 (t=900), 3 (t=450), 6 (t=0) only
    assert step_figs == ["xai_step_t_0.png", "xai_step_t_450.png",
                         "xai_step_t_900.png"]
    gradcam_figs = {n for n in names if n.startswith("gradcam_t_")}
    assert gradcam_figs == {"gradcam_t_900.png", "gradcam_t_450.png",
                            "gradcam_t_0.png"}
    # the knob is recorded for reproducibility
    data = json.loads((out_dir / "analysis_results.json").read_text())
    assert data["metadata"]["parameters"]["viz_every_n"] == 3
