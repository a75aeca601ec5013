"""Tiny-shape CPU tests for the round-5 family evidence scripts:
scripts/score_family.py (per-class Fréchet/consistency table + shared
probe) and scripts/bench_model_churn.py (ModelManager churn cycle)."""
import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import jax

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="module")
def family_ckpts(tmp_path_factory):
    from train_family import train_family

    out = tmp_path_factory.mktemp("family")
    train_family(str(out), ["MEL", "NV"], size=32, train_images=8,
                 epochs=2, batch_size=4, width="quarter", seed=0,
                 log=lambda *a: None)
    return out / "checkpoints"


@pytest.mark.slow
def test_score_family_structure(family_ckpts, tmp_path):
    from score_family import score_family

    out = tmp_path / "score.json"
    report = score_family(
        str(family_ckpts), str(out), size=32, width="quarter",
        count=4, heldout=8, steps=4, clf_per_class=8, clf_epochs=2,
        hard=0.6, work_dir=str(tmp_path / "samples"),
        log=lambda *a: None)
    data = json.loads(out.read_text())
    assert set(data["classes"]) == {"MEL", "NV"}
    for c in ("MEL", "NV"):
        row = data["per_class"][c]
        for key in ("frechet_vs_heldout", "quality_bar", "model_converged",
                    "class_consistency", "consistency_absolute_ok",
                    "consistency_vs_judge_skill", "probe_heldout_acc"):
            assert key in row, key
        # anchors sane: ceiling above floor
        assert row["ceiling_noise_vs_heldout"] > row["floor_train_vs_heldout"]
    assert "heldout_acc" in data["probe"]
    # probe checkpoint written next to the family (gauntlet reuses it)
    assert (family_ckpts / "classifier.pth").exists()
    assert report["family_converged"] in (True, False)


@pytest.mark.slow
def test_bench_model_churn_structure(family_ckpts, tmp_path):
    from bench_model_churn import bench_churn

    out = tmp_path / "churn.json"
    report = bench_churn(str(family_ckpts), str(out), size=32,
                         width="quarter", rotations=1,
                         log=lambda *a: None)
    data = json.loads(out.read_text())
    assert set(data["classes"]) == {"MEL", "NV"}
    for key in ("cold_load_s", "cached_load_s", "swap_s_p50",
                "resident_reload_s"):
        assert key in data, key
    # the cached (converted-pytree) reload must not be slower than cold
    assert data["cached_load_s_median"] <= data["cold_load_s_median"] * 1.5
    # an already-resident re-request is near-free
    assert data["resident_reload_s"] < 0.1
    assert report["swaps"] == 2


@pytest.mark.slow
def test_probe_trains_on_full_taxonomy_when_scoring_subset(family_ckpts,
                                                           tmp_path):
    """Scoring a SUBSET must still train the shared probe over every
    checkpoint on disk — a probe trained on the scored class alone is a
    degenerate always-that-class judge whose consistency numbers are
    meaningless (observed live during the round-5 wedge-recovery split:
    'MEL 1.00 consistency' from a single-class probe)."""
    from score_family import score_family

    out = tmp_path / "subset.json"
    report = score_family(
        str(family_ckpts), str(out), classes=["MEL"], size=32,
        width="quarter", count=4, heldout=8, steps=4, clf_per_class=8,
        clf_epochs=2, hard=0.6, work_dir=str(tmp_path / "samples"),
        log=lambda *a: None)
    # the probe reports held-out accuracy for BOTH classes on disk even
    # though only MEL was scored
    assert set(report["probe"]["heldout_acc"]) == {"MEL", "NV"}
    assert set(report["per_class"]) == {"MEL"}
