"""Tiny-shape CPU tests for scripts/train_family.py (the round-5 7-class
family trainer) and its crash-safety contract."""
import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import jax

jax.config.update("jax_platforms", "cpu")

from train_family import train_family  # noqa: E402


@pytest.mark.slow
def test_family_trains_skips_and_resumes(tmp_path):
    out = tmp_path / "fam"
    kw = dict(size=32, train_images=8, epochs=2, batch_size=4,
              width="quarter", seed=0, log=lambda *a: None)

    report = train_family(str(out), ["MEL"], **kw)
    ckpt = out / "checkpoints"
    assert (ckpt / "unet_MEL_best.pth").exists()
    assert report["family_complete"]
    assert "best_loss" in report["classes"]["MEL"]
    # color statistics written for the trained class
    stats = json.loads((ckpt / "color_statistics.json").read_text())
    assert "MEL" in stats
    # clean completion leaves no optimizer snapshot behind
    assert not (ckpt / "train_state_MEL.npz").exists()

    # second run: checkpoint exists and no snapshot -> skipped, stats kept
    r2 = train_family(str(out), ["MEL"], **kw)
    assert r2["family_complete"]
    first_loss = report["classes"]["MEL"]["best_loss"]
    assert r2["classes"]["MEL"]["best_loss"] == first_loss

    # a lingering train_state snapshot marks the class INTERRUPTED: the
    # trainer must fall through to training again instead of trusting the
    # periodic best file (round-5 stall recovery contract). The stale
    # fake snapshot is ignored by train_class when resume=False.
    (ckpt / "train_state_MEL.npz").write_bytes(b"not a real snapshot")
    r3 = train_family(str(out), ["MEL"], **kw)
    assert not r3["classes"]["MEL"].get("skipped_existing")
    assert "best_loss" in r3["classes"]["MEL"]
    # the retrain completed cleanly -> snapshot removed again
    assert not (ckpt / "train_state_MEL.npz").exists()
