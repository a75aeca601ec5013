"""CPU seam test for scripts/e2e_conditional.py: the conditional-family
evidence loop (train one conditional model on the procedural classes ->
per-class sampling through the production conditional path at several
guidance scales -> per-class Fréchet + class-consistency) must run end to
end at smoke sizes and emit a well-formed report. The chip run uses the
same code path at production sizes."""
import pytest
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.mark.slow
def test_e2e_conditional_smoke(tmp_path):
    from e2e_conditional import run

    report = run(str(tmp_path), size=16, train_images=8, heldout=8,
                 epochs=2, batch_size=6, sample_count=4, ddim_steps=2,
                 guidance_scales=(1.0, 2.0), clf_per_class=8, clf_epochs=1,
                 seed=0, log=lambda *a, **k: None)
    assert (tmp_path / "report.json").exists()
    on_disk = json.loads((tmp_path / "report.json").read_text())
    assert on_disk["classes"] == ["MEL", "NV", "VASC"]
    assert set(on_disk["results"]) == {"g1", "g2"}
    for g, res in on_disk["results"].items():
        assert set(res["per_class"]) == set(on_disk["classes"])
        for c, m in res["per_class"].items():
            assert m["frechet_vs_heldout"] >= 0.0
            assert 0.0 <= m["class_consistency"] <= 1.0
    assert on_disk["results"]["g2"]["unet_evals_per_step"] == 2
    assert on_disk["results"]["g1"]["unet_evals_per_step"] == 1
    # the conditional checkpoint + metadata landed and are loadable
    assert (tmp_path / "checkpoints" / "unet_conditional_best.pth").exists()
    meta = json.loads((tmp_path / "checkpoints" /
                       "unet_conditional_best.json").read_text())
    assert meta["num_class_embeds"] == 4
    # samples were written through the production generator per guidance
    assert (tmp_path / "samples_g1" / "MEL" / "ISIC_0000001.png").exists()
    assert (tmp_path / "samples_g2" / "VASC" / "ISIC_0000001.png").exists()
    assert report["conditional_ok"] in (True, False)  # verdict present


def test_e2e_conditional_resume_flag(tmp_path):
    """--resume continues a (killed) run from train_state_conditional.npz
    with optimizer state — the flag the round-4 queue-kill showed was
    missing from the script surface."""
    from e2e_conditional import run

    logs = []
    run(str(tmp_path), size=16, train_images=8, heldout=8,
        epochs=2, batch_size=6, sample_count=2, ddim_steps=2,
        guidance_scales=(1.0,), clf_per_class=8, clf_epochs=1,
        classes=("MEL", "NV"), seed=0, log=lambda *a, **k: None)
    assert (tmp_path / "checkpoints" / "train_state_conditional.npz").exists()
    run(str(tmp_path), size=16, train_images=8, heldout=8,
        epochs=1, batch_size=6, sample_count=2, ddim_steps=2,
        guidance_scales=(1.0,), clf_per_class=8, clf_epochs=1,
        classes=("MEL", "NV"), seed=0, resume=True,
        log=lambda *a: logs.append(" ".join(str(x) for x in a)))
    assert any("resumed from" in ln for ln in logs), logs[:10]
