"""Widget-level GUI tests on the qt_compat stub backend.

The reference GUI (`main.py`) ships zero tests; here the REAL window class
(`SyntheticDataGeneratorWindow`) is constructed headlessly (PyQt5 absent ->
qt_compat stub) and its actual handler code is driven: class discovery,
generation through the worker (synchronous QThread on the stub), progress
wiring, the results browser (generated files + XAI runs/files two-list
with JSON/PKL viewers, reference `main.py:1624-1714`), the XAI-overlay
preview path (`main.py:890-966`), and the system-configuration panel
(`main.py:745-799`). On a machine with PyQt5 these same tests exercise the
real Qt classes (signals are synchronous in-thread there too, except
QThread.start — skipped there via the backend marker where behavior
differs).
"""
import json
import pickle
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from synt_isic_tpu.app import qt_compat
from synt_isic_tpu.app.gui import SyntheticDataGeneratorWindow
from synt_isic_tpu.models.unet2d import UNet2DConfig
from synt_isic_tpu.utils.config import ConfigManager

from tests.torch_oracle.unet2d_torch import UNet2DTorch, tiny_config

TINY = tiny_config()
TINY_JAX = UNet2DConfig(
    sample_size=TINY["sample_size"], layers_per_block=TINY["layers_per_block"],
    block_out_channels=TINY["block_out_channels"],
    down_block_types=TINY["down_block_types"],
    up_block_types=TINY["up_block_types"],
    attention_head_dim=TINY["attention_head_dim"],
    norm_num_groups=TINY["norm_num_groups"])

needs_stub = pytest.mark.skipif(
    qt_compat.QT_BACKEND != "stub",
    reason="synchronous-QThread assertions are stub-backend specific")


@pytest.fixture(scope="module")
def window(tmp_path_factory):
    base = tmp_path_factory.mktemp("gui")
    ckpt = base / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_MEL_best.pth")
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")
    out = base / "generated"
    xai = base / "xai_results"
    from synt_isic_tpu.generator import ImageGenerator
    cfg = ConfigManager(config_file=str(base / "config.json"),
                        project_root=str(base))
    gen = ImageGenerator(config=cfg, checkpoints_dir=str(ckpt),
                         model_config=TINY_JAX)
    win = SyntheticDataGeneratorWindow(
        config=cfg, generator=gen, checkpoints_dir=str(ckpt),
        output_dir=str(out), xai_results_dir=str(xai))
    return win, base


def test_class_discovery_enables_only_available(window):
    win, _ = window
    assert win.class_rows["MEL"][0].isEnabled()
    assert win.class_rows["NV"][0].isEnabled()
    assert not win.class_rows["BCC"][0].isEnabled()
    assert win.class_rows["BCC"][0].toolTip() == "no checkpoint found"


def test_config_panel_reports_models_and_paths(window):
    win, base = window
    assert "Available models: 2" in win.available_models_label.text()
    assert str(base / "checkpoints") in win.model_path_label.text()
    assert win.device_info_label.text().startswith("Device: ")


def test_start_without_selection_warns(window):
    win, _ = window
    win.start_generation()
    assert "[warning] select at least one class" in win.logs.toPlainText()


@needs_stub
def test_generation_flow_end_to_end(window):
    """Start button -> worker -> images on disk -> progress + browser."""
    win, base = window
    win.class_rows["MEL"][0].setChecked(True)
    win.class_rows["MEL"][1].setValue(2)
    win.steps_spin.setValue(2)
    win.seed_mode.setCurrentText("fixed")
    win.seed_spin.setValue(7)
    win.start_btn.click()
    # stub QThread runs synchronously: generation is done on return
    pngs = sorted((base / "generated").rglob("*.png"))
    assert len(pngs) == 2
    assert win.progress.value() == win.progress.maximum() > 0
    assert win.start_btn.isEnabled() and not win.stop_btn.isEnabled()
    assert win.files_list.count() == 2
    assert win.status_label.text().startswith("done:")


@needs_stub
def test_preview_and_xai_overlay_path(window):
    win, base = window
    img = str(sorted((base / "generated").rglob("*.png"))[0])
    # no XAI mode: preview shows the clicked file
    win.xai_check.setChecked(False)
    win.display_image(img)
    assert win._preview_path == img
    assert win.preview.pixmap_set is not None
    # XAI mode + a fabricated artifact for this image -> overlay is shown
    stem = Path(img).stem
    cls = Path(img).parent.name
    run_dir = Path(img).parents[2] / "xai_results" / cls / f"{stem}_7"
    run_dir.mkdir(parents=True)
    from PIL import Image
    art = run_dir / "xai_step_t_000.png"
    Image.new("RGB", (16, 16), (255, 0, 0)).save(art)
    win.xai_check.setChecked(True)
    win.display_image(img)
    assert win._preview_path == str(art)
    assert "XAI overlay:" in win.logs.toPlainText()
    win.xai_check.setChecked(False)


@needs_stub
def test_xai_results_browser_runs_files_and_viewers(window):
    win, base = window
    xai = base / "xai_results"
    run = xai / "MEL" / "demo_run_42"
    run.mkdir(parents=True, exist_ok=True)
    from PIL import Image
    Image.new("RGB", (8, 8)).save(run / "time_shap_analysis.png")
    (run / "analysis_results.json").write_text(
        json.dumps({"metadata": {"class": "MEL", "seed": 42}}))
    with open(run / "full_results.pkl", "wb") as f:
        pickle.dump({"frames": [1, 2], "stats": {}}, f)

    win.refresh_results()
    runs = [win.xai_runs_list.item(i).text()
            for i in range(win.xai_runs_list.count())]
    assert any(r.endswith("demo_run_42") for r in runs)
    # newest run auto-selected and its files listed
    files = [win.xai_files_list.item(i).text()
             for i in range(win.xai_files_list.count())]
    assert {"analysis_results.json", "full_results.pkl",
            "time_shap_analysis.png"} <= set(files)

    # JSON viewer -> dialog with pretty content
    idx = files.index("analysis_results.json")
    win.xai_files_list.click_row(idx)
    assert '"seed": 42' in win._last_dialog._layout.items[0].toPlainText()
    # PKL viewer -> dict-keys summary
    win.xai_files_list.click_row(files.index("full_results.pkl"))
    text = win._last_dialog._layout.items[0].toPlainText()
    assert "Type: dict" in text and "frames" in text
    # image -> preview
    win.xai_files_list.click_row(files.index("time_shap_analysis.png"))
    assert win._preview_path.endswith("time_shap_analysis.png")


@needs_stub
def test_memory_timer_updates_labels(window):
    win, _ = window
    win._mem_timer.fire()
    assert win.mem_label.text().startswith("mem:")
    assert win.memory_info_label.text().startswith("Memory:")


def test_stop_button_requests_cooperative_stop(window):
    win, _ = window
    win.stop_generation()  # no worker running: must not raise
    assert win.generator.stop_requested in (True, False)


def test_device_combo_dp_mesh_entry(window):
    """With >1 device the combo grows an 'all N devices (dp)' entry that
    sets a data-parallel mesh on the generator; selecting a single device
    clears it (beyond-reference multi-chip surface)."""
    import jax

    win, _ = window
    n = len(jax.devices())
    assert n >= 8  # conftest's virtual CPU mesh
    assert win.device_combo.count() == n + 1
    win.device_combo.setCurrentIndex(n)      # the dp entry
    win._on_device_changed(n)
    assert win.generator.mesh is not None
    assert win.generator.mesh.shape["data"] == n
    win._update_memory_info()                 # must not raise on dp entry
    win._on_device_changed(0)
    assert win.generator.mesh is None


def test_variant_combo_lists_and_switches(window):
    """The variant selector (beyond-reference: progressive-distillation
    students) lists on-disk variants with 'best' first, hides epoch
    snapshots, and switching variants redirects the ModelManager's
    checkpoint path + unloads stale weights."""
    win, base = window
    ckpt = base / "checkpoints"
    torch.manual_seed(3)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_MEL_distill4.pth")
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_MEL_epoch5.pth")
    win._refresh_classes()
    items = [win.variant_combo._items[i] if qt_compat.QT_BACKEND == "stub"
             else win.variant_combo.itemText(i)
             for i in range(win.variant_combo.count())]
    assert items[0] == "best"
    assert "distill4" in items
    assert not any(v.startswith("epoch") for v in items)

    win.variant_combo.setCurrentText("distill4")
    win._on_variant_changed(items.index("distill4"))
    mm = win.generator.model_manager
    assert mm.variant == "distill4"
    assert mm.checkpoint_path("MEL").name == "unet_MEL_distill4.pth"
    assert not mm.loaded_params  # stale weights dropped
    # back to reference naming
    win.variant_combo.setCurrentText("best")
    win._on_variant_changed(0)
    assert mm.checkpoint_path("MEL").name == "unet_MEL_best.pth"


def test_variant_availability_follows_active_variant(window):
    """Variants are a union across classes — selecting one that exists for
    only MEL must disable NV's checkbox (its load would fail) instead of
    letting the run silently produce zero NV images."""
    win, base = window
    ckpt = base / "checkpoints"
    if not (ckpt / "unet_MEL_distill4.pth").exists():
        torch.manual_seed(3)
        torch.save(UNet2DTorch(**TINY).state_dict(),
                   ckpt / "unet_MEL_distill4.pth")
    win._refresh_classes()
    win.variant_combo.setCurrentText("distill4")
    win._on_variant_changed(0)
    assert win.generator.model_manager.variant == "distill4"
    assert win.class_rows["MEL"][0].isEnabled()
    assert not win.class_rows["NV"][0].isEnabled()
    assert "distill4" in win.class_rows["NV"][0].toolTip()
    # back to 'best': both classes usable again
    win.variant_combo.setCurrentText("best")
    win._on_variant_changed(0)
    assert win.class_rows["NV"][0].isEnabled()
    assert win.class_rows["MEL"][0].isEnabled()


def test_variant_reset_when_checkpoints_vanish(window):
    """If the active variant's checkpoints disappear (e.g. the checkpoints
    dir is switched), the refresh must reset the GENERATOR's variant too —
    not just display 'best' while load_model keeps failing on the stale
    variant."""
    win, base = window
    ckpt = base / "checkpoints"
    path = ckpt / "unet_MEL_distill4.pth"
    if not path.exists():
        torch.manual_seed(3)
        torch.save(UNet2DTorch(**TINY).state_dict(), path)
    win._refresh_classes()
    win.variant_combo.setCurrentText("distill4")
    win._on_variant_changed(0)
    mm = win.generator.model_manager
    assert mm.variant == "distill4"
    path.unlink()
    win._refresh_classes()
    assert mm.variant == "best"
    assert mm.checkpoint_path("MEL").name == "unet_MEL_best.pth"
    assert win.class_rows["NV"][0].isEnabled()

# -- model-family selector (beyond-reference: conditional family) ---------------

COND_CLASSES = ["MEL", "NV", "VASC"]


def _write_conditional_checkpoint(ckpt_dir: Path, variant: str = "best",
                                  seed: int = 0):
    """Fabricate a tiny conditional checkpoint + its class metadata."""
    import dataclasses

    import jax
    import numpy as np

    from synt_isic_tpu.io.convert import flax_to_torch
    from synt_isic_tpu.io.pth import save_pth
    from synt_isic_tpu.models.unet2d import UNet2D, init_unet_params

    cond_cfg = dataclasses.replace(TINY_JAX,
                                   num_class_embeds=len(COND_CLASSES) + 1)
    params = init_unet_params(UNet2D(config=cond_cfg),
                              jax.random.PRNGKey(seed))
    host = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), params)
    save_pth(flax_to_torch(host), str(ckpt_dir / f"unet_conditional_{variant}.pth"))
    (ckpt_dir / f"unet_conditional_{variant}.json").write_text(json.dumps({
        "classes": COND_CLASSES,
        "num_class_embeds": len(COND_CLASSES) + 1,
        "null_label": len(COND_CLASSES)}))


@pytest.fixture(scope="module")
def cond_window(tmp_path_factory):
    """Window over a checkpoints dir holding BOTH families: per-class
    MEL/NV checkpoints and the single conditional checkpoint."""
    base = tmp_path_factory.mktemp("gui_cond")
    ckpt = base / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(1)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_MEL_best.pth")
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")
    _write_conditional_checkpoint(ckpt)
    from synt_isic_tpu.generator import ImageGenerator
    cfg = ConfigManager(config_file=str(base / "config.json"),
                        project_root=str(base))
    gen = ImageGenerator(config=cfg, checkpoints_dir=str(ckpt),
                         model_config=TINY_JAX)
    win = SyntheticDataGeneratorWindow(
        config=cfg, generator=gen, checkpoints_dir=str(ckpt),
        output_dir=str(base / "generated"),
        xai_results_dir=str(base / "xai_results"))
    return win, base


def _combo_items(combo):
    if qt_compat.QT_BACKEND == "stub":
        return list(combo._items)
    return [combo.itemText(i) for i in range(combo.count())]


def test_family_combo_offers_conditional_when_present(cond_window, window):
    win, _ = cond_window
    assert _combo_items(win.family_combo) == ["per-class", "conditional"]
    assert win.family_combo.currentText() == "per-class"
    assert not win.guidance_spin.isEnabled()
    # the conditional checkpoint is NOT a per-class entry named 'conditional'
    assert "conditional" not in win.generator.get_available_classes()
    # a dir without a conditional checkpoint offers only the per-class family
    plain_win, _ = window
    assert _combo_items(plain_win.family_combo) == ["per-class"]


def test_family_switch_to_conditional(cond_window):
    win, _ = cond_window
    win.guidance_spin.setValue(2.0)
    win.family_combo.setCurrentText("conditional")
    win._on_family_changed(1)
    mm = win.generator.model_manager
    assert mm.conditional
    assert win.generator.guidance_scale == 2.0
    assert win.guidance_spin.isEnabled()
    # class availability follows the conditional checkpoint's metadata
    for cls in COND_CLASSES:
        assert win.class_rows[cls][0].isEnabled()
    assert not win.class_rows["BCC"][0].isEnabled()
    assert "Available models: 3" in win.available_models_label.text()


@needs_stub
def test_conditional_generation_mixed_classes(cond_window):
    """End-to-end through the GUI worker: one conditional model, two
    classes in one run (the per-class family would need two checkpoints)."""
    win, base = cond_window
    if not win.generator.model_manager.conditional:
        win.family_combo.setCurrentText("conditional")
        win._on_family_changed(1)
    win.class_rows["MEL"][0].setChecked(True)
    win.class_rows["MEL"][1].setValue(1)
    win.class_rows["VASC"][0].setChecked(True)
    win.class_rows["VASC"][1].setValue(1)
    win.steps_spin.setValue(2)
    win.seed_mode.setCurrentText("fixed")
    win.seed_spin.setValue(3)
    win.start_btn.click()
    assert (base / "generated" / "MEL" / "ISIC_0000001.png").exists()
    assert (base / "generated" / "VASC" / "ISIC_0000001.png").exists()
    assert win.status_label.text().startswith("done:")


def test_guidance_spin_live_updates_generator(cond_window):
    win, _ = cond_window
    if not win.generator.model_manager.conditional:
        win.family_combo.setCurrentText("conditional")
        win._on_family_changed(1)
    win.guidance_spin.setValue(3.5)
    assert win.generator.guidance_scale == 3.5


def test_family_switch_back_to_per_class(cond_window):
    win, _ = cond_window
    if not win.generator.model_manager.conditional:
        win.family_combo.setCurrentText("conditional")
        win._on_family_changed(1)
    win.family_combo.setCurrentText("per-class")
    win._on_family_changed(0)
    mm = win.generator.model_manager
    assert not mm.conditional
    assert not win.guidance_spin.isEnabled()
    # per-class availability again: MEL/NV have checkpoints, VASC does not
    assert win.class_rows["MEL"][0].isEnabled()
    assert win.class_rows["NV"][0].isEnabled()
    assert not win.class_rows["VASC"][0].isEnabled()


def test_sampler_selector_live_and_survives_family_switch(cond_window):
    """Beyond-reference sampler selector: the combo updates the generator's
    scheduler kind + timestep spacing live, generation runs with a
    non-default sampler, and the choice survives a family switch (the
    rebuilt generator boots on the config default)."""
    win, base = cond_window
    win.sampler_combo.setCurrentText("unipc")
    win.spacing_combo.setCurrentText("trailing")
    win._on_sampler_changed(0)
    assert win.generator.scheduler_kind == "unipc"
    assert win.generator.timestep_spacing == "trailing"

    # a family switch rebuilds the generator — the window's sampler choice
    # must be re-applied, not silently reset to the config default
    want = "per-class" if win.generator.model_manager.conditional else "conditional"
    win.family_combo.setCurrentText(want)
    win._on_family_changed(0)
    assert win.generator.scheduler_kind == "unipc"
    assert win.generator.timestep_spacing == "trailing"

    # and a generation actually samples through the selected scheduler
    win.class_rows["MEL"][0].setChecked(True)
    win.class_rows["MEL"][1].setValue(1)
    for other in ("NV", "VASC"):
        win.class_rows[other][0].setChecked(False)
    win.out_edit.setText(str(base / "gen_unipc"))
    win.steps_spin.setValue(3)
    win.seed_mode.setCurrentText("fixed")
    win.seed_spin.setValue(9)
    win.start_btn.click()
    assert (base / "gen_unipc" / "MEL" / "ISIC_0000001.png").exists()
    sidecar = json.loads(
        (base / "gen_unipc" / "MEL" / "ISIC_0000001.json").read_text())
    assert sidecar["scheduler"]["kind"] == "unipc"
    assert sidecar["scheduler"]["timestep_spacing"] == "trailing"
