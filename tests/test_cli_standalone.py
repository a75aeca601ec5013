"""End-to-end tests for the console CLI and the standalone XAI entry,
using fabricated tiny checkpoints."""
import json
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from synt_isic_tpu.cli import ConsoleGenerator
from synt_isic_tpu.models.unet2d import UNet2DConfig
from synt_isic_tpu.xai.standalone import run_standalone_xai

from tests.torch_oracle.unet2d_torch import UNet2DTorch, tiny_config

TINY = tiny_config()
TINY_JAX = UNet2DConfig(
    sample_size=TINY["sample_size"], layers_per_block=TINY["layers_per_block"],
    block_out_channels=TINY["block_out_channels"],
    down_block_types=TINY["down_block_types"],
    up_block_types=TINY["up_block_types"],
    attention_head_dim=TINY["attention_head_dim"],
    norm_num_groups=TINY["norm_num_groups"])


@pytest.fixture(scope="module")
def base_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("base")
    ckpt = base / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_MEL_best.pth")
    return base


def test_console_generator_dataset(base_dir):
    gen = ConsoleGenerator(base_dir=str(base_dir), inference_steps=3,
                           batch_size=2, seed=0, model_config=TINY_JAX)
    produced = gen.generate({"MEL": 3})
    assert produced == {"MEL": 3}
    files = sorted((base_dir / "ISIC2018_Task3_synt").glob("ISIC_*.jpg"))
    assert [f.name for f in files] == ["ISIC_0034321.jpg", "ISIC_0034322.jpg",
                                      "ISIC_0034323.jpg"]
    csv_lines = (base_dir / "ISIC2018_Task3_GroundTruth_synt.csv") \
        .read_text().strip().splitlines()
    assert csv_lines[0] == "image,MEL,NV,BCC,AKIEC,BKL,DF,VASC"
    assert csv_lines[1].startswith("ISIC_0034321.jpg,1.0,0.0")
    # numbering resumes across instances
    gen2 = ConsoleGenerator(base_dir=str(base_dir), inference_steps=3,
                            batch_size=2, seed=1, model_config=TINY_JAX)
    assert gen2.last_isic_number == 34323
    gen2.generate({"MEL": 1})
    assert (base_dir / "ISIC2018_Task3_synt" / "ISIC_0034324.jpg").exists()
    assert len((base_dir / "ISIC2018_Task3_GroundTruth_synt.csv")
               .read_text().strip().splitlines()) == 5


def test_console_generator_missing_class(base_dir):
    gen = ConsoleGenerator(base_dir=str(base_dir), inference_steps=2,
                           model_config=TINY_JAX)
    produced = gen.generate({"VASC": 2})
    assert produced == {"VASC": 0}


@pytest.mark.slow
def test_standalone_xai(base_dir, tmp_path):
    results = run_standalone_xai(
        target_class="MEL", seed=11, inference_steps=4, save_every=2,
        checkpoints_dir=str(base_dir / "checkpoints"),
        results_dir=str(tmp_path / "xai_out"),
        model_config=TINY_JAX, ig_n_steps=2, shap_n_samples=4,
        n_bootstrap=20, n_permutations=50, with_gradcam=False,
        with_sanity=False, log=lambda *a: None)
    assert results is not None
    # save_every=2 over 4 steps -> frames at step idx {0, 2, 3}
    assert results["metadata"]["n_timesteps"] == 3
    out = tmp_path / "xai_out"
    assert (out / "analysis_results.json").exists()
    assert (out / "time_shap_analysis.png").exists()


def test_standalone_main_env_dir_overrides(tmp_path, monkeypatch):
    """`XAI_CHECKPOINTS_DIR` / `XAI_RESULTS_DIR` (the web UI's subprocess
    launch) reach run_standalone_xai, with the results dir following the
    browser layout xai_results/<class>/<run>."""
    import synt_isic_tpu.xai.standalone as st

    captured = {}
    monkeypatch.setattr(
        st, "run_standalone_xai",
        lambda **kw: captured.update(kw) or {"ok": True})
    monkeypatch.setenv("XAI_TARGET_CLASS", "NV")
    monkeypatch.setenv("XAI_GENERATION_SEED", "7")
    monkeypatch.setenv("XAI_CHECKPOINTS_DIR", str(tmp_path / "ckpt"))
    monkeypatch.setenv("XAI_RESULTS_DIR", str(tmp_path / "xout"))
    assert st.main() == 0
    assert captured["checkpoints_dir"] == str(tmp_path / "ckpt")
    run_dir = Path(captured["results_dir"])
    assert run_dir.parent == tmp_path / "xout" / "NV"
    assert run_dir.name.startswith("standalone_seed7_")
    # without the env vars the defaults stay None (cwd-relative behavior)
    monkeypatch.delenv("XAI_CHECKPOINTS_DIR")
    monkeypatch.delenv("XAI_RESULTS_DIR")
    captured.clear()
    assert st.main() == 0
    assert captured["checkpoints_dir"] is None
    assert captured["results_dir"] is None


def test_console_generator_dp_mesh_layout_independent(tmp_path):
    """--dp-mesh sampling produces byte-identical artifacts to the
    single-device run: per-seed RNG streams make the batch independent of
    the device layout (same guarantee as ShardedSampler's tests, here
    through the CLI surface)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    from synt_isic_tpu.parallel.mesh import create_mesh

    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_MEL_best.pth")

    outs = {}
    for tag, mesh in (("single", None), ("mesh", create_mesh({"data": 8}))):
        base = tmp_path / tag
        base.mkdir()
        gen = ConsoleGenerator(base_dir=str(base), checkpoints_dir=str(ckpt),
                               inference_steps=3, batch_size=8, seed=7,
                               model_config=TINY_JAX, mesh=mesh)
        gen.generate({"MEL": 8}, output_dir=str(base / "out"),
                     postprocess=False)
        outs[tag] = sorted((base / "out").glob("ISIC_*.jpg"))
        assert len(outs[tag]) == 8
    for a, b in zip(outs["single"], outs["mesh"]):
        assert a.read_bytes() == b.read_bytes(), a.name


@pytest.mark.slow
def test_standalone_xai_conditional(tmp_path):
    """Conditional-family standalone XAI: the env-var subprocess protocol's
    XAI_CONDITIONAL/XAI_GUIDANCE_SCALE path — analyze the single
    class-conditional checkpoint's CFG-guided trajectory."""
    import dataclasses

    import jax

    from synt_isic_tpu.io.convert import flax_to_torch
    from synt_isic_tpu.io.pth import save_pth
    from synt_isic_tpu.models.unet2d import UNet2D, init_unet_params

    classes = ["MEL", "NV", "VASC"]
    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    cond_cfg = dataclasses.replace(TINY_JAX, num_class_embeds=len(classes) + 1)
    params = init_unet_params(UNet2D(config=cond_cfg), jax.random.PRNGKey(2))
    host = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), params)
    save_pth(flax_to_torch(host), str(ckpt / "unet_conditional_best.pth"))
    (ckpt / "unet_conditional_best.json").write_text(json.dumps({
        "classes": classes, "num_class_embeds": len(classes) + 1,
        "null_label": len(classes)}))

    results = run_standalone_xai(
        target_class="NV", seed=5, inference_steps=4, save_every=2,
        checkpoints_dir=str(ckpt), results_dir=str(tmp_path / "xai_out"),
        model_config=TINY_JAX, ig_n_steps=2, shap_n_samples=4,
        n_bootstrap=20, n_permutations=50, with_gradcam=False,
        with_sanity=False, conditional=True, guidance_scale=2.0,
        log=lambda *a: None)
    assert results is not None
    assert results["metadata"]["n_timesteps"] == 3
    assert (tmp_path / "xai_out" / "analysis_results.json").exists()


def test_console_jpeg_sidecar_reproduce(base_dir, tmp_path):
    """Console artifacts (JPEG q95, mean-shift postprocess, flat naming)
    must honor the reproduce contract too: the sidecar records the sampler
    (kind/dtype/spacing), the JPEG encode settings, and the device-block
    layout, and `--reproduce` re-encodes byte-identically. Previously these
    sidecars carried only the static reference fields — a DDIM run would
    silently mis-reproduce as DDPM f32 through the PNG writer."""
    from synt_isic_tpu.cli import reproduce_from_sidecar

    out_dir = tmp_path / "console_run"
    gen = ConsoleGenerator(base_dir=str(base_dir), inference_steps=3,
                           batch_size=2, seed=7, scheduler="ddim",
                           model_config=TINY_JAX)
    produced = gen.generate({"MEL": 2}, output_dir=str(out_dir))
    assert produced == {"MEL": 2}

    jpgs = sorted(out_dir.glob("ISIC_*.jpg"))
    metas = [json.loads(p.with_suffix(".json").read_text()) for p in jpgs]
    for i, m in enumerate(metas):
        assert m["scheduler"]["kind"] == "ddim"
        assert m["scheduler"]["dtype"] in ("float32", "bfloat16")
        assert m["artifact"] == {"format": "jpeg", "quality": 95,
                                 "postprocess": "mean_shift"}
        assert m["block"]["index"] == i and len(m["block"]["seeds"]) == 2

    # reproduce the SECOND image of the block through the CLI function
    sidecar = jpgs[1].with_suffix(".json")
    redo = tmp_path / "redo.jpg"
    rc = reproduce_from_sidecar(str(sidecar),
                                str(base_dir / "checkpoints"),
                                output=str(redo), model_config=TINY_JAX)
    assert rc == 0
    assert redo.read_bytes() == jpgs[1].read_bytes()

    # --no-postprocess console runs record postprocess: null and reproduce
    out2 = tmp_path / "console_raw"
    gen.generate({"MEL": 1}, output_dir=str(out2), postprocess=False)
    raw = sorted(out2.glob("ISIC_*.jpg"))[0]
    meta = json.loads(raw.with_suffix(".json").read_text())
    assert meta["artifact"]["postprocess"] is None
    assert "block" not in meta  # single-image block stays unannotated
    rc = reproduce_from_sidecar(str(raw.with_suffix(".json")),
                                str(base_dir / "checkpoints"),
                                output=str(tmp_path / "redo2.jpg"),
                                model_config=TINY_JAX)
    assert rc == 0
    assert (tmp_path / "redo2.jpg").read_bytes() == raw.read_bytes()
