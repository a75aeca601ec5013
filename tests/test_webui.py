"""HTTP-level tests for the browser thin client (`app/webui.py`).

The real server is started on a loopback port and driven with urllib —
the same four-panel functionality the Qt window tests cover
(`tests/test_gui.py`), but through the web surface: state/telemetry,
generation through the single worker thread, the results + XAI browsers,
incremental logs, and the file-serving sandbox.
"""
import json
import pickle
import time
import urllib.error
import urllib.request
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

from synt_isic_tpu.app.webui import WebUIServer
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


def _get(app, path, raw=False):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{app.port}{path}", timeout=30) as r:
        body = r.read()
        return body if raw else json.loads(body)


def _post(app, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{app.port}{path}",
        data=json.dumps(obj).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post_err(app, path, obj):
    try:
        return _post(app, path, obj)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def app(tmp_path_factory):
    base = tmp_path_factory.mktemp("webui")
    ckpt = base / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_MEL_best.pth")
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")
    from synt_isic_tpu.generator import ImageGenerator

    cfg = ConfigManager(config_file=str(base / "config.json"),
                        project_root=str(base))
    gen = ImageGenerator(config=cfg, checkpoints_dir=str(ckpt),
                         model_config=TINY_JAX)
    server = WebUIServer(generator=gen, config=cfg,
                         checkpoints_dir=str(ckpt),
                         output_dir=str(base / "generated")).start()
    yield server, base
    server.stop()


def _wait_idle(server, timeout=120.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if not _get(server, "/api/state")["busy"]:
            return
        time.sleep(0.2)
    raise TimeoutError("generation did not finish")


def test_index_page_served(app):
    server, _ = app
    page = _get(server, "/", raw=True).decode()
    assert "SYNT-ISIC" in page and "/api/state" in page


def test_state_reports_classes_and_config(app):
    server, base = app
    s = _get(server, "/api/state")
    assert s["classes"]["MEL"] and s["classes"]["NV"]
    assert not s["classes"]["BCC"]
    assert s["family"] == "per-class" and s["variant"] == "best"
    assert not s["busy"]
    assert s["output_dir"] == str((base / "generated").resolve())
    # xai_results defaults to living under the output dir (where the
    # integrated analyzer actually writes)
    assert s["xai_results_dir"].startswith(s["output_dir"])
    assert s["config"]["image_size"] == 128  # config default, not model's


def test_generate_validation_errors(app):
    server, _ = app
    code, resp = _post_err(server, "/api/generate", {"classes": {}})
    assert code == 400 and "at least one" in resp["error"]
    code, resp = _post_err(server, "/api/generate",
                           {"classes": {"NOPE": 1}})
    assert code == 400 and "NOPE" in resp["error"]


def test_generate_end_to_end_and_browsers(app):
    server, base = app
    code, resp = _post(server, "/api/generate", {
        "classes": {"MEL": 2}, "steps": 2,
        "seed_mode": "fixed", "seed": 42, "postprocess": True})
    assert code == 200 and resp["ok"]
    _wait_idle(server)
    s = _get(server, "/api/state")
    assert s["last_result"]["generated"] == 2
    assert s["progress"]["done"] == s["progress"]["total"] > 0

    res = _get(server, "/api/results")
    assert len(res["files"]) == 2
    entry = res["files"][0]
    assert entry["name"].startswith("MEL/ISIC_")
    assert "sidecar" in entry

    png = _get(server, "/api/file?path=" + entry["path"], raw=True)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    sidecar = json.loads(_get(server, "/api/file?path=" + entry["sidecar"],
                              raw=True))
    assert sidecar["class"] == "MEL" and sidecar["seed"] is not None
    assert sidecar["inference_steps"] == 2


def test_logs_are_incremental(app):
    server, _ = app
    first = _get(server, "/api/logs?since=0")
    assert first["entries"] and first["next"] > 0
    again = _get(server, f"/api/logs?since={first['next']}")
    assert again["entries"] == []


def test_stop_endpoint_ok_when_idle(app):
    server, _ = app
    code, resp = _post(server, "/api/stop", {})
    assert code == 200 and resp["ok"]


def test_file_sandbox_blocks_traversal(app):
    server, base = app
    for path in ("/etc/passwd",
                 str(base / "generated" / ".." / ".." / "etc" / "passwd"),
                 str(base / "config.json"),
                 ""):
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{server.port}/api/file?path=" + path,
                    timeout=10) as r:
                assert False, f"served {path}: {r.status}"
        except urllib.error.HTTPError as e:
            assert e.code == 404


def test_xai_browser_lists_runs_and_serves_artifacts(app):
    server, _ = app
    run_dir = server.xai_results_dir / "MEL" / "demo_seed42"
    run_dir.mkdir(parents=True, exist_ok=True)
    (run_dir / "analysis_results.json").write_text(
        json.dumps({"target_class": "MEL"}))
    with open(run_dir / "full_results.pkl", "wb") as f:
        pickle.dump({"cfi": [1.0, 2.0], "nested": {"a": (1, 2)}}, f)

    runs = _get(server, "/api/xai/runs")["runs"]
    match = [r for r in runs if r["name"] == "demo_seed42"]
    assert match and match[0]["class"] == "MEL"

    files = _get(server, "/api/xai/files?run=" + match[0]["path"])["files"]
    names = {f["name"] for f in files}
    assert {"analysis_results.json", "full_results.pkl"} <= names

    pkl_view = _get(server, "/api/file?path=" + str(run_dir /
                    "full_results.pkl"), raw=True).decode()
    assert "dict(2 keys)" in pkl_view and "'cfi'" in pkl_view

    outside = _get(server, "/api/xai/files?run=/etc")
    assert outside["files"] == [] and "outside" in outside["error"]


def test_busy_guard_rejects_concurrent_generate(app):
    server, _ = app
    code, _ = _post(server, "/api/generate", {
        "classes": {"NV": 1}, "steps": 2, "seed_mode": "fixed", "seed": 1})
    assert code == 200
    # the worker is alive for at least the model-load + sampling time;
    # a second request during that window must 409
    code2, resp2 = _post_err(server, "/api/generate",
                             {"classes": {"MEL": 1}, "steps": 2})
    if code2 != 409:  # raced past completion on a fast machine: still fine
        _wait_idle(server)
        pytest.skip("first generation finished before the second request")
    assert "already running" in resp2["error"]
    _wait_idle(server)


# -- conditional-family mode (VERDICT r4 housekeeping: webui coverage) -----------

@pytest.fixture(scope="module")
def cond_app(tmp_path_factory):
    """Server over ONE conditional checkpoint serving every class."""
    import dataclasses

    import jax
    import numpy as np

    from synt_isic_tpu.io.convert import flax_to_torch
    from synt_isic_tpu.io.pth import save_pth
    from synt_isic_tpu.models.unet2d import UNet2D, init_unet_params

    classes = ["MEL", "NV", "VASC"]
    cond_cfg = UNet2DConfig(
        sample_size=16, block_out_channels=(8, 8), layers_per_block=1,
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        norm_num_groups=4, attention_head_dim=4,
        num_class_embeds=len(classes) + 1)
    base = tmp_path_factory.mktemp("webui_cond")
    ckpt = base / "checkpoints"
    ckpt.mkdir()
    params = init_unet_params(UNet2D(config=cond_cfg), jax.random.PRNGKey(0))
    host = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), params)
    save_pth(flax_to_torch(host), str(ckpt / "unet_conditional_best.pth"))
    (ckpt / "unet_conditional_best.json").write_text(json.dumps({
        "classes": classes, "num_class_embeds": len(classes) + 1,
        "null_label": len(classes)}))
    from synt_isic_tpu.generator import ImageGenerator

    cfg = ConfigManager(config_file=str(base / "config.json"),
                        project_root=str(base))
    gen = ImageGenerator(
        config=cfg, checkpoints_dir=str(ckpt),
        model_config=dataclasses.replace(cond_cfg, num_class_embeds=None),
        conditional=True, guidance_scale=2.0)
    server = WebUIServer(generator=gen, config=cfg,
                         checkpoints_dir=str(ckpt),
                         output_dir=str(base / "generated")).start()
    yield server, base, classes
    server.stop()


def test_conditional_state_reports_family_and_classes(cond_app):
    server, _, classes = cond_app
    state = _get(server, "/api/state")
    assert state["family"] == "conditional"
    available = {c for c, ok in state["classes"].items() if ok}
    assert available == set(classes)


def test_conditional_generate_end_to_end(cond_app):
    server, base, classes = cond_app
    status, body = _post(server, "/api/generate", {
        "classes": {"NV": 1}, "steps": 2, "seed_mode": "fixed", "seed": 7})
    assert status == 200, body
    _wait_idle(server)
    out = list((base / "generated" / "NV").glob("ISIC_*.png"))
    assert len(out) == 1
    # sidecar records the conditional provenance (guidance + class id)
    sidecar = json.loads(out[0].with_suffix(".json").read_text())
    blob = json.dumps(sidecar)
    assert "guidance" in blob and "conditional" in blob
