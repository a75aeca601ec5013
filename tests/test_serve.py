"""Generation service (`serve.py`): protocol, worker, coalescing."""
import json
import queue
import threading
from collections import deque
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from synt_isic_tpu.generator import ImageGenerator
from synt_isic_tpu.models.unet2d import UNet2DConfig
from synt_isic_tpu.serve import GenerationServer, _Request, drain_batch, request

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
def server(tmp_path_factory):
    ckpt = tmp_path_factory.mktemp("ckpt")
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")
    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen.set_inference_steps(4)
    srv = GenerationServer(
        gen, port=0, output_root=str(tmp_path_factory.mktemp("out"))).start()
    yield srv
    srv.stop()


def _rpc(server, payload):
    host, port = server.address
    return request(host, port, payload, timeout=120)


def test_classes_and_status(server):
    assert _rpc(server, {"op": "classes"}) == {"ok": True, "classes": ["NV"]}
    st = _rpc(server, {"op": "status"})
    assert st["ok"] and st["queue_depth"] == 0 and "generator" in st
    assert st["classes"] == ["NV"] and st["default_steps"] == 4
    assert isinstance(st["loaded_models"], list)


def test_unknown_op_and_missing_class(server):
    assert not _rpc(server, {"op": "nope"})["ok"]
    assert not _rpc(server, {"op": "generate"})["ok"]
    assert "unknown class" in _rpc(server, {"op": "generate",
                                            "class": "MEL"})["error"]


def test_warmup_then_generate(server):
    w = _rpc(server, {"op": "warmup", "class": "NV"})
    assert w["ok"] and "compiled_batches" not in w   # plain warmup: load only
    # compile:true builds + executes the b1 and device-batch executables
    w = _rpc(server, {"op": "warmup", "class": "NV", "compile": True,
                      "steps": 4})
    assert w["ok"] and w["steps"] == 4
    assert w["compiled_batches"] == sorted({1, server.generator.batch_size})
    r = _rpc(server, {"op": "generate", "class": "NV", "count": 2,
                      "seed": 42, "postprocess": False})
    assert r["ok"] and len(r["files"]) == 2 and r["coalesced"] == 1
    from pathlib import Path

    for f in r["files"]:
        assert Path(f).exists()
    # sidecar metadata records the reproducibility contract
    sidecar = json.loads(Path(r["files"][0]).with_suffix(".json").read_text())
    assert sidecar["seed"] is not None


def test_generate_is_reproducible_with_fixed_seed(server):
    r1 = _rpc(server, {"op": "generate", "class": "NV", "count": 1,
                       "seed": 7, "postprocess": False})
    r2 = _rpc(server, {"op": "generate", "class": "NV", "count": 1,
                       "seed": 7, "postprocess": False})
    from PIL import Image

    a = np.asarray(Image.open(r1["files"][0]))
    b = np.asarray(Image.open(r2["files"][0]))
    np.testing.assert_array_equal(a, b)


def test_steps_do_not_leak_between_requests(server):
    """A request's custom `steps` must not change later requests that omit
    steps (they get the server default, here 4)."""
    _rpc(server, {"op": "generate", "class": "NV", "count": 1, "steps": 2,
                  "seed": 5, "postprocess": False})
    r = _rpc(server, {"op": "generate", "class": "NV", "count": 1,
                      "seed": 5, "postprocess": False})
    from pathlib import Path

    sidecar = json.loads(Path(r["files"][0]).with_suffix(".json").read_text())
    assert sidecar["inference_steps"] == 4


def test_reused_output_dir_is_refused(server, tmp_path):
    out = tmp_path / "fixed"
    r1 = _rpc(server, {"op": "generate", "class": "NV", "count": 1,
                       "seed": 1, "postprocess": False,
                       "output_dir": str(out)})
    assert r1["ok"]
    r2 = _rpc(server, {"op": "generate", "class": "NV", "count": 1,
                       "seed": 2, "postprocess": False,
                       "output_dir": str(out)})
    assert not r2["ok"] and "already holds" in r2["error"]
    # the first client's served artifact is untouched
    from pathlib import Path

    assert Path(r1["files"][0]).exists()


def test_concurrent_requests_all_served(server):
    results = []

    def go(i):
        results.append(_rpc(server, {"op": "generate", "class": "NV",
                                     "count": 1, "postprocess": False}))

    threads = [threading.Thread(target=go, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 3 and all(r["ok"] for r in results)
    assert all(len(r["files"]) == 1 for r in results)


# -- coalescing unit tests (no device) -----------------------------------

def _req(**kw):
    payload = {"op": "generate", "class": "NV", "count": 1}
    payload.update(kw)
    return _Request(payload)


def test_drain_batch_merges_seedless_same_target():
    q = queue.Queue()
    first = _req(count=2)
    for r in [_req(count=3), _req(count=1)]:
        q.put(r)
    batch = drain_batch(q, first, max_batch=64)
    assert len(batch) == 3
    assert q.qsize() == 0


def test_drain_batch_keeps_fixed_seed_requests_separate():
    q = queue.Queue()
    backlog = deque()
    q.put(_req(seed=42))
    batch = drain_batch(q, _req(), max_batch=64, backlog=backlog)
    assert len(batch) == 1          # seeded request NOT merged
    # skipped request is held at the FRONT of the worker backlog (serviced
    # before new queue arrivals — no starvation)
    assert q.qsize() == 0 and len(backlog) == 1


def test_drain_batch_respects_max_batch_and_mixed_keys():
    q = queue.Queue()
    backlog = deque()
    q.put(_req(count=10))             # would overshoot 64 -> must NOT merge
    q.put(_req(count=4))              # fits -> merges
    q.put(_req(count=10, steps=99))   # different executable -> no merge
    batch = drain_batch(q, _req(count=60), max_batch=64, backlog=backlog)
    assert [int(r.payload["count"]) for r in batch] == [60, 4]
    # the overshoot request was skipped into the backlog (front of the
    # line); the drain stopped at max_batch so steps=99 stays queued
    assert len(backlog) == 1 and int(backlog[0].payload["count"]) == 10
    assert q.qsize() == 1


def test_drain_batch_scans_backlog_before_queue():
    """A request skipped by an earlier drain merges in a later compatible
    drain, ahead of newer queue arrivals — the anti-starvation contract."""
    q = queue.Queue()
    backlog = deque([_req(count=3), _req(count=2, steps=99)])
    q.put(_req(count=1))
    batch = drain_batch(q, _req(count=1), max_batch=64, backlog=backlog)
    # head + backlog match (3) + queue match (1); steps=99 stays backlogged
    assert [int(r.payload["count"]) for r in batch] == [1, 3, 1]
    assert len(backlog) == 1 and backlog[0].payload["steps"] == 99


def test_drain_batch_drops_cancelled_requests():
    q = queue.Queue()
    dead = _req()
    dead.cancelled = True
    q.put(dead)
    q.put(_req(count=2))
    batch = drain_batch(q, _req(count=1), max_batch=64)
    assert [int(r.payload["count"]) for r in batch] == [1, 2]
    assert q.qsize() == 0


def test_drain_batch_never_merges_warmup_with_generate():
    """A warmup op must not swallow queued generate requests (only the head
    request of a warmup batch gets a response — merged ones would hang)."""
    q = queue.Queue()
    q.put(_req())        # seedless generate
    warm = _Request({"op": "warmup", "class": "NV"})
    batch = drain_batch(q, warm, max_batch=64)
    assert len(batch) == 1
    assert q.qsize() == 1


def test_xai_requests_do_not_coalesce_with_plain():
    q = queue.Queue()
    backlog = deque()
    q.put(_req(xai=True))
    batch = drain_batch(q, _req(), max_batch=64, backlog=backlog)
    assert len(batch) == 1 and len(backlog) == 1


def test_drain_batch_cross_class_only_when_conditional():
    """Per-class serving never merges different classes (separate models);
    conditional serving (ignore_class=True) merges them — one model,
    per-image labels, one mixed device batch."""
    q = queue.Queue()
    backlog = deque()
    q.put(_req(**{"class": "MEL", "count": 2}))
    batch = drain_batch(q, _req(count=1), max_batch=64, backlog=backlog)
    assert len(batch) == 1 and len(backlog) == 1  # default: no cross-class

    q = queue.Queue()
    backlog = deque()
    q.put(_req(**{"class": "MEL", "count": 2}))
    q.put(_req(**{"class": "VASC", "count": 1, "steps": 7}))  # other steps
    batch = drain_batch(q, _req(count=1), max_batch=64, backlog=backlog,
                        ignore_class=True)
    assert [r.payload["class"] for r in batch] == ["NV", "MEL"]
    assert len(backlog) == 1  # differing steps still never merge


def test_conditional_server_coalesces_across_classes(tmp_path_factory):
    """Live conditional server: concurrent seedless requests for DIFFERENT
    classes run as ONE mixed-class device batch (coalesced=2) and each
    client gets its own class's files."""
    import dataclasses

    import jax
    from synt_isic_tpu.io.convert import flax_to_torch
    from synt_isic_tpu.io.pth import save_pth
    from synt_isic_tpu.models.unet2d import UNet2D, init_unet_params

    classes = ["MEL", "NV"]
    cond_cfg = dataclasses.replace(TINY_JAX, num_class_embeds=len(classes) + 1)
    model = UNet2D(config=cond_cfg)
    params = init_unet_params(model, jax.random.PRNGKey(0))
    ckpt = tmp_path_factory.mktemp("cond_serve_ckpt")
    host = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), params)
    save_pth(flax_to_torch(host), str(ckpt / "unet_conditional_best.pth"))
    (ckpt / "unet_conditional_best.json").write_text(json.dumps({
        "classes": classes, "num_class_embeds": len(classes) + 1,
        "null_label": len(classes)}))

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX,
                         conditional=True)
    gen.set_inference_steps(3)
    out_root = tmp_path_factory.mktemp("cond_serve_out")
    srv = GenerationServer(gen, port=0, output_root=str(out_root))
    # drive the worker path directly (no TCP/thread races): both requests
    # are pending before the drain, exactly the burst scenario
    out_dir = str(out_root / "mixed_run")
    r_mel = _Request({"op": "generate", "class": "MEL", "count": 1,
                      "output_dir": out_dir, "postprocess": False})
    r_nv = _Request({"op": "generate", "class": "NV", "count": 2,
                     "output_dir": out_dir, "postprocess": False})
    srv._queue.put(r_nv)
    batch = drain_batch(srv._queue, r_mel, srv.max_batch,
                        ignore_class=gen.model_manager.conditional)
    assert [r.payload["class"] for r in batch] == ["MEL", "NV"]
    srv._run_batch(batch)
    assert r_mel.response["ok"] and r_mel.response["coalesced"] == 2
    assert r_nv.response["ok"] and r_nv.response["coalesced"] == 2
    assert [Path(f).name for f in r_mel.response["files"]] == ["ISIC_0000001.png"]
    assert [Path(f).name for f in r_nv.response["files"]] == [
        "ISIC_0000001.png", "ISIC_0000002.png"]
    for r, cls in [(r_mel, "MEL"), (r_nv, "NV")]:
        assert r.response["class"] == cls
        for f in r.response["files"]:
            assert f"/{cls}/" in f and Path(f).exists()


def _lite_server(tmp_path_factory, name="ckpt_lane", **kwargs):
    ckpt = tmp_path_factory.mktemp(name)
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")
    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    return GenerationServer(
        gen, port=0, output_root=str(tmp_path_factory.mktemp(name + "_out")),
        **kwargs)


def test_fast_lane_jumps_bulk(tmp_path_factory):
    """An interactive request (count x steps <= interactive_cost) enqueued
    AFTER a bulk job is serviced first — the anti-head-of-line contract
    (VERDICT r2 #4). No worker started: drive _next_request directly."""
    srv = _lite_server(tmp_path_factory)
    bulk = _req(count=8, steps=1000)      # 8000 step-images: research job
    fast = _req(count=1, steps=20)        # 20: interactive preview
    srv._queue.put(bulk)
    srv._queue.put(fast)
    assert srv._next_request() is fast    # priority lane wins
    assert srv._next_request() is bulk    # bulk still served after


def test_interactive_classification(tmp_path_factory):
    srv = _lite_server(tmp_path_factory, name="ckpt_cls", interactive_cost=256)
    assert srv._is_interactive({"op": "generate", "count": 4, "steps": 50})
    assert not srv._is_interactive({"op": "generate", "count": 8, "steps": 50})
    assert not srv._is_interactive({"op": "generate", "count": 1, "steps": 1000})
    # steps omitted -> server default (50 here) applies
    assert srv._is_interactive({"op": "generate", "count": 2})
    # plain warmups ride the fast lane (one load, no generation)...
    assert srv._is_interactive({"op": "warmup", "class": "NV"})
    # ...but a compile warmup builds AND executes the serving executables
    # (tens of seconds of first-jit) — it must queue as bulk, never run in
    # the between-blocks fast lane ahead of b1 previews
    assert not srv._is_interactive({"op": "warmup", "class": "NV",
                                    "compile": True})


def test_drain_diverts_interactive_pulls_to_fast_lane():
    """A non-matching interactive request pulled during a bulk drain lands
    in the fast lane, not behind the bulk backlog."""
    q = queue.Queue()
    backlog = deque()
    fast = deque()
    q.put(_req(count=1, steps=20))   # interactive, key differs (steps)
    q.put(_req(count=8, steps=500))  # bulk, key differs
    classify = lambda p: int(p.get("count", 1)) * int(p.get("steps") or 50) <= 256
    batch = drain_batch(q, _req(count=4, steps=500), max_batch=64,
                        backlog=backlog, fast=fast, classify=classify)
    # steps=500 bulk merges with the head; steps=20 diverted to fast
    assert [int(r.payload["count"]) for r in batch] == [4, 8]
    assert len(fast) == 1 and fast[0].payload["steps"] == 20
    assert len(backlog) == 0


def test_status_reports_latency_metrics(tmp_path_factory):
    srv = _lite_server(tmp_path_factory, name="ckpt_lat")
    r1 = _req(count=1, steps=20)
    r2 = _req(count=8, steps=1000)
    srv._finish(r1, {"ok": True})
    srv._finish(r2, {"ok": True})
    status = srv._dispatch({"op": "status"})
    assert status["latency"]["n"] == 2
    assert status["interactive_latency"]["n"] == 1
    assert status["latency"]["p95_ms"] >= status["latency"]["p50_ms"] >= 0
    assert status["fast_lane_depth"] == 0
    assert "throughput_img_s" in status and "interactive_cost" in status


def test_status_latency_safe_under_concurrent_finish(tmp_path_factory):
    """The worker appends to the latency deques while `status` connection
    threads sort them — unguarded, CPython raises 'deque mutated during
    iteration' and the status client loses its connection."""
    srv = _lite_server(tmp_path_factory, name="ckpt_latrace")
    stop = threading.Event()
    errors = []

    def hammer():
        while not stop.is_set():
            srv._finish(_req(count=1, steps=20), {"ok": True})

    t = threading.Thread(target=hammer, daemon=True)
    t.start()
    try:
        for _ in range(300):
            try:
                status = srv._dispatch({"op": "status"})
                assert status["ok"]
            except RuntimeError as exc:  # pragma: no cover - the regression
                errors.append(exc)
    finally:
        stop.set()
        t.join(timeout=10)
    assert not errors


def test_interactive_served_mid_bulk_run(tmp_path_factory):
    """An interactive request that arrives while a long bulk job is running
    is served BETWEEN device blocks (the generator's between-blocks hook),
    finishing before the bulk job instead of behind it."""
    srv = _lite_server(tmp_path_factory, name="ckpt_midrun",
                       interactive_cost=10)
    srv.generator.batch_size = 1          # bulk count=3 -> 3 device blocks
    order = []
    orig_finish = srv._finish

    def tracking_finish(r, resp):
        order.append(r)
        orig_finish(r, resp)

    srv._finish = tracking_finish
    bulk = _req(count=3, steps=6, postprocess=False)       # cost 18 > 10
    inter = _req(count=1, steps=4, postprocess=False)      # cost 4 <= 10
    srv._queue.put(inter)   # "arrives" while the bulk batch runs
    srv._run_batch([bulk])  # worker-thread path, run synchronously
    assert inter.event.is_set() and bulk.event.is_set()
    assert inter.response["ok"], inter.response
    assert inter.response.get("interactive") is True
    assert bulk.response["ok"], bulk.response
    assert order[0] is inter               # finished BEFORE the bulk job
    # the interactive run must not disturb the bulk run's generator state
    assert len(bulk.response["files"]) == 3
    assert len(inter.response["files"]) == 1
    # interactive sidecar pins its own steps, bulk keeps its own
    import json as _json
    inter_sc = _json.loads(Path(inter.response["files"][0])
                           .with_suffix(".json").read_text())
    bulk_sc = _json.loads(Path(bulk.response["files"][0])
                          .with_suffix(".json").read_text())
    assert inter_sc["inference_steps"] == 4
    assert bulk_sc["inference_steps"] == 6


def test_shutdown_drains_pending_requests(tmp_path_factory):
    """On shutdown every queued/backlogged request gets an ok:false reply
    immediately — blocked clients must not hang until timeout_s."""
    ckpt = tmp_path_factory.mktemp("ckpt_drain")
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")
    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    srv = GenerationServer(gen, port=0,
                           output_root=str(tmp_path_factory.mktemp("out_d")))
    # do NOT start the worker: simulate requests stuck behind a long job
    queued = _req()
    backlogged = _req(seed=7)
    srv._queue.put(queued)
    srv._backlog.append(backlogged)
    srv._stop.set()
    srv._queue.put(None)
    srv._work_loop()  # run the loop body directly; exits via the sentinel
    for r in (queued, backlogged):
        assert r.event.is_set()
        assert r.response["ok"] is False
        assert "shutting down" in r.response["error"]


@pytest.mark.slow
def test_generate_with_xai_returns_artifacts(tmp_path_factory):
    """XAI-as-a-service: "xai": true runs the integrated pipeline on each
    served image's captured trajectory."""
    from synt_isic_tpu.xai.integration import create_integrated_xai_analyzer

    ckpt = tmp_path_factory.mktemp("ckpt_xai")
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")
    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen.set_inference_steps(4)
    srv = GenerationServer(
        gen, port=0, output_root=str(tmp_path_factory.mktemp("out_xai")),
        xai_analyzer_factory=lambda: create_integrated_xai_analyzer(
            ig_n_steps=2, shap_n_samples=4, n_bootstrap=20, n_permutations=20,
            with_sanity=False, verbose=False)).start()
    try:
        host, port = srv.address
        r = request(host, port, {"op": "generate", "class": "NV", "count": 1,
                                 "seed": 3, "postprocess": False,
                                 "xai": True}, timeout=600)
        assert r["ok"], r
        from pathlib import Path

        xai_dir = Path(r["xai_dir"])
        assert xai_dir.exists()
        assert any(xai_dir.rglob("analysis_results.json"))
        # a later non-xai request must not run the pipeline
        r2 = request(host, port, {"op": "generate", "class": "NV",
                                  "count": 1, "seed": 4,
                                  "postprocess": False}, timeout=600)
        assert r2["ok"] and "xai_dir" not in r2
    finally:
        srv.stop()


def test_protocol_bad_json_and_persistent_connection(server):
    """One connection can carry several newline-delimited requests, and a
    malformed line gets an error reply without killing the connection."""
    import socket

    host, port = server.address
    with socket.create_connection((host, port), timeout=60) as sock:
        f = sock.makefile("rwb")
        for payload, check in [
            (b"{not json}\n", lambda r: not r["ok"] and "bad json" in r["error"]),
            (b'{"op": "classes"}\n', lambda r: r["ok"] and r["classes"] == ["NV"]),
            (b'{"op": "status"}\n', lambda r: r["ok"]),
        ]:
            f.write(payload)
            f.flush()
            reply = json.loads(f.readline().decode())
            assert check(reply), reply


@pytest.mark.slow
def test_fast_variant_lane(tmp_path_factory):
    """{"fast": true} samples the distilled fast variant through the live
    socket protocol: priority classification, dedicated generator, variant
    recorded in the reply and the sidecar; clean error when no fast
    variant is configured; warmup can pre-compile the fast executables."""
    ckpt = tmp_path_factory.mktemp("ckpt_fast")
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")
    torch.manual_seed(9)  # student weights deliberately differ
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_distill2.pth")

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen.set_inference_steps(4)
    fast = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX,
                          model_variant="distill2")
    fast.set_inference_steps(2)
    fast.timestep_spacing = "trailing"
    fast.save_trajectory = False
    out_root = tmp_path_factory.mktemp("out_fast")
    srv = GenerationServer(gen, port=0, output_root=str(out_root),
                           fast_generator=fast).start()
    try:
        st = _rpc(srv, {"op": "status"})
        assert st["fast_variant"] == {"variant": "distill2", "steps": 2,
                                      "timestep_spacing": "trailing"}
        # fast requests classify as interactive regardless of cost budget
        assert srv._is_interactive({"op": "generate", "class": "NV",
                                    "count": 1, "fast": True})
        w = _rpc(srv, {"op": "warmup", "class": "NV", "fast": True,
                       "compile": True})
        assert w["ok"] and w["steps"] == 2
        r = _rpc(srv, {"op": "generate", "class": "NV", "count": 1,
                       "seed": 7, "fast": True, "postprocess": False})
        assert r["ok"], r
        assert r["fast_variant"] == "distill2" and r["fast_steps"] == 2
        assert r["interactive"] is True
        meta = json.loads(Path(r["files"][0]).with_suffix(".json")
                          .read_text())
        assert meta["scheduler"]["model_variant"] == "distill2"
        assert meta["scheduler"]["timestep_spacing"] == "trailing"
        assert meta["inference_steps"] == 2
        # the student's bytes differ from the same request on 'best'
        # (different weights prove the fast lane used its own generator)
        r_best = _rpc(srv, {"op": "generate", "class": "NV", "count": 1,
                            "seed": 7, "steps": 2, "postprocess": False})
        assert r_best["ok"] and "fast_variant" not in r_best
        assert (Path(r["files"][0]).read_bytes()
                != Path(r_best["files"][0]).read_bytes())
        # fast previews are capped at max_batch
        cap = _rpc(srv, {"op": "generate", "class": "NV",
                         "count": srv.max_batch + 1, "fast": True})
        assert not cap["ok"] and "capped" in cap["error"]
    finally:
        srv.stop()

    # a server without a fast generator refuses fast requests cleanly
    srv2 = GenerationServer(gen, port=0, output_root=str(out_root)).start()
    try:
        r = _rpc(srv2, {"op": "generate", "class": "NV", "count": 1,
                        "fast": True})
        assert not r["ok"] and "no fast variant" in r["error"]
        st = _rpc(srv2, {"op": "status"})
        assert st["fast_variant"] is None
    finally:
        srv2.stop()


def test_warmup_compiles_the_exact_generate_executable(tmp_path_factory):
    """Regression: warmup must build the sampler with the generator's
    timestep_spacing — a trailing-configured server used to warm a
    'leading' executable and the first real request still paid first-jit."""
    ckpt = tmp_path_factory.mktemp("ckpt_warm")
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")
    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen.set_inference_steps(3)
    gen.timestep_spacing = "trailing"
    srv = GenerationServer(gen, port=0,
                           output_root=str(tmp_path_factory.mktemp("o"))).start()
    try:
        w = _rpc(srv, {"op": "warmup", "class": "NV", "compile": True})
        assert w["ok"] and w["steps"] == 3
        warmed = set(gen.model_manager._samplers)
        r = _rpc(srv, {"op": "generate", "class": "NV", "count": 1,
                       "seed": 1, "postprocess": False})
        assert r["ok"], r
        assert set(gen.model_manager._samplers) == warmed, \
            "generate built a sampler the warmup did not pre-build"
    finally:
        srv.stop()


def test_mesh_backed_serving_is_bit_identical(tmp_path_factory):
    """`--mesh` serving (ShardedSampler over the virtual 8-device mesh)
    must return byte-identical images to the single-device server for the
    same fixed seed, warm the PARTITIONED executable, and report the mesh
    in status."""
    from PIL import Image

    from synt_isic_tpu.parallel.mesh import create_mesh

    ckpt = tmp_path_factory.mktemp("ckpt_mesh")
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")

    def run(mesh):
        gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
        gen.set_inference_steps(3)
        if mesh is not None:
            gen.set_mesh(mesh)
        srv = GenerationServer(
            gen, port=0,
            output_root=str(tmp_path_factory.mktemp("out_mesh"))).start()
        try:
            w = _rpc(srv, {"op": "warmup", "class": "NV", "compile": True})
            assert w["ok"], w
            if mesh is not None:
                assert w.get("mesh") == {"data": 8}
            st = _rpc(srv, {"op": "status"})
            assert st["mesh"] == ({"data": 8} if mesh is not None else None)
            # count=3 exercises the pad path (3 seeds on 8 shards)
            r = _rpc(srv, {"op": "generate", "class": "NV", "count": 3,
                           "seed": 11, "postprocess": False})
            assert r["ok"], r
            return [np.asarray(Image.open(f)) for f in r["files"]]
        finally:
            srv.stop()

    single = run(None)
    sharded = run(create_mesh({"data": 8}))
    assert len(single) == len(sharded) == 3
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a, b)


def test_mesh_server_threads_mesh_into_xai_analyzer(tmp_path_factory):
    """XAI-as-a-service on a mesh-backed server must shard the heavy
    attribution kernels over the SAME mesh (bit-identity of the sharded
    kernels themselves is test_sharded_attribution.py; this pins the
    wiring)."""
    from synt_isic_tpu.parallel.mesh import create_mesh

    ckpt = tmp_path_factory.mktemp("ckpt_mesh_xai")
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")
    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    mesh = create_mesh({"data": 8})
    gen.set_mesh(mesh)
    srv = GenerationServer(gen, port=0,
                           output_root=str(tmp_path_factory.mktemp("o")))
    try:
        analyzer = srv._get_xai_analyzer()
        assert analyzer.mesh is mesh
    finally:
        srv.stop()


def test_fast_lane_scheduler_only_same_weights(tmp_path_factory):
    """Fast lane on the SAME checkpoint with a few-step solver override
    (the measured Pareto-best preview config — `serve --fast-scheduler
    unipc --fast-steps N`): replies and sidecars record the solver, and
    the preview pixels come from the same weights as bulk."""
    ckpt = tmp_path_factory.mktemp("ckpt_fast_sched")
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen.set_inference_steps(6)
    fast = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    fast.set_inference_steps(2)
    fast.scheduler_kind = "unipc"
    fast.timestep_spacing = "trailing"
    fast.save_trajectory = False
    out_root = tmp_path_factory.mktemp("out_fast_sched")
    srv = GenerationServer(gen, port=0, output_root=str(out_root),
                           fast_generator=fast).start()
    try:
        st = _rpc(srv, {"op": "status"})
        assert st["fast_variant"] == {"variant": "best", "steps": 2,
                                      "timestep_spacing": "trailing"}
        r = _rpc(srv, {"op": "generate", "class": "NV", "count": 1,
                       "seed": 5, "fast": True, "postprocess": False})
        assert r["ok"], r
        assert r["fast_variant"] == "best" and r["fast_steps"] == 2
        meta = json.loads(Path(r["files"][0]).with_suffix(".json")
                          .read_text())
        assert meta["scheduler"]["kind"] == "unipc"
        assert meta["scheduler"]["timestep_spacing"] == "trailing"
        assert meta["inference_steps"] == 2
        # same weights as bulk: the preview sidecar records the MAIN
        # variant ('best'), not a separate student checkpoint
        assert meta["scheduler"]["model_variant"] == "best"
    finally:
        srv.stop()


@pytest.mark.slow
def test_scheduler_only_fast_lane_shares_weights(tmp_path_factory):
    """A scheduler-only fast lane (same variant as the main generator)
    shares the main ModelManager — weights load ONCE and stay resident
    once — while sampler kind/steps stay per-lane (they are per-call
    arguments). This is the wiring serve's --fast-scheduler sets up."""
    ckpt = tmp_path_factory.mktemp("ckpt_sched_fast")
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen.set_inference_steps(4)
    fast = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    fast.model_manager = gen.model_manager  # what serve main() does
    fast.set_inference_steps(2)
    fast.scheduler_kind = "ddim"
    fast.timestep_spacing = "trailing"
    fast.save_trajectory = False
    out_root = tmp_path_factory.mktemp("out_sched_fast")
    srv = GenerationServer(gen, port=0, output_root=str(out_root),
                           fast_generator=fast).start()
    try:
        r = _rpc(srv, {"op": "generate", "class": "NV", "count": 1,
                       "seed": 7, "fast": True, "postprocess": False})
        assert r["ok"], r
        meta = json.loads(Path(r["files"][0]).with_suffix(".json")
                          .read_text())
        assert meta["inference_steps"] == 2
        assert meta["scheduler"]["kind"] == "ddim"
        assert meta["scheduler"]["timestep_spacing"] == "trailing"
        # ONE param tree: both lanes point at the same loaded weights
        assert fast.model_manager is gen.model_manager
        assert gen.model_manager.loaded_params["NV"] is \
            fast.model_manager.loaded_params["NV"]
        # the main lane still samples with ITS sampler settings
        r_main = _rpc(srv, {"op": "generate", "class": "NV", "count": 1,
                            "seed": 7, "postprocess": False})
        assert r_main["ok"], r_main
        meta_main = json.loads(Path(r_main["files"][0]).with_suffix(".json")
                               .read_text())
        assert meta_main["inference_steps"] == 4
        assert meta_main["scheduler"]["kind"] == "ddpm"
    finally:
        srv.stop()
