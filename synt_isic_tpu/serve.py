"""Long-lived generation service: models stay hot, requests get batched.

The reference's closest analog is `diffusion/console_generator_server.py`
— despite the name a one-shot CLI that re-loads the model for EVERY image
(`console_generator_server.py:220-242`). For production serving on TPU the
expensive state is the opposite of disposable: converted checkpoints,
jitted executables, and device-resident params amortize across requests.
This daemon keeps an `ImageGenerator` resident and serves a newline-
delimited JSON protocol over TCP:

  {"op": "classes"}                          -> {"ok": true, "classes": [..]}
  {"op": "status"}                           -> {"ok": true, ...queue/stats}
  {"op": "warmup", "class": "NV",
   "compile": true?, "steps": 50?}           -> load weights; compile:true
                                                also builds+runs the b1 and
                                                device-batch executables so
                                                no client pays first-jit
  {"op": "generate", "class": "NV", "count": 4,
   "seed": 42?, "steps": 50?, "output_dir": "..."?,
   "postprocess": true?, "xai": false?,
   "fast": false?}                           -> {"ok": true, "files": [..],
                                                 "output_dir", "elapsed_s",
                                                 "xai_dir"?, "fast_variant"?}
   ("fast": true samples the server's distilled fast variant
    (--fast-variant, e.g. a progressive-distillation student at T=8) on
    the priority lane — explicit opt-in, capped at max_batch images)
  {"op": "shutdown"}                         -> {"ok": true}

Execution model: connection threads only parse and enqueue; ONE worker
thread owns the device (the chip has no useful intra-host concurrency and
serializing keeps timings honest — NOTES_ROUND2.md). At dequeue time the
worker coalesces queued requests that share (class, steps, postprocess,
output_dir) and use server-drawn seeds (seed=None) into a single device
batch — per-image recorded seeds keep every image reproducible regardless
of how requests were merged (same guarantee as the reference's random
mode, `image_generator.py:632-637`). A `--conditional` server coalesces
ACROSS classes too: the single class-conditional model takes per-image
labels, so a burst of different-class requests becomes one mixed-class
MXU batch instead of one dispatch per class.

Multi-chip: `--mesh N|auto` shards every device batch over a data-parallel
mesh (`ShardedSampler`) — per-seed RNG streams keep each image bit-identical
to the single-chip output, so clients cannot observe the topology; `status`
reports the mesh and warmup compiles the partitioned executable.

Priority: requests whose device cost (count x steps) is at most
`interactive_cost` ride a fast lane serviced ahead of queued bulk work,
and a RUNNING bulk job yields to them between its device blocks (the
generator's between-blocks hook) — replies served that way carry
`"interactive": true`. `status` reports `latency`/`interactive_latency`
({p50_ms, p95_ms, n}), `fast_lane_depth`, and `throughput_img_s`.
"""
from __future__ import annotations

import argparse
import json
import queue
import socket
import socketserver
import threading
import time
import uuid
from collections import deque
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple


def _snapshot_keys(d: Dict[str, Any]) -> List[str]:
    """Sorted key snapshot of a dict another thread may be inserting into
    (the worker loads models while connection threads serve `status`)."""
    for _ in range(8):
        try:
            return sorted(d)
        except RuntimeError:  # "dictionary changed size during iteration"
            continue
    return []


class _Request:
    __slots__ = ("payload", "event", "response", "cancelled", "t_enqueue")

    def __init__(self, payload: Dict[str, Any]):
        self.payload = payload
        self.event = threading.Event()
        self.response: Dict[str, Any] = {}
        # set when the waiting client gave up (timeout/disconnect); the
        # worker drops cancelled requests instead of generating orphans
        self.cancelled = False
        self.t_enqueue = time.time()


def _percentile(sorted_vals: List[float], q: float) -> float:
    """Nearest-rank percentile of an already-sorted list."""
    if not sorted_vals:
        return 0.0
    idx = min(len(sorted_vals) - 1, max(0, int(round(q * (len(sorted_vals) - 1)))))
    return sorted_vals[idx]


def _coalesce_key(payload: Dict[str, Any],
                  ignore_class: bool = False) -> Optional[Tuple]:
    """Requests merge iff they are generates targeting the same sampler
    executable and artifact location AND let the server draw seeds. A fixed
    client seed pins image indices, so such requests never merge.

    `ignore_class=True` (conditional serving): the single class-conditional
    model takes per-image labels, so requests for DIFFERENT classes share a
    device batch too — a burst of per-class requests becomes one mixed
    MXU batch instead of one dispatch per class."""
    if payload.get("op") != "generate" or payload.get("seed") is not None:
        return None
    if payload.get("fast"):
        # fast-variant previews run one-by-one through the dedicated
        # distilled generator — never merged into a bulk device batch
        return None
    return (None if ignore_class else payload["class"],
            payload.get("steps"),
            bool(payload.get("postprocess", True)),
            bool(payload.get("xai", False)),
            payload.get("output_dir"))


def drain_batch(q: "queue.Queue[_Request]", first: _Request,
                max_batch: int,
                backlog: Optional["deque[_Request]"] = None,
                fast: Optional["deque[_Request]"] = None,
                classify=None, ignore_class: bool = False) -> List[_Request]:
    """Greedily pull queued requests coalescible with `first` (no waiting).

    Non-matching requests land in `backlog` — a worker-owned deque serviced
    BEFORE new queue items — so a request skipped during a drain keeps its
    place at the front instead of being re-queued behind later arrivals
    (re-putting at the tail starves it under sustained coalescible load).
    `fast` is the interactive lane: scanned for matches too (an interactive
    head should absorb its coalescible peers); when `classify(payload)` is
    given, non-matching pulls from `q` that classify as interactive are
    diverted into `fast` instead of `backlog`."""
    if backlog is None:
        backlog = deque()
    batch = [first]
    key = _coalesce_key(first.payload, ignore_class)
    if key is None:
        return batch
    total = int(first.payload.get("count", 1))
    # scan the worker-owned lanes first (they hold the oldest requests)
    for lane in (fast, backlog):
        if lane is None:
            continue
        for r in list(lane):
            if total >= max_batch:
                break
            if r.cancelled:
                lane.remove(r)
                continue
            n = int(r.payload.get("count", 1))
            if _coalesce_key(r.payload, ignore_class) == key and total + n <= max_batch:
                lane.remove(r)
                batch.append(r)
                total += n
    while total < max_batch:
        try:
            nxt = q.get_nowait()
        except queue.Empty:
            break
        if nxt is None or nxt.cancelled:
            continue
        n = int(nxt.payload.get("count", 1))
        if _coalesce_key(nxt.payload, ignore_class) == key and total + n <= max_batch:
            batch.append(nxt)
            total += n
        elif fast is not None and classify is not None and classify(nxt.payload):
            fast.append(nxt)
        else:
            backlog.append(nxt)
    return batch


class GenerationServer:
    """TCP front + single device-owning worker around an ImageGenerator."""

    def __init__(self, generator, host: str = "127.0.0.1", port: int = 0,
                 output_root: str = "serve_output", max_batch: int = 64,
                 xai_analyzer_factory=None, interactive_cost: int = 256,
                 fast_generator=None):
        self.generator = generator
        # fast-preview lane: a second ImageGenerator (same device, worker-
        # serialized) holding a progressive-distillation student variant at
        # its few-step config; requests opting in with {"fast": true} ride
        # the priority lane and sample through it (~6x the DDIM-50 rate).
        # Explicit opt-in only — a request that pins steps/scheduler always
        # gets exactly what it asked for from the main generator.
        self.fast_generator = fast_generator
        self.output_root = Path(output_root)
        self.max_batch = max_batch
        self._default_steps = generator.inference_steps
        # priority: requests whose device cost (count x steps) is at most
        # `interactive_cost` step-images ride the fast lane, serviced ahead
        # of queued bulk work — a T=1000 research job must not add minutes
        # of head-of-line latency to a b1 DPM-20 preview (VERDICT r2 weak
        # #3). No preemption: an already-running batch still finishes.
        self.interactive_cost = int(interactive_cost)
        # XAI-as-a-service: requests with "xai": true run the integrated
        # pipeline on each served image's captured trajectory. The analyzer
        # (classifier + jitted attribution kernels) is built once, lazily.
        self._xai_factory = xai_analyzer_factory
        self._xai_analyzer = None
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._backlog: "deque[_Request]" = deque()  # worker-owned, bulk FIFO
        self._fast: "deque[_Request]" = deque()     # worker-owned, priority
        self._stop = threading.Event()
        self._served = 0
        self._t0 = time.time()
        # completed-request latencies (seconds, enqueue -> reply), bounded.
        # Guarded by _lat_lock: the worker appends in _finish while `status`
        # connection threads sort — an unguarded concurrent append raises
        # "deque mutated during iteration" and kills the status reply.
        self._lat_lock = threading.Lock()
        self._lat_all: "deque[float]" = deque(maxlen=1024)
        self._lat_interactive: "deque[float]" = deque(maxlen=1024)

        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                for raw in self.rfile:
                    line = raw.decode("utf-8").strip()
                    if not line:
                        continue
                    try:
                        payload = json.loads(line)
                    except json.JSONDecodeError as exc:
                        self._reply({"ok": False, "error": f"bad json: {exc}"})
                        continue
                    self._reply(outer._dispatch(payload))
                    if payload.get("op") == "shutdown":
                        return

            def _reply(self, obj):
                self.wfile.write((json.dumps(obj) + "\n").encode("utf-8"))
                self.wfile.flush()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address = self._server.server_address
        self._worker = threading.Thread(target=self._work_loop,
                                        name="serve-worker", daemon=True)
        self._accept = threading.Thread(target=self._server.serve_forever,
                                        name="serve-accept", daemon=True)
        # priority WITHIN a long bulk run: the generator calls back between
        # device blocks (same worker thread), letting interactive requests
        # execute mid-run instead of waiting for the whole research job —
        # interactive p95 under bulk load drops from remaining-job-time to
        # one device block
        generator.between_blocks_hook = self._service_fast_lane

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "GenerationServer":
        self._worker.start()
        self._accept.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        self._queue.put(None)  # wake worker
        # BaseServer.shutdown() BLOCKS until a running serve_forever() loop
        # exits — on a constructed-but-never-start()ed server (embedded
        # callers building a server they abandon) it would deadlock forever
        if self._accept.is_alive():
            self._server.shutdown()
        self._server.server_close()
        if self._worker.is_alive():
            self._worker.join(timeout=30)

    def serve_forever(self) -> None:
        try:
            while not self._stop.is_set():
                time.sleep(0.2)
        except KeyboardInterrupt:
            pass
        finally:
            self.stop()

    # -- request handling --------------------------------------------------
    def _dispatch(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        op = payload.get("op")
        if op == "classes":
            return {"ok": True,
                    "classes": self.generator.get_available_classes()}
        if op == "status":
            return {"ok": True,
                    "queue_depth": (self._queue.qsize() + len(self._backlog)
                                    + len(self._fast)),
                    "fast_lane_depth": len(self._fast),
                    "served_images": self._served,
                    "uptime_s": round(time.time() - self._t0, 1),
                    "throughput_img_s": round(
                        self._served / max(time.time() - self._t0, 1e-9), 2),
                    "latency": self._lat_stats(self._lat_all),
                    "interactive_latency": self._lat_stats(
                        self._lat_interactive),
                    "interactive_cost": self.interactive_cost,
                    "classes": self.generator.get_available_classes(),
                    "loaded_models": _snapshot_keys(
                        self.generator.model_manager.loaded_params),
                    "device_batch": self.generator.batch_size,
                    "mesh": (dict(self.generator.mesh.shape)
                             if self.generator.mesh is not None else None),
                    "max_batch": self.max_batch,
                    "default_steps": self._default_steps,
                    "fast_variant": (
                        None if self.fast_generator is None else {
                            "variant": self.fast_generator.model_manager.variant,
                            "steps": self.fast_generator.inference_steps,
                            "timestep_spacing":
                                self.fast_generator.timestep_spacing}),
                    "generator": self.generator.get_generation_status()}
        if op == "shutdown":
            threading.Thread(target=self.stop, daemon=True).start()
            return {"ok": True, "shutting_down": True}
        if op in ("generate", "warmup"):
            if self._stop.is_set():
                return {"ok": False, "error": "server shutting down"}
            if "class" not in payload:
                return {"ok": False, "error": "missing 'class'"}
            cls = payload["class"]
            if cls not in self.generator.get_available_classes():
                return {"ok": False, "error": f"unknown class {cls!r}"}
            req = _Request(payload)
            self._queue.put(req)
            # generation blocks the calling connection thread, not the server
            if not req.event.wait(timeout=float(payload.get("timeout_s", 3600))):
                req.cancelled = True  # worker drops it if not yet started
                return {"ok": False, "error": "timed out waiting for worker"}
            return req.response
        return {"ok": False, "error": f"unknown op {op!r}"}

    # -- worker ------------------------------------------------------------
    def _is_interactive(self, payload: Dict[str, Any]) -> bool:
        """Fast-lane test: device cost (count x steps) within budget.
        Plain warmups are interactive (they unblock a client's first
        request and cost one load, not a generation) — but a warmup with
        `"compile": true` builds AND executes the serving executables
        (tens of seconds of first-jit), which must not run in the
        between-blocks fast lane ahead of queued b1 previews."""
        if payload.get("op") == "warmup":
            return not payload.get("compile")
        if payload.get("fast"):
            return True   # explicit preview opt-in (count capped at serve)
        steps = int(payload.get("steps") or self._default_steps)
        return int(payload.get("count", 1)) * steps <= self.interactive_cost

    def _pump(self, block: bool) -> bool:
        """Move socket-thread arrivals from the queue into the worker-owned
        lanes (fast/bulk). Returns False when the shutdown sentinel was
        seen."""
        alive = True
        try:
            r = self._queue.get(block=block)
        except queue.Empty:
            return alive
        while True:
            if r is None:
                alive = False
            elif not r.cancelled:
                (self._fast if self._is_interactive(r.payload)
                 else self._backlog).append(r)
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                return alive

    def _next_request(self) -> Optional[_Request]:
        """Oldest pending request, fast lane strictly first; backlog (bulk
        arrivals + drain skips) before anything newly queued."""
        alive = self._pump(block=False)
        while True:
            for lane in (self._fast, self._backlog):
                while lane:
                    r = lane.popleft()
                    if not r.cancelled:
                        return r
            if not alive or self._stop.is_set():
                return None
            alive = self._pump(block=True)

    def _work_loop(self) -> None:
        try:
            while not self._stop.is_set():
                req = self._next_request()
                if req is None:
                    break
                batch = drain_batch(self._queue, req, self.max_batch,
                                    self._backlog, fast=self._fast,
                                    classify=self._is_interactive,
                                    # conditional serving: one model, per-
                                    # image labels — different-class
                                    # requests share the device batch
                                    ignore_class=self.generator
                                    .model_manager.conditional)
                try:
                    self._run_batch(batch)
                except Exception as exc:  # defensive: a failed batch must not kill the worker
                    for r in batch:
                        self._finish(r, {"ok": False, "error": str(exc)})
        finally:
            # shutdown: every pending request must get a reply — otherwise
            # blocked connection threads (and embedded callers) hang until
            # their timeout_s (3600 s default)
            pending = list(self._fast) + list(self._backlog)
            self._fast.clear()
            self._backlog.clear()
            while True:
                try:
                    r = self._queue.get_nowait()
                except queue.Empty:
                    break
                if r is not None:
                    pending.append(r)
            for r in pending:
                if not r.event.is_set():
                    r.response = {"ok": False, "error": "server shutting down"}
                    r.event.set()

    # -- mid-run interactive service ---------------------------------------
    def _service_fast_lane(self) -> None:
        """Between-blocks callback (worker thread, inside a bulk
        `generate_images` run): pump arrivals and serve every pending
        interactive request NOW through the nested single-image path."""
        self._pump(block=False)
        while self._fast and not self._stop.is_set():
            req = self._fast.popleft()
            if req.cancelled:
                continue
            try:
                self._run_interactive(req)
            except Exception as exc:
                self._finish(req, {"ok": False, "error": str(exc)})

    def _run_interactive(self, req: _Request) -> None:
        """Serve one interactive request via `generate_single_image`,
        saving/restoring every generator knob so the surrounding bulk run
        continues unchanged. Same thread — single device owner preserved."""
        from .generator import class_seed_offset
        from .io.csv_io import append_synthetic_row, initialize_synthetic_csv

        p = req.payload
        if p.get("op") == "warmup":
            self._finish(req, self._do_warmup(p))
            return
        use_fast = bool(p.get("fast"))
        if use_fast and self.fast_generator is None:
            self._finish(req, {"ok": False, "error":
                               "no fast variant configured (start the "
                               "server with --fast-variant)"})
            return
        if (use_fast and p.get("steps")
                and int(p["steps"]) != self.fast_generator.inference_steps):
            # a distilled student only supports its own step count — honor
            # the pinned-steps guarantee by refusing, never substituting
            self._finish(req, {"ok": False, "error":
                               f"fast previews run at the fast variant's "
                               f"step count "
                               f"({self.fast_generator.inference_steps}); "
                               f"omit 'steps' or drop 'fast'"})
            return
        if use_fast and int(p.get("count", 1)) > self.max_batch:
            self._finish(req, {"ok": False, "error":
                               f"fast previews are capped at max_batch="
                               f"{self.max_batch} images per request"})
            return
        g = self.fast_generator if use_fast else self.generator
        saved = (g.inference_steps, g.base_seed, g.save_trajectory,
                 g.xai_analyzer, g.xai_frequency)
        try:
            cls = p["class"]
            count = int(p.get("count", 1))
            if not use_fast:
                g.set_inference_steps(
                    int(p["steps"]) if p.get("steps") else self._default_steps)
            want_xai = bool(p.get("xai"))
            analyzer = self._get_xai_analyzer() if want_xai else None
            g.save_trajectory = want_xai
            out_dir = Path(p.get("output_dir") or
                           (self.output_root / f"req_{uuid.uuid4().hex[:12]}"))
            class_dir = out_dir / cls
            if class_dir.exists() and any(class_dir.glob("ISIC_*.png")):
                self._finish(req, {"ok": False, "error":
                                   f"output_dir {out_dir} already holds "
                                   f"generated {cls} images; use a fresh "
                                   f"directory"})
                return
            class_dir.mkdir(parents=True, exist_ok=True)
            csv_path = out_dir / "synthetic_dataset.csv"
            initialize_synthetic_csv(csv_path)
            t0 = time.time()
            files: List[str] = []
            xai_error: Optional[str] = None
            for i in range(count):
                # same numbering-from-1 semantics as the bulk path
                # (generator.generate_images); shared formatter so the
                # naming convention lives in exactly one place
                fname = g.path_manager.get_isic_filename(i + 1)
                path = class_dir / fname
                seed = (None if p.get("seed") is None else
                        (int(p["seed"]) + class_seed_offset(cls) + i)
                        & 0x7FFFFFFF)
                ok, traj = g.generate_single_image(
                    cls, str(path), postprocess=bool(p.get("postprocess", True)),
                    seed=seed)
                if not ok:
                    break
                files.append(str(path))
                append_synthetic_row(csv_path, {
                    "filename": fname, "class": cls, "isic_number": i + 1,
                    "source": "synthetic",
                    "generated_at": str(path.stat().st_mtime)})
                if want_xai and analyzer is not None and traj is not None:
                    try:
                        import json as _json
                        recorded = _json.loads(
                            path.with_suffix(".json").read_text())["seed"]
                        analyzer.analyze_trajectory(
                            trajectory=traj, class_name=cls, seed=recorded,
                            inference_steps=g.inference_steps,
                            filename=fname, file_path=str(path))
                    except Exception as exc:
                        # continue generating, but report honestly (the bulk
                        # path sets xai_error the same way)
                        xai_error = f"{type(exc).__name__}: {exc}"
            self._served += len(files)
            response: Dict[str, Any] = {
                "ok": len(files) == count, "class": cls, "files": files,
                "output_dir": str(out_dir), "coalesced": 1,
                "interactive": True,
                "elapsed_s": round(time.time() - t0, 3)}
            if use_fast:
                response["fast_variant"] = g.model_manager.variant
                response["fast_steps"] = g.inference_steps
            if want_xai:
                xd = out_dir / "xai_results" / cls
                response["xai_dir"] = str(xd) if xd.exists() else None
                if xai_error is not None:
                    response["xai_error"] = xai_error
                elif response["xai_dir"] is None:
                    response["xai_error"] = ("XAI produced no artifacts "
                                             "(see server logs)")
            if len(files) != count:
                response["error"] = f"partial generation: {len(files)}/{count}"
            self._finish(req, response)
        finally:
            (g.inference_steps, g.base_seed, g.save_trajectory,
             g.xai_analyzer, g.xai_frequency) = saved

    def _do_warmup(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        """`warmup` op body: load the class's weights; with `"compile": true`
        additionally build AND execute the exact serving executables (the
        interactive b1 path and the coalescing device batch) so the first
        real request pays zero compile — `load_model` alone leaves the
        20-40s first-jit cost on the first unlucky client. Uses the
        request's `steps` (default: server default), the server's scheduler
        and dtype — HLO-faithful by construction (same factory the generate
        path calls)."""
        import numpy as np

        g = self.generator
        if payload.get("fast"):
            if self.fast_generator is None:
                return {"ok": False, "error": "no fast variant configured"}
            g = self.fast_generator
        t0 = time.time()
        ok = g.model_manager.load_model(payload["class"]) is not None
        params = g.model_manager.loaded_params.get(payload["class"])
        resp: Dict[str, Any] = {"ok": ok and params is not None}
        if resp["ok"] and payload.get("compile"):
            steps = int(payload.get("steps")
                        or (g.inference_steps if payload.get("fast")
                            else self._default_steps))
            # timestep_spacing must match the generate path or the warmed
            # executable is a different HLO program (trailing-configured
            # generators — e.g. distilled fast variants — would otherwise
            # still pay first-jit on the first real request)
            sampler = g.model_manager.create_sampler(
                steps, scheduler=g.scheduler_kind, ddim_eta=g.ddim_eta,
                timestep_spacing=g.timestep_spacing)
            if g.mesh is not None:
                # a mesh-backed generator serves through ShardedSampler —
                # warming the single-device executable would leave the real
                # partitioned program's first-jit on the first client
                from .parallel.sharded_sampler import ShardedSampler

                sampler = ShardedSampler(sampler, g.mesh)
                resp["mesh"] = dict(g.mesh.shape)
            sizes = sorted({1, int(g.batch_size)})
            for b in sizes:
                out = sampler.sample(params, np.arange(b, dtype=np.uint32))
                out["images"].block_until_ready()
            resp["compiled_batches"] = sizes
            resp["steps"] = steps
        resp["elapsed_s"] = round(time.time() - t0, 3)
        return resp

    def _get_xai_analyzer(self):
        if self._xai_analyzer is None:
            if self._xai_factory is not None:
                self._xai_analyzer = self._xai_factory()
            else:
                from .xai.integration import create_integrated_xai_analyzer

                # a mesh-backed server shards the heavy attribution kernels
                # (frame-batched IG / patch-SHAP / Grad-CAM / Time-SHAP)
                # over the same mesh — output stays bit-identical to
                # single-device (tests/test_sharded_attribution.py)
                self._xai_analyzer = create_integrated_xai_analyzer(
                    mesh=self.generator.mesh)
        return self._xai_analyzer

    def _finish(self, r: _Request, response: Dict[str, Any]) -> None:
        """Set the reply and record the end-to-end latency."""
        r.response = response
        lat = time.time() - r.t_enqueue
        with self._lat_lock:
            self._lat_all.append(lat)
            if self._is_interactive(r.payload):
                self._lat_interactive.append(lat)
        r.event.set()

    def _lat_stats(self, lats: "deque[float]") -> Dict[str, Any]:
        with self._lat_lock:
            vals = sorted(lats)
        return {"p50_ms": round(_percentile(vals, 0.50) * 1e3, 1),
                "p95_ms": round(_percentile(vals, 0.95) * 1e3, 1),
                "n": len(vals)}

    def _run_batch(self, batch: List[_Request]) -> None:
        head = batch[0].payload
        if head.get("op") == "warmup":
            self._finish(batch[0], self._do_warmup(head))
            return
        if head.get("fast"):
            # fast previews are non-coalescible (len(batch) == 1) and run
            # through the dedicated distilled generator
            self._run_interactive(batch[0])
            return

        # per-request steps must not leak into later requests that omit it
        self.generator.set_inference_steps(
            int(head["steps"]) if head.get("steps") else self._default_steps)
        self.generator.set_generation_seed(
            int(head["seed"]) if head.get("seed") is not None else None)
        if head.get("xai"):
            self.generator.set_xai_analyzer(self._get_xai_analyzer())
            self.generator.set_xai_frequency(1)
        else:
            self.generator.set_xai_analyzer(None)
        out_dir = Path(head.get("output_dir") or
                       (self.output_root / f"req_{uuid.uuid4().hex[:12]}"))
        # one (class, count) entry per request, FIFO — single-class batches
        # collapse to the reference shape; conditional serving coalesces
        # ACROSS classes (one model, per-image labels), so the generator
        # gets the mixed list and builds mixed-class device blocks from it
        configs = [(r.payload["class"], int(r.payload.get("count", 1)))
                   for r in batch]

        # generation numbers images from ISIC_0000001 per run (reference
        # semantics) — a reused output_dir would silently overwrite images
        # already served to an earlier client
        for c in dict.fromkeys(c for c, _ in configs):
            class_dir = out_dir / c
            if class_dir.exists() and any(class_dir.glob("ISIC_*.png")):
                for r in batch:
                    self._finish(r, {"ok": False, "error":
                                     f"output_dir {out_dir} already holds generated "
                                     f"{c} images; use a fresh directory (or omit "
                                     f"output_dir for an auto-created one)"})
                return
        t0 = time.time()
        result = self.generator.generate_images(
            configs, str(out_dir),
            postprocess=bool(head.get("postprocess", True)))
        elapsed = time.time() - t0
        if "error" in result:
            for r in batch:
                self._finish(r, {"ok": False, "error": result["error"]})
            return
        self._served += result.get("generated", 0)
        # split files across the coalesced requests in FIFO order — the
        # generator numbers ISIC_%07d.png per class, continuing across
        # repeated entries, so each request's slice is deterministic; a
        # stopped/partial run short-changes the tail requests, which must
        # see ok:false rather than an empty-but-ok reply
        next_num: Dict[str, int] = {}
        for r in batch:
            r_cls = r.payload["class"]
            n = int(r.payload.get("count", 1))
            start = next_num.get(r_cls, 1)
            next_num[r_cls] = start + n
            files = [str(out_dir / r_cls / f"ISIC_{i:07d}.png")
                     for i in range(start, start + n)
                     if (out_dir / r_cls / f"ISIC_{i:07d}.png").exists()]
            complete = len(files) == n
            response = {"ok": complete, "class": r_cls,
                        "files": files,
                        "output_dir": str(out_dir),
                        "coalesced": len(batch),
                        "elapsed_s": round(elapsed, 3)}
            if head.get("xai"):
                # per-image XAI failures are logged-and-continued by the
                # generator; report honestly when no artifacts materialized
                xd = out_dir / "xai_results" / r_cls
                if xd.exists():
                    response["xai_dir"] = str(xd)
                else:
                    response["xai_dir"] = None
                    response["xai_error"] = ("XAI produced no artifacts "
                                             "(see server logs)")
            if not complete:
                response["error"] = (
                    f"partial generation: {len(files)}/{n} images "
                    f"(stopped={result.get('stopped', False)})")
            self._finish(r, response)


def request(host: str, port: int, payload: Dict[str, Any],
            timeout: float = 3600.0) -> Dict[str, Any]:
    """One-shot client: send a request line, return the parsed reply."""
    with socket.create_connection((host, port), timeout=timeout) as sock:
        sock.sendall((json.dumps(payload) + "\n").encode("utf-8"))
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = sock.recv(65536)
            if not chunk:
                break
            buf += chunk
    return json.loads(buf.decode("utf-8"))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="synt-isic-serve",
        description="long-lived TPU generation service (JSON-lines over TCP)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7933)
    p.add_argument("--checkpoints", default=None)
    p.add_argument("--output-root", default="serve_output")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch", type=int, default=128,
                   help="device batch size for the generator (128 is the "
                        "measured single-chip throughput knee, DEPLOYMENT.md)")
    p.add_argument("--max-batch", type=int, default=None,
                   help="coalescing cap in images (default: --batch — the "
                        "device batch the executables are warmed for)")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16",
                   help="compute dtype (bf16 is the production path all "
                        "published throughput numbers use)")
    p.add_argument("--mesh", default=None, metavar="N|auto|DxT",
                   help="multi-chip serving: shard bulk device batches over "
                        "a data-parallel mesh of N chips ('auto' = every "
                        "visible device). Per-seed RNG streams keep every "
                        "image identical to the single-chip output; "
                        "throughput scales with chips (per-image step cost "
                        "is batch-flat on one chip, PERFORMANCE.md). A "
                        "'DxT' spec (e.g. 4x2) adds tensor parallelism: "
                        "UNet weights channel-shard over the T-sized "
                        "'model' axis — the LATENCY axis, where dp only "
                        "scales throughput. The --fast-variant preview "
                        "lane stays single-chip (b1 latency work gains "
                        "nothing from padding)")
    p.add_argument("--interactive-cost", type=int, default=256,
                   help="count x steps threshold under which a request "
                        "rides the priority lane (ahead of queued bulk "
                        "jobs; default 256 = e.g. 4 images at 50 steps)")
    p.add_argument("--warmup", nargs="*", default=[],
                   help="classes to load+compile before accepting traffic")
    p.add_argument("--model-variant", default="best",
                   help="checkpoint variant to serve (e.g. 'distill8' from "
                        "progressive distillation — pair with --steps 8; "
                        "recorded in sidecars). Distilled variants default "
                        "the sampler to ddim/trailing (their training grid) "
                        "unless --scheduler/--timestep-spacing say otherwise")
    p.add_argument("--png-compress-level", type=int, default=None,
                   metavar="0-9", choices=range(10),
                   help="zlib level for PNG artifacts (default: PIL's 6). "
                        "Level 1 encodes ~3x faster — the write stage "
                        "bounds few-step throughput on 1-core hosts. "
                        "Recorded in sidecars; --reproduce honors it")
    p.add_argument("--scheduler",
                   choices=("ddpm", "ddim", "dpm_solver", "dpm_solver_sde", "unipc"),
                   default=None,
                   help="sampler for the main generator (default: ddpm = "
                        "reference parity; ddim for distill* variants)")
    p.add_argument("--timestep-spacing", choices=("leading", "trailing"),
                   default=None,
                   help="main generator's timestep spacing (default: "
                        "leading = reference parity; trailing for distill* "
                        "variants)")
    p.add_argument("--conditional", action="store_true",
                   help="serve the single class-conditional checkpoint "
                        "(unet_conditional_<variant>.pth): one resident "
                        "parameter set answers every class — no per-class "
                        "weight swaps between requests")
    p.add_argument("--guidance-scale", type=float, default=0.0, metavar="S",
                   help="classifier-free guidance weight with --conditional "
                        "(0/1 = plain conditional; >1 = guided at 2x UNet "
                        "cost per step)")
    p.add_argument("--guidance-map", default=None, metavar="SPEC",
                   help="per-class guidance with --conditional, e.g. "
                        "'MEL=2.5,NV=2' — every class samples at its own "
                        "measured-best weight in one compiled program "
                        "(classes absent from the map use "
                        "--guidance-scale); per-class optima come from "
                        "scripts/e2e_conditional.py per_class_best_guidance")
    p.add_argument("--fast-variant", default=None, metavar="V",
                   help="fast-preview lane on a separate checkpoint variant "
                        "(e.g. a distillation student, distill8) at "
                        "--fast-steps. EXPERIMENTAL: on the measured ladder "
                        "(artifacts/distill_ladder) distilled students lose "
                        "to --fast-scheduler unipc at the same step count — "
                        "gate any student on scripts/distill_ladder.py")
    p.add_argument("--fast-scheduler", default=None,
                   choices=("ddpm", "ddim", "dpm_solver", "dpm_solver_sde",
                            "unipc"),
                   help="fast-preview lane on the SAME weights with a "
                        "few-step scheduler override. RECOMMENDED for the "
                        "full-size model: --fast-scheduler dpm_solver_sde "
                        "--fast-steps 20 (Frechet 3.24 at 22.7 img/s on the "
                        "flagship ladder, artifacts/sampler_ladder_full."
                        "json); tightest budget: unipc 8 (5.59 on the "
                        "quarter-width battery vs the distill8 student's "
                        "9.94 and teacher-DDIM-8's 7.16, zero extra "
                        "training)")
    p.add_argument("--fast-steps", type=int, default=None,
                   help="steps for the fast lane (default: the trailing "
                        "integer in the variant name, e.g. distill8 -> 8; "
                        "or 8 for a scheduler-only fast lane)")
    p.add_argument("--fast-spacing", choices=("leading", "trailing"),
                   default="trailing",
                   help="timestep spacing of the fast lane (few-step "
                        "quality needs trailing; distilled students are "
                        "trained on trailing grids)")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from .generator import ImageGenerator, parse_guidance_map
    from .utils.compute import enable_compilation_cache

    enable_compilation_cache()
    guidance_map = parse_guidance_map(args.guidance_map)
    gen = ImageGenerator(
        checkpoints_dir=args.checkpoints,
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        model_variant=args.model_variant,
        conditional=args.conditional,
        guidance_scale=args.guidance_scale,
        guidance_map=guidance_map)
    # a distilled student was trained against DDIM steps on a trailing
    # grid — serving it through the reference defaults (ancestral DDPM,
    # leading spacing) would silently degrade every image
    is_distilled = args.model_variant.startswith("distill")
    gen.scheduler_kind = args.scheduler or ("ddim" if is_distilled
                                            else gen.scheduler_kind)
    gen.timestep_spacing = args.timestep_spacing or (
        "trailing" if is_distilled else gen.timestep_spacing)
    if args.png_compress_level is not None:
        gen.png_compress_level = args.png_compress_level
    if is_distilled and (args.scheduler is None
                         or args.timestep_spacing is None):
        print(f"model variant {args.model_variant}: sampler defaults set "
              f"to {gen.scheduler_kind}/{gen.timestep_spacing} "
              f"(its distillation grid)", flush=True)
    if args.steps:
        gen.set_inference_steps(args.steps)
    if args.batch:
        gen.batch_size = args.batch
    if args.mesh:
        from .parallel.mesh import apply_dp_mesh

        mesh = apply_dp_mesh(gen, args.mesh)
        # the fast-preview lane stays single-chip ON PURPOSE: it serves
        # images one-by-one (latency-bound b1 work), where sharding only
        # adds per-call padding — bulk traffic is the multi-chip axis
        print(f"serving over a {dict(mesh.shape)} mesh "
              f"(device batch {gen.batch_size})", flush=True)
    fast_gen = None
    if args.fast_variant or args.fast_scheduler:
        import re

        if args.fast_variant:
            m = re.search(r"(\d+)$", args.fast_variant)
            fast_steps = args.fast_steps or (int(m.group(1)) if m else None)
            if not fast_steps:
                p.error("--fast-steps required (variant name has no "
                        "trailing integer to infer it from)")
        else:
            # scheduler-only fast lane: same weights/variant as the main
            # generator, few-step solver override (recommended: unipc 8)
            fast_steps = args.fast_steps or 8
        fast_variant = args.fast_variant or args.model_variant
        fast_gen = ImageGenerator(
            checkpoints_dir=args.checkpoints,
            compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
            model_variant=fast_variant,
            conditional=args.conditional,
            guidance_scale=args.guidance_scale,
            guidance_map=guidance_map)
        if fast_variant == args.model_variant:
            # scheduler-only lane: SHARE the main generator's weights —
            # sampler kind/steps are per-generator call arguments, so a
            # second ModelManager would only keep every class's param
            # tree resident twice (~100 MB/class f32 on a 7-class
            # family) and pay the checkpoint load twice on first use
            fast_gen.model_manager = gen.model_manager
        fast_gen.set_inference_steps(fast_steps)
        fast_gen.timestep_spacing = args.fast_spacing
        # distillation students target DDIM steps; a scheduler-only lane
        # defaults to the measured Pareto-best few-step solver (UniPC)
        fast_gen.scheduler_kind = args.fast_scheduler or (
            "ddim" if args.fast_variant else "unipc")
        fast_gen.save_trajectory = False
        print(f"fast lane: variant={fast_variant} "
              f"{fast_gen.scheduler_kind}-{fast_steps} "
              f"({args.fast_spacing})", flush=True)
    server = GenerationServer(gen, host=args.host, port=args.port,
                              output_root=args.output_root,
                              # gen.batch_size, not args.batch: --mesh may
                              # have rounded the device batch up, and a cap
                              # below it would re-pad every full block
                              max_batch=args.max_batch or gen.batch_size,
                              interactive_cost=args.interactive_cost,
                              fast_generator=fast_gen)
    for cls in args.warmup:
        print(f"warming up {cls} (weights + executables)...", flush=True)
        r = server._do_warmup({"class": cls, "compile": True})
        print(f"  {cls}: {r}", flush=True)
        if fast_gen is not None:
            # the fast lane has its own executables (and, for a
            # --fast-variant student, its own weights); an unwarmed
            # first preview would pay load + first-jit on the priority lane
            rf = server._do_warmup({"class": cls, "compile": True,
                                    "fast": True})
            print(f"  {cls} (fast): {rf}", flush=True)
    server.start()
    print(f"serving on {server.address[0]}:{server.address[1]} "
          f"({len(gen.get_available_classes())} classes)", flush=True)
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
