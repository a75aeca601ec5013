"""Asynchronous checkpoint writer: overlap snapshot I/O with compute.

Why (measured, NOTES_ROUND3.md): on a tunneled/remote accelerator the
device->host pull of a ~100 MB params+opt-state snapshot runs at link
speed (~2 MB/s on the axon tunnel) and, done synchronously at snapshot
boundaries, re-serializes training — the epoch-scan path regressed from
~0.2 s/step to ~1.3 s/step average with every-5-epoch snapshots. The
reference has the same structural cost in miniature (`torch.save` of the
best checkpoint inside the epoch loop, `diffusion/train_diffusion.py:
251-258`) but never notices it because its GPU is host-local.

The TPU-native fix is the standard async-checkpoint pattern (what orbax's
AsyncCheckpointer does for large-scale training):

  1. snapshot the pytree ON DEVICE (`jnp.array` copies) — an HBM->HBM copy
     enqueued on the device stream, so later donation of the source
     buffers by the next train step cannot invalidate it;
  2. enqueue the device->host transfer (`copy_to_host_async`) — it rides
     the device queue concurrently with subsequent compute;
  3. hand the tree to a single background worker thread that materializes
     the host values (`np.asarray` blocks only until the already-enqueued
     copy lands) and runs the caller's write function (torch-format .pth,
     resume .npz, ...).

Writes to the same path complete in submit order (single worker, FIFO).
A `coalesce` key marks writes where only the LATEST value matters (the
rolling best checkpoint, the resume state): if a newer submit with the
same key arrives while an older one is still queued, the older one is
dropped — the link can fall arbitrarily far behind without the queue
growing or stale multi-minute transfers blocking fresh ones. Epoch-N
snapshots (distinct paths, every one part of the artifact contract) are
never coalesced; `max_pending` bounds how many device-side copies can be
outstanding (backpressure blocks `submit`, which is still no worse than
the old synchronous write).

Worker exceptions are surfaced on the next `submit`/`wait` call, not
swallowed.
"""
from __future__ import annotations

import threading
from collections import deque
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _device_snapshot(tree: Any) -> Any:
    """HBM->HBM copy of every jax.Array leaf (host leaves pass through).

    The copy is enqueued on the device stream ahead of any later step that
    donates the source buffers, so the snapshot stays valid."""
    return jax.tree_util.tree_map(
        lambda a: jnp.array(a) if isinstance(a, jax.Array) else a, tree)


def _enqueue_d2h(tree: Any) -> None:
    """Start the device->host transfer for every leaf without blocking."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array):
            try:
                leaf.copy_to_host_async()
            except Exception:
                pass  # np.asarray in the worker still lands the value


def _materialize(tree: Any) -> Any:
    """Block until the enqueued copies land; returns a host-numpy pytree."""
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, tree)


class AsyncCheckpointer:
    """Background checkpoint writer with per-key coalescing.

    Usage:
        ckpt = AsyncCheckpointer()
        ckpt.submit(params, save_checkpoint_torch_format, best_path,
                    coalesce="best")          # only latest matters
        ckpt.submit(params, save_checkpoint_torch_format, epoch_path)
        ...
        ckpt.wait()   # flush + re-raise the first worker error, if any
    """

    def __init__(self, max_pending: int = 4, log: Optional[Callable] = None):
        self._max_pending = max(1, max_pending)
        self._log = log
        self._lock = threading.Lock()
        self._not_full = threading.Condition(self._lock)
        self._queue: deque = deque()
        self._seq = 0
        self._latest_for_key: dict = {}
        self._inflight = 0            # items popped but not yet written
        self._closed = False
        self._error: Optional[BaseException] = None
        self._idle = threading.Condition(self._lock)
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="async-ckpt")
        self._worker.start()

    # ------------------------------------------------------------------ API

    def submit(self, tree: Any, write_fn: Callable[[Any, str], Any],
               path: str, coalesce: Optional[str] = None) -> None:
        """Snapshot `tree` now (device-side) and schedule
        `write_fn(host_tree, path)` in the background.

        `coalesce`: writes sharing this key keep only the newest queued
        value — use for rolling artifacts (best checkpoint, resume state)
        where intermediate values have no contract."""
        self._raise_pending()
        snap = _device_snapshot(tree)
        _enqueue_d2h(snap)
        with self._lock:
            if self._closed:
                raise RuntimeError("AsyncCheckpointer is closed")
            self._seq += 1
            seq = self._seq
            if coalesce is not None:
                stale = self._latest_for_key.get(coalesce)
                self._latest_for_key[coalesce] = seq
                if stale is not None:
                    before = len(self._queue)
                    self._queue = deque(i for i in self._queue
                                        if i[0] != stale)
                    if len(self._queue) != before and self._log:
                        self._log(f"[async-ckpt] coalesced stale "
                                  f"'{coalesce}' write ({path})")
            while (len(self._queue) + self._inflight >= self._max_pending
                   and not self._closed):
                self._not_full.wait(timeout=0.5)
                if self._error is not None:
                    break
            self._queue.append((seq, coalesce, snap, write_fn, str(path)))
            self._idle.notify_all()
        self._raise_pending()

    def wait(self) -> None:
        """Block until every submitted write has landed; raise the first
        worker error if one occurred."""
        with self._lock:
            while (self._queue or self._inflight) and self._error is None:
                self._idle.wait(timeout=0.5)
        self._raise_pending()

    def close(self) -> None:
        """Flush and stop the worker. Safe to call twice."""
        try:
            self.wait()
        finally:
            with self._lock:
                self._closed = True
                self._idle.notify_all()
            self._worker.join(timeout=30)
        self._raise_pending()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        # on an exception in the training loop still flush what we have,
        # but don't mask the original error with a writer error
        try:
            self.close()
        except Exception:
            if exc_type is None:
                raise
        return False

    # -------------------------------------------------------------- worker

    def _raise_pending(self) -> None:
        with self._lock:
            err, self._error = self._error, None
        if err is not None:
            raise err

    def _run(self) -> None:
        while True:
            with self._lock:
                while not self._queue and not self._closed:
                    self._idle.wait(timeout=0.5)
                if not self._queue and self._closed:
                    return
                seq, key, snap, write_fn, path = self._queue.popleft()
                self._inflight += 1
                self._not_full.notify_all()
            try:
                host = _materialize(snap)
                del snap  # release the device-side copy before the write
                write_fn(host, path)
            except BaseException as exc:  # surfaced on submit/wait
                with self._lock:
                    if self._error is None:
                        self._error = exc
            finally:
                with self._lock:
                    self._inflight -= 1
                    if key is not None and self._latest_for_key.get(key) == seq:
                        del self._latest_for_key[key]
                    self._idle.notify_all()
                    self._not_full.notify_all()
