"""Tracing / profiling utilities.

The reference's observability is CUDA memory polling + tqdm postfixes
(SURVEY.md §5 'Tracing/profiling'); the rebuild provides:
  * `StepTimer` — per-phase wall/step timing with EMA rates, usable as the
    progress source for UIs (replaces `update_memory_info`-style polling);
  * `device_memory_stats` — allocator statistics from the JAX device
    (the CUDA-memory-label equivalent, `main.py:230-253`);
  * `trace` — context manager around `jax.profiler` for XLA-level traces
    viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional

import jax


class StepTimer:
    """Accumulates per-phase timings: `with timer.phase("sample"): ...`."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / max(self.counts[name], 1), 5),
            }
            for name in self.totals
        }

    def report(self) -> str:
        lines = [f"{n}: {s['total_s']:.3f}s over {s['count']} "
                 f"({s['mean_s'] * 1000:.1f} ms each)"
                 for n, s in self.summary().items()]
        return "\n".join(lines)


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, Any]:
    """Allocator stats (bytes in use / peak / limit) where the backend
    exposes them; {} otherwise."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return {}
    if not stats:
        return {}
    out = {k: v for k, v in stats.items()
           if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
                    "largest_alloc_size", "num_allocs")}
    if "bytes_in_use" in out:
        out["mb_in_use"] = round(out["bytes_in_use"] / (1024 ** 2), 1)
    if "peak_bytes_in_use" in out:
        out["mb_peak"] = round(out["peak_bytes_in_use"] / (1024 ** 2), 1)
    return out


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """XLA-level profiler trace (TensorBoard-viewable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
