"""Aggregate a jax.profiler device trace into op-family time shares.

Reproducible source of the "device-op time breakdown" tables in
PERFORMANCE.md / BENCHMARKS.md: parses the Chrome-trace json that
`jax.profiler.trace` writes (plugins/profile/<ts>/*.trace.json.gz), sums
XLA-op durations on the device track by family (the op name with its
unique `.N` suffix stripped, grouped by fusion kind), and prints shares of
total on-device op time. Umbrella events (the jitted module and the
`while` scan loop) are excluded — they contain every other op.

Usage: python scripts/trace_ops.py [trace.json.gz | artifacts/profile]
"""
from __future__ import annotations

import collections
import gzip
import json
import re
import sys
from pathlib import Path


def find_trace(root: Path) -> Path:
    if root.is_file():
        return root
    traces = sorted(root.glob("plugins/profile/*/*.trace.json.gz"))
    if not traces:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    return traces[-1]  # newest capture


def family(op_name: str) -> str:
    base = re.sub(r"\.\d+$", "", op_name)
    # group xla fusion kinds and pallas custom calls into readable families
    for pat, fam in [
        (r"^fused_attention", "fused_attention (Pallas)"),
        (r"^convert_reduce_fusion|^reduce_fusion", "convert/reduce fusion (norm stats)"),
        (r"^convolution_add_fusion|^convolution", "convolution fusion"),
        (r"^copy", "copy (layout/data movement)"),
        (r"^fusion", "elementwise/matmul fusion"),
        (r"^rng|threefry|erf_inv", "RNG"),
        (r"^dynamic_update_slice|^dynamic_slice", "dynamic slice"),
        (r"^(all_reduce|all_gather|reduce_scatter|collective)", "collectives"),
    ]:
        if re.match(pat, base):
            return fam
    return base


def main() -> None:
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("artifacts/profile")
    trace_path = find_trace(root)
    with gzip.open(trace_path) as f:
        data = json.load(f)
    ev = data["traceEvents"]

    threads = {}
    device_pids = set()
    for e in ev:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "thread_name":
            threads[(e["pid"], e["tid"])] = e["args"]["name"]
        elif e.get("name") == "process_name" and "TPU" in str(e.get("args", {}).get("name", "")):
            device_pids.add(e["pid"])

    dur = collections.Counter()
    n_ops = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if threads.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        name = e.get("name", "")
        if re.match(r"^(while|jit_|body|condition)", name):
            continue  # umbrella events: contain all other ops
        fam = family(name)
        dur[fam] += e.get("dur", 0)
        n_ops[fam] += 1

    total = sum(dur.values())
    print(f"trace: {trace_path}")
    print(f"total on-device op time: {total/1e6:.3f} s\n")
    print(f"{'share':>7}  {'time':>9}  {'#ops':>6}  family")
    for fam, us in dur.most_common():
        print(f"{us/total*100:6.1f}%  {us/1e6:8.3f}s  {n_ops[fam]:6d}  {fam}")


if __name__ == "__main__":
    main()
