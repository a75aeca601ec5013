"""Device-mesh and sharding helpers.

The reference has zero distributed constructs (single process, one CUDA
device — SURVEY.md §2.3); the rebuild's scaling axis is a
`jax.sharding.Mesh` over ICI with batch data-parallelism for sampling and
attribution fan-out. Collectives are inserted by XLA from sharding
annotations — no hand-written communication.

Default topology: 1-D 'data' mesh over all local devices (v5e-8: 8 chips).
A 2-D ('data','model') mesh is supported for tensor-parallel experiments
(channel-sharded convs on the widest UNet stages).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(axes: Optional[Dict[str, int]] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """axes: {axis_name: size}, with -1 meaning 'all remaining devices'.
    Default: {'data': -1}."""
    devices = list(devices if devices is not None else jax.devices())
    axes = dict(axes or {"data": -1})
    n = len(devices)
    sizes = []
    remaining = n
    names = list(axes.keys())
    for name in names:
        size = axes[name]
        if size == -1:
            sizes.append(None)
        else:
            if remaining % size != 0:
                raise ValueError(f"axis {name}={size} does not divide {remaining}")
            sizes.append(size)
            remaining //= size
    free = sizes.count(None)
    if free > 1:
        raise ValueError("at most one axis may be -1")
    if free == 1:
        sizes[sizes.index(None)] = remaining
        remaining = 1
    if int(np.prod(sizes)) != n:
        # use only a prefix of devices when sizes underfill
        devices = devices[: int(np.prod(sizes))]
    mesh_devices = np.asarray(devices).reshape(tuple(sizes))
    return Mesh(mesh_devices, tuple(names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over `axis`; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place a host array with its leading dim sharded across the mesh."""
    return jax.device_put(x, batch_sharding(mesh, axis))


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def tp_param_shardings(params, mesh: Mesh, axis: str = "model"):
    """Tensor-parallel placement tree: shard the LAST dim (conv/dense output
    channels in Flax's HWIO/IO layouts) of every weight whose width divides
    the axis; replicate everything else (biases, norm scales, odd widths).

    Same rule as the training dry-run's dp x tp layout
    (`__graft_entry__.dryrun_multichip`): XLA's GSPMD propagates the
    annotation through the network and inserts the all-gathers — no
    hand-written collectives. With output-channel sharding each device
    computes its channel slice with the FULL contraction, so there is no
    partial-sum reduction and results stay numerically equal to the
    replicated run."""
    tp = mesh.shape[axis]

    def spec(leaf):
        if getattr(leaf, "ndim", 0) >= 2 and leaf.shape[-1] % tp == 0 \
                and leaf.shape[-1] >= tp:
            return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + [axis])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, params)


def apply_dp_mesh(generator, spec) -> Mesh:
    """Attach a device mesh to an `ImageGenerator` from a CLI spec.

    `spec`: device count as int/str ('8'), 'auto' for every visible
    device — both build a 1-D data-parallel mesh — or 'DxT' ('4x2') for a
    dp x tp mesh: batches shard over the D-sized 'data' axis and
    `ShardedSampler` channel-shards the UNet weights over the T-sized
    'model' axis (tensor parallelism, the latency axis — see
    `tp_param_shardings`). Rounds the generator's device batch UP to a
    multiple of the dp size — `ShardedSampler` pads short batches
    (cyclic-tiled seeds, extras dropped), but a non-multiple device batch
    would waste that pad on every call. Shared by `serve.py --mesh` and
    `scripts/bench_serve.py`.

    NOTE: callers deriving a coalescing cap from the device batch must read
    `generator.batch_size` AFTER this call (the round-up can raise it)."""
    spec = str(spec)
    if "x" in spec:
        d, t = spec.split("x", 1)
        mesh = create_mesh({"data": int(d), "model": int(t)})
    else:
        n = len(jax.devices()) if spec == "auto" else int(spec)
        mesh = create_mesh({"data": n})
    generator.set_mesh(mesh)
    dp = mesh.shape["data"]
    if generator.batch_size % dp:
        generator.batch_size = -(-generator.batch_size // dp) * dp
    return mesh
