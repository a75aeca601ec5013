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
