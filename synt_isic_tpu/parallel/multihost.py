"""Multi-host (DCN) tier: the same mesh/sharding story spanning processes.

The reference is strictly single-process, single-device — no distributed
constructs at all (SURVEY.md §2.3; `core/generator/image_generator.py:66`
picks one `cuda:N`). The rebuild scales first over one host's chips via
ICI (`parallel/mesh.py`), and this module extends the SAME sharding code
across hosts over DCN:

  * each process owns its local chips; `jax.distributed.initialize` joins
    them into one global runtime;
  * meshes are laid out so that fast-collective axes (model/tensor
    parallelism) stay WITHIN a host's ICI domain and only the data axis
    crosses DCN — XLA then routes psums/all-gathers over the right fabric;
  * host-side data feeding uses `jax.make_array_from_process_local_data`,
    so every process loads only its own slice of the global batch.

Everything degrades to a no-op in the single-process case, so the sampler,
trainer, and fairness-audit drivers can call these helpers unconditionally.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join this process into a multi-host JAX runtime.

    Arguments fall back to the standard env vars
    (`JAX_COORDINATOR_ADDRESS`, `JAX_NUM_PROCESSES`, `JAX_PROCESS_ID`);
    with no coordinator configured anywhere this is a no-op and returns
    False, so single-host entry points can call it unconditionally.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_multihost() -> bool:
    return jax.process_count() > 1


def hybrid_mesh(ici_axes: Optional[Dict[str, int]] = None,
                dcn_axes: Optional[Dict[str, int]] = None) -> Mesh:
    """Build a mesh whose `dcn_axes` cross hosts and `ici_axes` stay inside
    one host's ICI domain.

    Defaults: all cross-host parallelism on 'data' (one DCN group per
    process), all local chips on an inner 'data' factor — i.e. pure data
    parallelism with per-host all-reduce staying on ICI. `-1` on one ICI
    axis means "all remaining local devices".

    Axis name reuse is allowed: if 'data' appears in both dcn_axes and
    ici_axes the two factors are flattened into ONE mesh axis (size =
    product), keeping `PartitionSpec("data")` valid unchanged from the
    single-host code.
    """
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    dcn_axes = dict(dcn_axes or {"data": n_proc})
    ici_axes = dict(ici_axes or {"data": -1})

    # resolve -1 on the ICI tier
    fixed = 1
    free_name = None
    for name, size in ici_axes.items():
        if size == -1:
            if free_name is not None:
                raise ValueError("at most one ICI axis may be -1")
            free_name = name
        else:
            fixed *= size
    if free_name is not None:
        if n_local % fixed != 0:
            raise ValueError(f"ICI axes {ici_axes} do not divide "
                             f"{n_local} local devices")
        ici_axes[free_name] = n_local // fixed

    if int(np.prod(list(dcn_axes.values()))) != n_proc:
        raise ValueError(f"dcn_axes {dcn_axes} must multiply to "
                         f"process_count={n_proc}")
    if int(np.prod(list(ici_axes.values()))) != n_local:
        raise ValueError(f"ici_axes {ici_axes} must multiply to "
                         f"local_device_count={n_local}")

    if n_proc == 1:
        # single host: plain ICI mesh, but still honor flattened axis names
        shape = tuple(dcn_axes[n] * ici_axes.get(n, 1) if n in ici_axes
                      else dcn_axes[n] for n in dcn_axes)
        extra = [(n, s) for n, s in ici_axes.items() if n not in dcn_axes]
        names = tuple(dcn_axes) + tuple(n for n, _ in extra)
        shape = shape + tuple(s for _, s in extra)
        devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
        return Mesh(devs, names)

    from jax.experimental import mesh_utils

    # order shared names first so DCN factors stay outer (slowest-varying)
    dcn_names = list(dcn_axes)
    ici_only = [n for n in ici_axes if n not in dcn_axes]
    names = dcn_names + ici_only
    dcn_shape = [dcn_axes[n] for n in names if n in dcn_axes] + [1] * len(ici_only)
    ici_shape = [ici_axes.get(n, 1) for n in names]
    # create_hybrid_device_mesh returns shape dcn_mesh_shape * mesh_shape
    # elementwise, so a name shared between the tiers is already ONE flat
    # axis of size dcn*ici (processes outer, local chips inner).
    # process_is_granule: our dcn_axes multiply to process_count by
    # contract, so the DCN granule is the PROCESS — the slice-granule
    # default would reject both CPU meshes (no slice_index) and multi-host
    # single-slice TPU topologies.
    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=ici_shape, dcn_mesh_shape=dcn_shape,
        devices=jax.devices(), process_is_granule=True)
    return Mesh(devices, tuple(names))


def local_batch_bounds(global_batch: int, process_id: Optional[int] = None,
                       process_count: Optional[int] = None) -> Tuple[int, int]:
    """[start, stop) of the global batch this process should load.

    The global batch must divide evenly — dataloaders should pad to
    `pad_to_multiple(n, process_count * local_device_count)` first.
    """
    pid = jax.process_index() if process_id is None else process_id
    n_proc = jax.process_count() if process_count is None else process_count
    if global_batch % n_proc != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n_proc} processes")
    per = global_batch // n_proc
    return pid * per, (pid + 1) * per


def global_batch_array(local_data: np.ndarray, mesh: Mesh,
                       axis: str = "data") -> jax.Array:
    """Assemble the global batch-sharded array from this process's slice.

    `local_data` is the [start, stop) slice from `local_batch_bounds`
    (leading dim = global_batch / process_count). Single-process this is
    just a sharded device_put.
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(local_data, sharding)
    return jax.make_array_from_process_local_data(sharding, local_data)


def replicated_global(tree: Any, mesh: Mesh) -> Any:
    """Place a host pytree fully replicated on a (possibly multi-process)
    mesh. Every process must hold the same values (load on host 0 +
    `broadcast_from_host0` first if not)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def broadcast_from_host0(tree: Any) -> Any:
    """Make host 0's pytree the value on every process (e.g. loaded
    checkpoint params, sampled seeds). No-op single-process."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def sync_hosts(name: str = "barrier") -> None:
    """Barrier across processes (checkpoint write ordering, bench fences)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def host0_only(fn, *args, **kwargs):
    """Run a host-side side effect (checkpoint/CSV/artifact writes) on
    process 0 only, then barrier so other processes can't race past it.

    If `fn` raises on process 0 the barrier is STILL entered (try/finally)
    — otherwise every other process would block in sync_hosts forever,
    turning a local write error into a distributed hang — and the failure
    is then broadcast so all processes raise instead of proceeding on a
    missing artifact."""
    result = None
    err: Exception | None = None
    if jax.process_index() == 0:
        try:
            result = fn(*args, **kwargs)
        except Exception as exc:
            err = exc
    if jax.process_count() > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        # the broadcast is itself a collective, so it doubles as the barrier
        failed = bool(multihost_utils.broadcast_one_to_all(
            np.asarray(err is not None)))
        if failed and err is None:
            raise RuntimeError(
                "host0_only: process 0 raised during the side effect")
    if err is not None:
        raise err
    return result
