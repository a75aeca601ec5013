"""Multi-host (DCN) tier helpers (`parallel/multihost.py`).

True multi-process execution can't run in one pytest process; these tests
pin down (a) the exact single-process degradations every entry point relies
on, (b) the mesh/axis bookkeeping that must hold regardless of process
count, and (c) end-to-end sharded execution on the virtual 8-device CPU
mesh (conftest.py forces host_platform_device_count=8).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from synt_isic_tpu.parallel import multihost as mh


def test_initialize_is_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert mh.initialize() is False
    assert mh.is_multihost() is False


def test_hybrid_mesh_single_host_defaults():
    mesh = mh.hybrid_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.shape["data"] == jax.local_device_count()


def test_hybrid_mesh_single_host_2d():
    n = jax.local_device_count()
    if n < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = mh.hybrid_mesh(ici_axes={"data": -1, "model": 2})
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] == n // 2


def test_hybrid_mesh_rejects_nondividing_axes():
    with pytest.raises(ValueError):
        mh.hybrid_mesh(ici_axes={"data": 3, "model": -1})
    with pytest.raises(ValueError):
        mh.hybrid_mesh(dcn_axes={"data": 2})  # process_count == 1


def test_local_batch_bounds_partitions_exactly():
    bounds = [mh.local_batch_bounds(64, process_id=i, process_count=4)
              for i in range(4)]
    assert bounds == [(0, 16), (16, 32), (32, 48), (48, 64)]
    with pytest.raises(ValueError):
        mh.local_batch_bounds(10, process_id=0, process_count=4)


def test_global_batch_array_shards_over_mesh():
    mesh = mh.hybrid_mesh()
    n = mesh.shape["data"]
    data = np.arange(n * 4 * 3, dtype=np.float32).reshape(n * 4, 3)
    arr = mh.global_batch_array(data, mesh)
    assert arr.shape == data.shape
    assert arr.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), arr.ndim)
    np.testing.assert_array_equal(np.asarray(arr), data)
    # per-device shards hold contiguous batch slices
    assert all(s.data.shape[0] == data.shape[0] // n
               for s in arr.addressable_shards)


def test_broadcast_and_sync_noop_single_process():
    tree = {"a": jnp.ones((2,)), "b": 3}
    out = mh.broadcast_from_host0(tree)
    assert out is tree
    mh.sync_hosts()  # must not raise


def test_host0_only_runs_and_returns():
    calls = []
    out = mh.host0_only(lambda x: calls.append(x) or "done", 7)
    assert out == "done" and calls == [7]


def test_multihost_feeding_matches_single_device_math():
    """A jitted global-batch reduction over the hybrid mesh must equal the
    host computation — proves sharding annotations don't change values."""
    mesh = mh.hybrid_mesh()
    data = np.random.default_rng(0).normal(
        size=(mesh.shape["data"] * 2, 8)).astype(np.float32)
    start, stop = mh.local_batch_bounds(data.shape[0])
    arr = mh.global_batch_array(data[start:stop], mesh)

    @jax.jit
    def mean_norm(x):
        return jnp.mean(jnp.sum(x * x, axis=-1))

    got = float(mean_norm(arr))
    want = float(np.mean(np.sum(data * data, axis=-1)))
    assert abs(got - want) < 1e-4
