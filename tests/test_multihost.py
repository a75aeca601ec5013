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

from synt_isic_tpu.models.unet2d import UNet2DConfig

TINY_TRAIN = UNet2DConfig(
    sample_size=16, layers_per_block=1, block_out_channels=(8, 16, 16),
    attention_head_dim=4, norm_num_groups=2,
    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"))


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


MULTIPROC_SCRIPT = r'''
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
import numpy as np, jax.numpy as jnp
sys.path.insert(0, os.environ["REPO_ROOT"])
from synt_isic_tpu.parallel import multihost as mh
assert jax.process_count() == nproc
assert mh.is_multihost()
mesh = mh.hybrid_mesh()
assert mesh.shape["data"] == nproc * 2
start, stop = mh.local_batch_bounds(8)
assert (stop - start) == 4 and start == pid * 4
data = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
arr = mh.global_batch_array(data[start:stop], mesh)
assert arr.shape == (8, 3)
total = float(jax.jit(jnp.sum)(arr))
assert abs(total - float(data.sum())) < 1e-5, total
tree = mh.broadcast_from_host0({"v": jnp.full((3,), float(pid))})
assert float(tree["v"][0]) == 0.0          # host 0's value everywhere
mh.host0_only(lambda: None)
print("MULTIPROC_OK", flush=True)
'''


def _free_port() -> str:
    """An OS-assigned free TCP port (fixed ports collide across concurrent
    runs and linger in TIME_WAIT)."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


def test_two_real_processes_over_local_coordinator(tmp_path):
    """TRUE multi-process validation of the DCN tier: two OS processes join
    one JAX runtime over a localhost coordinator, build a hybrid mesh
    spanning 2 processes x 2 virtual devices, feed per-process slices of a
    global batch, and agree on a jitted global reduction + broadcast."""
    import os
    import subprocess

    script = tmp_path / "proc.py"
    script.write_text(MULTIPROC_SCRIPT)
    env = dict(os.environ,
               REPO_ROOT=str(__import__("pathlib").Path(__file__).parents[1]))
    env.pop("JAX_PLATFORMS", None)
    port = _free_port()
    procs = [subprocess.Popen(["python", str(script), str(i), "2", port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and "MULTIPROC_OK" in out, \
            f"proc{i} rc={p.returncode}:\n{out[-2000:]}"


TRAIN_SCRIPT = r'''
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
workdir = sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
import numpy as np
sys.path.insert(0, os.environ["REPO_ROOT"])
from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig
from synt_isic_tpu.parallel import multihost as mh
from synt_isic_tpu.train.train_ddpm import TrainConfig, train_class

TINY = UNet2DConfig(sample_size=16, layers_per_block=1,
                    block_out_channels=(8, 16, 16), attention_head_dim=4,
                    norm_num_groups=2,
                    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
                    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"))

class FixedDataset:
    def __init__(self):
        self.data = (np.random.default_rng(7)
                     .uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32))
    def __len__(self):
        return len(self.data)
    def batches(self, batch_size, rng, local_range=None):
        lo, hi = local_range if local_range else (0, batch_size)
        for i in range(0, len(self.data), batch_size):
            yield self.data[i + lo:i + min(hi, batch_size)]

cfg = TrainConfig(image_size=16, batch_size=8, learning_rate=1e-3, epochs=1,
                  bf16_compute=False, snapshot_every=100)
mesh = mh.hybrid_mesh()
res = train_class("NV", FixedDataset(), workdir, cfg,
                  model=UNet2D(config=TINY), mesh=mesh,
                  log=lambda *a: None)
print("TRAIN_LOSS", res["history"][0], flush=True)

# flagship workload across hosts: dp-sharded SAMPLING on the same mesh
import jax.numpy as jnp
from synt_isic_tpu.diffusion import DiffusionSampler, DiffusionSchedule, SamplerConfig
from synt_isic_tpu.parallel.sharded_sampler import ShardedSampler

model = UNet2D(config=TINY)
from synt_isic_tpu.io.pth import load_pth
from synt_isic_tpu.io.convert import torch_to_flax
params = torch_to_flax(load_pth(workdir + "/unet_NV_best.pth"))
sampler = DiffusionSampler(
    lambda p, x, t: model.apply({"params": p}, x, t),
    DiffusionSchedule.create(),
    SamplerConfig(num_inference_steps=3, scheduler="ddim", image_size=16))
out = ShardedSampler(sampler, mesh).sample(params, np.arange(8, dtype=np.uint32))
# a dp-sharded global array is not fully addressable on one host — gather
from jax.experimental import multihost_utils
imgs = np.asarray(multihost_utils.process_allgather(out["images"], tiled=True))
assert imgs.shape == (8, 16, 16, 3) and np.isfinite(imgs).all()
print("SAMPLE_SUM", round(float(np.abs(imgs).sum()), 3), flush=True)
'''


@pytest.mark.slow
def test_two_process_dp_training_matches_single_device(tmp_path):
    """Data-parallel TRAINING across two real processes: the gradient psum
    crosses the process boundary, each process feeds only its slice, and
    the epoch loss matches the single-device run exactly (dp changes
    layout, never values). Only process 0 writes checkpoints."""
    import os
    import re
    import subprocess

    from synt_isic_tpu.models.unet2d import UNet2D
    from synt_isic_tpu.train.train_ddpm import TrainConfig, train_class

    script = tmp_path / "train_proc.py"
    script.write_text(TRAIN_SCRIPT)
    shared = tmp_path / "ckpt"
    env = dict(os.environ,
               REPO_ROOT=str(__import__("pathlib").Path(__file__).parents[1]))
    env.pop("JAX_PLATFORMS", None)
    port = _free_port()
    procs = [subprocess.Popen(
        ["python", str(script), str(i), "2", port, str(shared)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            outs.append(p.communicate(timeout=420)[0])
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            outs.append(p.communicate()[0])
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} rc={p.returncode}:\n{out[-2000:]}"
        m = re.search(r"TRAIN_LOSS ([0-9.]+)", out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1]
    sums = [re.search(r"SAMPLE_SUM ([0-9.]+)", o) for o in outs]
    assert all(sums), outs[0][-1000:]
    assert sums[0].group(1) == sums[1].group(1)  # cross-host sampling agrees
    assert (shared / "unet_NV_best.pth").exists()

    # single-device ground truth (same seeds, same fixed dataset)
    cfg = TrainConfig(image_size=16, batch_size=8, learning_rate=1e-3,
                      epochs=1, bf16_compute=False, snapshot_every=100)
    r = train_class("NV", _SingleFixedDataset(), str(tmp_path / "single"),
                    cfg, model=UNet2D(config=TINY_TRAIN), log=lambda *a: None)
    assert abs(r["history"][0] - losses[0]) < 2e-4


class _SingleFixedDataset:
    def __init__(self):
        self.data = (np.random.default_rng(7)
                     .uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32))

    def __len__(self):
        return len(self.data)

    def batches(self, batch_size, rng):
        for i in range(0, len(self.data), batch_size):
            yield self.data[i:i + batch_size]
