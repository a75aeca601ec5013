"""Multi-device (virtual 8-CPU mesh) sharding tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synt_isic_tpu.parallel import (create_mesh, shard_batch, batch_sharding,
                                    ShardedSampler)
from synt_isic_tpu.diffusion import DiffusionSchedule, DiffusionSampler, SamplerConfig
from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

TINY = UNet2DConfig(sample_size=16, layers_per_block=1,
                    block_out_channels=(8, 16, 16), attention_head_dim=4,
                    norm_num_groups=2,
                    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
                    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"))


def _sampler(steps=3):
    model = UNet2D(config=TINY)
    params = init_unet_params(model, jax.random.PRNGKey(0))
    apply_fn = lambda p, x, t: model.apply({"params": p}, x, t)
    cfg = SamplerConfig(num_inference_steps=steps, image_size=16)
    return DiffusionSampler(apply_fn, DiffusionSchedule.create(), cfg), params


def test_create_mesh_shapes():
    mesh = create_mesh({"data": -1})
    assert mesh.shape["data"] == 8
    mesh2 = create_mesh({"data": 4, "model": 2})
    assert dict(mesh2.shape) == {"data": 4, "model": 2}
    mesh3 = create_mesh({"data": -1, "model": 2})
    assert dict(mesh3.shape) == {"data": 4, "model": 2}


def test_shard_batch_places_on_mesh():
    mesh = create_mesh({"data": -1})
    x = np.zeros((16, 4, 4, 3), np.float32)
    placed = shard_batch(x, mesh)
    assert placed.sharding == batch_sharding(mesh)
    assert len(placed.sharding.device_set) == 8


def test_sharded_sampler_matches_single_device():
    """Per-seed RNG streams make the result independent of the mesh layout
    (up to float tiling noise)."""
    sampler, params = _sampler()
    seeds = np.arange(8, dtype=np.uint32)
    single = np.asarray(sampler.sample(params, seeds)["images"])

    mesh = create_mesh({"data": -1})
    sharded = ShardedSampler(sampler, mesh)
    multi = np.asarray(sharded.sample(params, seeds)["images"])
    np.testing.assert_allclose(multi, single, rtol=2e-2, atol=5e-3)


def test_sharded_sampler_pads_odd_batches():
    sampler, params = _sampler()
    mesh = create_mesh({"data": -1})
    sharded = ShardedSampler(sampler, mesh)
    out = sharded.sample(params, np.arange(5, dtype=np.uint32))
    assert out["images"].shape[0] == 5
    assert len(out["noise_hashes"]) == 5


def test_sharded_sampler_pads_shorter_than_pad_amount():
    """Pad amount exceeding the batch itself (1 seed on 8 shards) must
    still tile to a full axis multiple — a single concat of
    seeds[:pad] came up short and device_put rejected the uneven shard.
    The result must equal the single-device run for the real seed."""
    sampler, params = _sampler()
    seeds = np.asarray([7], np.uint32)
    single = np.asarray(sampler.sample(params, seeds)["images"])
    mesh = create_mesh({"data": -1})
    sharded = ShardedSampler(sampler, mesh)
    out = sharded.sample(params, seeds)
    assert out["images"].shape[0] == 1
    assert len(out["noise_hashes"]) == 1
    np.testing.assert_allclose(np.asarray(out["images"]), single,
                               rtol=2e-2, atol=5e-3)


def test_sharded_scores_batch_shorter_than_pad_amount():
    """Same under-padding hazard in the attribution fan-out path: a
    3-frame scoring batch on an 8-device mesh (e.g. Time-SHAP on a short
    trajectory) must pad by tiling, not by a short concat."""
    from synt_isic_tpu.parallel.sharded_sampler import sharded_scores

    mesh = create_mesh({"data": -1})
    fn = jax.jit(lambda x: jnp.sum(x, axis=(1, 2, 3)))
    batch = np.random.default_rng(0).normal(
        size=(3, 4, 4, 3)).astype(np.float32)
    out = sharded_scores(fn, batch, mesh)
    np.testing.assert_allclose(out, batch.sum(axis=(1, 2, 3)), rtol=1e-5)


def test_sharded_sampler_trajectory():
    sampler, params = _sampler()
    mesh = create_mesh({"data": -1})
    sharded = ShardedSampler(sampler, mesh)
    out = sharded.sample(params, np.arange(8, dtype=np.uint32),
                         capture_trajectory=True)
    assert out["trajectory"].shape == (3, 8, 16, 16, 3)


@pytest.mark.slow
def test_tensor_parallel_sampler_matches_single_device():
    """Pure-TP mesh (data=1, model=8): UNet weights channel-shard over
    'model' and GSPMD partitions the scan — results must match the
    replicated run (output-channel sharding keeps full contractions, so
    only layout/fusion float noise differs)."""
    sampler, params = _sampler()
    seeds = np.asarray([3, 11], np.uint32)
    single = np.asarray(sampler.sample(params, seeds)["images"])

    mesh = create_mesh({"data": 1, "model": 8})
    tp = ShardedSampler(sampler, mesh)
    assert tp.tp_axis == "model"
    out = tp.sample(params, seeds)
    np.testing.assert_allclose(np.asarray(out["images"]), single,
                               rtol=2e-2, atol=5e-3)


def test_dp_tp_sampler_matches_single_device():
    """2-D dp x tp mesh: batch over 'data', weights over 'model', both at
    once — the full pod-slice serving layout."""
    sampler, params = _sampler()
    seeds = np.arange(4, dtype=np.uint32)
    single = np.asarray(sampler.sample(params, seeds)["images"])

    mesh = create_mesh({"data": 4, "model": 2})
    out = ShardedSampler(sampler, mesh).sample(params, seeds,
                                               capture_trajectory=True)
    np.testing.assert_allclose(np.asarray(out["images"]), single,
                               rtol=2e-2, atol=5e-3)
    assert out["trajectory"].shape == (3, 4, 16, 16, 3)


def test_tp_sampler_1d_mesh_unchanged():
    """A plain 1-D 'data' mesh must not trigger the tp path."""
    sampler, _ = _sampler()
    mesh = create_mesh({"data": -1})
    assert ShardedSampler(sampler, mesh).tp_axis is None


def test_apply_dp_mesh_rounds_device_batch_up():
    """The CLI helper (serve --mesh / bench_serve) must attach the mesh and
    round a non-multiple device batch UP so ShardedSampler never pads on
    every call; a multiple stays untouched."""
    from synt_isic_tpu.parallel.mesh import apply_dp_mesh

    class _Gen:
        batch_size = 12

        def set_mesh(self, mesh):
            self.mesh = mesh

    g = _Gen()
    mesh = apply_dp_mesh(g, 8)
    assert g.mesh is mesh and dict(mesh.shape) == {"data": 8}
    assert g.batch_size == 16  # 12 -> next multiple of 8

    g2 = _Gen()
    g2.batch_size = 16
    apply_dp_mesh(g2, "auto")  # all 8 virtual devices
    assert g2.batch_size == 16

    # 'DxT' spec: dp x tp mesh; the batch rounds to the DP size only
    g3 = _Gen()
    g3.batch_size = 6
    mesh3 = apply_dp_mesh(g3, "4x2")
    assert dict(mesh3.shape) == {"data": 4, "model": 2}
    assert g3.batch_size == 8


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)
