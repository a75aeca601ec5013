"""AsyncCheckpointer: background checkpoint writes that overlap compute.

Covers the invariants the trainer relies on (train_ddpm.py `write`):
value-at-submit-time semantics under buffer donation, per-key coalescing,
FIFO ordering, error surfacing, and flush-on-close."""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synt_isic_tpu.train.async_ckpt import AsyncCheckpointer


def _tree(v: float):
    return {"w": jnp.full((4, 4), v, jnp.float32),
            "b": jnp.full((4,), v * 2, jnp.float32)}


def _npz_write(host_tree, path):
    np.savez(path, **{k: np.asarray(a) for k, a in host_tree.items()})


def _load(path):
    with np.load(path) as d:
        return {k: d[k] for k in d.files}


def test_basic_write_and_wait(tmp_path):
    path = str(tmp_path / "a.npz")
    with AsyncCheckpointer() as ckpt:
        ckpt.submit(_tree(3.0), _npz_write, path)
        ckpt.wait()
        got = _load(path)
    np.testing.assert_array_equal(got["w"], np.full((4, 4), 3.0))
    np.testing.assert_array_equal(got["b"], np.full((4,), 6.0))


def test_value_at_submit_time_survives_donation(tmp_path):
    """The trainer donates (params, opt_state) into the next step; the
    snapshot must capture the submit-time value, not the donated buffer."""

    @jax.jit
    def step(tree):
        return jax.tree_util.tree_map(lambda a: a + 1.0, tree)

    step_donated = jax.jit(
        lambda tree: jax.tree_util.tree_map(lambda a: a + 1.0, tree),
        donate_argnums=(0,))

    tree = _tree(0.0)
    paths = []
    with AsyncCheckpointer() as ckpt:
        for i in range(5):
            p = str(tmp_path / f"step{i}.npz")
            paths.append(p)
            ckpt.submit(tree, _npz_write, p)
            tree = step_donated(tree)  # invalidates the submitted buffers
        ckpt.wait()
    for i, p in enumerate(paths):
        got = _load(p)
        np.testing.assert_array_equal(got["w"], np.full((4, 4), float(i)))


def test_coalesce_keeps_only_latest(tmp_path):
    """While an older write with the same coalesce key is still queued, a
    newer submit replaces it — the rolling-best contract."""
    path = str(tmp_path / "best.npz")
    calls = []
    gate = threading.Event()

    def slow_first(host_tree, p):
        calls.append(float(np.asarray(host_tree["w"])[0, 0]))
        if len(calls) == 1:
            gate.wait(timeout=10)  # hold the worker so later submits queue
        _npz_write(host_tree, p)

    ckpt = AsyncCheckpointer(max_pending=8)
    try:
        ckpt.submit(_tree(1.0), slow_first, path, coalesce="best")
        # give the worker time to pop item 1 and block inside it
        deadline = time.time() + 5
        while not calls and time.time() < deadline:
            time.sleep(0.01)
        assert calls == [1.0]
        ckpt.submit(_tree(2.0), slow_first, path, coalesce="best")
        ckpt.submit(_tree(3.0), slow_first, path, coalesce="best")
        gate.set()
        ckpt.wait()
    finally:
        gate.set()
        ckpt.close()
    # v2 was coalesced away while queued; v1 (in flight) and v3 ran
    assert calls == [1.0, 3.0]
    np.testing.assert_array_equal(_load(path)["w"], np.full((4, 4), 3.0))


def test_distinct_paths_all_written_in_order(tmp_path):
    order = []

    def record(host_tree, p):
        order.append(p)
        _npz_write(host_tree, p)

    paths = [str(tmp_path / f"epoch{i}.npz") for i in range(6)]
    with AsyncCheckpointer(max_pending=2) as ckpt:  # exercises backpressure
        for i, p in enumerate(paths):
            ckpt.submit(_tree(float(i)), record, p)
        ckpt.wait()
    assert order == paths
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(_load(p)["w"], np.full((4, 4), float(i)))


def test_worker_error_surfaces_on_wait(tmp_path):
    def boom(host_tree, p):
        raise RuntimeError("disk full")

    ckpt = AsyncCheckpointer()
    ckpt.submit(_tree(1.0), boom, str(tmp_path / "x.npz"))
    with pytest.raises(RuntimeError, match="disk full"):
        ckpt.wait()
    ckpt.close()  # error already consumed; close is clean


def test_close_flushes_pending(tmp_path):
    path = str(tmp_path / "flush.npz")
    ckpt = AsyncCheckpointer()
    ckpt.submit(_tree(7.0), _npz_write, path)
    ckpt.close()
    np.testing.assert_array_equal(_load(path)["w"], np.full((4, 4), 7.0))
    with pytest.raises(RuntimeError, match="closed"):
        ckpt.submit(_tree(8.0), _npz_write, path)


@pytest.mark.slow
def test_trainer_smoke_uses_async_writer(tmp_path):
    """train_class end-to-end on a tiny config still produces loadable
    torch-format checkpoints + resume state through the async path."""
    from synt_isic_tpu.io.pth import load_pth
    from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig
    from synt_isic_tpu.train.procedural import ProceduralDataset
    from synt_isic_tpu.train.train_ddpm import TrainConfig, train_class

    cfg = TrainConfig(image_size=16, batch_size=2, epochs=2,
                      num_train_timesteps=50, snapshot_every=1,
                      bf16_compute=False, seed=0)
    model = UNet2D(config=UNet2DConfig(
        sample_size=16, layers_per_block=1,
        block_out_channels=(8, 16, 16), attention_head_dim=4,
        norm_num_groups=2,
        down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D")))
    ds = ProceduralDataset("MEL", n_images=4, image_size=16, seed=0)
    result = train_class("MEL", ds, str(tmp_path), cfg, model=model)
    best = tmp_path / "unet_MEL_best.pth"
    assert best.exists(), "async writer must flush before train_class returns"
    sd = load_pth(str(best))
    assert len(sd) > 0
    assert (tmp_path / "train_state_MEL.npz").exists()
    assert np.isfinite(result["best_loss"])
