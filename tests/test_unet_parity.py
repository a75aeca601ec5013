"""Numerical parity of the Flax UNet2D against the torch oracle.

Same weights (converted through the real checkpoint path: torch state_dict
-> `.pth` bytes -> `load_pth` -> `torch_to_flax`), same inputs, outputs must
agree to float32 tolerance. This validates the whole chain a real
`unet_<CLASS>_best.pth` goes through (reference `model_manager.py:89-171`).
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from synt_isic_tpu.io import load_pth, save_pth, torch_to_flax, flax_to_torch
from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig

from tests.torch_oracle.unet2d_torch import UNet2DTorch, tiny_config


def _make_pair(tmp_path):
    torch.manual_seed(0)
    cfg = tiny_config()
    tmodel = UNet2DTorch(**cfg).eval()
    path = os.path.join(tmp_path, "unet_TEST_best.pth")
    torch.save(tmodel.state_dict(), path)

    jcfg = UNet2DConfig(
        sample_size=cfg["sample_size"], in_channels=3, out_channels=3,
        layers_per_block=cfg["layers_per_block"],
        block_out_channels=cfg["block_out_channels"],
        down_block_types=cfg["down_block_types"],
        up_block_types=cfg["up_block_types"],
        attention_head_dim=cfg["attention_head_dim"],
        norm_num_groups=cfg["norm_num_groups"])
    jmodel = UNet2D(config=jcfg)
    params = torch_to_flax(load_pth(path))
    return tmodel, jmodel, params


def test_pth_reader_matches_torch_load(tmp_path):
    torch.manual_seed(1)
    tmodel = UNet2DTorch(**tiny_config())
    path = os.path.join(tmp_path, "w.pth")
    torch.save(tmodel.state_dict(), path)
    ours = load_pth(path)
    theirs = torch.load(path, map_location="cpu", weights_only=True)
    assert set(ours) == set(theirs)
    for k in theirs:
        np.testing.assert_array_equal(ours[k], theirs[k].numpy())


def test_save_pth_roundtrip(tmp_path):
    state = {
        "a.weight": np.random.default_rng(0).normal(size=(4, 3, 3, 3)).astype(np.float32),
        "a.bias": np.arange(4, dtype=np.float32),
        "b.step": np.array(7, dtype=np.int64),
    }
    path = os.path.join(tmp_path, "rt.pth")
    save_pth(state, path)
    back_torch = torch.load(path, map_location="cpu", weights_only=True)
    back_ours = load_pth(path)
    for k, v in state.items():
        np.testing.assert_array_equal(back_torch[k].numpy(), v)
        np.testing.assert_array_equal(back_ours[k], v)


def test_flax_to_torch_inverse(tmp_path):
    torch.manual_seed(2)
    tmodel = UNet2DTorch(**tiny_config())
    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    tree = torch_to_flax(state)
    back = flax_to_torch(tree)
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k])


def test_unet_forward_parity(tmp_path):
    tmodel, jmodel, params = _make_pair(tmp_path)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    t = np.array([999, 20], dtype=np.int64)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      torch.from_numpy(t)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x), jnp.asarray(t)))
    # XLA's default conv/matmul precision is bf16-class; structural bugs
    # would produce O(1) errors, precision noise stays ~1e-3. Exact-math
    # parity is covered in test_ops_exact.py under 'highest' precision.
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=8e-3)


def test_unet_param_tree_covers_checkpoint(tmp_path):
    """Every checkpoint tensor must land somewhere in the Flax tree that the
    model actually consumes (no silently ignored weights)."""
    import jax

    tmodel, jmodel, params = _make_pair(tmp_path)
    init = jmodel.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,), jnp.int32))["params"]
    flat_init = jax.tree_util.tree_leaves_with_path(init)
    flat_ckpt = jax.tree_util.tree_leaves_with_path(params)
    init_paths = {jax.tree_util.keystr(p) for p, _ in flat_init}
    ckpt_paths = {jax.tree_util.keystr(p) for p, _ in flat_ckpt}
    assert init_paths == ckpt_paths
    for (p, a), (q, b) in zip(sorted(flat_init, key=lambda kv: jax.tree_util.keystr(kv[0])),
                              sorted(flat_ckpt, key=lambda kv: jax.tree_util.keystr(kv[0]))):
        assert a.shape == b.shape, f"{jax.tree_util.keystr(p)}: {a.shape} vs {b.shape}"
