"""Fused GroupNorm(+FiLM)+SiLU Pallas kernels vs the Flax reference path
(interpret mode on CPU)."""
import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from synt_isic_tpu.ops.pallas.group_norm import (
    fused_film_group_norm_silu, fused_group_norm_silu)


def _ref_gn_silu(x, scale, bias, groups, eps=1e-5, with_silu=True):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps)
    y = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    return nn.silu(y) if with_silu else y


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 16), 4),
                                          ((1, 16, 16, 8), 2)])
def test_fused_group_norm_silu(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32) * 0.1 + 1)
    bias = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32) * 0.1)
    want = np.asarray(_ref_gn_silu(x, scale, bias, groups))
    got = np.asarray(fused_group_norm_silu(x, scale, bias, groups=groups,
                                           interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_film_group_norm_silu():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    scale = jnp.ones(16)
    bias = jnp.zeros(16)
    shifted = x + temb[:, None, None, :]
    want = np.asarray(_ref_gn_silu(shifted, scale, bias, groups=4))
    got = np.asarray(fused_film_group_norm_silu(x, temb, scale, bias, groups=4,
                                                interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resnet_block_fused_matches_reference():
    """Whole ResnetBlock2D with fused norms == reference path, same params."""
    from synt_isic_tpu.models.unet2d import ResnetBlock2D

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    temb = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    ref = ResnetBlock2D(8, 8, groups=4, use_fused_norm=False)
    fused = ResnetBlock2D(8, 8, groups=4, use_fused_norm=True)
    params = ref.init(jax.random.PRNGKey(0), x, temb)["params"]
    want = np.asarray(ref.apply({"params": params}, x, temb))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused.apply({"params": params}, x, temb))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # identical param trees
    params_fused = jax.eval_shape(
        lambda: fused.init(jax.random.PRNGKey(0), x, temb)["params"])
    assert (jax.tree_util.tree_map(lambda a: a.shape, params)
            == jax.tree_util.tree_map(lambda a: a.shape, params_fused))
