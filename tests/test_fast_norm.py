"""fast_norm path: f32-statistics / bf16-arithmetic GroupNorm.

Guarantees: (a) exact equality with Flax GroupNorm(+SiLU) in f32 (same
math when arithmetic is exact); (b) on the bf16 model path, deviation from
the f32 reference is within the SAME band as the standard bf16 path
(fast_norm adds bf16-rounding-level error only); (c) identical param tree.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params
from synt_isic_tpu.ops.norms import group_norm_silu_fast

TINY = UNet2DConfig(sample_size=16, layers_per_block=1,
                    block_out_channels=(8, 16, 16), attention_head_dim=4,
                    norm_num_groups=2,
                    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
                    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"))


def test_fast_norm_matches_flax_groupnorm_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(1.5, 2.0, (2, 8, 8, 16)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1.0, 0.1, (16,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0.0, 0.1, (16,)).astype(np.float32))
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5, use_bias=False, use_scale=False)
    ref = nn.silu(gn.apply({}, x) * scale + bias)
    got = group_norm_silu_fast(x, scale, bias, groups=4, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # and without the SiLU
    got2 = group_norm_silu_fast(x, scale, bias, groups=4, eps=1e-5, silu=False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(gn.apply({}, x) * scale + bias),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fast_norm_unet_error_band():
    params = init_unet_params(UNet2D(config=TINY), jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    t = jnp.asarray([5, 900])
    f32 = UNet2D(config=TINY).apply({"params": params}, x, t)
    std = UNet2D(config=TINY, dtype=jnp.bfloat16).apply(
        {"params": params}, x, t).astype(jnp.float32)
    fast = UNet2D(config=TINY, dtype=jnp.bfloat16, fast_norm=True).apply(
        {"params": params}, x, t).astype(jnp.float32)
    err_std = float(jnp.max(jnp.abs(std - f32)))
    err_fast = float(jnp.max(jnp.abs(fast - f32)))
    # fast_norm must not add more than ~2x the inherent bf16-path error
    assert err_fast <= max(2.0 * err_std, 5e-2), (err_fast, err_std)


@pytest.mark.slow
def test_fast_norm_same_param_tree():
    p1 = init_unet_params(UNet2D(config=TINY), jax.random.PRNGKey(0))
    p2 = init_unet_params(UNet2D(config=TINY, fast_norm=True,
                                 dtype=jnp.bfloat16), jax.random.PRNGKey(0))
    s1 = jax.tree_util.tree_structure(p1)
    s2 = jax.tree_util.tree_structure(p2)
    assert s1 == s2
