"""Exact-math (fp32 'highest' precision) parity of the primitive ops.

Complements the whole-network tests (which run at XLA default precision):
proves the torch->flax weight-layout conversion and op semantics are exact
where precision is controlled.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn
import jax
import jax.numpy as jnp


def test_conv_exact():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    tconv = torch.nn.Conv2d(3, 6, 3, padding=1)
    w, b = tconv.weight.detach().numpy(), tconv.bias.detach().numpy()
    with torch.no_grad():
        want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    conv = nn.Conv(6, (3, 3), padding=1)
    p = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}}
    with jax.default_matmul_precision("highest"):
        got = np.asarray(conv.apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_groupnorm_exact():
    C, G = 8, 4
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 5, C)).astype(np.float32)
    tgn = torch.nn.GroupNorm(G, C, eps=1e-5)
    with torch.no_grad():
        tgn.weight.copy_(torch.arange(C, dtype=torch.float32) * 0.1 + 0.5)
        tgn.bias.copy_(torch.arange(C, dtype=torch.float32) * 0.01)
        want = tgn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    gn = nn.GroupNorm(num_groups=G, epsilon=1e-5)
    params = {"scale": jnp.asarray(np.arange(C) * 0.1 + 0.5, jnp.float32),
              "bias": jnp.asarray(np.arange(C) * 0.01, jnp.float32)}
    got = np.asarray(gn.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_linear_exact():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 16)).astype(np.float32)
    tl = torch.nn.Linear(16, 8)
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()
    dense = nn.Dense(8)
    p = {"params": {"kernel": jnp.asarray(tl.weight.detach().numpy().T),
                    "bias": jnp.asarray(tl.bias.detach().numpy())}}
    with jax.default_matmul_precision("highest"):
        got = np.asarray(dense.apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nearest_upsample_exact():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
        mode="nearest").numpy().transpose(0, 2, 3, 1)
    got = np.asarray(jnp.repeat(jnp.repeat(jnp.asarray(x), 2, axis=1), 2, axis=2))
    np.testing.assert_array_equal(got, want)


def test_avg_pool_same_matches_torch():
    from synt_isic_tpu.xai.interventions import _avg_pool_same
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    k = 5
    want = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), kernel_size=k, stride=1,
        padding=k // 2).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(_avg_pool_same(jnp.asarray(x), k))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_maxpool_exact():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 7, 7, 3)).astype(np.float32)
    want = torch.nn.functional.max_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, stride=2,
        padding=1).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(nn.max_pool(jnp.asarray(x), (3, 3), strides=(2, 2),
                                 padding=((1, 1), (1, 1))))
    np.testing.assert_array_equal(got, want)
