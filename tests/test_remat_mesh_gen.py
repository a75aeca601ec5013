"""Remat flag + mesh-enabled generator tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig

TINY = UNet2DConfig(sample_size=16, layers_per_block=1,
                    block_out_channels=(8, 16, 16), attention_head_dim=4,
                    norm_num_groups=2,
                    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
                    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"))


@pytest.mark.slow
@pytest.mark.parametrize("mode", [True, "hires", "attn", "dots"])
def test_remat_same_outputs_and_grads(mode):
    """Every remat mode is semantics-preserving: outputs and gradients match
    the no-remat model to float rounding (rematerialization only changes
    WHAT is recomputed in the backward pass, never the math)."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3))
                    .astype(np.float32))
    t = jnp.zeros((2,), jnp.int32)
    base = UNet2D(config=TINY, remat=False)
    rem = UNet2D(config=TINY, remat=mode)
    params = base.init(jax.random.PRNGKey(0), x, t)["params"]
    y1 = base.apply({"params": params}, x, t)
    y2 = rem.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)

    def loss(m, p):
        return jnp.mean(m.apply({"params": p}, x, t) ** 2)

    g1 = jax.grad(lambda p: loss(base, p))(params)
    g2 = jax.grad(lambda p: loss(rem, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_remat_rejects_unknown_mode():
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="unknown remat mode"):
        UNet2D(config=TINY, remat="everything").init(jax.random.PRNGKey(0), x, t)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_generator_with_mesh(tmp_path):
    torch = pytest.importorskip("torch")
    from tests.torch_oracle.unet2d_torch import UNet2DTorch, tiny_config
    from synt_isic_tpu.generator import ImageGenerator
    from synt_isic_tpu.parallel import create_mesh

    tc = tiny_config()
    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**tc).state_dict(), ckpt / "unet_NV_best.pth")
    jcfg = UNet2DConfig(
        sample_size=tc["sample_size"], layers_per_block=tc["layers_per_block"],
        block_out_channels=tc["block_out_channels"],
        down_block_types=tc["down_block_types"],
        up_block_types=tc["up_block_types"],
        attention_head_dim=tc["attention_head_dim"],
        norm_num_groups=tc["norm_num_groups"])
    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=jcfg)
    gen.set_inference_steps(3)
    gen.set_generation_seed(3)
    gen.batch_size = 8
    gen.set_mesh(create_mesh({"data": -1}))
    out = gen.generate_images([("NV", 8)], str(tmp_path / "out"),
                              postprocess=False)
    assert out["generated"] == 8
    assert len(list((tmp_path / "out" / "NV").glob("*.png"))) == 8
