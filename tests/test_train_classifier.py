"""Classifier training: learns a separable toy problem; exports load into
both the frozen inference ResNet and torch."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synt_isic_tpu.train.train_classifier import (
    ClassifierTrainConfig, create_classifier_train_state,
    make_classifier_train_step, to_inference_tree, export_classifier_pth)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = ClassifierTrainConfig(num_classes=3, image_size=32, batch_size=8,
                                learning_rate=3e-4, bf16_compute=False)
    model, state, tx = create_classifier_train_state(cfg)
    return cfg, model, state, tx


def _toy_batch(rng, n=8, size=32):
    """class k = image dominated by channel k."""
    labels = rng.integers(0, 3, n)
    images = rng.normal(0, 0.1, (n, size, size, 3)).astype(np.float32)
    for i, k in enumerate(labels):
        images[i, :, :, k] += 1.0
    return images, labels.astype(np.int64)


@pytest.mark.slow
def test_classifier_learns(tiny_setup):
    cfg, model, state, tx = tiny_setup
    step = make_classifier_train_step(model, tx)
    rng = np.random.default_rng(0)
    accs = []
    for i in range(25):
        images, labels = _toy_batch(rng)
        state, loss, acc = step(state, jnp.asarray(images), jnp.asarray(labels))
        accs.append(float(acc))
    assert np.mean(accs[-5:]) > np.mean(accs[:5])
    assert np.mean(accs[-5:]) > 0.6
    # stash for the export test
    tiny_setup_state[0] = state


tiny_setup_state = [None]


@pytest.mark.slow
def test_export_roundtrip(tiny_setup, tmp_path):
    cfg, model, state, tx = tiny_setup
    state = tiny_setup_state[0] or state
    # frozen inference tree loads into models.resnet18.ResNet18
    from synt_isic_tpu.models.resnet18 import ResNet18, ResNet18Config

    tree = to_inference_tree(state)
    infer = ResNet18(config=ResNet18Config(num_classes=3))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3))
                    .astype(np.float32))
    logits_infer = infer.apply({"params": tree}, x)
    # eval-mode trainable model must agree with the frozen-tree inference
    logits_train = model.apply({"params": state.params,
                                "batch_stats": state.batch_stats}, x,
                               train=False)
    np.testing.assert_allclose(np.asarray(logits_infer),
                               np.asarray(logits_train), rtol=1e-4, atol=1e-4)

    # torch export loads into the torch oracle without missing keys
    torch = pytest.importorskip("torch")
    from tests.torch_oracle.resnet18_torch import ResNet18Torch

    path = str(tmp_path / "classifier.pth")
    export_classifier_pth(state, path)
    tmodel = ResNet18Torch(num_classes=3)
    loaded = torch.load(path, map_location="cpu", weights_only=True)
    missing, unexpected = tmodel.load_state_dict(loaded, strict=False)
    assert not missing and not unexpected
    with torch.no_grad():
        want = tmodel.eval()(torch.from_numpy(
            np.asarray(x).transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(logits_infer), want,
                               rtol=2e-2, atol=2e-2)
