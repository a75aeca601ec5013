"""Flax ResNet18 classifier vs torch oracle + reference API behavior."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from synt_isic_tpu.io import load_pth, torch_to_flax
from synt_isic_tpu.models.classifier import (
    LesionClassifier, preprocess_for_classifier)
from synt_isic_tpu.models.resnet18 import ResNet18, ResNet18Config

from tests.torch_oracle.resnet18_torch import ResNet18Torch, classifier_preprocess_torch


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    torch.manual_seed(0)
    tmodel = ResNet18Torch(num_classes=7).eval()
    # randomize running stats so BN parity is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    path = str(tmp_path_factory.mktemp("ckpt") / "classifier.pth")
    torch.save(tmodel.state_dict(), path)
    clf, counts = LesionClassifier.from_checkpoint(path, num_classes=7)
    return tmodel, clf, counts, path


def test_checkpoint_fully_loaded(pair):
    _, _, counts, _ = pair
    assert counts["skipped"] == 0
    assert counts["loaded"] > 100  # resnet18 has ~122 loadable tensors w/ BN stats


def test_backbone_parity(pair):
    """Raw 224x224 forward parity (no resize in the way)."""
    tmodel, clf, _, _ = pair
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 224, 224, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(clf.model.apply({"params": clf.params}, jnp.asarray(x)))
    # default XLA precision (bf16-class convs) — see conftest note
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=2e-2)


def test_full_pipeline_close(pair):
    """End-to-end (128² [-1,1] -> preprocess -> logits): small divergence
    allowed from the resize implementations, probabilities must agree."""
    tmodel, clf, _, _ = pair
    rng = np.random.default_rng(1)
    x = np.clip(rng.normal(size=(2, 128, 128, 3)) * 0.4, -1, 1).astype(np.float32)
    with torch.no_grad():
        tin = classifier_preprocess_torch(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        want = torch.softmax(tmodel(tin), dim=1).numpy()
    got = np.asarray(clf.get_probabilities(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)
    assert np.argmax(got, axis=1).tolist() == np.argmax(want, axis=1).tolist()


def test_per_class_score_is_log_prob(pair):
    _, clf, _, _ = pair
    x = jnp.zeros((1, 128, 128, 3))
    probs = clf.get_probabilities(x)
    score = clf.get_per_class_score(x, 3)
    # two separate forward executions — XLA:CPU conv reductions are not
    # bitwise run-to-run deterministic, so this is a semantic check only
    np.testing.assert_allclose(np.asarray(score),
                               np.log(np.asarray(probs[:, 3]) + 1e-8),
                               rtol=1e-3, atol=1e-3)


def test_partial_load_with_mismatched_head(tmp_path):
    """The XAI path builds an 8-output head but loads 7-output checkpoints —
    compatible weights load, fc is skipped (`XAI.py:489-531`)."""
    torch.manual_seed(1)
    tmodel = ResNet18Torch(num_classes=7)
    path = str(tmp_path / "classifier.pth")
    torch.save(tmodel.state_dict(), path)
    clf, counts = LesionClassifier.from_checkpoint(path, num_classes=8)
    assert counts["skipped"] == 2  # fc kernel + bias shapes differ
    assert clf.logits(jnp.zeros((1, 128, 128, 3))).shape == (1, 8)


def test_input_gradient_shape(pair):
    _, clf, _, _ = pair
    x = jnp.zeros((2, 128, 128, 3))
    g = clf.input_gradient(x, 0)
    assert g.shape == x.shape
    assert bool(jnp.any(g != 0))


def test_preprocess_matches_reference_semantics():
    x = jnp.asarray(np.linspace(-1.2, 1.2, 128 * 128 * 3, dtype=np.float32)
                    .reshape(1, 128, 128, 3))
    y = preprocess_for_classifier(x)
    assert y.shape == (1, 224, 224, 3)
    # clamp before normalize: max over channel c is (1 - mean_c)/std_c
    from synt_isic_tpu.models.classifier import IMAGENET_MEAN, IMAGENET_STD
    for c in range(3):
        assert float(jnp.max(y[..., c])) <= (1 - IMAGENET_MEAN[c]) / IMAGENET_STD[c] + 1e-5
