"""Standard Inception-FID: architecture/conversion structure + FID math.

The embedding network must load real torchvision `inception_v3` weights
(BASELINE.md "FID parity" contract); diffusers/torchvision are absent
here, so structure is proven the same way as the UNet
(tests/test_checkpoint_manifest.py): a vendored key/shape manifest of the
torchvision state dict, converted and compared against the Flax init tree
leaf-for-leaf. FID math is validated on synthetic feature distributions
with closed-form Fréchet distances.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synt_isic_tpu.metrics.fid import (FeatureExtractor,
                                       InceptionFeatureExtractor, compute_fid,
                                       frechet_distance)
from synt_isic_tpu.models.inception_v3 import (InceptionV3,
                                               expected_inception_state_shapes,
                                               init_inception_params)
from synt_isic_tpu.io.convert import torch_to_flax


def _flatten_shapes(tree, path=()):
    flat = {}
    for k, v in tree.items():
        if hasattr(v, "shape"):
            flat[path + (k,)] = tuple(v.shape)
        else:
            flat.update(_flatten_shapes(v, path + (k,)))
    return flat


def test_manifest_converts_onto_flax_tree():
    manifest = expected_inception_state_shapes()
    fake = {k: np.zeros(s, np.float32) for k, s in manifest.items()}
    converted = _flatten_shapes(torch_to_flax(fake))
    model = InceptionV3()
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                               jnp.zeros((1, 299, 299, 3), jnp.float32))
    expected = _flatten_shapes(variables["params"])
    assert set(converted) == set(expected), (
        f"missing={sorted(set(expected) - set(converted))[:5]} "
        f"extra={sorted(set(converted) - set(expected))[:5]}")
    mismatched = {k: (converted[k], expected[k])
                  for k in expected if converted[k] != expected[k]}
    assert not mismatched, dict(list(mismatched.items())[:5])


def test_manifest_param_count():
    """torchvision documents inception_v3 at 27.16M params INCLUDING the
    AuxLogits head (~3.3M: 768->128 1x1 + 128->768 5x5 + 768->1000 fc);
    the manifest excludes aux, so it must land at 27.16M - 3.29M ~ 23.87M."""
    n = sum(int(np.prod(s)) for s in expected_inception_state_shapes().values())
    aux = (128 * 768 + 2 * 128 + 2 * 128) + (768 * 128 * 25 + 2 * 768 + 2 * 768) \
        + (1000 * 768 + 1000)
    assert 23_700_000 < n < 24_000_000
    assert 26_900_000 < n + aux < 27_400_000


@pytest.mark.slow
def test_pool3_features_shape_and_determinism():
    params = init_inception_params(jax.random.PRNGKey(0))
    model = InceptionV3()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    from synt_isic_tpu.models.inception_v3 import preprocess_for_inception
    feats = model.apply({"params": params}, preprocess_for_inception(x),
                        method=model.pool3_features)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_frechet_distance_closed_form():
    """For isotropic Gaussians: d² = ||mu1-mu2||² + (sqrt(s1)-sqrt(s2))²·D."""
    d = 16
    mu1, mu2 = np.zeros(d), np.ones(d) * 0.5
    s1, s2 = 1.0, 2.25
    got = frechet_distance(mu1, np.eye(d) * s1, mu2, np.eye(d) * s2)
    want = float(0.25 * d + (1.0 - 1.5) ** 2 * d)
    assert got == pytest.approx(want, rel=1e-6)
    assert frechet_distance(mu1, np.eye(d), mu1, np.eye(d)) == pytest.approx(0.0, abs=1e-8)


@pytest.mark.slow
def test_inception_fid_monotone_under_noise():
    """FID(A, A+noise) grows with noise level; FID(A, A') ~ 0 for two halves
    of the same distribution. Random-init weights: the embedding is still a
    fixed nonlinear map, so the METRIC's behavior is testable."""
    extractor = InceptionFeatureExtractor(batch_size=16)
    rng = np.random.default_rng(1)
    base = rng.uniform(-0.8, 0.8, (48, 32, 32, 3)).astype(np.float32)
    same = rng.uniform(-0.8, 0.8, (48, 32, 32, 3)).astype(np.float32)
    fid_same = compute_fid(base, same, extractor)
    fids = [compute_fid(base,
                        np.clip(same + rng.normal(0, lvl, same.shape), -1, 1)
                        .astype(np.float32), extractor)
            for lvl in (0.2, 0.6)]
    assert fid_same < fids[0] < fids[1]


def test_pixel_frechet_ranks_structure_over_noise():
    """The deterministic pooled-pixel embedding must rank a structured
    sample set (same distribution, different draws) FAR closer to data than
    pure noise — the property the random-init CNN proxy cannot guarantee,
    and the reason the e2e loop's convergence verdict uses this metric."""
    from synt_isic_tpu.metrics.fid import PixelFeatureExtractor, pixel_frechet
    from synt_isic_tpu.train.procedural import procedural_images

    held = procedural_images("MEL", 128, 32, seed=0, start_index=1000)
    same = procedural_images("MEL", 128, 32, seed=0)
    rng = np.random.default_rng(3)
    noise = rng.uniform(-1, 1, held.shape).astype(np.float32)
    floor = pixel_frechet(same, held)
    ceiling = pixel_frechet(noise, held)
    assert floor < 0.1 * ceiling
    # embedding is deterministic and shaped (N, grid²·3); 33 crops to 32
    ex = PixelFeatureExtractor(grid=8)
    f1, f2 = ex(held), ex(held)
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape == (128, 192)
    assert ex(np.zeros((2, 33, 33, 3), np.float32)).shape == (2, 192)
    # a global color shift moves the metric well above the same-distribution
    # sampling-noise floor (the failure mode the proxy often misses)
    shifted = np.clip(held + np.array([0.3, -0.2, 0.1], np.float32), -1, 1)
    assert pixel_frechet(shifted, held) > 3 * floor


def test_fallback_extractor_still_works():
    extractor = FeatureExtractor()
    rng = np.random.default_rng(2)
    imgs = rng.uniform(-1, 1, (8, 128, 128, 3)).astype(np.float32)
    feats = extractor(imgs)
    assert feats.shape == (8, 512)


def test_require_standard_refuses_fallback(tmp_path):
    """`require_standard=True` must raise, never silently hand back the
    classifier-feature proxy (VERDICT r2 #7)."""
    from synt_isic_tpu.metrics.fid import default_extractor

    with pytest.raises(FileNotFoundError, match="standard FID"):
        default_extractor(checkpoints_dir=str(tmp_path), require_standard=True)
    # and the permissive default still falls back
    assert isinstance(default_extractor(checkpoints_dir=str(tmp_path)),
                      FeatureExtractor)


def _fake_inception_state():
    return {k: np.zeros(s, np.float32)
            for k, s in expected_inception_state_shapes().items()}


def test_inception_bootstrap_with_stubbed_fetch(tmp_path):
    """The one-command bootstrap: fetch (stubbed) -> sha256 check ->
    manifest validation -> install as checkpoints/inception_v3.pth."""
    import hashlib

    from synt_isic_tpu.app.download_models import fetch_inception_weights
    from synt_isic_tpu.io.pth import save_pth

    payload = tmp_path / "payload.pth"
    save_pth(_fake_inception_state(), str(payload))
    digest8 = hashlib.sha256(payload.read_bytes()).hexdigest()[:8]

    def fetch(url, dest):
        dest.write_bytes(payload.read_bytes())
        return True

    ckpt = tmp_path / "checkpoints"
    assert fetch_inception_weights(ckpt, sha256_prefix=digest8, fetch=fetch)
    assert (ckpt / "inception_v3.pth").exists()
    # and the FID path now uses the standard extractor
    from synt_isic_tpu.metrics.fid import default_extractor

    ex = default_extractor(checkpoints_dir=str(ckpt), require_standard=True)
    assert isinstance(ex, InceptionFeatureExtractor) and ex.pretrained


def test_inception_bootstrap_rejects_bad_checksum(tmp_path):
    from synt_isic_tpu.app.download_models import fetch_inception_weights

    def fetch(url, dest):
        dest.write_bytes(b"not the weights")
        return True

    ckpt = tmp_path / "checkpoints"
    assert not fetch_inception_weights(ckpt, fetch=fetch)
    assert not (ckpt / "inception_v3.pth").exists()


def test_inception_bootstrap_rejects_wrong_architecture(tmp_path):
    """Right checksum (computed over the delivered file), wrong structure:
    manifest validation must refuse the install."""
    import hashlib

    from synt_isic_tpu.app.download_models import fetch_inception_weights
    from synt_isic_tpu.io.pth import save_pth

    payload = tmp_path / "payload.pth"
    save_pth({"conv.weight": np.zeros((3, 3), np.float32)}, str(payload))
    digest8 = hashlib.sha256(payload.read_bytes()).hexdigest()[:8]

    def fetch(url, dest):
        dest.write_bytes(payload.read_bytes())
        return True

    ckpt = tmp_path / "checkpoints"
    assert not fetch_inception_weights(ckpt, sha256_prefix=digest8, fetch=fetch)
    assert not (ckpt / "inception_v3.pth").exists()
