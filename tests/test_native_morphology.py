"""Native C++ morphology vs scipy.ndimage: exact behavioral parity."""
import numpy as np
import pytest
from scipy import ndimage

from synt_isic_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ unavailable — native lib not built")


def _random_masks(n=8, size=64, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        density = rng.uniform(0.05, 0.6)
        yield rng.random((size, size)) < density


@pytest.mark.parametrize("connectivity", [1, 2])
def test_closing_parity(connectivity):
    structure = ndimage.generate_binary_structure(2, connectivity)
    for mask in _random_masks(seed=1):
        want = ndimage.binary_closing(mask, structure=structure, iterations=2)
        got = native.binary_closing(mask, connectivity=connectivity, iterations=2)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("connectivity", [1, 2])
def test_opening_parity(connectivity):
    structure = ndimage.generate_binary_structure(2, connectivity)
    for mask in _random_masks(seed=2):
        want = ndimage.binary_opening(mask, structure=structure, iterations=1)
        got = native.binary_opening(mask, connectivity=connectivity, iterations=1)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("connectivity", [1, 2])
def test_label_parity(connectivity):
    structure = ndimage.generate_binary_structure(2, connectivity)
    for mask in _random_masks(seed=3):
        want_labels, want_n = ndimage.label(mask, structure=structure)
        got_labels, got_n = native.label(mask, connectivity=connectivity)
        assert got_n == want_n
        # same partition (label ids may permute): compare via first-occurrence
        # canonicalization
        def canon(lab):
            out = np.zeros_like(lab)
            mapping = {}
            nxt = 0
            for v in lab.ravel():
                if v and v not in mapping:
                    nxt += 1
                    mapping[v] = nxt
            for v, m in mapping.items():
                out[lab == v] = m
            return out
        np.testing.assert_array_equal(canon(got_labels), canon(want_labels))


def test_remove_small_components():
    mask = np.zeros((32, 32), bool)
    mask[2, 2] = True              # size 1
    mask[10:14, 10:14] = True      # size 16
    out = native.remove_small_components(mask, min_size=10)
    assert not out[2, 2]
    assert out[11, 11]


def test_regions_native_path_matches_scipy():
    """select_regions_advanced must give identical masks through either
    backend."""
    from synt_isic_tpu.xai import regions as R

    rng = np.random.default_rng(4)
    attr = rng.normal(size=(64, 64)).astype(np.float32)
    res_scipy = R.select_regions_advanced(attr, k_percent=15, use_native=False)
    res_native = R.select_regions_advanced(attr, k_percent=15, use_native=True)
    np.testing.assert_array_equal(res_scipy["mask"], res_native["mask"])
