"""MultiClassDataset + SingleClassDataset over a synthetic ISIC-format tree."""
import numpy as np
import pytest

pd = pytest.importorskip("pandas")
from PIL import Image

from synt_isic_tpu.train.data import MultiClassDataset, SingleClassDataset


@pytest.fixture(scope="module")
def isic_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("isic")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    classes = ["MEL", "NV", "BCC", "AKIEC", "BKL", "DF", "VASC"]
    for i in range(21):
        name = f"ISIC_{i:07d}"
        arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{name}.jpg")
        onehot = [0.0] * 7
        onehot[i % 3] = 1.0  # labels 0..2 only
        rows.append([name] + onehot)
    csv = root / "gt.csv"
    pd.DataFrame(rows, columns=["image"] + classes).to_csv(csv, index=False)
    return str(img_dir), str(csv)


def test_single_class_dataset(isic_tree):
    img_dir, csv = isic_tree
    ds = SingleClassDataset(img_dir, csv, class_id=1, image_size=32,
                            max_samples=5)
    assert len(ds) == 5
    raw = ds.load_raw(0)
    assert raw.shape == (32, 32, 3)
    assert 0 <= raw.min() and raw.max() <= 1
    batches = list(ds.batches(2, np.random.default_rng(0)))
    assert batches and batches[0].shape == (2, 32, 32, 3)
    assert batches[0].min() >= -1 - 1e-6 and batches[0].max() <= 1 + 1e-6


def test_multiclass_dataset(isic_tree):
    img_dir, csv = isic_tree
    ds = MultiClassDataset(img_dir, csv, image_size=32, max_samples_per_class=4)
    assert len(ds) == 12  # 3 classes x 4
    images, labels = next(ds.batches(6, np.random.default_rng(1),
                                     classifier_size=64))
    assert images.shape == (6, 64, 64, 3)
    assert labels.shape == (6,)
    assert set(labels).issubset({0, 1, 2})
    # ImageNet normalization applied (values outside [0,1])
    assert images.min() < -0.5


def test_single_class_local_range_matches_full_batches(isic_tree):
    """Per-image rng streams: loading only rows [lo, hi) of each batch must
    produce EXACTLY the corresponding rows of the full batches (the
    multi-host feeding contract — a process's slice is independent of who
    else materializes what)."""
    img_dir, csv = isic_tree
    ds = SingleClassDataset(img_dir, csv, class_id=0, image_size=32,
                            max_samples=6)
    full = list(ds.batches(4, np.random.default_rng(5)))
    lo_half = list(ds.batches(4, np.random.default_rng(5), local_range=(0, 2)))
    hi_half = list(ds.batches(4, np.random.default_rng(5), local_range=(2, 4)))
    assert len(full) == len(lo_half) == len(hi_half)
    for fb, lb, hb in zip(full, lo_half, hi_half):
        np.testing.assert_array_equal(lb, fb[0:2])
        np.testing.assert_array_equal(hb, fb[2:4])


def test_single_class_batches_deterministic_per_rng_seed(isic_tree):
    img_dir, csv = isic_tree
    ds = SingleClassDataset(img_dir, csv, class_id=0, image_size=32,
                            max_samples=6)
    a = list(ds.batches(3, np.random.default_rng(9)))
    b = list(ds.batches(3, np.random.default_rng(9)))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
