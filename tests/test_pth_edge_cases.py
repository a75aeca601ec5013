"""Torch-free .pth reader edge cases: exotic dtypes, non-contiguous saves,
nested checkpoint dicts, and the security boundary of the restricted
unpickler."""
import io
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from synt_isic_tpu.io.pth import load_pth, save_pth


def test_dtypes_roundtrip(tmp_path):
    state = {
        "f32": torch.randn(3, 4),
        "f64": torch.randn(2, 2, dtype=torch.float64),
        "f16": torch.randn(4).half(),
        "i64": torch.arange(5),
        "i32": torch.arange(5, dtype=torch.int32),
        "u8": torch.arange(4, dtype=torch.uint8),
        "bool": torch.tensor([True, False, True]),
        "scalar": torch.tensor(3.5),
    }
    path = str(tmp_path / "w.pth")
    torch.save(state, path)
    ours = load_pth(path)
    for key, val in state.items():
        np.testing.assert_array_equal(ours[key], val.numpy())


def test_bfloat16_widened(tmp_path):
    state = {"w": torch.randn(4, 4).to(torch.bfloat16)}
    path = str(tmp_path / "bf16.pth")
    torch.save(state, path)
    ours = load_pth(path)
    np.testing.assert_allclose(ours["w"], state["w"].float().numpy(), rtol=1e-6)
    assert ours["w"].dtype == np.float32


def test_noncontiguous_tensor(tmp_path):
    base = torch.randn(6, 8)
    state = {"t": base.t()}  # transposed view — strided storage
    path = str(tmp_path / "nc.pth")
    torch.save(state, path)
    ours = load_pth(path)
    np.testing.assert_array_equal(ours["t"], state["t"].numpy())


def test_shared_storage_views(tmp_path):
    base = torch.randn(10)
    state = {"a": base[:5], "b": base[5:]}  # two views of one storage
    path = str(tmp_path / "sh.pth")
    torch.save(state, path)
    ours = load_pth(path)
    np.testing.assert_array_equal(ours["a"], state["a"].numpy())
    np.testing.assert_array_equal(ours["b"], state["b"].numpy())


def test_nested_checkpoint_dict(tmp_path):
    state = {"model_state_dict": {"w": torch.ones(2, 2)},
             "epoch": 7, "loss": 0.5}
    path = str(tmp_path / "nested.pth")
    torch.save(state, path)
    ours = load_pth(path)
    assert ours["epoch"] == 7
    np.testing.assert_array_equal(ours["model_state_dict"]["w"], np.ones((2, 2)))


def test_restricted_unpickler_blocks_arbitrary_globals(tmp_path):
    """A malicious pickle inside the zip must be rejected, not executed."""
    import zipfile

    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("echo pwned",))

    payload = pickle.dumps({"x": Evil()}, protocol=2)
    path = tmp_path / "evil.pth"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", payload)
        zf.writestr("archive/version", "3\n")
    with pytest.raises(Exception) as err:
        load_pth(str(path))
    assert "blocked" in str(err.value) or "Unpickling" in str(type(err.value).__name__) \
        or "unpickle" in str(err.value).lower()


def test_save_pth_large_keys_and_int64(tmp_path):
    state = {"x" * 300: np.arange(7, dtype=np.int64),
             "s": np.float32(2.5).reshape(())}
    path = str(tmp_path / "big.pth")
    save_pth(state, path)
    back = torch.load(path, map_location="cpu", weights_only=True)
    np.testing.assert_array_equal(back["x" * 300].numpy(), np.arange(7))
    assert float(back["s"]) == 2.5
