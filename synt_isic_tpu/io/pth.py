"""Torch-free `.pth` checkpoint reader/writer.

The reference persists every model as a raw `state_dict` saved with
`torch.save` — `unet_<CLASS>_best.pth`, `classifier.pth` (reference
`core/generator/model_manager.py:103-143`, `diffusion/train_diffusion.py:251-258`,
`xai/XAI.py:202-213`). The rebuild keeps that format readable and writable so
existing checkpoints load and our training outputs remain consumable by the
reference app.

Implementation: torch's zip serialization is a zipfile containing
`<name>/data.pkl` (a pickle whose tensors are rebuilt via
`torch._utils._rebuild_tensor_v2` over persistent-id storage records) plus
one raw little-endian buffer per storage under `<name>/data/<key>`. We parse
it with a restricted unpickler that resolves storages to numpy arrays —
no torch import needed on the TPU host. `torch.load` is used only as a
fallback for the legacy non-zip format when torch happens to be installed.
"""
from __future__ import annotations

import io
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "BFloat16Storage": np.dtype("<u2"),  # widened to f32 on read
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
}

_NP_TO_STORAGE = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("float16"): "HalfStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
    np.dtype("int16"): "ShortStorage",
    np.dtype("int8"): "CharStorage",
    np.dtype("uint8"): "ByteStorage",
    np.dtype("bool"): "BoolStorage",
}


class _TensorStub:
    """Minimal stand-in for torch.Tensor carrying its numpy payload."""

    def __init__(self, array: np.ndarray):
        self.array = array

    def __repr__(self):
        return f"_TensorStub{self.array.shape}"


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad,
                       backward_hooks, metadata=None):
    arr: np.ndarray = storage
    if len(size) == 0:
        return _TensorStub(arr[storage_offset:storage_offset + 1].reshape(()).copy())
    itemsize = arr.dtype.itemsize
    strides_bytes = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(arr[storage_offset:],
                                           shape=tuple(size),
                                           strides=strides_bytes)
    return _TensorStub(np.ascontiguousarray(view))


class _RestrictedUnpickler(pickle.Unpickler):
    """Only allows the symbols a plain state_dict pickle needs."""

    _ALLOWED = {
        ("collections", "OrderedDict"): OrderedDict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._utils", "_rebuild_tensor"): lambda storage, offset, size, stride:
            _rebuild_tensor_v2(storage, offset, size, stride, False, None),
        ("torch._tensor", "_rebuild_from_type_v2"):
            lambda func, new_type, args, state: func(*args),
        ("torch._utils", "_rebuild_parameter"):
            lambda data, requires_grad, hooks: data,
    }

    def __init__(self, file, storages: Dict[Any, np.ndarray]):
        super().__init__(file, encoding="utf-8")
        self._storages = storages

    def find_class(self, module: str, name: str):
        if (module, name) in self._ALLOWED:
            return self._ALLOWED[(module, name)]
        if module == "torch" and name.endswith("Storage"):
            return name  # class object is only a dtype tag inside persistent ids
        raise pickle.UnpicklingError(f"blocked unpickle symbol: {module}.{name}")

    def persistent_load(self, pid):
        if pid[0] != "storage":
            raise pickle.UnpicklingError(f"unsupported persistent id: {pid[0]}")
        storage_type, key = pid[1], str(pid[2])
        dtype_name = storage_type if isinstance(storage_type, str) else storage_type.__name__
        return self._storages[(dtype_name, key)]


class _ProbeUnpickler(pickle.Unpickler):
    """First pass: record which storages the pickle references."""

    def __init__(self, file):
        super().__init__(file, encoding="utf-8")
        self.refs = []

    def persistent_load(self, pid):
        storage_type = pid[1]
        dtype_name = (storage_type if isinstance(storage_type, str)
                      else storage_type.__name__)
        self.refs.append((dtype_name, str(pid[2])))
        return np.zeros(0, dtype=np.uint8)

    def find_class(self, module, name):
        if (module, name) == ("collections", "OrderedDict"):
            return OrderedDict
        if module == "torch" and name.endswith("Storage"):
            return name
        return lambda *a, **k: None  # permissive no-op: probing only


def _load_zip_pth(path: str) -> Dict[str, Any]:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        raw_pkl = zf.read(pkl_name)

        probe = _ProbeUnpickler(io.BytesIO(raw_pkl))
        try:
            probe.load()
        except Exception:
            pass

        storages: Dict[Any, np.ndarray] = {}
        for dtype_name, key in probe.refs:
            dtype = _STORAGE_DTYPES.get(dtype_name)
            if dtype is None:
                raise ValueError(f"unsupported storage dtype: {dtype_name}")
            data = zf.read(f"{prefix}data/{key}")
            arr = np.frombuffer(data, dtype=dtype).copy()
            if dtype_name == "BFloat16Storage":
                arr = (arr.astype(np.uint32) << 16).view(np.float32)
            storages[(dtype_name, key)] = arr

        obj = _RestrictedUnpickler(io.BytesIO(raw_pkl), storages).load()

    def _unwrap(x):
        if isinstance(x, _TensorStub):
            return x.array
        if isinstance(x, dict):
            return {k: _unwrap(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(_unwrap(v) for v in x)
        return x

    return _unwrap(obj)


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a torch `.pth` state_dict as {key: numpy array}."""
    if zipfile.is_zipfile(path):
        state = _load_zip_pth(path)
    else:
        try:
            import torch
        except ImportError as exc:
            raise ValueError(
                f"{path} is a legacy torch pickle; install torch to read it") from exc
        raw = torch.load(path, map_location="cpu", weights_only=True)
        state = {k: v.numpy() for k, v in raw.items()}
    if not isinstance(state, dict):
        raise ValueError(f"{path} did not contain a state_dict (got {type(state)})")
    return state


def unwrap_state_dict(state: Dict[str, Any]) -> Dict[str, Any]:
    """Tolerate full training checkpoints that wrap the weights in a
    `model_state_dict` container (the reference classifier loader does the
    same, `xai/XAI.py:508-513`). The ONE place this idiom lives — the
    production load path (`model_manager.load_model`) and the distill
    teacher loader both use it."""
    if ("model_state_dict" in state
            and isinstance(state["model_state_dict"], dict)):
        return state["model_state_dict"]
    return state


def save_pth(state: Dict[str, np.ndarray], path: str) -> None:
    """Write a numpy state_dict in torch's zip `.pth` format.

    Emits the pickle stream opcode-by-opcode (protocol 2 + BINPERSID storage
    records), producing files `torch.load(..., weights_only=True)` reads
    back verbatim — the reference checkpoint format stays writable without a
    torch dependency.
    """
    out = io.BytesIO()
    out.write(pickle.PROTO + bytes([2]))

    def put_global(module: str, name: str) -> None:
        out.write(pickle.GLOBAL + module.encode() + b"\n" + name.encode() + b"\n")

    def put_str(s: str) -> None:
        data = s.encode("utf-8")
        out.write(pickle.BINUNICODE + struct.pack("<I", len(data)) + data)

    def put_int(i: int) -> None:
        out.write(pickle.dumps(i, protocol=2)[2:-1])  # strip PROTO header + STOP

    # OrderedDict()
    put_global("collections", "OrderedDict")
    out.write(pickle.EMPTY_TUPLE + pickle.REDUCE)

    storage_files: Dict[str, bytes] = {}
    for idx, (name, arr) in enumerate(state.items()):
        arr = np.ascontiguousarray(np.asarray(arr))
        if arr.dtype not in _NP_TO_STORAGE:
            raise ValueError(f"unsupported dtype for {name}: {arr.dtype}")
        key = str(idx)
        storage_files[key] = arr.tobytes()

        put_str(name)
        put_global("torch._utils", "_rebuild_tensor_v2")
        out.write(pickle.MARK)           # args tuple of _rebuild_tensor_v2
        out.write(pickle.MARK)           # persistent id tuple
        put_str("storage")
        put_global("torch", _NP_TO_STORAGE[arr.dtype])
        put_str(key)
        put_str("cpu")
        put_int(int(arr.size))
        out.write(pickle.TUPLE)
        out.write(pickle.BINPERSID)
        put_int(0)                       # storage_offset
        out.write(pickle.MARK)           # shape
        for d in arr.shape:
            put_int(int(d))
        out.write(pickle.TUPLE)
        out.write(pickle.MARK)           # contiguous strides
        if arr.ndim:
            contiguous = np.cumprod((1,) + arr.shape[::-1][:-1])[::-1]
            for s in contiguous:
                put_int(int(s))
        out.write(pickle.TUPLE)
        out.write(pickle.NEWFALSE)       # requires_grad
        put_global("collections", "OrderedDict")
        out.write(pickle.EMPTY_TUPLE + pickle.REDUCE)  # backward_hooks
        out.write(pickle.TUPLE)          # close args
        out.write(pickle.REDUCE)
        out.write(pickle.SETITEM)

    out.write(pickle.STOP)

    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", out.getvalue())
        for key, data in storage_files.items():
            zf.writestr(f"archive/data/{key}", data)
        zf.writestr("archive/version", "3\n")
