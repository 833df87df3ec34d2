"""Torch-free .pth reader (SURVEY.md §5.4c / §7 "torch-free checkpoint
ingestion").

Reads the modern torch.save zip format: ``archive/data.pkl`` pickled object
graph + raw little-endian storages under ``archive/data/<key>``. Tensors are
materialized as numpy arrays via a custom Unpickler — no torch import.
Handles _rebuild_tensor_v2 with offset/size/stride (incl. non-contiguous).
"""

from __future__ import annotations

import pickle
import zipfile
from typing import Any

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled specially below
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StorageType:
    def __init__(self, name: str):
        self.name = name


def _bf16_to_f32(raw: bytes) -> np.ndarray:
    u16 = np.frombuffer(raw, dtype=np.uint16)
    u32 = u16.astype(np.uint32) << 16
    return u32.view(np.float32)


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *_args):
    arr, itemsize = storage
    if len(size) == 0:
        return arr[storage_offset].copy()
    strides = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=tuple(size), strides=strides
    )
    return view.copy()


def _noop_rebuild(*args):  # _rebuild_parameter wraps a tensor
    return args[0]


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, root: str):
        super().__init__(file)
        self._zf = zf
        self._root = root

    def find_class(self, module: str, name: str):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_parameter":
            return _noop_rebuild
        if name.endswith("Storage"):
            return _StorageType(name)
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        if module == "torch" and name == "Size":
            return tuple
        raise pickle.UnpicklingError(f"unsupported global {module}.{name}")

    def persistent_load(self, pid: Any):
        kind, storage_type, key, _location, _numel = pid
        assert kind == "storage"
        raw = self._zf.read(f"{self._root}/data/{key}")
        name = storage_type.name if isinstance(storage_type, _StorageType) else str(storage_type)
        if name == "BFloat16Storage":
            return _bf16_to_f32(raw), 4
        dtype = _DTYPES[name]
        arr = np.frombuffer(raw, dtype=dtype)
        return arr, np.dtype(dtype).itemsize


def load_pth(path: str) -> Any:
    """Load a torch.save zip archive into plain python/numpy objects."""
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(f"{path} is not a torch zip checkpoint")
        root = pkl_names[0].rsplit("/", 1)[0]
        with zf.open(pkl_names[0]) as f:
            return _TorchUnpickler(f, zf, root).load()
