"""Pure-Python torch-pickle ``.pt`` codec (no torch dependency).

The reference framework's one bespoke artifact format is the repellency
cache (reference repellency/repellency_methods_threshold.py:88-106,157-159):

  * ``repellency_proj_ref.pt``            — a single fp32 tensor [M, C, H, W]
  * ``repellency_noisy_proj_ref_for_beta.pt`` — dict {timestep:int -> tensor}

written with ``torch.save`` (zipfile format). This module reads and writes
that format bit-compatibly using only ``zipfile`` + ``pickle`` + ``numpy``,
so the TPU framework can exchange caches with the PyTorch reference without
importing torch.

Supported object graph: nested dict / list / tuple / set / scalars / strings /
numpy-representable tensors. Tensors are returned as ``numpy.ndarray``.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any

import ml_dtypes
import numpy as np

# torch storage class name -> numpy dtype. BF16 uses the ml_dtypes
# extension dtype (jax's own) — the old raw-uint16 mapping made a real
# bf16-saved checkpoint (e.g. a finetuned ESD/RECE UNet) load as silent
# garbage instead of numbers.
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("float32"),
    "DoubleStorage": np.dtype("float64"),
    "HalfStorage": np.dtype("float16"),
    "BFloat16Storage": np.dtype(ml_dtypes.bfloat16),
    "LongStorage": np.dtype("int64"),
    "IntStorage": np.dtype("int32"),
    "ShortStorage": np.dtype("int16"),
    "CharStorage": np.dtype("int8"),
    "ByteStorage": np.dtype("uint8"),
    "BoolStorage": np.dtype("bool"),
}
_DTYPE_STORAGE = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("float16"): "HalfStorage",
    np.dtype(ml_dtypes.bfloat16): "BFloat16Storage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
    np.dtype("int16"): "ShortStorage",
    np.dtype("int8"): "CharStorage",
    np.dtype("uint8"): "ByteStorage",
    np.dtype("bool"): "BoolStorage",
}


class _StorageRef:
    """Placeholder for a torch storage persistent id."""

    def __init__(self, dtype: np.dtype, key: str, numel: int):
        self.dtype = dtype
        self.key = key
        self.numel = numel


class _TorchClass:
    """Stand-in for an arbitrary ``torch.*`` global we don't model."""

    def __init__(self, module: str, name: str):
        self.module = module
        self.name = name

    def __call__(self, *args, **kwargs):  # e.g. OrderedDict-like reduce
        return _TorchObject(self, args)


class _TorchObject:
    def __init__(self, cls: _TorchClass, args):
        self.cls = cls
        self.args = args


def _rebuild_tensor_v2(storage: _StorageRef, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None, metadata=None):
    # Deferred: the unpickler resolves storage bytes afterwards.
    return ("__tensor_v2__", storage, storage_offset, tuple(size), tuple(stride))


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, loaded_storages):
        super().__init__(file)
        self._storages = loaded_storages

    def find_class(self, module: str, name: str):
        if module == "torch._utils" and name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor_v2
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module.startswith("torch"):
            return _TorchClass(module, name)
        return super().find_class(module, name)

    def persistent_load(self, pid):
        typename, storage_cls, key, _location, numel = pid
        assert typename == "storage", f"unexpected persistent id {pid!r}"
        if isinstance(storage_cls, _TorchClass):
            dtype = _STORAGE_DTYPES[storage_cls.name]
        else:
            dtype = _STORAGE_DTYPES[storage_cls]
        return _StorageRef(dtype, key, int(numel))


def _materialize(obj: Any, read_record) -> Any:
    """Recursively replace tensor placeholders with numpy arrays."""
    if isinstance(obj, tuple) and len(obj) == 5 and obj[0] == "__tensor_v2__":
        _, ref, offset, size, stride = obj
        raw = read_record(ref.key)
        flat = np.frombuffer(raw, dtype=ref.dtype)
        if size == ():
            return flat[offset].copy()
        return np.lib.stride_tricks.as_strided(
            flat[offset:],
            shape=size,
            strides=tuple(s * ref.dtype.itemsize for s in stride),
        ).copy()
    if isinstance(obj, (dict, OrderedDict)):
        return type(obj)((k, _materialize(v, read_record)) for k, v in obj.items())
    if isinstance(obj, list):
        return [_materialize(v, read_record) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_materialize(v, read_record) for v in obj)
    if isinstance(obj, (set, frozenset)):
        items = [_materialize(v, read_record) for v in obj]
        try:
            return type(obj)(items)
        except TypeError:
            # materialized numpy arrays are unhashable (torch tensors hash by
            # identity) — degrade to a list rather than lose the data
            return items
    return obj


def load_pt(path: str) -> Any:
    """Load a ``torch.save``-format file; tensors come back as numpy arrays."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
        root = pkl_name[: -len("data.pkl")]

        def read_record(key: str) -> bytes:
            return zf.read(f"{root}data/{key}")

        up = _Unpickler(io.BytesIO(zf.read(pkl_name)), read_record)
        obj = up.load()
        return _materialize(obj, read_record)


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


class _TensorStandin:
    """Marks a numpy array to be pickled exactly like a torch.Tensor."""

    def __init__(self, arr: np.ndarray, key: str):
        self.arr = arr
        self.key = key

    def __reduce_ex__(self, protocol):
        arr = self.arr
        storage_ref = _WriterStorageRef(arr, self.key)
        # Contiguous row-major strides in *elements*, matching torch CPU tensors.
        strides = []
        acc = 1
        for dim in reversed(arr.shape):
            strides.append(acc)
            acc *= dim
        strides = tuple(reversed(strides))
        return (
            _FakeGlobal("torch._utils", "_rebuild_tensor_v2"),
            (storage_ref, 0, tuple(arr.shape), strides, False,
             _FakeGlobal("collections", "OrderedDict")()),
        )


class _WriterStorageRef:
    def __init__(self, arr: np.ndarray, key: str):
        self.arr = arr
        self.key = key


class _FakeGlobal:
    """Pickles as GLOBAL module.name (so torch.load resolves real classes)."""

    def __init__(self, module: str, name: str):
        self.module = module
        self.name = name

    def __call__(self):
        return OrderedDict()


class _Pickler(pickle._Pickler):
    """Pure-Python pickler that writes our torch global markers as GLOBAL
    opcodes without importing torch for identity verification."""

    def save(self, obj, save_persistent_id=True):
        if isinstance(obj, _FakeGlobal):
            self.write(pickle.GLOBAL + f"{obj.module}\n{obj.name}\n".encode("ascii"))
            self.memoize(obj)
            return
        super().save(obj, save_persistent_id)

    def persistent_id(self, obj):
        if isinstance(obj, _WriterStorageRef):
            storage_name = _DTYPE_STORAGE[obj.arr.dtype]
            return (
                "storage",
                _FakeGlobal("torch", storage_name),
                obj.key,
                "cpu",
                int(obj.arr.size),
            )
        return None


def _wrap_tensors(obj: Any, storages: list) -> Any:
    if isinstance(obj, np.generic):
        # a raw numpy scalar would pickle as a numpy._core.multiarray.scalar
        # GLOBAL, which torch.load's weights_only=True default (torch>=2.6)
        # refuses; the reference caches hold such values (e.g. beta) as
        # plain Python scalars, so store the native equivalent
        return obj.item()
    if isinstance(obj, np.ndarray):
        key = str(len(storages))
        arr = np.ascontiguousarray(obj)
        storages.append((key, arr))
        return _TensorStandin(arr, key)
    if isinstance(obj, (dict, OrderedDict)):
        return type(obj)((k, _wrap_tensors(v, storages)) for k, v in obj.items())
    if isinstance(obj, list):
        return [_wrap_tensors(v, storages) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_wrap_tensors(v, storages) for v in obj)
    if isinstance(obj, (set, frozenset)):
        # numpy arrays are unhashable, so sets can only contain scalars or
        # already-wrapped placeholders — recurse for nested tuples
        return type(obj)(_wrap_tensors(v, storages) for v in obj)
    return obj


def save_pt(obj: Any, path: str) -> None:
    """Write ``obj`` (numpy arrays + containers) as a torch.load-compatible .pt."""
    import os

    root = os.path.splitext(os.path.basename(path))[0] or "archive"
    storages: list = []
    wrapped = _wrap_tensors(obj, storages)

    buf = io.BytesIO()
    _Pickler(buf, protocol=2).dump(wrapped)

    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{root}/data.pkl", buf.getvalue())
        zf.writestr(f"{root}/byteorder", "little")
        for key, arr in storages:
            zf.writestr(f"{root}/data/{key}", arr.tobytes())
        zf.writestr(f"{root}/version", "3\n")
