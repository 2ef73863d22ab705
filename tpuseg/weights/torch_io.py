"""Pure-Python readers for torch ``.pth``/``.pkl`` checkpoints (no torch dep).

The reference zoo distributes pretrained weights as torch-serialized files:
  - Yolact.jittor: ``yolact_base_54_800000.pth`` etc. (README.md:205-221)
  - detectron.jittor: ``e2e_mask_rcnn_R_50_*.pth`` (README.md:266)
  - Pose2Seg.jittor: ``last.pkl`` (README.md:187) — torch.save with .pkl suffix
Jittor itself loads these with its own torch-free unpickler; we do the same so
the framework carries no torch dependency (torch-cpu is only used in tests as
a golden).

Two on-disk formats:
  * zip (torch >= 1.6): a zipfile with ``<root>/data.pkl`` and raw storage
    blobs under ``<root>/data/<key>``.
  * legacy (torch < 1.6): magic + protocol + sys_info pickles, the main
    pickle, a pickled key list, then ``int64 numel + raw bytes`` per storage.

Tensors are returned as numpy arrays (bf16 via ml_dtypes). All torch classes
encountered in the pickle stream are replaced by inert stubs — nothing is
executed from the checkpoint.
"""
from __future__ import annotations

import io
import pickle
import struct
import zipfile

import numpy as np

try:  # ships with jax
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
    _FP8E4M3 = np.dtype(ml_dtypes.float8_e4m3fn)
    _FP8E5M2 = np.dtype(ml_dtypes.float8_e5m2)
except ImportError:  # pragma: no cover
    _BF16 = _FP8E4M3 = _FP8E5M2 = None

_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
    "BFloat16Storage": _BF16,
    "ComplexFloatStorage": np.dtype("<c8"),
    "ComplexDoubleStorage": np.dtype("<c16"),
}


class _StorageType:
    """Stub for torch.FloatStorage & friends appearing as pickle globals."""

    def __init__(self, name):
        self.name = name
        self.dtype = _STORAGE_DTYPES.get(name)

    def __repr__(self):
        return f"_StorageType({self.name})"


class _TorchDtypeStub:
    def __init__(self, name):
        self.name = name  # e.g. "bfloat16"


_DTYPE_STUBS = {
    # torch.save of TypedStorage puts torch.<dtype> objects in the stream
    name: _TorchDtypeStub(name)
    for name in (
        "float32", "float64", "float16", "bfloat16", "int64", "int32",
        "int16", "int8", "uint8", "bool", "complex64", "complex128",
        "float8_e4m3fn", "float8_e5m2", "uint16", "uint32", "uint64",
    )
}

_NP_FROM_TORCH_DTYPE = {
    "float32": np.dtype("<f4"), "float64": np.dtype("<f8"),
    "float16": np.dtype("<f2"), "bfloat16": _BF16,
    "int64": np.dtype("<i8"), "int32": np.dtype("<i4"),
    "int16": np.dtype("<i2"), "int8": np.dtype("<i1"),
    "uint8": np.dtype("<u1"), "bool": np.dtype("?"),
    "complex64": np.dtype("<c8"), "complex128": np.dtype("<c16"),
    "float8_e4m3fn": _FP8E4M3, "float8_e5m2": _FP8E5M2,
    "uint16": np.dtype("<u2"), "uint32": np.dtype("<u4"),
    "uint64": np.dtype("<u8"),
}


class _AttrDict(dict):
    """dict stand-in for OrderedDict (state dicts pickle a ``_metadata`` attr)."""


class _Storage:
    """A loaded flat byte buffer + element dtype."""

    def __init__(self, data: bytes, dtype: np.dtype):
        self.data = data
        self.dtype = dtype


def _rebuild_tensor(storage: _Storage, offset, size, stride):
    dtype = storage.dtype
    if dtype is None:
        raise ValueError("unsupported storage dtype in checkpoint")
    flat = np.frombuffer(storage.data, dtype=dtype)
    if not size:  # 0-d tensor: keep it an ndarray so tree flattening sees it
        return flat[offset : offset + 1].reshape(()).copy()
    arr = np.lib.stride_tricks.as_strided(
        flat[offset:],
        shape=tuple(size),
        strides=tuple(s * dtype.itemsize for s in stride),
    )
    return np.ascontiguousarray(arr)


def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad=None,
                       backward_hooks=None, metadata=None):
    return _rebuild_tensor(storage, offset, size, stride)


def _rebuild_tensor_v3(storage, offset, size, stride, requires_grad,
                       backward_hooks, dtype_stub, **kwargs):
    # torch >= 2.x with UntypedStorage: dtype travels with the rebuild call
    np_dtype = _NP_FROM_TORCH_DTYPE[dtype_stub.name]
    st = _Storage(storage.data, np_dtype)
    return _rebuild_tensor(st, offset, size, stride)


def _rebuild_parameter(data, requires_grad=None, backward_hooks=None):
    return data


def _rebuild_from_type_v2(func, new_type, args, state):
    return func(*args)


# Checkpoints are untrusted input (zoo downloads). The default pickle
# resolver can reach builtins.eval/exec via REDUCE, so only these exact
# globals are ever resolved for real; everything else becomes an inert stub.
_SAFE_BUILTINS = frozenset({
    "set", "frozenset", "complex", "bytearray", "slice", "range",
    "list", "dict", "tuple", "bytes", "str", "int", "float", "bool",
})
_SAFE_NUMPY_MODULES = frozenset({
    "numpy", "numpy.core.multiarray", "numpy._core.multiarray",
    "numpy.core.numeric", "numpy._core.numeric",
})
_SAFE_NUMPY_NAMES = frozenset({
    "_reconstruct", "ndarray", "dtype", "scalar", "_frombuffer",
    "bool_", "float32", "float64", "int32", "int64",
})


def _inert_stub(name: str):
    """A do-nothing class for any unrecognized pickle global.

    Accepts arbitrary constructor args / setstate / calls so REDUCE opcodes
    on it succeed structurally without executing anything.
    """
    return type(name, (), {
        "__init__": lambda self, *a, **k: None,
        "__setstate__": lambda self, state: None,
        "__call__": lambda self, *a, **k: None,
    })


class _MetaUnpickler(pickle.Unpickler):
    """For the legacy-format header pickles (magic/protocol/sys_info/keys):
    pure data only — resolving ANY global is refused."""

    def find_class(self, module, name):
        raise pickle.UnpicklingError(
            f"global {module}.{name} not allowed in torch legacy header")


def _meta_load(f):
    return _MetaUnpickler(f, encoding="latin1").load()


class _Unpickler(pickle.Unpickler):
    """Unpickler that stubs torch globals and resolves storages lazily."""

    def __init__(self, f, load_storage):
        super().__init__(f, encoding="latin1")
        self._load_storage = load_storage

    def find_class(self, module, name):
        if module.startswith("torch"):
            if name in _STORAGE_DTYPES or name.endswith("Storage"):
                return _StorageType(name)
            table = {
                "_rebuild_tensor_v2": _rebuild_tensor_v2,
                "_rebuild_tensor_v3": _rebuild_tensor_v3,
                "_rebuild_tensor": lambda st, off, sz, sd: _rebuild_tensor(
                    st, off, sz, sd
                ),
                "_rebuild_parameter": _rebuild_parameter,
                "_rebuild_from_type_v2": _rebuild_from_type_v2,
            }
            if name in table:
                return table[name]
            if name in _DTYPE_STUBS:
                return _DTYPE_STUBS[name]
            if module == "torch" and name == "Size":
                return tuple
            if name in ("Tensor", "Parameter", "device"):
                return lambda *a, **k: None
            # any other torch global: inert placeholder type
            return _inert_stub(name)
        if module == "collections" and name == "OrderedDict":
            return _AttrDict  # plain dict that tolerates ._metadata etc.
        if module in _SAFE_NUMPY_MODULES and name in _SAFE_NUMPY_NAMES:
            return super().find_class(module, name)
        if module == "builtins" and name in _SAFE_BUILTINS:
            return super().find_class(module, name)
        if module == "argparse" or name == "Namespace":
            return _inert_stub("Namespace")
        # unknown module: inert stub (never execute checkpoint code)
        return _inert_stub(name)

    def persistent_load(self, pid):
        assert isinstance(pid, tuple) and pid[0] == "storage", pid
        storage_type, key = pid[1], pid[2]
        numel = pid[4] if len(pid) > 4 else None
        if isinstance(storage_type, _StorageType):
            dtype = storage_type.dtype
        elif isinstance(storage_type, _TorchDtypeStub):
            dtype = _NP_FROM_TORCH_DTYPE[storage_type.name]
        else:
            dtype = None  # UntypedStorage: dtype arrives at rebuild time
        data = self._load_storage(str(key), numel, dtype)
        return _Storage(data, dtype)


def _load_zip(path: str):
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
    root = pkl_name[: -len("data.pkl")]
    cache: dict[str, bytes] = {}

    def load_storage(key, numel, dtype):
        if key not in cache:
            cache[key] = zf.read(f"{root}data/{key}")
        return cache[key]

    up = _Unpickler(io.BytesIO(zf.read(pkl_name)), load_storage)
    return up.load()


class _LegacyUnpickler(_Unpickler):
    """Legacy torch format: storage payloads live AFTER the main pickle.

    persistent_load returns mutable _Storage placeholders; tensor rebuilds are
    deferred as _LazyTensor and materialized once the payloads are read.
    """

    def __init__(self, f, storages):
        super().__init__(f, lambda *a: b"")
        self._storages = storages

    def persistent_load(self, pid):
        assert isinstance(pid, tuple) and pid[0] == "storage", pid
        storage_type, key = pid[1], str(pid[2])
        dtype = (
            storage_type.dtype if isinstance(storage_type, _StorageType) else None
        )
        if key not in self._storages:
            self._storages[key] = _Storage(b"", dtype)
        return self._storages[key]

    def find_class(self, module, name):
        if module.startswith("torch") and name in (
            "_rebuild_tensor_v2",
            "_rebuild_tensor",
        ):
            return lambda st, off, sz, sd, *rest: _LazyTensor(st, off, sz, sd)
        return super().find_class(module, name)


def _load_legacy(f) -> object:
    magic = _meta_load(f)
    if magic != _LEGACY_MAGIC:
        raise ValueError("not a legacy torch file")
    _meta_load(f)  # protocol version
    _meta_load(f)  # sys info
    storages: dict[str, _Storage] = {}
    up = _LegacyUnpickler(f, storages)
    result = up.load()
    keys = _meta_load(f)
    for key in keys:
        (numel,) = struct.unpack("<q", f.read(8))
        st = storages[str(key)]
        nbytes = numel * (st.dtype.itemsize if st.dtype else 1)
        st.data = f.read(nbytes)
    return _materialize(result)


class _LazyTensor:
    def __init__(self, storage, offset, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = size
        self.stride = stride

    def materialize(self):
        return _rebuild_tensor(self.storage, self.offset, self.size, self.stride)


def _materialize(obj):
    if isinstance(obj, _LazyTensor):
        return obj.materialize()
    if isinstance(obj, dict):
        return {k: _materialize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = type(obj)
        return t(_materialize(v) for v in obj)
    return obj


def load_torch_file(path: str):
    """Load a torch-serialized file -> nested python structure of np arrays."""
    if zipfile.is_zipfile(path):
        return _load_zip(path)
    with open(path, "rb") as f:
        try:
            return _load_legacy(f)
        except (ValueError, pickle.UnpicklingError, EOFError, KeyError, struct.error):
            f.seek(0)
            # plain pickle (e.g. numpy dicts, jittor-style .pkl)
            return _Unpickler(f, lambda *a: b"").load()


def save_torch_file(path: str, state: dict) -> None:
    """Write ``{name: ndarray}`` as a torch-zip checkpoint (torch.load-able).

    Completes the interchange loop: checkpoints trained here load back in
    the reference's torch/Jittor ecosystem. Emits the modern zip format:
    ``archive/data.pkl`` whose tensors are persistent-id references to raw
    little-endian storages under ``archive/data/<n>``. Uses the torch
    classes when torch is importable; otherwise registers inert stand-ins
    under the ``torch`` module names so the pickle stream carries the same
    globals.
    """
    import io as _io
    import zipfile

    np_to_storage = {
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
    if _BF16 is not None:
        np_to_storage[_BF16] = "BFloat16Storage"

    try:
        import torch as _torch

        storage_cls = {n: getattr(_torch, n)
                       for n in set(np_to_storage.values())}
        rebuild = _torch._utils._rebuild_tensor_v2
    except ImportError:  # torch-free: inert globals with the right names
        import sys
        import types

        tm = sys.modules.setdefault("torch", types.ModuleType("torch"))
        um = sys.modules.setdefault(
            "torch._utils", types.ModuleType("torch._utils"))
        tm._utils = um

        def _mk(name):
            cls = getattr(tm, name, None)
            if cls is None:
                cls = type(name, (), {})
                cls.__module__ = "torch"
                cls.__qualname__ = name
                setattr(tm, name, cls)
            return cls

        storage_cls = {n: _mk(n) for n in set(np_to_storage.values())}

        def rebuild(*a):  # placeholder global; never executed here
            raise RuntimeError("write-only stub")

        rebuild.__module__ = "torch._utils"
        rebuild.__qualname__ = rebuild.__name__ = "_rebuild_tensor_v2"
        um._rebuild_tensor_v2 = rebuild

    storages: list[bytes] = []

    class _TensorRef:
        def __init__(self, arr: np.ndarray):
            arr = np.ascontiguousarray(arr)
            self.dtype = arr.dtype
            self.shape = tuple(int(s) for s in arr.shape)
            strides = []
            acc = 1
            for s in reversed(self.shape):
                strides.append(acc)
                acc *= s
            self.strides = tuple(reversed(strides))
            self.key = str(len(storages))
            self.numel = int(arr.size)
            storages.append(arr.tobytes())

    class _Tensor:
        # split from _TensorRef: persistent_id is consulted before
        # __reduce__, so the reducible wrapper must be a different object
        # than the storage reference
        def __init__(self, ref):
            self.ref = ref

        def __reduce__(self):
            r = self.ref
            return (rebuild, (r, 0, r.shape, r.strides, False, {}))

    class _ZipPickler(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, _TensorRef):
                return ("storage", storage_cls[np_to_storage[obj.dtype]],
                        obj.key, "cpu", obj.numel)
            return None

    def convert(tree):
        if isinstance(tree, dict):
            return {k: convert(v) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(convert(v) for v in tree)
        if isinstance(tree, np.ndarray):
            return _Tensor(_TensorRef(tree))
        if hasattr(tree, "dtype") and hasattr(tree, "shape"):  # jax arrays
            return _Tensor(_TensorRef(np.asarray(tree)))
        return tree

    bio = _io.BytesIO()
    _ZipPickler(bio, protocol=2).dump(convert(state))
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", bio.getvalue())
        for i, blob in enumerate(storages):
            zf.writestr(f"archive/data/{i}", blob)
        zf.writestr("archive/version", "3\n")


def flatten_state_dict(obj, prefix="") -> dict[str, np.ndarray]:
    """Flatten a loaded checkpoint into {dotted_name: array}.

    Handles the common containers: raw state dicts, {'state_dict': ...},
    {'model': ...}, nested dicts.
    """
    for key in ("state_dict", "model", "weights", "params"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    out = {}

    def rec(o, pre):
        if isinstance(o, np.ndarray):
            out[pre.rstrip(".")] = o
        elif isinstance(o, dict):
            for k, v in o.items():
                rec(v, f"{pre}{k}.")
        # scalars/None/other metadata are dropped

    rec(obj, prefix)
    return out
