"""Torch-free reader for PyTorch zip checkpoints (.pt/.pth).

The reference loads model/camera state with ``torch.load``
(simple_raw_render.py:114-130; camera files saved by simple_benchmark.py:134).
Torch is not a dependency of this framework, so this module re-implements the
subset of torch's serialization needed to read those files with only the
stdlib + numpy:

- A torch-format zip holds ``archive/data.pkl`` (a pickle whose tensors are
  ``torch._utils._rebuild_tensor_v2`` calls over *persistent-id* storages)
  plus one raw little-endian buffer per storage under ``archive/data/<key>``.
- ``persistent_load`` receives ``('storage', StorageType, key, location,
  numel)``; we map the storage type to a numpy dtype and slurp the buffer.
- ``_rebuild_tensor_v2(storage, offset, size, stride, ...)`` becomes a numpy
  ``as_strided`` view (copied, so the result owns its memory).

Only a whitelist of globals is honored — anything else in the pickle raises,
so arbitrary-code-execution pickles are rejected rather than executed.

bfloat16 storages are widened to float32 (numpy has no bf16) by bit-shifting
the raw uint16 payload into the high half of a uint32.
"""

from __future__ import annotations

import io
import pickle
import struct
import typing as T
import zipfile

import numpy as np

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
    "BFloat16Storage": np.dtype("<u2"),  # widened to f32 at rebuild
}


class _StorageType:
    def __init__(self, name: str):
        self.name = name


class _Storage:
    def __init__(self, data: np.ndarray, is_bf16: bool):
        self.data = data
        self.is_bf16 = is_bf16


def _rebuild_tensor_v2(
    storage: _Storage, storage_offset, size, stride, requires_grad=False,
    backward_hooks=None, metadata=None,
):
    data = storage.data
    if storage.is_bf16:
        data = (
            data.astype(np.uint32) << 16
        ).view(np.float32)
    itemsize = data.dtype.itemsize
    if not size:
        return data[storage_offset].copy()
    arr = np.lib.stride_tricks.as_strided(
        data[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )
    return arr.copy()


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


_SAFE_GLOBALS: T.Dict[T.Tuple[str, str], T.Any] = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("collections", "OrderedDict"): dict,
    ("torch.serialization", "_get_layout"): lambda name: None,
    ("torch", "Size"): tuple,
}
# plain numpy payloads inside state dicts
_np_core = getattr(np, "_core", None) or np.core
_SAFE_GLOBALS.update({
    ("numpy.core.multiarray", "_reconstruct"):
        _np_core.multiarray._reconstruct,
    ("numpy._core.multiarray", "_reconstruct"):
        _np_core.multiarray._reconstruct,
    ("numpy.core.multiarray", "scalar"): _np_core.multiarray.scalar,
    ("numpy._core.multiarray", "scalar"): _np_core.multiarray.scalar,
    ("numpy", "ndarray"): np.ndarray,
    ("numpy", "dtype"): np.dtype,
})
for _name in _STORAGE_DTYPES:
    _SAFE_GLOBALS[("torch", _name)] = _StorageType(_name)


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, f, load_storage):
        super().__init__(f, encoding="latin1")
        self._load_storage = load_storage

    def find_class(self, module, name):
        try:
            return _SAFE_GLOBALS[(module, name)]
        except KeyError:
            raise pickle.UnpicklingError(
                f"torch_zip: global {module}.{name} is not in the whitelist "
                f"(refusing to unpickle arbitrary objects)"
            )

    def persistent_load(self, pid):
        kind = pid[0]
        if kind != "storage":
            raise pickle.UnpicklingError(
                f"torch_zip: unknown persistent id kind {kind!r}"
            )
        storage_type, key, _location, _numel = pid[1], pid[2], pid[3], pid[4]
        if not isinstance(storage_type, _StorageType):
            raise pickle.UnpicklingError(
                f"torch_zip: unexpected storage type {storage_type!r}"
            )
        return self._load_storage(key, storage_type.name)


def load_torch_zip(path: str):
    """Read a PyTorch zip checkpoint into numpy arrays / python scalars.

    Returns whatever object the pickle root is — for reference checkpoints a
    (possibly nested) dict of np.ndarray.
    """
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    pkl_name = next(n for n in names if n.endswith("/data.pkl"))
    prefix = pkl_name[: -len("data.pkl")]

    def load_storage(key: str, type_name: str) -> _Storage:
        dtype = _STORAGE_DTYPES[type_name]
        raw = zf.read(f"{prefix}data/{key}")
        return _Storage(
            np.frombuffer(raw, dtype=dtype), type_name == "BFloat16Storage"
        )

    with zf.open(pkl_name) as f:
        return _TorchUnpickler(io.BytesIO(f.read()), load_storage).load()


def is_torch_zip(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            magic = f.read(4)
        if magic[:2] != b"PK":
            return False
        zf = zipfile.ZipFile(path)
        return any(n.endswith("/data.pkl") for n in zf.namelist())
    except Exception:
        return False


def save_torch_zip(path: str, obj: dict):
    """Write a dict of numpy arrays / scalars as a torch-loadable zip.

    Used by the dataset/camera exporters so their outputs round-trip into
    the reference's ``torch.load`` (and for converter tests without torch).
    """
    flat: T.Dict[str, np.ndarray] = {}

    def _encode(o, memo_key=[0]):
        if isinstance(o, dict):
            return {k: _encode(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return type(o)(_encode(v) for v in o)
        if isinstance(o, np.ndarray):
            key = str(memo_key[0])
            memo_key[0] += 1
            flat[key] = np.ascontiguousarray(o)
            return _TensorStub(key, flat[key])
        return o

    class _TensorStub:
        def __init__(self, key, arr):
            self.key = key
            self.arr = arr

        def __reduce_ex__(self, protocol):
            a = self.arr
            type_name = {
                "float32": "FloatStorage",
                "float64": "DoubleStorage",
                "float16": "HalfStorage",
                "int64": "LongStorage",
                "int32": "IntStorage",
                "int16": "ShortStorage",
                "int8": "CharStorage",
                "uint8": "ByteStorage",
                "bool": "BoolStorage",
            }[str(a.dtype)]
            pid = _Pid(
                ("storage", _Global("torch", type_name), self.key, "cpu",
                 int(a.size))
            )
            strides = tuple(s // a.itemsize for s in a.strides)
            return (
                _Global("torch._utils", "_rebuild_tensor_v2"),
                (pid, 0, tuple(a.shape), strides, False,
                 _Global("collections", "OrderedDict")()),
            )

    class _Global:
        """Pickles as a STACK_GLOBAL reference to module.name."""

        def __init__(self, module, name):
            self.module = module
            self.name = name

        def __call__(self):
            return {}

        def __reduce__(self):  # pragma: no cover - not used directly
            raise NotImplementedError

    class _Pid:
        def __init__(self, pid):
            self.pid = pid

    # The pure-python pickler lets us emit GLOBAL opcodes for torch names
    # that aren't importable here, and BINPERSID for storages.
    class _GlobalPickler(pickle._Pickler):
        def save(self, obj, save_persistent_id=True):  # noqa: N802
            if isinstance(obj, _Global):
                self.write(
                    b"c" + obj.module.encode() + b"\n" + obj.name.encode()
                    + b"\n"
                )
                return
            if isinstance(obj, _Pid):
                super().save(obj.pid, save_persistent_id=False)
                self.write(pickle.BINPERSID)
                return
            super().save(obj, save_persistent_id=save_persistent_id)

    encoded = _encode(obj)
    buf = io.BytesIO()
    _GlobalPickler(buf, protocol=2).dump(encoded)

    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        for key, arr in flat.items():
            zf.writestr(f"archive/data/{key}", arr.tobytes())
        zf.writestr("archive/version", "3\n")
