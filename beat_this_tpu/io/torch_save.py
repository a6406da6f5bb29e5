"""Torch-free WRITER for PyTorch-format checkpoints.

Emits the torch>=1.6 zip serialization format (``<root>/data.pkl`` +
``<root>/data/<n>`` storage payloads + ``version``) with a hand-rolled
pickle-opcode emitter, so training checkpoints written by this framework can
be opened with ``torch.load(..., weights_only=True)`` — including by the
reference PyTorch stack (its loader: beat_this/inference.py:16-53) — without
torch ever being imported here.

Supported object graph: dict / list / tuple / str / bytes / int / float /
bool / None and numpy arrays (written as CPU tensors of matching dtype).
"""

from __future__ import annotations

import struct
import zipfile
from pathlib import Path

import numpy as np

_DTYPE_TO_STORAGE = {
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


class _PickleWriter:
    """Minimal protocol-2 pickler for the checkpoint object graph."""

    def __init__(self):
        self.out = bytearray()
        self.storages: list[np.ndarray] = []
        self.out += b"\x80\x02"  # PROTO 2

    # -- low-level emitters -------------------------------------------------
    def _global(self, module: str, name: str):
        self.out += b"c" + module.encode() + b"\n" + name.encode() + b"\n"

    def _unicode(self, s: str):
        data = s.encode("utf-8")
        self.out += b"X" + struct.pack("<I", len(data)) + data  # BINUNICODE

    def _bytes(self, b: bytes):
        self.out += b"C" + struct.pack("<B", len(b)) + b if len(b) < 256 else (
            b"B" + struct.pack("<I", len(b)) + b
        )

    def _int(self, i: int):
        if -(2**31) <= i < 2**31:
            self.out += b"J" + struct.pack("<i", i)  # BININT
        else:
            self.out += b"\x8a"  # LONG1
            data = i.to_bytes((i.bit_length() + 8) // 8, "little", signed=True)
            self.out += struct.pack("<B", len(data)) + data

    def _float(self, f: float):
        self.out += b"G" + struct.pack(">d", f)  # BINFLOAT

    # -- object graph -------------------------------------------------------
    def save(self, obj):
        if obj is None:
            self.out += b"N"
        elif obj is True:
            self.out += b"\x88"
        elif obj is False:
            self.out += b"\x89"
        elif isinstance(obj, (int, np.integer)):
            self._int(int(obj))
        elif isinstance(obj, (float, np.floating)):
            self._float(float(obj))
        elif isinstance(obj, str):
            self._unicode(obj)
        elif isinstance(obj, bytes):
            self._bytes(obj)
        elif isinstance(obj, np.ndarray) or isinstance(obj, np.generic):
            self._tensor(np.asarray(obj))
        elif isinstance(obj, dict):
            self.out += b"}"  # EMPTY_DICT
            if obj:
                self.out += b"("  # MARK
                for k, v in obj.items():
                    self.save(k)
                    self.save(v)
                self.out += b"u"  # SETITEMS
        elif isinstance(obj, (list,)):
            self.out += b"]"  # EMPTY_LIST
            if obj:
                self.out += b"("
                for v in obj:
                    self.save(v)
                self.out += b"e"  # APPENDS
        elif isinstance(obj, tuple):
            self.out += b"("
            for v in obj:
                self.save(v)
            self.out += b"t"  # TUPLE
        else:
            raise TypeError(f"cannot serialize {type(obj)!r}")

    def _tensor(self, arr: np.ndarray):
        arr = np.ascontiguousarray(arr)
        if arr.dtype not in _DTYPE_TO_STORAGE:
            raise TypeError(f"unsupported dtype {arr.dtype}")
        key = str(len(self.storages))
        self.storages.append(arr)
        # torch._utils._rebuild_tensor_v2(storage, offset, size, stride,
        #                                 requires_grad, backward_hooks)
        self._global("torch._utils", "_rebuild_tensor_v2")
        self.out += b"("  # MARK for the args tuple
        # persistent id: ('storage', <StorageClass>, key, 'cpu', numel)
        self.out += b"("
        self._unicode("storage")
        self._global("torch", _DTYPE_TO_STORAGE[arr.dtype])
        self._unicode(key)
        self._unicode("cpu")
        self._int(arr.size)
        self.out += b"t"
        self.out += b"Q"  # BINPERSID
        self._int(0)  # storage offset
        # size tuple
        self.out += b"("
        for s in arr.shape:
            self._int(s)
        self.out += b"t"
        # stride tuple (in elements, C-contiguous)
        self.out += b"("
        for s in arr.strides:
            self._int(s // arr.itemsize)
        self.out += b"t"
        self.out += b"\x89"  # requires_grad = False
        # empty backward_hooks: collections.OrderedDict()
        self._global("collections", "OrderedDict")
        self.out += b")"  # EMPTY_TUPLE
        self.out += b"R"  # REDUCE -> OrderedDict()
        self.out += b"t"  # close args tuple (MARK...TUPLE)
        self.out += b"R"  # REDUCE -> the tensor

    def finish(self) -> bytes:
        self.out += b"."  # STOP
        return bytes(self.out)


def save_torch_checkpoint(obj, path, archive_name: str = "archive") -> None:
    """Write `obj` (dicts/lists/scalars/numpy arrays) as a torch-format zip
    checkpoint loadable by torch.load and by
    beat_this_tpu.io.torch_ckpt.load_torch_checkpoint."""
    writer = _PickleWriter()
    writer.save(obj)
    payload = writer.finish()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{archive_name}/data.pkl", payload)
        zf.writestr(f"{archive_name}/byteorder", "little")
        for i, arr in enumerate(writer.storages):
            zf.writestr(f"{archive_name}/data/{i}", arr.tobytes())
        zf.writestr(f"{archive_name}/version", "3\n")
