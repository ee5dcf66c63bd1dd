"""Packed record dataset: native mmap-backed sample storage.

Production data path (role of the reference's torch DataLoader worker pool +
its pickled DatasetFromList, detectron2/data/common.py:60-113): samples are
packed once into a binary shard (tools/pack_dataset.py) with images ALREADY
decoded, and served via the native mmap reader (native/record_io.cpp) — the
hot path does one memcpy + one pickle.loads per sample, no JPEG decode.
"""

from __future__ import annotations

import ctypes
import os
import pickle
import subprocess
from typing import Iterable, List

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "librecord_io.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.record_open.restype = ctypes.c_void_p
    lib.record_open.argtypes = [ctypes.c_char_p]
    lib.record_count.restype = ctypes.c_int64
    lib.record_count.argtypes = [ctypes.c_void_p]
    lib.record_length.restype = ctypes.c_int64
    lib.record_length.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.record_read.restype = ctypes.c_int64
    lib.record_read.argtypes = [ctypes.c_void_p, ctypes.c_int64, u8p]
    lib.record_write.restype = ctypes.c_int64
    lib.record_write.argtypes = [ctypes.c_char_p, u8p, i64p, ctypes.c_int64]
    lib.record_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def write_records(path: str, records: Iterable[dict]) -> int:
    """Pack picklable records into a shard. Returns the record count."""
    lib = _load_lib()
    payloads = [pickle.dumps(r, protocol=pickle.HIGHEST_PROTOCOL)
                for r in records]
    blob = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    lengths = np.asarray([len(p) for p in payloads], dtype=np.int64)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    out = lib.record_write(path.encode(), np.ascontiguousarray(blob),
                           lengths, len(payloads))
    assert out > 0, f"record_write failed for {path}"
    return len(payloads)


class RecordDataset:
    """Random-access list of packed records (dicts)."""

    def __init__(self, path: str):
        self._lib = _load_lib()
        self._handle = self._lib.record_open(path.encode())
        if not self._handle:
            raise FileNotFoundError(f"cannot open record file {path}")
        self._n = self._lib.record_count(self._handle)

    def __len__(self) -> int:
        return int(self._n)

    def __getitem__(self, i: int) -> dict:
        n = self._lib.record_length(self._handle, i)
        if n < 0:
            raise IndexError(i)
        buf = np.empty(n, dtype=np.uint8)
        got = self._lib.record_read(self._handle, i, buf)
        assert got == n
        return pickle.loads(buf.tobytes())

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def close(self):
        if self._handle:
            self._lib.record_close(self._handle)
            self._handle = None

    def __del__(self):  # noqa: D105
        try:
            self.close()
        except Exception:
            pass


def pack_dataset(records: List[dict], path: str,
                 decode_images: bool = True) -> int:
    """Pack dataset dicts, optionally embedding the decoded image pixels so
    the training hot path skips JPEG decode entirely."""
    from .mapper import read_image

    def gen():
        for r in records:
            out = dict(r)
            if decode_images and "file_name" in r and "image" not in r:
                out["image"] = read_image(r["file_name"], "BGR")
            yield out

    return write_records(path, gen())
