"""ctypes bindings + on-demand build of the native record reader.

Builds ``record_reader.cc`` with g++ on first use (cached next to the
source); falls back cleanly when no compiler is available. No pybind11 in
this image, so the C ABI + ctypes is the binding layer.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_SRC_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_SRC_DIR, "librecordreader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    src = os.path.join(_SRC_DIR, "record_reader.cc")
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
        return _SO_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             src, "-o", _SO_PATH],
            check=True, capture_output=True, timeout=120)
        return _SO_PATH
    except Exception as e:
        log.warning("native record reader build failed (%s); using python reader", e)
        return None


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.rs_open.restype = ctypes.c_void_p
        lib.rs_open.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                                ctypes.c_int64]
        lib.rs_len.restype = ctypes.c_int64
        lib.rs_len.argtypes = [ctypes.c_void_p]
        lib.rs_item.restype = ctypes.c_int
        lib.rs_item.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_void_p),
                                ctypes.POINTER(ctypes.c_int64)]
        lib.rs_gather.restype = ctypes.c_int64
        lib.rs_gather.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                                  ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
        lib.rs_prefault.restype = None
        lib.rs_prefault.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                                    ctypes.c_int64, ctypes.c_int]
        lib.rs_close.restype = None
        lib.rs_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeReader:
    """mmap zero-copy reader over the reference-format .data/.idx pair."""

    def __init__(self, path: str, n_threads: int = 4):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native reader unavailable")
        self._lib = lib
        idx = np.load(f"{path}.idx", allow_pickle=True).item()
        self.offsets = np.ascontiguousarray(np.asarray(idx["offsets"], np.int64))
        self._h = lib.rs_open(
            f"{path}.data".encode(),
            self.offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(self.offsets))
        if not self._h:
            raise OSError(f"rs_open failed for {path}.data")
        self.n_threads = n_threads

    def __len__(self) -> int:
        return int(self._lib.rs_len(self._h))

    def read_raw(self, i: int) -> memoryview:
        ptr = ctypes.c_void_p()
        ln = ctypes.c_int64()
        rc = self._lib.rs_item(self._h, i, ctypes.byref(ptr), ctypes.byref(ln))
        if rc != 0:
            raise IndexError(i)
        return memoryview((ctypes.c_char * ln.value).from_address(ptr.value)).cast("B")

    def __getitem__(self, i: int):
        import pickle

        return pickle.loads(self.read_raw(i))

    def gather(self, indices) -> list[bytes]:
        """Threaded multi-item fetch (one call, parallel page-ins + copies)."""
        idxs = np.ascontiguousarray(np.asarray(indices, np.int64))
        n = len(idxs)
        lens = np.zeros(n, np.int64)
        cap = int(sum(self.offsets[i + 1] - self.offsets[i] for i in idxs))
        buf = ctypes.create_string_buffer(cap)
        total = self._lib.rs_gather(
            self._h, idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            buf, cap, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.n_threads)
        if total < 0:
            raise RuntimeError(f"rs_gather failed ({total})")
        out, off = [], 0
        for ln in lens:
            out.append(buf.raw[off:off + int(ln)])
            off += int(ln)
        return out

    def prefault(self, indices) -> None:
        idxs = np.ascontiguousarray(np.asarray(indices, np.int64))
        self._lib.rs_prefault(
            self._h, idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idxs), self.n_threads)

    def close(self):
        if getattr(self, "_h", None):
            self._lib.rs_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
