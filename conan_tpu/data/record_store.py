"""Binary record store, format-compatible with the reference's IndexedDataset
(`/root/reference/utils/commons/indexed_datasets.py:7-55`): ``<path>.data`` is
a concatenation of pickled items; ``<path>.idx`` is an np-saved dict with the
byte ``offsets`` array. Reference-binarized datasets are readable as-is.

Reading hot path: when the native accelerator (conan_tpu.data._native, C++)
is built, bulk reads go through it (pread-based, no Python-file locking);
otherwise a pure-Python reader with an LRU cache is used.
"""

from __future__ import annotations

import os
import pickle
from collections import OrderedDict

import numpy as np


class RecordReader:
    def __init__(self, path: str, num_cache: int = 16, use_native: bool = True):
        self.path = path
        idx = np.load(f"{path}.idx", allow_pickle=True).item()
        self.offsets = np.asarray(idx["offsets"], np.int64)
        self._native = None
        if use_native:
            try:
                from conan_tpu.data._native import NativeReader

                self._native = NativeReader(path)
            except Exception:
                self._native = None
        self._fd = os.open(f"{path}.data", os.O_RDONLY)
        self._cache: OrderedDict[int, object] = OrderedDict()
        self.num_cache = num_cache

    def __len__(self) -> int:
        return len(self.offsets) - 1

    def __getitem__(self, i: int):
        if i < 0 or i >= len(self):
            raise IndexError(i)
        if i in self._cache:
            self._cache.move_to_end(i)
            return self._cache[i]
        if self._native is not None:
            item = pickle.loads(self._native.read_raw(i))
        else:
            n = int(self.offsets[i + 1] - self.offsets[i])
            buf = os.pread(self._fd, n, int(self.offsets[i]))
            item = pickle.loads(buf)
        if self.num_cache > 0:
            self._cache[i] = item
            while len(self._cache) > self.num_cache:
                self._cache.popitem(last=False)
        return item

    def read_raw(self, i: int) -> bytes:
        n = int(self.offsets[i + 1] - self.offsets[i])
        return os.pread(self._fd, n, int(self.offsets[i]))

    def close(self):
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class RecordWriter:
    """Sequential writer (reference IndexedDatasetBuilder)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(f"{path}.data", "wb")
        self.offsets = [0]

    def add_item(self, item) -> None:
        n = self._f.write(pickle.dumps(item))
        self.offsets.append(self.offsets[-1] + n)

    def finalize(self) -> None:
        self._f.close()
        np.save(open(f"{self.path}.idx", "wb"), {"offsets": self.offsets})
