"""Native C++ record reader: build, correctness vs python reader, gather."""

import pickle

import numpy as np
import pytest

from conan_tpu.data.record_store import RecordReader, RecordWriter


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    rng = np.random.default_rng(0)
    path = str(tmp_path_factory.mktemp("native") / "ds")
    items = [{"mel": rng.standard_normal((30 + i, 8)).astype(np.float32), "i": i}
             for i in range(25)]
    w = RecordWriter(path)
    for it in items:
        w.add_item(it)
    w.finalize()
    return path, items


def test_native_builds_and_reads(store):
    path, items = store
    from conan_tpu.data._native import NativeReader, get_lib

    if get_lib() is None:
        pytest.skip("no compiler available")
    r = NativeReader(path)
    assert len(r) == 25
    for i in [0, 7, 24]:
        got = r[i]
        np.testing.assert_array_equal(got["mel"], items[i]["mel"])
    # zero-copy raw view round-trips through pickle
    assert pickle.loads(bytes(r.read_raw(3)))["i"] == 3


def test_native_gather_threads(store):
    path, items = store
    from conan_tpu.data._native import NativeReader, get_lib

    if get_lib() is None:
        pytest.skip("no compiler available")
    r = NativeReader(path, n_threads=4)
    idxs = [5, 1, 20, 20, 0]
    blobs = r.gather(idxs)
    for i, b in zip(idxs, blobs):
        np.testing.assert_array_equal(pickle.loads(b)["mel"], items[i]["mel"])
    r.prefault(range(25))


def test_record_reader_uses_native(store):
    path, items = store
    r = RecordReader(path)
    np.testing.assert_array_equal(r[11]["mel"], items[11]["mel"])
    r_py = RecordReader(path, use_native=False)
    np.testing.assert_array_equal(r_py[11]["mel"], items[11]["mel"])
