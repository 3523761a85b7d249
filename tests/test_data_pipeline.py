"""Data layer: record store round-trip (reference format), batching,
binarizer on synthetic wavs, datasets + loader integration."""

import json
import os

import numpy as np
import pytest

from conan_tpu.config import HParams
from conan_tpu.data.batching import BucketLadder, batch_by_size, collate_1d, collate_2d
from conan_tpu.data.binarizer import ConanBinarizer
from conan_tpu.data.datasets import ConanDataset, EmformerDataset, VocoderDataset
from conan_tpu.data.loader import BatchIterator
from conan_tpu.data.record_store import RecordReader, RecordWriter


def test_record_store_roundtrip(tmp_path, rng):
    """Reference IndexedDataset self-test (indexed_datasets.py:57-72)."""
    path = str(tmp_path / "ds")
    items = [{"a": rng.standard_normal((50, 10)), "b": rng.standard_normal(7)}
             for _ in range(20)]
    w = RecordWriter(path)
    for it in items:
        w.add_item(it)
    w.finalize()
    r = RecordReader(path)
    assert len(r) == 20
    for i in [0, 7, 19, 3, 7]:
        np.testing.assert_array_equal(r[i]["a"], items[i]["a"])


def test_record_store_reference_compat(tmp_path, rng):
    """Our reader opens files written by the reference builder and vice versa."""
    from tests.ref_loader import load_reference

    load_reference()
    from utils.commons.indexed_datasets import IndexedDataset, IndexedDatasetBuilder

    path = str(tmp_path / "refds")
    items = [{"mel": rng.standard_normal((30, 8))} for _ in range(5)]
    b = IndexedDatasetBuilder(path)
    for it in items:
        b.add_item(it)
    b.finalize()
    r = RecordReader(path)
    np.testing.assert_array_equal(r[2]["mel"], items[2]["mel"])
    # ours → reference reader
    path2 = str(tmp_path / "ourds")
    w = RecordWriter(path2)
    for it in items:
        w.add_item(it)
    w.finalize()
    ref_r = IndexedDataset(path2)
    np.testing.assert_array_equal(ref_r[4]["mel"], items[4]["mel"])


def test_batch_by_size_matches_reference(rng):
    from tests.ref_loader import load_reference

    load_reference()
    from utils.commons.dataset_utils import batch_by_size as ref_bbs

    sizes = rng.integers(50, 500, 200)
    idx = list(range(200))
    ours = batch_by_size(idx, lambda i: int(sizes[i]), max_tokens=2000, max_sentences=8)
    ref = ref_bbs(idx, lambda i: int(sizes[i]), max_tokens=2000, max_sentences=8)
    assert ours == ref


def test_bucket_ladder():
    b = BucketLadder(min_len=100, max_len=1000, growth=1.5)
    assert b.fit(1) >= 1 and b.fit(99) >= 99
    assert b.fit(500) >= 500
    assert b.fit(99999) == b.lengths[-1]
    assert len(b.lengths) < 12


def _write_synth_corpus(tmp_path, rng, n_items=8, n_speakers=3):
    sr, hop = 16000, 320
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    from scipy.io import wavfile

    meta = []
    speakers = [f"p{200+i}" for i in range(n_speakers)]
    for i in range(n_items):
        spk = speakers[i % n_speakers]
        name = f"{spk}_{i:03d}"
        n = int(rng.integers(40, 90)) * hop
        t = np.arange(n) / sr
        wav = (0.3 * np.sin(2 * np.pi * (120 + 40 * (i % 3)) * t)).astype(np.float32)
        wavfile.write(str(wav_dir / f"{name}.wav"), sr, (wav * 32767).astype(np.int16))
        n_frames = n // hop + 1
        codes = rng.integers(0, 100, n_frames)
        meta.append({"item_name": name, "wav_fn": str(wav_dir / f"{name}.wav"),
                     "hubert": " ".join(map(str, codes))})
    # f0 sidecar files
    f0_dir = tmp_path / "wavs_f0"
    f0_dir.mkdir()
    for m in meta:
        n_frames = len(m["hubert"].split())
        f0 = np.abs(rng.standard_normal(n_frames)).astype(np.float32) * 100 + 100
        f0[rng.random(n_frames) < 0.2] = 0
        np.save(str(f0_dir / (m["item_name"] + "_f0.npy")), f0)
    (tmp_path / "processed").mkdir()
    json.dump(meta, open(tmp_path / "processed" / "metadata.json", "w"))
    json.dump({s: i for i, s in enumerate(speakers)},
              open(tmp_path / "processed" / "spker_set.json", "w"))
    return speakers


@pytest.fixture
def corpus(tmp_path, rng):
    speakers = _write_synth_corpus(tmp_path, rng)
    hp = HParams({
        "processed_data_dir": str(tmp_path / "processed"),
        "binary_data_dir": str(tmp_path / "binary"),
        "audio_sample_rate": 16000, "hop_size": 320, "fft_size": 1024,
        "win_size": 1024, "audio_num_mel_bins": 80, "fmin": 80, "fmax": 7600,
        "valid_prefixes": [speakers[0]], "test_prefixes": [speakers[0]],
        "max_frames": 3000, "max_samples": 2560,
    })
    ConanBinarizer(hp).process()
    return hp


def test_binarizer_and_datasets(corpus):
    hp = corpus
    bd = hp["binary_data_dir"]
    assert os.path.exists(f"{bd}/train.data")
    lengths = np.load(f"{bd}/train_lengths.npy")
    assert len(lengths) > 0
    ds = ConanDataset(bd, "train", hp)
    s = ds[0]
    assert s["mel"].shape[0] == len(s["content"]) == len(s["f0"])
    assert s["mel"].shape[1] == 80
    batch = ds.collate([ds[0], ds[1]], target_len=128)
    assert batch["mels"].shape == (2, 128, 80)
    assert batch["content"].shape == (2, 128)
    assert (batch["content"][0][s["mel"].shape[0]:] == -1).all()  # -1 pad fix

    eds = EmformerDataset(bd, "train", hp)
    eb = eds.collate([eds[0], eds[1]], target_len=60, seg=4, rc=2)
    assert eb["mels"].shape[1] == 62 and eb["mels"].shape[1] % 4 == 2
    # tail truncation: each sample's last rc codes are −1 — their lookahead
    # would be zero padding (reference truncates targets by right_context,
    # tasks/Emformer/Emformer.py:199-207); and no attention-lengths field
    for i, s in enumerate([eds[0], eds[1]]):
        tail = min(len(s["content"]), 62) - 2  # min(T_i, T_utt + rc) - rc
        assert (eb["content"][i, max(tail, 0):] == -1).all()
        assert (eb["content"][i, :min(max(tail, 0), 60)] != -1).all()
    assert "lengths" not in eb

    vds = VocoderDataset(bd, "train", hp)
    vb = vds.collate([vds[0], vds[1]])
    mf = hp["max_samples"] // hp["hop_size"]
    assert vb["mels"].shape[1] == mf
    assert vb["wavs"].shape[1] == mf * hp["hop_size"]


def test_loader_endless_and_bucketed(corpus):
    hp = corpus
    ds = ConanDataset(hp["binary_data_dir"], "train", hp)
    it = iter(BatchIterator(ds, ds.collate, max_tokens=400, max_sentences=4,
                            bucket=BucketLadder(32, 256, 1.5), endless=True))
    shapes = set()
    for _ in range(12):
        b = next(it)
        shapes.add(b["mels"].shape[1:])
    assert len(shapes) <= 4  # bucket ladder bounds the shape set


def test_loader_propagates_producer_errors():
    """A data error must fail training loudly, not end the iterator as if the
    epoch completed."""

    class BadDS:
        sizes = [10, 10]

        def __getitem__(self, i):
            raise ValueError("corrupt record")

    it = BatchIterator(BadDS(), lambda s: {"x": np.zeros(1)}, max_tokens=20,
                       max_sentences=2, endless=False)
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)
