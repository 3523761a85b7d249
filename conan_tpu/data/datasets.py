"""Datasets + collators over the binary record store.

Semantics-compatible with the reference datasets
(`/root/reference/tasks/tts/dataset_utils.py:9-257`,
`tasks/Conan/dataset.py:12-90`, `tasks/Emformer/dataset.py`,
`tasks/vocoder/dataset_utils.py:46-217`): same-speaker reference mel sampling
via the ``*_spk_ids.npy`` fast path, f0 log-norm + gap interpolation, vocoder
random crops aligned to the hop.

Deliberate fix (SURVEY.md "real bugs to not replicate"): content codes are
padded with −1 — the value the model actually masks on — instead of the
reference's pad-0 (tasks/Conan/dataset.py:57 vs modules/Conan/Conan.py:136).

Static-shape delta: collators accept a target length from the bucket ladder
so XLA sees a bounded shape set.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np

from conan_tpu.audio.pitch import norm_interp_f0_np
from conan_tpu.data.batching import collate_1d, collate_2d
from conan_tpu.data.record_store import RecordReader


class SpeechDataset:
    """mel + same-speaker reference mel + f0/uv."""

    def __init__(self, data_dir: str, prefix: str, hp, seed: int = 1234):
        self.data_dir = data_dir
        self.prefix = prefix
        self.hp = hp
        self.rng = np.random.default_rng(seed)
        self.sizes = np.load(f"{data_dir}/{prefix}_lengths.npy")
        self.avail_idxs = list(range(len(self.sizes)))
        min_frames = hp.get("min_frames", 0)
        if prefix == "train" and min_frames > 0:
            self.avail_idxs = [i for i in self.avail_idxs if self.sizes[i] >= min_frames]
        self.sizes = [int(self.sizes[i]) for i in self.avail_idxs]
        self._reader: RecordReader | None = None
        self._spk2indices: dict[int, list[int]] | None = None

    def __len__(self):
        return len(self.avail_idxs)

    def _get_item(self, local_idx: int):
        if self._reader is None:
            self._reader = RecordReader(f"{self.data_dir}/{self.prefix}")
        return self._reader[self.avail_idxs[local_idx]]

    def _speaker_map(self) -> dict[int, list[int]]:
        if self._spk2indices is None:
            self._spk2indices = defaultdict(list)
            path = f"{self.data_dir}/{self.prefix}_spk_ids.npy"
            max_per = int(self.hp.get("max_samples_per_spk", 100))
            if os.path.exists(path):
                spk_ids = np.load(path, mmap_mode="r")
                local = np.asarray(spk_ids)[self.avail_idxs]
                for li in self.rng.permutation(len(local)):
                    b = self._spk2indices[int(local[li])]
                    if len(b) < max_per:
                        b.append(int(li))
            else:
                for li in self.rng.permutation(len(self)):
                    b = self._spk2indices[int(self._get_item(li)["spk_id"])]
                    if len(b) < max_per:
                        b.append(int(li))
        return self._spk2indices

    def __getitem__(self, index: int) -> dict:
        hp = self.hp
        item = self._get_item(index)
        max_frames = hp.get("max_frames", 3000)
        mel = np.asarray(item["mel"], np.float32)[:max_frames]
        # same-speaker different-utterance reference
        spk_id = int(item["spk_id"])
        cands = [l for l in self._speaker_map()[spk_id] if l != index]
        ref_local = int(self.rng.choice(cands)) if cands else index
        ref_mel = np.asarray(self._get_item(ref_local)["mel"], np.float32)[:max_frames]
        sample = {"id": index, "item_name": item.get("item_name", str(index)),
                  "mel": mel, "ref_mel": ref_mel, "spk_id": spk_id}
        if hp.get("use_spk_embed", False) and "spk_embed" in item:
            emb = item["spk_embed"]
            if isinstance(emb, str):  # metadata stores space-separated floats
                emb = np.asarray([float(x) for x in emb.split()], np.float32)
            sample["spk_embed"] = np.asarray(emb, np.float32)
        if "f0" in item:
            T = min(mel.shape[0], len(item["f0"]))
            sample["mel"] = mel[:T]
            f0, uv = norm_interp_f0_np(np.asarray(item["f0"], np.float32)[:T].copy())
            sample["f0"], sample["uv"] = f0, uv
        return sample


class ConanDataset(SpeechDataset):
    def __getitem__(self, index: int) -> dict:
        sample = super().__getitem__(index)
        item = self._get_item(index)
        content = np.asarray(item["hubert"], np.int64)
        T = min(len(content), sample["mel"].shape[0])
        sample["content"] = content[:T]
        sample["mel"] = sample["mel"][:T]
        if "f0" in sample:
            sample["f0"] = sample["f0"][:T]
            sample["uv"] = sample["uv"][:T]
        return sample

    def collate(self, samples: list[dict], target_len: int | None = None,
                ref_target_len: int | None = None) -> dict:
        batch = {
            "nsamples": len(samples),
            "item_name": [s["item_name"] for s in samples],
            "content": collate_1d([s["content"] for s in samples], -1, target_len),
            "mels": collate_2d([s["mel"] for s in samples], 0.0, target_len),
            "ref_mels": collate_2d([s["ref_mel"] for s in samples], 0.0, ref_target_len),
            "f0": collate_1d([s["f0"] for s in samples], 0.0, target_len),
            "uv": collate_1d([s["uv"] for s in samples], 0.0, target_len),
            "mel_lengths": np.asarray([s["mel"].shape[0] for s in samples], np.int64),
            "spk_ids": np.asarray([s["spk_id"] for s in samples], np.int64),
        }
        if all("spk_embed" in s for s in samples):  # use_spk_embed path
            batch["spk_embed"] = np.stack([s["spk_embed"] for s in samples])
        return batch


class EmformerDataset(SpeechDataset):
    """mel (with rc lookahead naturally present in the utterance) + teacher
    HuBERT codes, padded −1 (tasks/Emformer/dataset.py:52)."""

    def __getitem__(self, index: int) -> dict:
        sample = super().__getitem__(index)
        item = self._get_item(index)
        content = np.asarray(item["hubert"], np.int64)
        T = min(len(content), sample["mel"].shape[0])
        sample["content"] = content[:T]
        sample["mel"] = sample["mel"][:T]
        return sample

    def collate(self, samples: list[dict], target_len: int | None = None,
                seg: int = 4, rc: int = 2) -> dict:
        """Pads mel to (⌈T/seg⌉·seg + rc) so the Emformer's static-shape
        forward sees a segment-aligned utterance + lookahead tail.

        The last ``rc`` codes of every sample are masked to −1: those frames'
        lookahead comes from zero padding, not audio, so training on them
        would be train/infer-inconsistent.  This generalizes the reference's
        batch-level target truncation (`/root/reference/tasks/Emformer/
        Emformer.py:199-207`: ``content[:, :-right_context]`` — which drops
        exactly these frames for the batch-max-length sample) to every sample.
        No per-sample attention lengths are passed: the reference feeds
        torchaudio the full padded length for all samples (`Emformer.py:185`),
        i.e. an all-valid padding mask; the −1 loss mask carries validity."""
        T = target_len or max(s["mel"].shape[0] for s in samples)
        T_utt = -(-T // seg) * seg
        mels = collate_2d([s["mel"] for s in samples], 0.0, T_utt + rc)
        contents = []
        for s in samples:
            c = np.asarray(s["content"]).copy()
            if rc > 0:
                # frames whose rc-lookahead reaches past the sample's mel
                # (after the bucket crop at T_utt + rc) have no real lookahead
                tail = min(len(c), T_utt + rc) - rc
                c[max(tail, 0):] = -1
            contents.append(c)
        content = collate_1d(contents, -1, T_utt)
        return {"nsamples": len(samples), "mels": mels, "content": content}


class VocoderDataset:
    """wav/mel random crops of max_samples (tasks/vocoder/dataset_utils.py:46-130)."""

    def __init__(self, data_dir: str, prefix: str, hp, seed: int = 1234):
        self.data_dir = data_dir
        self.prefix = prefix
        self.hp = hp
        self.rng = np.random.default_rng(seed)
        self.hop = hp["hop_size"]
        self.batch_max_frames = hp.get("max_samples", 8192) // self.hop
        sizes = np.load(f"{data_dir}/{prefix}_lengths.npy")
        self.avail_idxs = [i for i, s in enumerate(sizes) if s > self.batch_max_frames]
        self.sizes = [int(sizes[i]) for i in self.avail_idxs]
        self._reader: RecordReader | None = None

    def __len__(self):
        return len(self.avail_idxs)

    def __getitem__(self, index: int) -> dict:
        if self._reader is None:
            self._reader = RecordReader(f"{self.data_dir}/{self.prefix}")
        item = self._reader[self.avail_idxs[index]]
        return {"mel": np.asarray(item["mel"], np.float32),
                "wav": np.asarray(item["wav"], np.float32)}

    def collate(self, samples: list[dict]) -> dict:
        mf = self.batch_max_frames
        mels, wavs = [], []
        for s in samples:
            c, x = s["mel"], s["wav"]
            if len(c) <= mf:
                continue
            start = int(self.rng.integers(0, len(c) - mf))
            mels.append(c[start:start + mf])
            wavs.append(x[start * self.hop:(start + mf) * self.hop])
        return {"mels": np.stack(mels), "wavs": np.stack(wavs)}
