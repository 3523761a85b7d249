"""Build a deterministic synthetic corpus + binarize it for the soak runs.

The reference trains on VCTK with pre-extracted HuBERT codes
(`/root/reference/README.md` Metadata Format; `data_gen/conan_binarizer.py`);
no real speech is available in this container, so the TPU soak trainings
(VERDICT r1 #9) use harmonic-series pseudo-speech: per-speaker F0 base,
per-utterance vibrato + band noise, plus synthetic "HuBERT" codes correlated
with frame energy so the Emformer distillation has learnable structure.

Usage: python tools/make_soak_corpus.py [--out /tmp/soak_corpus]
       [--items 48] [--speakers 4]
Then point any egs/soak/*.yaml at <out>/binary.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# Host-side data prep: the jitted mel frontend must run on CPU, not through
# the axon TPU tunnel (one remote compile per utterance length would blow the
# runtime).  Env vars don't work here — the sitecustomize overrides them
# (CLAUDE.md); the config update after import does.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def write_corpus(base: pathlib.Path, rng, n_items: int, n_speakers: int):
    sr, hop = 16000, 320
    wav_dir = base / "wavs"
    wav_dir.mkdir(parents=True, exist_ok=True)
    from scipy.io import wavfile

    meta = []
    speakers = [f"p{300 + i}" for i in range(n_speakers)]
    for i in range(n_items):
        spk = speakers[i % n_speakers]
        name = f"{spk}_{i:03d}"
        n = int(rng.integers(150, 400)) * hop  # 3–8 s
        t = np.arange(n) / sr
        f0_base = 110 + 35 * (i % n_speakers)
        vib = 1 + 0.03 * np.sin(2 * np.pi * rng.uniform(4, 7) * t)
        phase = np.cumsum(2 * np.pi * f0_base * vib / sr)
        wav = np.zeros(n, np.float64)
        for h, a in enumerate([0.5, 0.25, 0.12, 0.08, 0.05], start=1):
            wav += a * np.sin(h * phase)
        # amplitude envelope: syllable-rate modulation + silences
        env = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(2, 4) * t
                                   + rng.uniform(0, 6))
        env *= (np.sin(2 * np.pi * rng.uniform(0.3, 0.8) * t) > -0.8)
        wav = (wav * env + 0.02 * rng.standard_normal(n)) * 0.3
        wav = wav.astype(np.float32)
        wavfile.write(str(wav_dir / f"{name}.wav"), sr,
                      (np.clip(wav, -1, 1) * 32767).astype(np.int16))
        n_frames = n // hop + 1
        # codes correlated with frame energy -> distillable structure
        wav_pad = np.pad(wav, (0, n_frames * hop - n)) ** 2
        fe = np.add.reduceat(wav_pad, np.arange(0, n_frames * hop, hop))
        codes = (np.clip(fe / (fe.max() + 1e-9), 0, 1) * 49).astype(np.int64)
        codes += (i % n_speakers) * 25 + rng.integers(0, 2, n_frames)
        meta.append({"item_name": name, "wav_fn": str(wav_dir / f"{name}.wav"),
                     "hubert": " ".join(map(str, np.clip(codes, 0, 99)))})
    f0_dir = base / "wavs_f0"
    f0_dir.mkdir(exist_ok=True)
    for i, m in enumerate(meta):
        n_frames = len(m["hubert"].split())
        f0_base = 110 + 35 * (i % n_speakers)
        tt = np.arange(n_frames) * hop / sr
        f0 = f0_base * (1 + 0.03 * np.sin(2 * np.pi * 5 * tt))
        f0[rng.random(n_frames) < 0.15] = 0  # unvoiced
        np.save(str(f0_dir / (m["item_name"] + "_f0.npy")),
                f0.astype(np.float32))
    (base / "processed").mkdir(exist_ok=True)
    json.dump(meta, open(base / "processed" / "metadata.json", "w"))
    json.dump({s: i for i, s in enumerate(speakers)},
              open(base / "processed" / "spker_set.json", "w"))
    return speakers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/soak_corpus")
    ap.add_argument("--items", type=int, default=48)
    ap.add_argument("--speakers", type=int, default=4)
    args = ap.parse_args()
    base = pathlib.Path(args.out)
    rng = np.random.default_rng(0)
    speakers = write_corpus(base, rng, args.items, args.speakers)

    from conan_tpu.config import HParams
    from conan_tpu.data.binarizer import ConanBinarizer

    hp = HParams({
        "processed_data_dir": str(base / "processed"),
        "binary_data_dir": str(base / "binary"),
        "audio_sample_rate": 16000, "hop_size": 320, "fft_size": 1024,
        "win_size": 1024, "audio_num_mel_bins": 80, "fmin": 80, "fmax": 7600,
        "valid_prefixes": [speakers[0]], "test_prefixes": [speakers[0]],
        "max_frames": 3000, "max_samples": 8000,
    })
    ConanBinarizer(hp).process()
    print(f"corpus + binary data under {base}")


if __name__ == "__main__":
    main()
