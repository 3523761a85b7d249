"""Quality evidence for serving_precision='fast' (bf16 conan+vocoder).

Runs the SAME weights + input through the exact (HIGHEST) and fast engines
on the TPU and reports the deltas that matter for serving:

  - content codes: must be IDENTICAL (the emformer stays HIGHEST in fast
    mode precisely because bf16 flips argmaxes — CLAUDE.md precision notes)
  - waveform: max-abs / rms diff + SNR of fast vs exact
  - mel: L1 distance between the mel spectrograms of the two outputs
    (the perceptual-adjacent number; GAN training itself only holds mel L1
    to ~1e-1, so fast-mode deltas an order below that are inaudible)

Writes tools/SERVING_FAST.json.  Usage: python tools/bench_fast_quality.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from conan_tpu.utils.bench_timing import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from conan_tpu.audio.mel import wav2mel_frontend
    from conan_tpu.infer.streaming import StreamingConfig, random_engine

    rng = np.random.default_rng(0)
    hop = StreamingConfig().mel.hop
    # harmonic pseudo-speech (same recipe as the soak corpus) — all-noise
    # input would overstate robustness
    sr = 16000
    n = hop * 200
    t = np.arange(n) / sr
    phase = np.cumsum(2 * np.pi * 150 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t)) / sr)
    src = sum(a * np.sin(h * phase) for h, a in
              enumerate([0.5, 0.25, 0.12], start=1))
    src = (src * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
           + 0.02 * rng.standard_normal(n)).astype(np.float32) * 0.3
    ref = (np.sin(np.cumsum(2 * np.pi * 220 * np.ones(hop * 100) / sr))
           * 0.2).astype(np.float32)

    exact = random_engine(serving_precision="exact", seed=0)
    fast = random_engine(serving_precision="fast", seed=0)

    wav_e, codes_e = exact.infer_once(src, ref, collect_codes=True,
                                      use_scan=True)
    wav_f, codes_f = fast.infer_once(src, ref, collect_codes=True,
                                     use_scan=True)

    code_flips = int((codes_e != codes_f).sum())
    diff = wav_f - wav_e
    rms_e = float(np.sqrt((wav_e ** 2).mean()))
    rms_d = float(np.sqrt((diff ** 2).mean()))
    snr_db = 20 * np.log10(rms_e / max(rms_d, 1e-12))

    mel_e = np.asarray(wav2mel_frontend(jnp.asarray(wav_e), exact.cfg.mel))
    mel_f = np.asarray(wav2mel_frontend(jnp.asarray(wav_f), exact.cfg.mel))
    mel_l1 = float(np.abs(mel_e - mel_f).mean())

    out = {
        "setup": "production sizes, random weights, harmonic pseudo-speech "
                 "(200 chunks); exact=HIGHEST everywhere, fast=bf16 "
                 "conan+vocoder with HIGHEST emformer",
        "code_flips": code_flips,
        "codes_total": int(codes_e.size),
        "wav_max_abs_diff": float(np.abs(diff).max()),
        "wav_rms_diff": rms_d,
        "snr_db_fast_vs_exact": round(float(snr_db), 2),
        "mel_l1_fast_vs_exact": mel_l1,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SERVING_FAST.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out, indent=1))
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
