"""Serving-precision ladder: exact / high / fast, measured end-to-end on the
TRAINED production-geometry composition (VERDICT r4 missing #3 / weak #5 —
the "high" tier shipped unevidenced, and fast-mode quality evidence used
random weights over synthetic pseudo-speech).

Per rung this reports, against the exact (HIGHEST-everywhere) engine:

  quality (trained weights, corpus audio)
    - content codes: identical BY CONSTRUCTION — all three rungs keep the
      Emformer at HIGHEST (codes are the pipeline's one discretization);
      counted anyway as a wiring check
    - waveform SNR + max-abs diff vs exact
    - mel L1 between the two outputs (GAN training holds mel L1 to ~1e-1,
      so deltas an order below that are inaudible)
  latency (slope method, CLAUDE.md: naive host timing lies through the
  axon tunnel)
    - per-chunk device ms at B=1 and B=64
    - capacity knee: streams/chip at RTF < 1 (sweep, budget-aware)

Reference baseline: the reference engine is precision-free fp32 CUDA
(`/root/reference/inference/Conan.py:95-156`) — its only rung is "exact".

Usage: python tools/bench_serving_ladder.py [--ckpt-root checkpoints]
       [--budget 600] [--no-capacity]
Writes tools/SERVING_LADDER.json.
"""

from __future__ import annotations

import argparse
import json
import os

import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def _trained_dirs(root: str):
    for tag in ("soak_r5", "soak_r4"):
        dirs = tuple(os.path.join(root, f"{tag}_{s}", "deploy")
                     for s in ("conan", "emf", "voc"))
        if all(os.path.exists(os.path.join(d, "config.yaml")) for d in dirs):
            return dirs
    return None


def _corpus_pair(sr: int, hop: int, rng):
    """Source/reference wavs from the soak corpus (the training distribution
    — trained low-entropy logits, not random-weight robustness theater);
    synthetic harmonic fallback when the corpus is absent."""
    import glob

    wavs = sorted(glob.glob("/tmp/soak_corpus/wavs/*.wav"))
    if len(wavs) >= 2:
        from scipy.io import wavfile

        def _rd(p):
            r, w = wavfile.read(p)
            assert r == sr
            return (w.astype(np.float32) / 32767.0)

        # different speakers: first and last (corpus sorts by speaker prefix)
        return _rd(wavs[0]), _rd(wavs[-1]), f"corpus ({os.path.basename(wavs[0])} -> {os.path.basename(wavs[-1])})"
    n = hop * 200
    t = np.arange(n) / sr
    phase = np.cumsum(2 * np.pi * 150 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t)) / sr)
    src = sum(a * np.sin(h * phase) for h, a in enumerate([0.5, 0.25, 0.12], 1))
    src = (src * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
           + 0.02 * rng.standard_normal(n)).astype(np.float32) * 0.3
    ref = (np.sin(np.cumsum(2 * np.pi * 220 * np.ones(hop * 100) / sr))
           * 0.2).astype(np.float32)
    return src, ref, "synthetic harmonic fallback (no corpus)"


def _bench(eng, B, rng, **kw):
    """(median, min, max) ms/chunk — shared single-compile slope timer."""
    from conan_tpu.utils.bench_timing import bench_engine_chunk

    return bench_engine_chunk(eng, B, rng, **kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-root", default="checkpoints")
    ap.add_argument("--budget", type=float, default=900.0,
                    help="wall-clock budget (s); capacity sweeps truncate")
    ap.add_argument("--no-capacity", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from conan_tpu.audio.mel import wav2mel_frontend
    from conan_tpu.infer.build import build_engine
    from conan_tpu.infer.streaming import StreamingVoiceConversion
    from conan_tpu.utils.bench_timing import enable_persistent_cache

    enable_persistent_cache()

    rng = np.random.default_rng(0)
    dirs = _trained_dirs(args.ckpt_root)
    if dirs is None:
        print("no trained deploy checkpoints found", file=sys.stderr)
        raise SystemExit(1)
    exact = build_engine(*dirs)
    cfg = exact.cfg
    sr, hop = cfg.mel.sample_rate, cfg.mel.hop
    chunk_ms = cfg.seg * hop / sr * 1000.0
    src, ref, src_desc = _corpus_pair(sr, hop, rng)

    engines = {"exact": exact}
    for mode in ("high", "fast"):
        engines[mode] = StreamingVoiceConversion(
            cfg, exact.p_emformer, exact.p_conan, exact.vq_state,
            exact.p_vocoder, serving_precision=mode)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SERVING_LADDER.json")

    def dump():
        json.dump(out, open(path, "w"), indent=1)

    out = {
        "setup": {
            "checkpoints": list(dirs),
            "sizes": {"emformer_layers": cfg.emformer.num_layers,
                      "conan_hidden": cfg.conan.hidden_size,
                      "voc_channels": cfg.vocoder.upsample_initial_channel},
            "input": src_desc,
            "note": "codes are exact in every rung BY CONSTRUCTION (emformer "
                    "always HIGHEST); waveform deltas are vs the exact rung",
        },
        "rungs": {},
    }

    # ---- quality: one utterance through each rung ----
    wavs, codes = {}, {}
    for mode, eng in engines.items():
        wavs[mode], codes[mode] = eng.infer_once(src, ref, collect_codes=True,
                                                 use_scan=True)
        print(f"# {mode}: quality pass done t={time.time() - T0:.0f}s",
              file=sys.stderr)
    mel_exact = np.asarray(wav2mel_frontend(jnp.asarray(wavs["exact"]), cfg.mel))
    for mode in ("exact", "high", "fast"):
        row = {}
        if mode != "exact":
            d = wavs[mode] - wavs["exact"]
            rms_e = float(np.sqrt((wavs["exact"] ** 2).mean()))
            rms_d = float(np.sqrt((d ** 2).mean()))
            mel_m = np.asarray(wav2mel_frontend(jnp.asarray(wavs[mode]), cfg.mel))
            row["quality_vs_exact"] = {
                "code_flips": int((codes[mode] != codes["exact"]).sum()),
                "wav_max_abs_diff": float(np.abs(d).max()),
                "snr_db": round(20 * np.log10(rms_e / max(rms_d, 1e-12)), 2),
                "mel_l1": float(np.abs(mel_m - mel_exact).mean()),
            }
        out["rungs"][mode] = row
    dump()

    # ---- latency: B=1 and B=64 per rung ----
    for mode, eng in engines.items():
        for B in (1, 64):
            med, lo, hi = _bench(eng, B, rng)
            out["rungs"][mode][f"per_chunk_ms_B{B}"] = {
                "median": round(med, 3), "min": round(lo, 3),
                "max": round(hi, 3),
                "rtf": round(med / chunk_ms, 4),
                "audio_s_per_s": round(B * chunk_ms / med, 1)}
            print(f"# {mode} B={B}: {med:.3f} ms/chunk "
                  f"t={time.time() - T0:.0f}s", file=sys.stderr)
            dump()

    # ---- capacity knee per rung (budget-aware) ----
    # ordered SAFE-FIRST: B>=1024 programs intermittently CRASH the TPU
    # worker (observed twice: exact B=1024 and high/fast B>=1024 — huge
    # stage-4 activations); running risky points last means a crash only
    # loses the remaining points, and the incremental dump keeps the rest.
    if not args.no_capacity:
        plan = [("exact", 256), ("exact", 512), ("high", 512),
                ("fast", 1024), ("high", 1024), ("fast", 2048),
                ("exact", 1024)]
        for mode in engines:
            out["rungs"][mode]["capacity"] = []
        for mode, B in plan:
            if time.time() - T0 > args.budget:
                out["rungs"][mode]["capacity"].append(
                    {"truncated_at": B, "reason": "budget"})
                break
            med, lo, hi = _bench(engines[mode], B, rng, n_meas=2)
            rtf = med / chunk_ms
            out["rungs"][mode]["capacity"].append(
                {"streams": B, "per_chunk_ms": round(med, 3),
                 "rtf": round(rtf, 4),
                 "audio_s_per_s": round(B * chunk_ms / med, 1)})
            print(f"# {mode} capacity B={B}: {med:.3f} ms (rtf {rtf:.3f}) "
                  f"t={time.time() - T0:.0f}s", file=sys.stderr)
            dump()
        for mode in engines:
            rows = [r for r in out["rungs"][mode]["capacity"] if "rtf" in r]
            out["rungs"][mode]["max_streams_rtf_lt_1"] = max(
                [r["streams"] for r in rows if r["rtf"] < 1.0], default=0)
        dump()

    dump()
    print(json.dumps(out, indent=1))
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
