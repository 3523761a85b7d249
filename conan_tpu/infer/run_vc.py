"""Batch voice-conversion runner.

CLI parity with `/root/reference/inference/run_voice_conversion.py:15-177`:
iterate a JSON list of {source, reference, output} triples through the
streaming engine, with per-pair error reporting and an RTF summary.

    python -m conan_tpu.infer.run_vc --pairs pairs.json \
        --conan_dir checkpoints/conan --emformer_dir checkpoints/emformer \
        --vocoder_dir checkpoints/hifigan_vc [--offline]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import numpy as np

log = logging.getLogger("conan_tpu.run_vc")


def save_wav(path: str, wav: np.ndarray, sr: int) -> None:
    from scipy.io import wavfile

    wav = np.clip(wav, -1.0, 1.0)
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))


def postprocess(wav: np.ndarray, mel_cfg, denoise_c: float) -> np.ndarray:
    """Post-vocoder spectral subtraction (reference applies it inside the NSF
    registry wrapper, `tasks/tts/vocoder_infer/hifigan_nsf.py:81-82`).

    The wav is zero-padded up to a power-of-two hop-count ladder before the
    jitted ``spectral_denoise`` call so batch conversion compiles a handful of
    shapes instead of one per utterance length (~30 s each through the axon
    remote-compile tunnel), then trimmed back."""
    if denoise_c <= 0:
        return wav
    import jax.numpy as jnp

    from conan_tpu.audio.denoise import spectral_denoise

    n = len(wav)
    hops = max(64, -(-n // mel_cfg.hop))
    bucket = 64
    while bucket < hops:
        bucket *= 2
    padded = np.pad(wav, (0, bucket * mel_cfg.hop - n))
    out = np.asarray(spectral_denoise(
        jnp.asarray(padded[None]), v=denoise_c, n_fft=mel_cfg.n_fft,
        hop=mel_cfg.hop, win_length=mel_cfg.win_length))[0]
    return out[:n]


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", required=True, help="JSON list of {source, reference, output}")
    ap.add_argument("--conan_dir", required=True)
    ap.add_argument("--emformer_dir", required=True)
    ap.add_argument("--vocoder_dir", required=True)
    ap.add_argument("--offline", action="store_true",
                    help="use the offline 3-stage composition instead of streaming")
    ap.add_argument("--serving_precision", default="exact",
                    choices=("exact", "high", "fast"),
                    help="matmul-precision ladder for the conan/vocoder stages "
                         "(the emformer always runs HIGHEST, so content codes "
                         "are identical in every rung; quality/throughput "
                         "evidence: tools/SERVING_LADDER.json)")
    args = ap.parse_args(argv)

    from conan_tpu.data.binarizer import load_wav
    from conan_tpu.infer.build import _load_dir_config, build_engine

    from conan_tpu.utils.async_save import AsyncSaver

    eng = build_engine(args.conan_dir, args.emformer_dir, args.vocoder_dir,
                       serving_precision=args.serving_precision)
    sr = eng.cfg.mel.sample_rate
    # post-vocoder spectral subtraction when configured (reference applies it
    # inside the NSF registry wrapper, hifigan_nsf.py:81-82)
    denoise_c = float(_load_dir_config(args.conan_dir).get("vocoder_denoise_c", 0.0) or 0.0)

    pairs = json.load(open(args.pairs))
    saver = AsyncSaver()
    ok, failed = 0, []
    total_audio, total_wall = 0.0, 0.0
    for i, pair in enumerate(pairs):
        try:
            src = load_wav(pair["source"], sr)
            ref = load_wav(pair["reference"], sr)
            t0 = time.time()
            # bucket_lengths: one XLA program per power-of-two length bucket
            # instead of one per utterance length (output unchanged)
            if args.offline:
                wav = eng.infer_offline(src, ref, bucket_lengths=True)[0]
            else:
                # on-device scan: chunkwise-identical output at device speed
                wav = eng.infer_once(src, ref, use_scan=True,
                                     bucket_lengths=True)[0]
            wav = postprocess(np.asarray(wav), eng.cfg.mel, denoise_c)
            wall = time.time() - t0
            out_path = pair.get("output") or os.path.splitext(pair["source"])[0] + "_vc.wav"
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            saver.submit(save_wav, out_path, wav, sr)
            total_audio += len(wav) / sr
            total_wall += wall
            ok += 1
            log.info("[%d/%d] %s  (%.2fs audio, %.2fs wall)", i + 1, len(pairs),
                     out_path, len(wav) / sr, wall)
        except Exception as e:
            failed.append((pair, str(e)))
            log.error("[%d/%d] FAILED %s: %s", i + 1, len(pairs), pair, e)
    saver.close()
    log.info("done: %d ok, %d failed, RTF=%.3f", ok, len(failed),
             total_wall / max(total_audio, 1e-9))
    if failed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
