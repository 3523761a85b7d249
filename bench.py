"""Benchmark: p50 per-chunk end-to-end streaming VC latency on one chip.

Measures the fused 3-stage chunk step (Emformer → Conan acoustic → causal
shuffle vocoder, production sizes, f32) against the reference's headline
number: ~80 ms per 80 ms chunk on a CUDA GPU (reference README.md:29,208).

Prints ONE JSON line:
  {"metric": ..., "value": p50_ms, "unit": "ms", "vs_baseline": 80/p50, ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from conan_tpu.infer.streaming import StreamingConfig, random_engine

    t_setup = time.time()
    eng = random_engine(StreamingConfig(), seed=0)
    rng = np.random.default_rng(0)
    hop = eng.cfg.mel.hop
    sr = eng.cfg.mel.sample_rate

    ref_mel = jnp.asarray(rng.standard_normal((1, 250, 80)).astype(np.float32) * 0.5)
    style_ctx = eng._prepare(ref_mel)
    state = eng.init_state(1)
    n_chunks = 200
    mel = jnp.asarray(rng.standard_normal((1, n_chunks * 4 + 2, 80)).astype(np.float32) * 0.5)

    # warmup/compile
    wav, codes, state = eng._step(state, mel[:, :6], style_ctx)
    jax.block_until_ready(wav)
    print(f"# compile+warmup {time.time() - t_setup:.1f}s", file=sys.stderr)

    lat = []
    for i in range(n_chunks):
        s = (i % (n_chunks - 1)) * 4
        chunk = mel[:, s:s + 6]
        t0 = time.perf_counter()
        wav, codes, state = eng._step(state, chunk, style_ctx)
        wav.block_until_ready()
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat[5:])  # drop stragglers from first dispatches
    p50 = float(np.percentile(lat, 50))
    p95 = float(np.percentile(lat, 95))
    chunk_ms = 4 * hop / sr * 1000.0  # 80 ms of audio per chunk
    audio_seconds_per_s = (chunk_ms / 1000.0) / (p50 / 1000.0)

    # batched multi-stream serving: 8 concurrent conversions per step
    B = 8
    state_b = eng.init_state(B)
    style_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape[1:]), style_ctx)
    mel_b = jnp.broadcast_to(mel, (B,) + mel.shape[1:])
    wav, codes, state_b = eng._step(state_b, mel_b[:, :6], style_b)
    jax.block_until_ready(wav)
    lat_b = []
    for i in range(60):
        s = (i % (n_chunks - 1)) * 4
        t0 = time.perf_counter()
        wav, codes, state_b = eng._step(state_b, mel_b[:, s:s + 6], style_b)
        wav.block_until_ready()
        lat_b.append((time.perf_counter() - t0) * 1e3)
    p50_b = float(np.percentile(np.asarray(lat_b[5:]), 50))
    throughput_b = B * (chunk_ms / 1000.0) / (p50_b / 1000.0)

    # pure device time per chunk: 100 chunks scanned on-device (no host
    # dispatch) — the hardware-limit number
    N = 100
    chunks = jnp.stack([mel[:, (i % (n_chunks - 1)) * 4:(i % (n_chunks - 1)) * 4 + 6]
                        for i in range(N)])
    st = eng.init_state(1)
    wavs, _codes, st = eng.stream_scan(st, chunks, style_ctx)
    jax.block_until_ready(wavs)
    t0 = time.perf_counter()
    wavs, _codes, st = eng.stream_scan(st, chunks, style_ctx)
    jax.block_until_ready(wavs)
    device_chunk_ms = (time.perf_counter() - t0) / N * 1e3
    print(json.dumps({
        "metric": "p50 per-chunk end-to-end streaming VC latency",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(80.0 / p50, 2),
        "extra": {
            "p95_ms": round(p95, 3),
            "rtf": round(p50 / chunk_ms, 4),
            "audio_seconds_per_s_per_stream": round(audio_seconds_per_s, 2),
            "batch8_p50_ms": round(p50_b, 3),
            "batch8_audio_seconds_per_s": round(throughput_b, 2),
            "device_time_per_chunk_ms": round(device_chunk_ms, 3),
            "baseline": "reference ~80 ms/chunk (README.md:29,208, CUDA GPU)",
        },
    }))


if __name__ == "__main__":
    main()
