"""Benchmark: per-chunk end-to-end streaming VC latency on one chip.

Measures the fused 3-stage chunk step (Emformer → Conan acoustic → causal
shuffle vocoder, production sizes, f32) against the reference's headline
number: ~80 ms per 80 ms chunk on a CUDA GPU (reference README.md:29,208).

Timing methodology — the axon tunnel in this container makes naive host-side
timing meaningless (`block_until_ready` does not actually block; a probe
"measured" 66× peak FLOPs that way, and per-dispatch overhead is 30-40 ms of
shared-tunnel noise).  The honest number is the ON-DEVICE chunk step time,
measured as a SLOPE: `stream_scan` (the chunk loop as one compiled
`lax.scan`) is timed to a terminal readback at two chunk counts; the
difference isolates per-chunk device time, cancelling dispatch/sync/tunnel
overhead exactly.  An 8192³ bf16 matmul chain measured this way reproduces
88% of v5e peak, validating the method.  On a host-attached deployment the
per-chunk latency is this device time plus O(0.1 ms) dispatch.

Prints ONE JSON line:
  {"metric": ..., "value": per_chunk_ms, "unit": "ms", "vs_baseline": 80/value, ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _scan_slope(eng, style, mel, B, n_lo=25, n_hi=200, reps=3):
    """Per-chunk device ms via two-point scan timing (min over reps)."""
    import jax
    import jax.numpy as jnp

    slopes = []
    stacks = {}
    for n in (n_lo, n_hi):
        stacks[n] = jnp.stack([mel[:, (i % 199) * 4:(i % 199) * 4 + 6]
                               for i in range(n)])
    # compile both shapes first (outside the timed region)
    for n in (n_lo, n_hi):
        st = eng.init_state(B)
        wavs, _c, st = eng.stream_scan(st, stacks[n], style)
        float(jnp.sum(wavs))
    for _ in range(reps):
        ts = {}
        for n in (n_lo, n_hi):
            st = eng.init_state(B)
            t0 = time.perf_counter()
            wavs, _c, st = eng.stream_scan(st, stacks[n], style)
            float(jnp.sum(wavs))  # readback = hard sync
            ts[n] = time.perf_counter() - t0
        slopes.append((ts[n_hi] - ts[n_lo]) / (n_hi - n_lo))
    return float(min(slopes)) * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from conan_tpu.infer.streaming import StreamingConfig, random_engine

    t_setup = time.time()
    eng = random_engine(StreamingConfig(), seed=0)
    rng = np.random.default_rng(0)
    hop = eng.cfg.mel.hop
    sr = eng.cfg.mel.sample_rate
    chunk_ms = 4 * hop / sr * 1000.0  # 80 ms of audio per chunk

    ref_mel = jnp.asarray(rng.standard_normal((1, 250, 80)).astype(np.float32) * 0.5)
    style = eng._prepare(ref_mel)
    mel = jnp.asarray(rng.standard_normal((1, 200 * 4 + 2, 80)).astype(np.float32) * 0.5)

    per_chunk = _scan_slope(eng, style, mel, B=1)
    print(f"# single-stream measured in {time.time() - t_setup:.1f}s",
          file=sys.stderr)

    # batched multi-stream serving: 8 concurrent conversions per step
    B = 8
    style_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape[1:]), style)
    mel_b = jnp.broadcast_to(mel, (B,) + mel.shape[1:])
    per_chunk_b = _scan_slope(eng, style_b, mel_b, B=B, n_lo=25, n_hi=100)
    throughput_b = B * (chunk_ms / 1e3) / (per_chunk_b / 1e3)

    print(json.dumps({
        "metric": "per-chunk end-to-end streaming VC latency (device, slope-measured)",
        "value": round(per_chunk, 3),
        "unit": "ms",
        "vs_baseline": round(80.0 / per_chunk, 2),
        "extra": {
            "rtf": round(per_chunk / chunk_ms, 5),
            "audio_seconds_per_s_per_stream": round(chunk_ms / per_chunk, 2),
            "batch8_per_chunk_ms": round(per_chunk_b, 3),
            "batch8_audio_seconds_per_s": round(throughput_b, 2),
            "method": "lax.scan chunk loop timed to terminal readback at two "
                      "chunk counts; per-chunk = slope (cancels tunnel "
                      "dispatch overhead; naive block_until_ready does not "
                      "block through the axon tunnel)",
            "baseline": "reference ~80 ms/chunk (README.md:29,208, CUDA GPU)",
        },
    }))


if __name__ == "__main__":
    main()
