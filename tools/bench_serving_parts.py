"""Serving chunk-step decomposition: where does the 0.83 ms go?

Slope-times (same two-depth lax.scan method as bench.py — the axon tunnel
makes naive host timing meaningless) ablated variants of the fused 3-stage
streaming chunk step at production sizes, single stream:

  full           — Emformer step → argmax codes → Conan stream_step →
                   vocoder step (the shipped `_chunk_step`)
  emformer_only  — Emformer KV-cache attention step + argmax
  conan_only     — Conan acoustic stream_step on fixed codes
  vocoder_only   — causal-shuffle vocoder step on a fixed mel chunk
  no_vocoder     — Emformer + Conan (isolates the vocoder by difference too)

The parts need not add up exactly to `full` — XLA schedules each program
separately — but the ranking tells us which stage bounds the per-chunk
latency budget (reference analog: the per-stage RTF prints in
`modules/Emformer/emformer.py:140-147` and the vocoder harness
`tasks/vocoder/hifigan.py:556-632`).

Writes tools/SERVING_PARTS.json.  Usage: python tools/bench_serving_parts.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 1  # overridden by --streams (capacity-knee decomposition at batch >1)
N_LO, N_HI, REPS = 25, 200, 3


def _slope(scan_fn, state, chunks_lo, chunks_hi):
    import jax.numpy as jnp

    # compile both depths first (lax.scan returns (carry, ys); ys is the
    # per-chunk sum stack -- the readback target)
    for c in (chunks_lo, chunks_hi):
        _, out = scan_fn(state, c)
        float(jnp.sum(out))
    slopes = []
    for _ in range(REPS):
        ts = {}
        for n, c in ((N_LO, chunks_lo), (N_HI, chunks_hi)):
            t0 = time.perf_counter()
            _, out = scan_fn(state, c)
            float(jnp.sum(out))  # readback = hard sync
            ts[n] = time.perf_counter() - t0
        slopes.append((ts[N_HI] - ts[N_LO]) / (N_HI - N_LO) * 1e3)
    return (float(min(slopes)), float(statistics.median(slopes)),
            float(max(slopes)))


def main():
    from conan_tpu.utils.bench_timing import enable_persistent_cache

    enable_persistent_cache()
    global B
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=1,
                    help="concurrent streams (batch) to decompose at")
    args = ap.parse_args()
    B = args.streams

    import jax
    import jax.numpy as jnp

    from conan_tpu.infer.streaming import StreamingConfig, random_engine

    eng = random_engine(StreamingConfig(), seed=0)
    rng = np.random.default_rng(0)
    ref_mel = jnp.asarray(rng.standard_normal((B, 250, 80)).astype(np.float32) * 0.5)
    style = eng._prepare(ref_mel)
    seg, rc = eng.cfg.seg, eng.cfg.rc
    mel = jnp.asarray(rng.standard_normal((B, 200 * seg + rc, 80))
                      .astype(np.float32) * 0.5)

    def stacks(n):
        m = jnp.stack([mel[:, (i % 199) * seg:(i % 199) * seg + seg + rc]
                       for i in range(n)])
        z = jnp.zeros((n, B, seg, 1))
        return m, z

    (m_lo, z_lo), (m_hi, z_hi) = stacks(N_LO), stacks(N_HI)
    codes_fixed = jnp.asarray(rng.integers(0, 100, (B, seg)))
    mel4_fixed = jnp.asarray(rng.standard_normal((B, seg, 80))
                             .astype(np.float32) * 0.5)
    params = eng._params
    results = []

    def run(name, step, init_state, lo, hi):
        fn = jax.jit(lambda st, cs: jax.lax.scan(step, st, cs))
        t0 = time.time()
        mn, med, mx = _slope(fn, init_state, lo, hi)
        r = {"variant": name, "streams": B, "per_chunk_ms": round(mn, 4),
             "per_chunk_ms_median": round(med, 4),
             "per_chunk_ms_max": round(mx, 4)}
        print(json.dumps(r) + f"  # {time.time() - t0:.0f}s", flush=True)
        results.append(r)

    # full — the shipped chunk step
    run("full",
        lambda s, c: (lambda w, cd, s2: (s2, jnp.sum(w)))(
            *eng._chunk_step(params, s, c[0], style, c[1])),
        eng.init_state(B), (m_lo, z_lo), (m_hi, z_hi))

    # emformer + argmax only
    def em_step(s, c):
        logits, s2 = eng.emformer.step(params["emformer"], s, c)
        return s2, jnp.sum(jnp.argmax(logits, axis=-1))

    run("emformer_only", em_step, eng.emformer.init_state(B), m_lo, m_hi)

    # conan acoustic stream_step on fixed codes (state still evolves)
    def conan_step(s, c):
        ret, s2 = eng.conan.stream_step(params["conan"], s, codes_fixed, style,
                                        f0_noise=c)
        return s2, jnp.sum(ret["mel_out"])

    run("conan_only", conan_step, eng.conan.init_stream_state(B), z_lo, z_hi)

    # vocoder step on a fixed mel chunk
    def voc_step(s, c):
        wav, s2 = eng.vocoder.step(params["vocoder"], s, mel4_fixed + 0 * c)
        return s2, jnp.sum(wav)

    run("vocoder_only", voc_step, eng.vocoder.init_state(B), z_lo, z_hi)

    # emformer + conan, no vocoder
    def novoc_step(s, c):
        logits, em2 = eng.emformer.step(params["emformer"], s["emformer"], c[0])
        codes = jnp.argmax(logits, axis=-1)
        ret, c2 = eng.conan.stream_step(params["conan"], s["conan"], codes,
                                        style, f0_noise=c[1])
        return {"emformer": em2, "conan": c2}, jnp.sum(ret["mel_out"])

    run("no_vocoder", novoc_step,
        {"emformer": eng.emformer.init_state(B),
         "conan": eng.conan.init_stream_state(B)},
        (m_lo, z_lo), (m_hi, z_hi))

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SERVING_PARTS.json" if B == 1
                        else f"SERVING_PARTS_B{B}.json")
    json.dump(results, open(path, "w"), indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
