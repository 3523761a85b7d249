"""Benchmark: per-chunk end-to-end streaming VC latency on one chip.

Measures the fused 3-stage chunk step (Emformer → Conan acoustic → causal
shuffle vocoder, production sizes, exact serving precision) against the
reference's headline number: ~80 ms per 80 ms chunk on a CUDA GPU (reference
README.md:29,208).

Timing methodology — the axon tunnel in this container makes naive host-side
timing meaningless (`block_until_ready` does not actually block; a probe
"measured" 66× peak FLOPs that way, and per-dispatch overhead is 30-40 ms of
shared-tunnel noise).  The honest number is the ON-DEVICE chunk step time,
measured as a SLOPE: the chunk loop (a compiled `lax.scan` inside a
traced-trip-count `fori_loop` — ONE executable per config) is timed to a
terminal readback at two repetition counts; the difference isolates
per-chunk device time, cancelling dispatch/sync/tunnel overhead exactly.
An 8192³ bf16 matmul chain measured this way reproduces 88% of v5e peak,
validating the method.  On a host-attached deployment the per-chunk latency
is this device time plus O(0.1 ms) dispatch.

Driver contract (CLAUDE.md): exactly ONE JSON line on stdout, always.
Round 4 broke it (rc 124 — unbounded sweeps outran the driver timeout), so
this harness is now time-budgeted like the reference's bounded 50-run
average (`/root/reference/tasks/vocoder/hifigan.py:556-632`):

  * the headline JSON is buffered the moment the single-stream measurement
    lands and is emitted exactly once — at exit, on any exception, or on
    SIGTERM/SIGINT (the driver's `timeout` kill);
  * every optional sweep checks a wall-clock budget (BENCH_BUDGET_S,
    default 420 s) before starting and is skipped, with a note in
    `extra.skipped`, once the budget is spent;
  * `value` is the MEDIAN slope — under tunnel contention a noise-inflated
    t_lo run shrinks one slope and `min` selects exactly that rep (r4's
    min/med/max tail was 0.140/0.694/0.954 ms vs the independently measured
    0.76 ms full-step median in tools/SERVING_PARTS.json, a 5× overclaim);
    min/max stay in `extra.slope_ms` as the environment-noise spread.

Reported:
  value            — production-size single-stream per-chunk ms (median slope)
  extra.capacity   — concurrent-stream sweep: per-chunk ms + aggregate
                     audio-s/s until RTF ≥ 1 → max streams/chip
  extra.fast_mode  — same for serving_precision="fast" (quality evidence:
                     tools/SERVING_LADDER.json)
  extra.trained_composition — same chunk step on the three TRAINED soak
                     checkpoints loaded from the COMMITTED deploy dirs under
                     checkpoints/ (round 5 trains at production geometry, so
                     the trained number IS the production number)

Weights for the headline are random at PRODUCTION sizes: per-chunk device
time depends on shapes, not values.  The trained-weights end-to-end proof
(binarize → train ×3 → compose → convert, with the stream-vs-offline guard
on every item) is the --infer artifact under checkpoints/soak_r5_conan/.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))

# single-emission result buffer: filled in progressively, printed exactly once
RESULT: dict = {
    "metric": "per-chunk end-to-end streaming VC latency (device, slope-measured)",
    "value": None,
    "unit": "ms",
    "vs_baseline": None,
    "extra": {"skipped": []},
}
_EMITTED = False


def emit_once() -> None:
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    print(json.dumps(RESULT), flush=True)


def _on_kill(signum, frame):  # driver timeout → still land the JSON line
    RESULT["extra"]["skipped"].append(f"killed by signal {signum} "
                                      f"after {time.time() - T_START:.0f}s")
    emit_once()
    os._exit(0)


def remaining() -> float:
    return BUDGET_S - (time.time() - T_START)


def _bench_engine(eng, B, rng, **kw):
    """(median, min, max) per-chunk ms — ONE compiled program per (eng, B)
    (conan_tpu/utils/bench_timing.py: lax.scan chunk loop inside a
    traced-trip-count fori_loop, timed at two repetition counts).  The old
    two-scan-lengths variant compiled TWO programs per config — at the
    observed 15 min/compile cold-tunnel cost that is what killed r4's run."""
    from conan_tpu.utils.bench_timing import bench_engine_chunk

    med, lo, hi = bench_engine_chunk(eng, B, rng, **kw)
    return lo, med, hi


def _capacity_sweep(eng, rng, batches, chunk_ms, tag, min_budget_s=60.0):
    """RTF-per-batch-size sweep, budget-aware: each batch size costs two scan
    compiles, so stop (and say so) once the wall budget is spent."""
    rows, max_streams = [], 0
    for B in batches:
        if remaining() < min_budget_s:
            RESULT["extra"]["skipped"].append(
                f"{tag} sweep truncated before B={B} (budget)")
            break
        blo, bmed, bhi = _bench_engine(eng, B, rng, n_meas=2)
        rtf = bmed / chunk_ms
        rows.append({"streams": B, "per_chunk_ms": round(bmed, 3),
                     "per_chunk_ms_min": round(blo, 3),
                     "rtf": round(rtf, 4),
                     "audio_s_per_s": round(B * chunk_ms / bmed, 1)})
        print(f"# {tag} B={B}: {bmed:.3f} ms/chunk (rtf {rtf:.3f}) "
              f"[t={time.time() - T_START:.0f}s]", file=sys.stderr)
        if rtf < 1.0:
            max_streams = B
        else:
            break
    return rows, max_streams


def _trained_engine():
    """Compose the three trained soak checkpoints when they exist.

    Prefers the round-5 PRODUCTION-geometry deploy checkpoints
    (checkpoints/soak_r5_*/deploy — 6-layer emformer / 256-hidden conan /
    512-channel vocoder, the shipped egs sizes), falling back to the round-4
    toy-size chain.  Only COMMITTED deploy dirs (tools/strip_ckpt.py) are
    considered so the trained composition is reproducible from the repo."""
    candidates = (
        ("checkpoints/soak_r5_conan/deploy", "checkpoints/soak_r5_emf/deploy",
         "checkpoints/soak_r5_voc/deploy"),
        ("checkpoints/soak_r4_conan/deploy", "checkpoints/soak_r4_emf/deploy",
         "checkpoints/soak_r4_voc/deploy"),
    )
    for dirs in candidates:
        if not all(os.path.exists(os.path.join(d, "config.yaml")) for d in dirs):
            continue
        try:
            from conan_tpu.infer.build import build_engine

            return dirs, build_engine(*dirs)
        except Exception as e:  # noqa: BLE001
            print(f"# trained composition unavailable: {e!r}", file=sys.stderr)
            return None
    return None


def main() -> None:
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _on_kill)

    from conan_tpu.utils.bench_timing import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    RESULT["extra"]["compile_cache"] = cache_dir

    from conan_tpu.infer.streaming import StreamingConfig, random_engine

    rng = np.random.default_rng(0)
    eng = random_engine(StreamingConfig(), seed=0)
    hop = eng.cfg.mel.hop
    sr = eng.cfg.mel.sample_rate
    chunk_ms = 4 * hop / sr * 1000.0  # 80 ms of audio per chunk

    try:
        # ---- headline: single-stream production-size chunk step ----
        # B=1 slope noise is tunnel-readback jitter (±300 ms) over the rep
        # delta: widen reps_pair (traced trip count — same executable) so the
        # denominator is 64·50 chunks, not 8·50 (r5 smoke saw a -1.4 ms "min"
        # at the default pair), and take the median of 5 slopes.
        lo, med, hi = _bench_engine(eng, 1, rng, reps_pair=(1, 65), n_meas=5)
        per_chunk = med
        RESULT["value"] = round(per_chunk, 3)
        RESULT["vs_baseline"] = round(80.0 / per_chunk, 2)
        RESULT["extra"].update({
            "rtf": round(per_chunk / chunk_ms, 5),
            "audio_seconds_per_s_per_stream": round(chunk_ms / per_chunk, 2),
            "slope_ms": {"min": round(lo, 3), "median": round(med, 3),
                         "max": round(hi, 3)},
            "method": "single compiled program: lax.scan chunk loop inside a "
                      "traced-trip-count fori_loop, timed to a terminal "
                      "readback at two repetition counts; per-chunk = MEDIAN "
                      "slope over 3 measurements (min is biased low under "
                      "tunnel contention; spread in slope_ms)",
            "baseline": "reference ~80 ms/chunk (README.md:29,208, CUDA GPU)",
            "budget_s": BUDGET_S,
        })
        print(f"# single-stream landed at t={time.time() - T_START:.1f}s "
              f"(slope min/med/max = {lo:.3f}/{med:.3f}/{hi:.3f} ms)",
              file=sys.stderr)

        # ---- trained composition (round-5 = production geometry) ----
        found = _trained_engine() if remaining() > 90 else None
        if found is None and remaining() <= 90:
            RESULT["extra"]["skipped"].append("trained_composition (budget)")
        if found is not None:
            dirs, trained = found
            tlo, tmed, thi = _bench_engine(trained, 1, rng,
                                           reps_pair=(1, 65), n_meas=5)
            c = trained.cfg
            RESULT["extra"]["trained_composition"] = {
                "checkpoints": list(dirs),
                "sizes": {"emformer_layers": c.emformer.num_layers,
                          "conan_hidden": c.conan.hidden_size,
                          "voc_channels": c.vocoder.upsample_initial_channel},
                "production_geometry": bool(
                    c.emformer.num_layers == eng.cfg.emformer.num_layers
                    and c.conan.hidden_size == eng.cfg.conan.hidden_size
                    and c.vocoder.upsample_initial_channel
                    == eng.cfg.vocoder.upsample_initial_channel),
                "per_chunk_ms": round(tmed, 3),
                "slope_ms": {"min": round(tlo, 3), "median": round(tmed, 3),
                             "max": round(thi, 3)},
                "rtf": round(tmed / chunk_ms, 5),
            }
            print(f"# trained composition {tmed:.3f} ms/chunk "
                  f"[t={time.time() - T_START:.0f}s]", file=sys.stderr)

        # ---- exact-mode serving capacity: streams/chip until RTF >= 1 ----
        # capped at 512: B=1024 exact reproducibly CRASHES the TPU worker
        # (3 observed; tools/SERVING_LADDER.json carries the evidence that
        # 1024 is past RTF 1 regardless — pre-packing measurement rtf 1.41)
        capacity, max_streams = _capacity_sweep(
            eng, rng, (64, 256, 512), chunk_ms, "exact")
        RESULT["extra"]["capacity"] = capacity
        RESULT["extra"]["max_streams_per_chip_rtf_lt_1"] = max_streams
        RESULT["extra"]["capacity_note"] = (
            "exact sweep capped at 512 (B=1024 crashes the TPU worker; its "
            "rtf is >1 by tools/SERVING_LADDER.json evidence)")

        # ---- fast mode: bracket the knee (capped at 2048 — 4096 crashed) ----
        if remaining() > 90:
            fast_eng = random_engine(StreamingConfig(), seed=0,
                                     serving_precision="fast")
            fast_capacity, fast_max = _capacity_sweep(
                fast_eng, rng, (1024, 2048), chunk_ms, "fast")
            RESULT["extra"]["fast_mode"] = {
                "serving_precision": "fast (emformer HIGHEST, conan+vocoder bf16)",
                "capacity": fast_capacity,
                "max_streams_per_chip_rtf_lt_1": fast_max,
            }
        else:
            RESULT["extra"]["skipped"].append("fast_mode sweep (budget)")
    except Exception as e:  # noqa: BLE001 — the JSON line must still land
        RESULT["extra"]["skipped"].append(f"aborted by {type(e).__name__}: {e}")
        import traceback

        traceback.print_exc(file=sys.stderr)
    finally:
        emit_once()


if __name__ == "__main__":
    main()
