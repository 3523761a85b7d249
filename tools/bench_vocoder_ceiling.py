"""Serving-vocoder ceiling analysis (VERDICT r4 next #4: the vocoder is 94%
of the exact-mode chunk step at B=64 — attack it or prove the ceiling).

Measures the ISOLATED vocoder chunk step (4 mel frames → 1280 samples,
carried causal-conv state — `models/vocoder/hifigan.py step`, reference
`hifigan_causal.py:269-341`) with the single-compile slope timer:

  * precision rungs highest / high / default at B=1 and B=64 — exact-mode
    serving runs the vocoder at HIGHEST (6-pass bf16 f32-emulation, peak
    197/6 ≈ 33 TF/s on v5e); the ladder shows how much of the 11.2 ms B=64
    step is emulation cost vs structure
  * weight-norm pre-folding (ops/conv.py fold_weight_norm) — removes the
    per-step g·v/||v|| recompose sweeps over all generator weights
  * cumulative stage ablation (conv_pre+stage1, +stage2, ...) at HIGHEST —
    which upsample stage owns the time; each stage's analytic FLOPs give
    its distance from the emulation ceiling

Writes tools/VOC_CEILING.json.  Usage: python tools/bench_vocoder_ceiling.py
[--batches 1,64] [--skip-stages]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()
V5E_BF16_TFLOPS = 197.0


def analytic_chunk_flops(cfg) -> float:
    """FLOPs of one 4-frame chunk through the generator (2·k·Cin·Cout·T per
    conv; resblock = 2 convs per dilation)."""
    T = 4
    ch = cfg.upsample_initial_channel
    fl = 2 * 7 * cfg.num_mels * ch * T  # conv_pre
    cin = ch
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cout = ch // (2 ** (i + 1))
        fl += 2 * k * cin * cout * u * T  # shuffle conv (out = cout*u, pre-shuffle T)
        T *= u
        for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            fl += 2 * rk * cout * cout * T * 2 * len(rd)
        cin = cout
    fl += 2 * 7 * cin * 1 * T  # conv_post
    return float(fl)


def _slope_vocoder(gen, params, B, rng, n_chunks=50, n_meas=3):
    import jax.numpy as jnp

    from conan_tpu.utils.bench_timing import make_scan_runner, scan_slope

    chunks = jnp.asarray(rng.standard_normal(
        (n_chunks, B, 4, gen.cfg.num_mels)).astype(np.float32) * 0.5)

    def step(p, st, c):
        wav, st2 = gen.step(p, st, c)
        return st2, jnp.sum(wav)

    runner = make_scan_runner(step)
    return scan_slope(runner, params, gen.init_state(B), chunks, n_meas=n_meas)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,64")
    ap.add_argument("--skip-stages", action="store_true")
    ap.add_argument("--budget", type=float, default=2400.0)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from conan_tpu.utils.bench_timing import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from conan_tpu.models.vocoder.hifigan import HifiGanConfig, HifiGanGenerator
    from conan_tpu.ops.conv import fold_weight_norm
    from conan_tpu.ops.precision import precision_scope

    rng = np.random.default_rng(0)
    cfg = HifiGanConfig()
    gen = HifiGanGenerator(cfg)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0))
    flops = analytic_chunk_flops(cfg)
    rows = []

    def record(name, prec, B, med, lo, hi, fl=flops, note=None):
        eff_peak = {"highest": V5E_BF16_TFLOPS / 6,
                    "high": V5E_BF16_TFLOPS / 3,
                    "default": V5E_BF16_TFLOPS}[prec]
        tfs = fl * B / (med * 1e-3) / 1e12
        r = {"variant": name, "precision": prec, "streams": B,
             "per_chunk_ms": round(med, 4),
             "per_chunk_ms_min": round(lo, 4), "per_chunk_ms_max": round(hi, 4),
             "gflops_per_chunk_per_stream": round(fl / 1e9, 3),
             "tflops_per_s": round(tfs, 2),
             "pct_of_emulation_ceiling": round(100 * tfs / eff_peak, 1)}
        if note:
            r["note"] = note
        rows.append(r)
        print(json.dumps(r), flush=True)

    # ---- precision rungs + weight-norm folding ----
    folded = fold_weight_norm(params)
    for B in batches:
        for prec in ("highest", "high", "default"):
            if time.time() - T0 > args.budget:
                break
            with precision_scope(prec):
                med, lo, hi = _slope_vocoder(gen, params, B, rng)
            record("full", prec, B, med, lo, hi)
        if time.time() - T0 < args.budget:
            with precision_scope("highest"):
                med, lo, hi = _slope_vocoder(gen, folded, B, rng)
            record("full_folded_wn", "highest", B, med, lo, hi,
                   note="weight-norm pre-folded at load (ops/conv.py)")

    # ---- cumulative stage ablation at HIGHEST, B=64 ----
    if not args.skip_stages:
        prev_ms = 0.0
        for n_stages in range(1, len(cfg.upsample_rates) + 1):
            if time.time() - T0 > args.budget:
                break
            sub = dataclasses.replace(
                cfg,
                upsample_rates=cfg.upsample_rates[:n_stages],
                upsample_kernel_sizes=cfg.upsample_kernel_sizes[:n_stages])
            sgen = HifiGanGenerator(sub)
            sparams = jax.jit(sgen.init)(jax.random.PRNGKey(0))
            sfl = analytic_chunk_flops(sub)
            with precision_scope("highest"):
                med, lo, hi = _slope_vocoder(sgen, sparams, 64, rng)
            record(f"stages_1..{n_stages}", "highest", 64, med, lo, hi, fl=sfl,
                   note=f"marginal vs previous: {med - prev_ms:.3f} ms")
            prev_ms = med

    out = {"setup": "isolated vocoder chunk step (4 frames -> 1280 samples), "
                    "production 512-ch shuffle generator, slope-timed "
                    "(single-compile runner)",
           "v5e_bf16_peak_tflops": V5E_BF16_TFLOPS,
           "emulation_peaks": {"highest": "peak/6 (6-pass bf16)",
                               "high": "peak/3", "default": "peak"},
           "rows": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "VOC_CEILING.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
