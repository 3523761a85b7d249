"""Tail-stage conv formulation shoot-out (vocoder serving attack, VERDICT r4
next #4).

tools/VOC_CEILING.json shows the exact-mode vocoder chunk step is owned by
upsample stages 3-4 (C=64/32): 8.0 of 11.2 ms at B=64, running at 23-31% of
the 6-pass-emulation ceiling while stages 1-2 (C>=128) run at ~86%.  The
output-channel count is below the 128-lane MXU width, so XLA's conv lowering
wastes 50-75% of every tile.

Candidate formulations, all numerically equal to the causal dilated conv
(validated against ops.causal_conv1d before timing):

  lax       — current lowering (ops/conv.py conv1d → conv_general_dilated)
  framed    — unfold k taps into lanes: [B,T,k·C] @ [k·C, C]
  packed    — space-to-depth by p=128//C: [B,T/p,p·C] @ block-Toeplitz
              [kp·p·C, p·C]; fills all 128 lanes at kp/k·p FLOP overhead
  block3    — three independent C→C convs (the 3 parallel resblocks) merged
              block-diagonally into one [B,T,3C] @ [k·3C, 3C] conv
              (ops/grouped_conv.py trick); reported per single conv

Writes tools/TAIL_CONV.json.  Usage: python tools/bench_tail_conv.py
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def unfold_taps(x, k: int, d: int):
    """[B,T,C] → [B,T,k·C]: tap j (oldest first) at output t is input
    t-(k-1-j)·d, causally left-padded."""
    import jax.numpy as jnp

    left = (k - 1) * d
    xp = jnp.pad(x, ((0, 0), (left, 0), (0, 0)))
    T = x.shape[1]
    return jnp.concatenate([xp[:, j * d:j * d + T] for j in range(k)], axis=-1)


def framed_weight(w):
    """w [Cout, Cin, k] → [k·Cin, Cout] matching unfold_taps tap order."""
    import jax.numpy as jnp

    k = w.shape[-1]
    return jnp.concatenate([w[:, :, j].T for j in range(k)], axis=0)


def packed_weight(w, d: int, p: int):
    """Block-Toeplitz weight for space-to-depth factor p.

    Output packed frame m, slot b, channel o reads input global index
    u = m·p + b - (k-1-j)·d → packed frame m - f (f ≥ 0), slot u mod p.
    Returns (Wp [kp·p·Cin, p·Cout], kp)."""
    Cout, Cin, k = w.shape
    max_back = (k - 1) * d  # largest lookback in global samples
    kp = (max_back + p - 1) // p + 1
    Wp = np.zeros((kp, p * Cin, p * Cout), np.float32)
    for b in range(p):
        for j in range(k):
            back = (k - 1 - j) * d
            u = b - back  # relative global index within frame m (can be <0)
            f = (-u + p - 1) // p if u < 0 else 0
            slot = (u + f * p) % p
            fr = kp - 1 - f  # frame order oldest-first like unfold_taps
            Wp[fr, slot * Cin:(slot + 1) * Cin, b * Cout:(b + 1) * Cout] += \
                np.asarray(w[:, :, j]).T
    return Wp.reshape(kp * p * Cin, p * Cout), kp


def main():
    from conan_tpu.utils.bench_timing import (enable_persistent_cache,
                                              make_scan_runner, scan_slope)

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from conan_tpu import ops
    from conan_tpu.ops.precision import get_precision, precision_scope

    rng = np.random.default_rng(0)
    B, N_CHUNKS = 64, 20
    results = []

    def timeit(name, prec, step_fn, params, state, chunks, flops_per_chunk,
               eff_div):
        with precision_scope(prec):
            runner = make_scan_runner(step_fn)
            med, lo, hi = scan_slope(runner, params, state, chunks,
                                     reps_pair=(1, 5), n_meas=3)
        tfs = flops_per_chunk / (med * 1e-3) / 1e12
        r = {"variant": name, "precision": prec, "ms": round(med, 4),
             "tflops_per_s": round(tfs, 2),
             "pct_ceiling": round(100 * tfs / (197.0 / eff_div), 1)}
        results.append(r)
        print(json.dumps(r), flush=True)

    for (C, T), k, d in itertools.product(((64, 640), (32, 1280)),
                                          (7,), (1, 3)):
        w = (rng.standard_normal((C, C, k)).astype(np.float32) / (k * C))
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        wj = jnp.asarray(w)
        flops = 2 * k * C * C * T * B

        # --- numerics cross-check (f32, CPU-grade tolerance) ---
        y_ref = ops.causal_conv1d(x, wj, dilation=d)
        y_framed = jnp.matmul(unfold_taps(x, k, d), framed_weight(wj),
                              precision="highest")
        np.testing.assert_allclose(np.asarray(y_framed), np.asarray(y_ref),
                                   atol=2e-5, rtol=1e-4)
        p = 128 // C
        Wp, kp = packed_weight(wj, d, p)
        xp = x.reshape(B, T // p, p * C)
        yp = jnp.matmul(unfold_taps(xp, kp, 1), jnp.asarray(Wp),
                        precision="highest")
        np.testing.assert_allclose(np.asarray(yp.reshape(B, T, C)),
                                   np.asarray(y_ref), atol=2e-5, rtol=1e-4)
        print(f"# C={C} T={T} k={k} d={d}: numerics OK (p={p}, kp={kp}, "
              f"flop_mult={kp * p / k:.2f})", file=sys.stderr)

        tag = f"C{C}_T{T}_k{k}_d{d}"
        chunks = jnp.zeros((N_CHUNKS, 1))  # dummy scan inputs; state carries x

        def lax_step(params, s, _c):
            y = ops.causal_conv1d(s, params["w"], dilation=params_d)
            return y, jnp.sum(y[:, -1, -1])

        # close over d via a static python var per iteration
        params_d = d
        for prec, div in (("highest", 6), ("default", 1)):
            timeit(f"{tag}/lax", prec, lax_step, {"w": wj}, x, chunks,
                   flops, div)

        def framed_step(params, s, _c):
            y = jnp.matmul(unfold_taps(s, params_k, params_d), params["wf"],
                           precision=get_precision())
            return y, jnp.sum(y[:, -1, -1])

        params_k = k
        for prec, div in (("highest", 6), ("default", 1)):
            timeit(f"{tag}/framed", prec, framed_step, {"wf": framed_weight(wj)},
                   x, chunks, flops, div)

        def packed_step(params, s, _c):
            y = jnp.matmul(unfold_taps(s, params_kp, 1), params["wp"],
                           precision=get_precision())
            return y, jnp.sum(y[:, -1, -1])

        params_kp = kp
        xpj = jnp.asarray(np.asarray(xp))
        for prec, div in (("highest", 6), ("default", 1)):
            timeit(f"{tag}/packed_p{p}", prec, packed_step,
                   {"wp": jnp.asarray(Wp)}, xpj, chunks, flops, div)

        # block3: three C→C convs merged block-diagonally (per-conv cost = /3)
        w3 = np.zeros((k * 3 * C, 3 * C), np.float32)
        fw = np.asarray(framed_weight(wj))  # [kC, C]
        for g in range(3):
            for j in range(k):
                w3[j * 3 * C + g * C:j * 3 * C + (g + 1) * C,
                   g * C:(g + 1) * C] = fw[j * C:(j + 1) * C]
        x3 = jnp.concatenate([x, x, x], axis=-1)

        def block3_step(params, s, _c):
            y = jnp.matmul(unfold_taps(s, params_k, params_d), params["w3"],
                           precision=get_precision())
            return y, jnp.sum(y[:, -1, -1])

        y3 = np.asarray(jnp.matmul(unfold_taps(x3, k, d), jnp.asarray(w3),
                                   precision="highest"))
        np.testing.assert_allclose(y3[..., :C], np.asarray(y_ref),
                                   atol=2e-5, rtol=1e-4)
        for prec, div in (("highest", 6),):
            with precision_scope(prec):
                runner = make_scan_runner(block3_step)
                med, lo, hi = scan_slope(runner, {"w3": jnp.asarray(w3)}, x3,
                                         chunks, reps_pair=(1, 5), n_meas=3)
            med3 = med / 3.0
            tfs = flops / (med3 * 1e-3) / 1e12
            r = {"variant": f"{tag}/block3_perconv", "precision": prec,
                 "ms": round(med3, 4), "tflops_per_s": round(tfs, 2),
                 "pct_ceiling": round(100 * tfs / (197.0 / div), 1)}
            results.append(r)
            print(json.dumps(r), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "TAIL_CONV.json")
    json.dump(results, open(path, "w"), indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
