"""Shared TPU benchmarking utilities: persistent compile cache + the
single-compile slope timer for the streaming chunk step.

Why these exist (CLAUDE.md measurement notes):

* The axon remote-compile tunnel costs 30 s – 15 min PER XLA PROGRAM on a
  cold process, and `jax.block_until_ready` does not actually block through
  the tunnel, so (a) every extra compiled shape is wall-clock poison and
  (b) naive host timing reads dispatch time only.  The persistent
  compilation cache (cross-process, keyed on program+options) turns repeat
  runs of bench/tools/trainers into seconds.

* The honest per-chunk number is an ON-DEVICE slope.  ``chunk_slope`` uses
  ONE compiled program per (engine, batch) config: the chunk loop is a
  ``lax.scan`` wrapped in a ``lax.fori_loop`` whose trip count is a TRACED
  scalar, so timing at two repetition counts needs no second compile (the
  old two-scan-lengths variant compiled two programs — 2× the dominant
  cost).  The wav output is folded into the carry as a sum so XLA cannot
  dead-code-eliminate the vocoder.
"""

from __future__ import annotations

import os
import statistics
import time


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (cross-process).

    Verified against the axon tunnel in this container: a 53 s cold matmul
    compile becomes 2.4 s in the next process.  Default location is
    ``.jax_cache/`` at the repo root (gitignored) so the end-of-round driver
    invocation of bench.py hits the warm cache; override with
    ``CONAN_TPU_COMPILE_CACHE``.  Returns the cache dir (None on failure)."""
    path = path or os.environ.get(
        "CONAN_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        import jax
        from jax.experimental.compilation_cache import compilation_cache

        # scope by backend: entries AOT-compiled for one platform (or via the
        # remote tunnel's compile machine) must not be loaded by another —
        # observed XLA:CPU feature-mismatch warnings ("could lead to SIGILL")
        # when a mixed dir was shared between CPU test runs and axon runs
        path = f"{path}-{jax.default_backend()}"
        os.makedirs(path, exist_ok=True)
        compilation_cache.set_cache_dir(path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except Exception:  # noqa: BLE001 — cache is an accelerator, never a blocker
        return None


def make_scan_runner(step_fn):
    """ONE jitted program for an arbitrary chunk step.

    ``step_fn(params, state, chunk) -> (state', out)`` is scanned over a
    [N, ...] chunk stack inside a traced-trip-count fori_loop; the summed
    outputs keep the whole computation live (no DCE).  Params are explicit
    jit arguments (CLAUDE.md: closing over pytrees bakes weights in as
    compile-time constants)."""
    import jax
    import jax.numpy as jnp

    def run(params, state, chunks, reps):
        def body(_, carry):
            st, acc = carry
            st2, outs = jax.lax.scan(lambda s, c: step_fn(params, s, c),
                                     st, chunks)
            return (st2, acc + jnp.sum(outs))

        _st, acc = jax.lax.fori_loop(0, reps, body, (state, jnp.float32(0.0)))
        return acc

    return jax.jit(run)


def scan_slope(runner, params, state, chunks, reps_pair=(1, 9), n_meas=3):
    """Time a ``make_scan_runner`` program: per-chunk device ms as the median
    slope between two repetition counts (single executable)."""
    import jax as _jax

    n_chunks = _jax.tree_util.tree_leaves(chunks)[0].shape[0]
    lo_r, hi_r = reps_pair
    float(runner(params, state, chunks, lo_r))  # compile
    slopes = []
    for _ in range(n_meas):
        ts = {}
        for reps in (lo_r, hi_r):
            t0 = time.perf_counter()
            acc = runner(params, state, chunks, reps)
            float(acc)
            ts[reps] = time.perf_counter() - t0
        slopes.append((ts[hi_r] - ts[lo_r]) / ((hi_r - lo_r) * n_chunks) * 1e3)
    return (float(statistics.median(slopes)), float(min(slopes)),
            float(max(slopes)))


def make_chunk_runner(eng):
    """ONE jitted program: run the engine's chunk scan ``reps`` times (traced
    trip count) and return a scalar that depends on every wav sample."""
    import jax
    import jax.numpy as jnp

    def run(params, state, mel_chunks, noise_chunks, style, reps):
        def body(_, carry):
            st, acc = carry

            def step(s, c):
                w, _cd, s2 = eng._chunk_step(params, s, c[0], style, c[1])
                return s2, jnp.sum(w)

            st2, wsums = jax.lax.scan(step, st, (mel_chunks, noise_chunks))
            return (st2, acc + jnp.sum(wsums))

        _st, acc = jax.lax.fori_loop(0, reps, body, (state, jnp.float32(0.0)))
        return acc

    return jax.jit(run)


def chunk_slope(eng, style, mel, B, n_chunks: int = 50,
                reps_pair: tuple[int, int] = (1, 9), n_meas: int = 3):
    """Per-chunk device ms for the engine's fused step at batch ``B``.

    ``mel`` is [B, >=199*4+6, 80]; returns (median, min, max) over
    ``n_meas`` slope measurements.  The median is the headline — under
    tunnel contention a noise-inflated low-rep run shrinks one slope and
    ``min`` selects exactly that rep (the r4 5× overclaim)."""
    import jax.numpy as jnp

    idx_max = (mel.shape[1] - 6) // 4
    mel_chunks = jnp.stack([mel[:, (i % idx_max) * 4:(i % idx_max) * 4 + 6]
                            for i in range(n_chunks)])
    noise_chunks = jnp.zeros((n_chunks, B, eng.cfg.seg, 1))
    runner = make_chunk_runner(eng)
    lo_r, hi_r = reps_pair
    # compile once (reps is traced — both rep counts share the executable)
    st = eng.init_state(B)
    float(runner(eng._params, st, mel_chunks, noise_chunks, style, lo_r))
    slopes = []
    for _ in range(n_meas):
        ts = {}
        for reps in (lo_r, hi_r):
            st = eng.init_state(B)
            t0 = time.perf_counter()
            acc = runner(eng._params, st, mel_chunks, noise_chunks, style, reps)
            float(acc)  # readback = hard sync through the tunnel
            ts[reps] = time.perf_counter() - t0
        slopes.append((ts[hi_r] - ts[lo_r]) / ((hi_r - lo_r) * n_chunks) * 1e3)
    return (float(statistics.median(slopes)), float(min(slopes)),
            float(max(slopes)))


def bench_engine_chunk(eng, B: int, rng, **kw):
    """Random-input wrapper: build style/mel at batch ``B`` and measure."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    ref_mel = jnp.asarray(rng.standard_normal((1, 250, 80)).astype(np.float32) * 0.5)
    style = eng._prepare(ref_mel)
    mel = jnp.asarray(rng.standard_normal((1, 802, 80)).astype(np.float32) * 0.5)
    if B > 1:
        style = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape[1:]),
                             style)
        mel = jnp.broadcast_to(mel, (B,) + mel.shape[1:])
    return chunk_slope(eng, style, mel, B, **kw)
