"""Vocoder micro-harness: per-chunk latency + incremental-consistency check.

Runnable parity with the reference's embedded harnesses:
  * 50-run single-chunk latency benchmark (`tasks/vocoder/hifigan.py:556-632`)
  * incremental prefix-growing synthesis allclose check
    (`tasks/vocoder/hifigan.py:277-444`)

    python -m conan_tpu.infer.bench_vocoder [--ckpt_dir DIR] [--chunks N]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default="", help="vocoder checkpoint dir (random init if empty)")
    ap.add_argument("--chunks", type=int, default=50)
    ap.add_argument("--chunk_frames", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from conan_tpu.models.vocoder.hifigan import HifiGanConfig, HifiGanGenerator

    if args.ckpt_dir:
        from conan_tpu.config import HParams, load_config
        from conan_tpu.train.checkpoint import load_ckpt_state

        hp = HParams(load_config(f"{args.ckpt_dir}/config.yaml"))
        cfg = HifiGanConfig.from_hparams(hp)
        gen = HifiGanGenerator(cfg)
        params = jax.tree.map(jnp.asarray, load_ckpt_state(args.ckpt_dir, "params_g"))
    else:
        cfg = HifiGanConfig()
        gen = HifiGanGenerator(cfg)
        params = jax.jit(gen.init)(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    cf = args.chunk_frames
    T = args.chunks * cf
    mel = jnp.asarray(rng.standard_normal((1, T, cfg.num_mels)).astype(np.float32))

    # ---- 50-run single-chunk latency FIRST: any device-to-host readback
    # (even float(scalar)) flips this container's axon tunnel into a ~40 ms
    # synchronous-dispatch mode for the rest of the process, so measure
    # before reading anything back (see CLAUDE.md)
    step = jax.jit(gen.step)
    state = gen.init_state(1)
    y, state = step(params, state, mel[:, :cf])
    y.block_until_ready()
    lat = []
    for i in range(args.chunks):
        s = (i % (args.chunks - 1)) * cf
        t0 = time.perf_counter()
        y, state = step(params, state, mel[:, s:s + cf])
        y.block_until_ready()
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat[3:])
    chunk_ms = cf * 320 / 16000 * 1e3
    print(f"vocoder single-chunk ({cf} frames = {chunk_ms:.0f} ms audio): "
          f"p50 {np.percentile(lat, 50):.3f} ms, mean {lat.mean():.3f} ms, "
          f"RTF {np.percentile(lat, 50) / chunk_ms:.4f}")

    # ---- incremental consistency: two different chunkings must agree
    # (equivalent to the reference's prefix-growing allclose check but without
    # an offline full-utterance compile, which is slow through the remote
    # tunnel; offline==streaming is covered by the test suite)
    state = gen.init_state(1)
    outs = []
    for s in range(0, T, cf):
        y, state = step(params, state, mel[:, s:s + cf])
        outs.append(y)
    y_a = jnp.concatenate(outs, axis=1)
    step2 = jax.jit(gen.step)
    state = gen.init_state(1)
    outs2 = []
    for s in range(0, T, 2 * cf):
        y, state = step2(params, state, mel[:, s:s + 2 * cf])
        outs2.append(y)
    y_b = jnp.concatenate(outs2, axis=1)
    diff = float(jnp.max(jnp.abs(y_a - y_b)))
    print(f"incremental-consistency ({cf} vs {2*cf} frame chunks) "
          f"max|diff| = {diff:.3e} ({'OK' if diff < 1e-4 else 'FAIL'})")


if __name__ == "__main__":
    main()
