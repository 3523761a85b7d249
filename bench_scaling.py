"""Data-parallel scaling evidence (VERDICT r1 weak #2).

Real multi-chip hardware is not reachable from this container (one v5e chip
behind a tunnel; the virtual mesh is 8 XLA CPU devices sharing 4 host cores),
so "throughput vs devices" cannot be measured directly in any honest way:
weak scaling on shared cores is bounded by core count, not by the program.
This script therefore produces two things that ARE meaningful:

1. **SPMD overhead at fixed global work (CPU mesh).** The same global batch
   is partitioned over 1/2/4/8 virtual devices.  Total FLOPs and total cores
   are constant, so the ideal is a FLAT step time; any rise is the cost of
   sharding + psum collectives + per-device executable overhead.  This
   validates that the compiled SPMD program itself scales (the collective
   graph is identical to the multi-chip TPU one — only the transport
   differs).

2. **Analytic ICI projection for real v5e DP.**  DP efficiency is
   T_compute / (T_compute + T_allreduce) with T_allreduce = 2·S·(n-1)/n / W
   for S gradient bytes over per-chip ICI bandwidth W (reduce-scatter +
   all-gather decomposition; "How to Scale Your Model" recipe).  T_compute
   comes from BENCH_TRAIN.json (slope-measured on the real chip), S from the
   actual parameter pytrees.  XLA overlaps the all-reduce with the backward
   pass, so the non-overlapped figure reported here is a LOWER bound.
   v5e: 4 ICI links/chip in a 2D torus; W ≈ 180 GB/s aggregate per chip
   (public spec 1600 Gbps); cross-host inside a pod slice still rides ICI,
   so the 2-host ≥90% BASELINE target is assessed with the same formula.

Writes SCALING.json; prints one JSON line per section.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from conan_tpu.parallel import make_mesh, replicate, shard_batch, shard_train_step  # noqa: E402

V5E_ICI_BYTES_PER_S = 180e9  # aggregate per-chip ICI (4 links, 2D torus)


def _conan_task():
    from conan_tpu.train.tasks import ConanTask

    hp = {
        "hidden_size": 128, "kernel_size": 3, "audio_num_mel_bins": 80,
        "content_embedding_dim": 102, "silent_token": 57, "style": True,
        "nVQ": 128, "vae_dropout": 0.0, "lambda_commit": 0.25, "f0_gen": "orig",
        "predictor_kernel": 5, "predictor_grad": 1.0, "lambda_f0": 1.0,
        "lambda_uv": 1.0, "dec_dilations": [1, 1, 1, 1], "dec_kernel_size": 5,
        "dec_post_net_kernel": 3, "layers_in_block": 2, "dropout": 0.0,
        "lr": 5e-4, "scheduler": "warmup", "warmup_updates": 4000,
        "optimizer_adam_beta1": 0.9, "optimizer_adam_beta2": 0.98,
        "weight_decay": 0.0, "clip_grad_norm": 1.0, "disc_lr": 1e-4,
        "disc_win_num": 3, "mel_disc_hidden_size": 64, "disc_start_steps": 0,
        "vq_start": -1, "forcing": 1, "random_speaker_steps": 100000,
        "lambda_mel_adv": 0.05, "mel_losses": "l1:0.5|ssim:0.5",
        "discriminator_scheduler_params": {"step_size": 40000, "gamma": 0.5},
        "discriminator_optimizer_params": {"eps": 1e-6, "weight_decay": 0.0},
    }
    return ConanTask(hp)


def _p50(fn, n=10):
    fn()  # warm
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50))


def fixed_work_curve():
    """Same global batch partitioned over growing device counts: ideal flat."""
    task = _conan_task()
    state0 = task.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, T, Tr = 8, 300, 160
    batch_np = {
        "content": rng.integers(0, 100, (B, T)),
        "mels": (rng.standard_normal((B, T, 80)) * 0.5).astype(np.float32),
        "ref_mels": (rng.standard_normal((B, Tr, 80)) * 0.5).astype(np.float32),
        "f0": (rng.standard_normal((B, T)) * 0.5 + 7.5).astype(np.float32),
        "uv": (rng.random((B, T)) < 0.25).astype(np.float32),
    }
    points = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        step = shard_train_step(task.train_step, mesh)
        state = replicate(state0, mesh)
        batch = shard_batch(batch_np, mesh)
        srng = replicate(jax.random.PRNGKey(1), mesh)

        def run():
            out = step(state, batch, srng)
            jax.block_until_ready(out[0])

        t = _p50(run)
        points.append(dict(devices=n, global_batch=B, p50_s=round(t, 4)))
        print(f"# fixed-work {n} dev: {t*1e3:.1f} ms/step", file=sys.stderr)
    base = points[0]["p50_s"]
    for p in points:
        # ideal = 1.0 (same FLOPs, same 4 cores); >1 is SPMD/collective cost
        p["overhead_vs_1dev"] = round(p["p50_s"] / base, 3)
    return dict(curve="conan_gan_fixed_global_work",
                note="constant FLOPs on constant cores; ideal flat — "
                     "overhead_vs_1dev isolates sharding+psum cost",
                global_batch=B, frames=T, points=points)


def serving_fixed_streams_curve():
    """8 concurrent VC streams sharded over 1/2/4/8 devices: ideal flat."""
    from conan_tpu.infer.streaming import StreamingConfig, random_engine
    from conan_tpu.models.conan.model import ConanConfig
    from conan_tpu.models.emformer import EmformerConfig
    from conan_tpu.models.vocoder.hifigan import HifiGanConfig

    cfg = StreamingConfig(
        emformer=EmformerConfig(input_dim=80, num_heads=8, ffn_dim=256,
                                num_layers=2, segment_length=4,
                                left_context_length=50, right_context_length=2,
                                output_dim=100),
        conan=ConanConfig(hidden_size=128),
        vocoder=HifiGanConfig(upsample_initial_channel=128))
    rng = np.random.default_rng(0)
    S = 8  # total streams, fixed
    points = []
    for n in (1, 2, 4, 8):
        eng = random_engine(cfg, seed=0)
        mesh = make_mesh(n)
        eng.shard_streams(mesh)
        ref_mel = jnp.asarray(rng.standard_normal((S, 120, 80)).astype(np.float32) * 0.5)
        style = eng._prepare(ref_mel)
        state = eng.init_state(S)
        chunk = jnp.asarray(rng.standard_normal((S, 6, 80)).astype(np.float32) * 0.5)

        def run():
            nonlocal state
            wav, _, state = eng._step(state, chunk, style)
            jax.block_until_ready(wav)

        t = _p50(run, n=15)
        points.append(dict(devices=n, streams=S, p50_ms=round(t * 1e3, 2)))
        print(f"# serving {S} streams/{n} dev: {t*1e3:.1f} ms/chunk", file=sys.stderr)
    base = points[0]["p50_ms"]
    for p in points:
        p["overhead_vs_1dev"] = round(p["p50_ms"] / base, 3)
    return dict(curve="serving_8streams_fixed_work",
                note="8 streams on shared cores; ideal flat — serving has NO "
                     "collectives (streams are independent), so any rise is "
                     "per-device dispatch overhead only",
                points=points)


def _tree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
               if hasattr(x, "size"))


def analytic_ici_projection():
    """Projected real-v5e DP efficiency from measured step times + grad bytes.

    Gradients are fp32 (HIGHEST policy) / bf16-computed-fp32-accumulated;
    all-reduce moves 2·S·(n-1)/n bytes per chip over W = 180 GB/s.
    """
    rows = []
    # production param byte counts, measured from the real task states
    from conan_tpu.config import load_config
    from conan_tpu.train.tasks import ConanTask, EmformerTask, VocoderTask

    specs = [
        ("vocoder_gan", VocoderTask, "egs/hifigan_shuffle.yaml",
         ("params_g", "params_d")),
        ("conan_gan", ConanTask, "egs/conan_emformer.yaml",
         ("params_g", "params_d")),
        ("emformer_distill", EmformerTask, "egs/emformer.yaml", ("params",)),
    ]
    bench = {}
    if os.path.exists("BENCH_TRAIN.json"):
        with open("BENCH_TRAIN.json") as f:
            for r in json.load(f)["results"]:
                # shipped precision is bf16 ('default') for all four configs
                # (CLAUDE.md precision policy); prefer it, fall back to any
                if r["precision"] == "default" or r["task"] not in bench:
                    bench[r["task"]] = r
    for name, cls, cfg_path, param_keys in specs:
        hp = load_config(cfg_path)
        task = cls(hp)
        state = task.init_state(jax.random.PRNGKey(0))
        grad_bytes = sum(_tree_bytes(state[k]) for k in param_keys)
        row = dict(task=name, grad_mb=round(grad_bytes / 1e6, 1))
        meas = bench.get(name)
        if meas and meas.get("ms_per_step"):
            t_step = meas["ms_per_step"] / 1e3
            row["measured_ms_per_step_1chip"] = meas["ms_per_step"]
            for n in (2, 4, 8, 16):
                t_ar = 2 * grad_bytes * (n - 1) / n / V5E_ICI_BYTES_PER_S
                row[f"efficiency_{n}chips_no_overlap"] = round(
                    t_step / (t_step + t_ar), 4)
            row["note"] = ("lower bound: XLA overlaps the psum with the "
                           "backward pass; 2 hosts in one v5e pod slice "
                           "still ride ICI so 16-chip ≈ 2-host")
        rows.append(row)
        del state, task
    return dict(section="analytic_v5e_dp_projection",
                ici_bytes_per_s=V5E_ICI_BYTES_PER_S, rows=rows)


def main():
    from conan_tpu.utils.bench_timing import enable_persistent_cache

    enable_persistent_cache()
    if "--projection-only" in sys.argv and os.path.exists("SCALING.json"):
        with open("SCALING.json") as f:
            out = json.load(f)
        out["projection"] = analytic_ici_projection()
    else:
        out = {
            "environment": "4 host cores, 8 virtual XLA CPU devices; one real "
                           "v5e chip behind a tunnel (no multi-chip hardware). "
                           "Curve points beyond 4 devices oversubscribe the 4 "
                           "physical cores — that thrash has no TPU analog.",
            "curves": [fixed_work_curve(), serving_fixed_streams_curve()],
            "projection": analytic_ici_projection(),
        }
        for c in out["curves"]:
            print(json.dumps(c))
    print(json.dumps(out["projection"]))
    with open("SCALING.json", "w") as f:
        json.dump(out, f, indent=1)
    print("# wrote SCALING.json", file=sys.stderr)


if __name__ == "__main__":
    main()
