"""Decompose GAN train-step time into its parts (slope-timed on device).

Each ablation is a REAL train step whose loss omits some terms; XLA dead-code
eliminates everything not on the loss/grad path, so the timing difference
between two variants isolates the omitted component (generator backward,
discriminator passes, STFT losses, ...).  State evolves every iteration, so
the while-loop cannot hoist the computation (same guarantee as bench_train).

Usage:  python tools/bench_decompose.py [vocoder|conan|emformer] ...
Writes/merges tools/DECOMPOSE.json and prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_train import _time_steps  # noqa: E402  (slope-method timer)


def _mask_losses(task_cls, keep):
    """Subclass overriding loss dicts to keep only `keep` keys."""

    class Masked(task_cls):
        def _gen_losses(self, *a, **kw):
            total, aux = super()._gen_losses(*a, **kw)
            out = aux[0]
            kept = {k: v for k, v in out.items() if k in keep}
            return sum(kept.values()), (out, *aux[1:])

    return Masked


def bench_vocoder(precision: str):
    import jax
    import jax.numpy as jnp

    from conan_tpu.config import load_config
    from conan_tpu.ops.precision import precision_scope
    from conan_tpu.train.tasks import VocoderTask

    hp = load_config("egs/hifigan_shuffle.yaml")
    B = hp["max_sentences"]
    frames = hp["max_samples"] // hp["hop_size"]
    rng = np.random.default_rng(0)
    batch = {
        "mels": jnp.asarray(rng.standard_normal((B, frames, 80)).astype(np.float32)),
        "wavs": jnp.asarray((rng.standard_normal((B, frames * hp["hop_size"])) * 0.1
                             ).astype(np.float32)),
    }
    results = []

    def run(name, task, step_fn=None):
        with precision_scope(precision):
            state = task.init_state(jax.random.PRNGKey(0))
            fn = step_fn or task.train_step
            ms, flops = _time_steps(fn, state, batch, jax.random.PRNGKey(1))
        r = dict(task="vocoder_gan", precision=precision, variant=name,
                 ms_per_step=round(ms, 2), flops_per_step=flops)
        print(json.dumps(r), flush=True)
        results.append(r)

    with precision_scope(precision):
        full = VocoderTask(hp)

    # G update only (loss-masked variants; D update dropped via a wrapper)
    def g_only(task):
        def step(state, batch, rng):
            import jax as _jax
            (gtot, (gl, y_)), grads_g = _jax.value_and_grad(
                task._gen_losses, has_aux=True)(state["params_g"],
                                                state["params_d"],
                                                batch["mels"], batch["wavs"],
                                                rng)
            upd_g, opt_g = task.opt_g.update(grads_g, state["opt_g"],
                                             state["params_g"])
            params_g = _jax.tree.map(lambda p, u: p + u,
                                     state["params_g"], upd_g)
            new_state = dict(state, params_g=params_g, opt_g=opt_g,
                             step=state["step"] + 1)
            return new_state, gl

        return step

    run("full", full)
    with precision_scope(precision):
        run("g_mel_only", _mask_losses(VocoderTask, {"mel"})(hp), None)
    with precision_scope(precision):
        t = _mask_losses(VocoderTask, {"mel"})(hp)
        run("gupd_mel_only", t, g_only(t))
    with precision_scope(precision):
        t = _mask_losses(VocoderTask, {"mel", "sc", "mag"})(hp)
        run("gupd_mel_stft", t, g_only(t))
    with precision_scope(precision):
        t = VocoderTask(hp)
        run("gupd_all", t, g_only(t))
    return results


def bench_vocoder_disc(precision: str):
    """Split the D update (the dominant cost) into MPD-only / MSD-only."""
    import jax
    import jax.numpy as jnp

    from conan_tpu.config import load_config
    from conan_tpu.ops.precision import precision_scope
    from conan_tpu.train.tasks import VocoderTask

    hp = load_config("egs/hifigan_shuffle.yaml")
    B = hp["max_sentences"]
    frames = hp["max_samples"] // hp["hop_size"]
    rng = np.random.default_rng(0)
    batch = {
        "mels": jnp.asarray(rng.standard_normal((B, frames, 80)).astype(np.float32)),
        "wavs": jnp.asarray((rng.standard_normal((B, frames * hp["hop_size"])) * 0.1
                             ).astype(np.float32)),
    }
    results = []

    def d_only(task, keep):
        def masked_d(pd, mel, y, y_, drng):
            total, out = task._disc_losses(pd, mel, y, y_, drng)
            kept = {k: v for k, v in out.items() if k in keep}
            return sum(kept.values()), out

        def step(state, batch, rng):
            import jax as _jax
            y = batch["wavs"]
            # fixed fake input (stop-gradient surrogate for y_)
            y_d = y * 0.9 + 0.01
            (dtot, dl), grads_d = _jax.value_and_grad(
                masked_d, has_aux=True)(state["params_d"], batch["mels"], y,
                                        y_d, rng)
            upd_d, opt_d = task.opt_d.update(grads_d, state["opt_d"],
                                             state["params_d"])
            params_d = _jax.tree.map(lambda p, u: p + u,
                                     state["params_d"], upd_d)
            return dict(state, params_d=params_d, opt_d=opt_d,
                        step=state["step"] + 1), dl

        return step

    for name, keep in [("dupd_all", {"r_p", "f_p", "r_s", "f_s"}),
                       ("dupd_mpd", {"r_p", "f_p"}),
                       ("dupd_msd", {"r_s", "f_s"})]:
        with precision_scope(precision):
            task = VocoderTask(hp)
            state = task.init_state(jax.random.PRNGKey(0))
            ms, flops = _time_steps(d_only(task, keep), state, batch,
                                    jax.random.PRNGKey(1))
        r = dict(task="vocoder_gan", precision=precision, variant=name,
                 ms_per_step=round(ms, 2), flops_per_step=flops)
        print(json.dumps(r), flush=True)
        results.append(r)
    return results


def bench_conan(precision: str):
    import jax
    import jax.numpy as jnp

    from conan_tpu.config import load_config
    from conan_tpu.ops.precision import precision_scope
    from conan_tpu.train.tasks import ConanTask

    hp = load_config("egs/conan_emformer.yaml")
    B, T, Tr = 24, 1500, 600
    rng = np.random.default_rng(0)
    batch = {
        "content": jnp.asarray(rng.integers(0, 100, (B, T))),
        "mels": jnp.asarray((rng.standard_normal((B, T, 80)) * 0.5).astype(np.float32)),
        "ref_mels": jnp.asarray((rng.standard_normal((B, Tr, 80)) * 0.5
                                 ).astype(np.float32)),
        "f0": jnp.asarray((rng.standard_normal((B, T)) * 0.5 + 7.5).astype(np.float32)),
        "uv": jnp.asarray((rng.random((B, T)) < 0.25).astype(np.float32)),
    }
    results = []

    def run(name, keep=None):
        with precision_scope(precision):
            task = (ConanTask if keep is None else _mask_losses(ConanTask, keep))(hp)
            state = task.init_state(jax.random.PRNGKey(0))
            state["step"] = jnp.asarray(50000, jnp.int32)
            ms, flops = _time_steps(task.train_step, state, batch,
                                    jax.random.PRNGKey(1))
        r = dict(task="conan_gan", precision=precision, variant=name,
                 ms_per_step=round(ms, 2), flops_per_step=flops)
        print(json.dumps(r), flush=True)
        results.append(r)

    run("full")
    run("mel_uv_only", {"l1", "ssim", "uv"})
    run("mel_uv_flow", {"l1", "ssim", "uv", "pflow", "fdiff"})
    run("no_adv", {"l1", "ssim", "uv", "pflow", "fdiff", "gloss", "vq_loss"})
    return results


def bench_emformer(precision: str):
    import jax
    import jax.numpy as jnp

    from conan_tpu.config import load_config
    from conan_tpu.ops.precision import precision_scope
    from conan_tpu.train.tasks import EmformerTask

    hp = load_config("egs/emformer.yaml")
    B, T = 16, 500
    rc = hp["right_context"]
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 100, (B, T))
    codes[:, -rc:] = -1
    batch = {
        "mels": jnp.asarray(rng.standard_normal((B, T + rc, 80)).astype(np.float32)),
        "content": jnp.asarray(codes),
    }
    results = []
    with precision_scope(precision):
        task = EmformerTask(hp)
        state = task.init_state(jax.random.PRNGKey(0))
        ms, flops = _time_steps(task.train_step, state, batch,
                                jax.random.PRNGKey(1))
    r = dict(task="emformer_distill", precision=precision, variant="full",
             ms_per_step=round(ms, 2), flops_per_step=flops)
    print(json.dumps(r), flush=True)
    results.append(r)
    return results


def main():
    from conan_tpu.utils.bench_timing import enable_persistent_cache

    enable_persistent_cache()
    which = sys.argv[1:] or ["vocoder", "conan", "emformer"]
    out = []
    for w in which:
        name, _, prec = w.partition(":")
        fn = {"vocoder": bench_vocoder, "vocoder_disc": bench_vocoder_disc,
              "conan": bench_conan, "emformer": bench_emformer}[name]
        t0 = time.time()
        out.extend(fn(prec or "default"))
        print(f"# {w} done in {time.time()-t0:.0f}s", file=sys.stderr)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "DECOMPOSE.json")
    old = []
    if os.path.exists(path):
        old = [r for r in json.load(open(path))
               if not any(r["task"] == n["task"] and r["precision"] == n["precision"]
                          and r["variant"] == n["variant"] for n in out)]
    json.dump(old + out, open(path, "w"), indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
