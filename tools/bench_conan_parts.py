"""Isolate where the Conan GAN step's 402 ms (bf16) lives.

tools/DECOMPOSE.json proved the auxiliary losses are all free (every loss
ablation times 401-403 ms) — so this times fwd+bwd of each backbone submodule
in isolation at the bench shapes (B=24, T=1500, Tr=600, H=256, f0_gen=orig),
plus the full apply, slope-timed on device.  Writes tools/CONAN_PARTS.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_train import _time_steps  # noqa: E402

B, T, TR = 24, 1500, 600
if "smoke" in sys.argv:  # tiny-shape CPU trace check
    B, T, TR = 2, 64, 32


def main():
    import jax

    if "smoke" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from conan_tpu.config import load_config
    from conan_tpu.models.conan.model import Conan, ConanConfig
    from conan_tpu.ops.precision import precision_scope

    hp = load_config("egs/conan_emformer.yaml")
    rng = np.random.default_rng(0)
    results = []

    with precision_scope("default"):
        cfg = ConanConfig.from_hparams(hp)
        model = Conan(cfg)
        params = model.init(jax.random.PRNGKey(0))
        vq_state = model.init_vq_state(jax.random.PRNGKey(1))
    H = cfg.hidden_size

    content = jnp.asarray(rng.integers(0, 100, (B, T)))
    ref = jnp.asarray((rng.standard_normal((B, TR, 80)) * 0.5).astype(np.float32))
    f0 = jnp.asarray((rng.standard_normal((B, T)) * 0.5 + 7.5).astype(np.float32))
    uv = jnp.asarray((rng.random((B, T)) < 0.25).astype(np.float32))
    x_t = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    pros = jnp.asarray(rng.standard_normal((B, TR // 4, H)).astype(np.float32))

    def run(name, loss_fn, p0):
        def step(state, batch, rng_):
            loss, grads = jax.value_and_grad(loss_fn)(state["p"], rng_)
            p = jax.tree.map(lambda a, g: a - 1e-9 * g, state["p"], grads)
            return dict(state, p=p, step=state["step"] + 1), {"loss": loss}

        with precision_scope("default"):
            state = {"p": p0, "step": jnp.zeros((), jnp.int32)}
            try:
                ms, flops = _time_steps(step, state, {}, jax.random.PRNGKey(2))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"part": name, "error": repr(e)[:200]}),
                      flush=True)
                return
        r = dict(part=name, ms=round(ms, 2), flops=flops,
                 tflops=round(flops / ms / 1e9, 1) if flops and ms > 0 else None)
        print(json.dumps(r), flush=True)
        results.append(r)

    # full apply, train mode (steady phase: vq on, forcing passed)
    def full_loss(p, rng_):
        ret = model.apply(p["m"], content, ref=ref, vq_state=p["vq"], f0=f0,
                          uv=uv, global_step=50000, rng=rng_, train=True,
                          vq_start=hp.get("vq_start", 20500),
                          forcing_steps=hp.get("forcing", 20000))
        return (jnp.sum(jnp.square(ret["mel_out"])) * 1e-6 + ret["vq_loss"]
                + ret["gl"] + ret["fdiff"] if "gl" in ret else
                jnp.sum(jnp.square(ret["mel_out"])) * 1e-6)

    run("full_apply", full_loss, {"m": params, "vq": vq_state})

    run("style_spk_embed",
        lambda p, r: jnp.sum(jnp.square(model.encode_spk_embed(p, ref))) * 1e-6,
        params)

    def prosody_loss(p, r):
        pros_, vq_loss, ppl, _ = model.encode_prosody(
            p["m"], p["vq"], ref, use_vq=True, train=True, rng=r)
        return jnp.sum(jnp.square(pros_)) * 1e-6 + vq_loss

    run("prosody_vq", prosody_loss, {"m": params, "vq": vq_state})

    def aligner_loss(p, r):
        out, gl, _ = model.aligner.apply(p["aligner"], x_t, pros, None, None,
                                         forcing=jnp.asarray(False), rng=r,
                                         train=True)
        return jnp.sum(jnp.square(out)) * 1e-6 + gl

    run("aligner_both_branches", aligner_loss, params)

    run("uv_predictor",
        lambda p, r: jnp.sum(jnp.square(
            model.uv_predictor.apply(p["uv_predictor"], x_t, rng=r,
                                     train=True))) * 1e-6,
        params)

    run("decoder",
        lambda p, r: jnp.sum(jnp.square(
            model.decoder.apply(p["decoder"], x_t))) * 1e-6,
        params)

    # ---- task-level G losses: exact, no-ssim, and traced-step variants ----
    from conan_tpu.train.tasks import ConanTask

    def task_runs(label, hp_over, static_step):
        hp2 = dict(hp)
        hp2.update(hp_over)
        with precision_scope("default"):
            task = ConanTask(hp2)
            tstate = task.init_state(jax.random.PRNGKey(0))
        batch = {"content": content, "mels":
                 jnp.asarray((rng.standard_normal((B, T, 80)) * 0.5
                              ).astype(np.float32)),
                 "ref_mels": ref, "f0": f0, "uv": uv}

        def step_fn(state, batch_, rng_):
            # step comes from the loop-carried state → genuinely traced
            # (a closed-over jnp scalar would embed as a foldable constant)
            sv = 50000 if static_step else state["gstep"]

            def loss_fn(g):
                total, _aux = task._gen_losses(g, state["d"], state["vq"],
                                               batch, sv, rng_, None, False)
                return total

            loss, grads = jax.value_and_grad(loss_fn)(state["g"])
            g = jax.tree.map(lambda a, d: a - 1e-9 * d, state["g"], grads)
            return dict(state, g=g, gstep=state["gstep"] + 1,
                        step=state["step"] + 1), {"loss": loss}

        with precision_scope("default"):
            st0 = {"g": tstate["params_g"], "d": tstate["params_d"],
                   "vq": tstate["vq_state"],
                   "gstep": jnp.asarray(50000, jnp.int32),
                   "step": jnp.zeros((), jnp.int32)}
            try:
                ms, flops = _time_steps(step_fn, st0, {}, jax.random.PRNGKey(2))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"part": label, "error": repr(e)[:200]}),
                      flush=True)
                return
        r = dict(part=label, ms=round(ms, 2), flops=flops,
                 tflops=round(flops / ms / 1e9, 1) if flops and ms > 0 else None)
        print(json.dumps(r), flush=True)
        results.append(r)

    task_runs("gen_losses_full", {}, False)
    task_runs("gen_losses_no_ssim", {"mel_losses": "l1:0.5"}, False)
    task_runs("gen_losses_static_step", {}, True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "CONAN_PARTS.json")
    json.dump(results, open(path, "w"), indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
