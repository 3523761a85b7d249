"""Decompose the MSD discriminator cost by scale and by component.

tools/GROUPCONV.json showed XLA's grouped-conv lowering is fine per layer
(scale-1 layers sum to ~11 ms grad vs the 66 ms dupd_msd measurement), so the
gap lives in the composed chain: the C_in=1 k=15 L1 conv, weight-norm /
spectral-norm recomputation in backward, the avg-pool scales, or fusion
boundaries.  Each variant here is a full value_and_grad (w.r.t. params and
input) of sum(logits²) over one DiscriminatorS configuration, slope-timed.

Usage: python tools/bench_msd.py          # all variants
Writes tools/MSD.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_train import _time_steps  # noqa: E402

B = 18
T = 8000


def main():
    import jax
    import jax.numpy as jnp

    from conan_tpu.models.vocoder.discriminators import (
        DiscriminatorS, MultiScaleDiscriminator, _avg_pool1d)
    from conan_tpu.ops.precision import precision_scope

    rng = np.random.default_rng(0)
    x0 = jnp.asarray((rng.standard_normal((B, T, 1)) * 0.1).astype(np.float32))
    results = []

    def run(name, make_loss, params, x):
        def step(state, batch, rng_):
            def loss_fn(p, xx):
                return make_loss(p, xx)
            loss, (dp, dx) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(state["p"], state["x"])
            p = jax.tree.map(lambda a, g: a - 1e-9 * g, state["p"], dp)
            return dict(state, p=p, x=state["x"] - 1e-9 * dx,
                        step=state["step"] + 1), {"loss": loss}

        with precision_scope("default"):
            state = {"p": params, "x": x, "step": jnp.zeros((), jnp.int32)}
            ms, flops = _time_steps(step, state, {}, jax.random.PRNGKey(0))
        r = dict(variant=name, ms=round(ms, 3), flops=flops,
                 tflops=round(flops / ms / 1e9, 1) if flops and ms > 0 else None)
        print(json.dumps(r), flush=True)
        results.append(r)

    with precision_scope("default"):
        key = jax.random.PRNGKey(0)
        msd = MultiScaleDiscriminator()
        p_msd = msd.init(key)
        d_sn = DiscriminatorS(use_spectral_norm=True)
        d_wn = DiscriminatorS(use_spectral_norm=False)
        p_sn = d_sn.init(key)
        p_wn = d_wn.init(key)

    # full MSD (3 scales, pooling, spectral on scale 1)
    run("msd_full", lambda p, x: sum(jnp.sum(l * l) for l in msd.apply(p, x, x)[1]),
        p_msd, x0)
    # one scale at full rate, spectral norm (as shipped)
    run("scale1_sn", lambda p, x: jnp.sum(d_sn.apply(p, x)[0] ** 2), p_sn, x0)
    # same chain, weight norm instead of spectral
    run("scale1_wn", lambda p, x: jnp.sum(d_wn.apply(p, x)[0] ** 2), p_wn, x0)
    # scale 2/3 (weight norm, pooled input)
    with precision_scope("default"):
        x2 = _avg_pool1d(x0)
        x3 = _avg_pool1d(x2)
    run("scale2_wn", lambda p, x: jnp.sum(d_wn.apply(p, x)[0] ** 2), p_wn, x2)
    run("scale3_wn", lambda p, x: jnp.sum(d_wn.apply(p, x)[0] ** 2), p_wn, x3)

    # L1 conv alone (C_in=1, k=15 — the old pathological STFT pattern)
    from conan_tpu import ops
    with precision_scope("default"):
        w1 = p_wn["convs"][0]
    run("L1_only",
        lambda p, x: jnp.sum(ops.conv1d(x, ops.weight_norm_weight(p), p["b"],
                                        padding=(7, 7)) ** 2),
        w1, x0)

    # raw-weight variant of scale 1 (isolate weight-norm recompute cost):
    with precision_scope("default"):
        p_raw = jax.tree.map(lambda a: a, p_wn)

        def apply_raw(p, x):
            import jax as _jax
            fm = x
            for (ci, co, k, s, g, pd), c in zip(d_wn.LAYERS, p["convs"]):
                fm = ops.conv1d(fm, c["v"], c["b"], stride=s,
                                padding=(pd, pd), groups=g)
                fm = _jax.nn.leaky_relu(fm, 0.1)
            fm = ops.conv1d(fm, p["post"]["v"], p["post"]["b"], padding=(1, 1))
            return jnp.sum(fm ** 2)

    run("scale1_raww", apply_raw, p_raw, x0)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "MSD.json")
    json.dump(results, open(path, "w"), indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
