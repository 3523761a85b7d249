"""Per-layer microbench of the MSD grouped convs (the vocoder GAN's dominant
cost: dupd_msd = 66 ms of the 146 ms step at 8.6% MFU, tools/DECOMPOSE.json).

Compares, per production layer shape (bf16 policy, B=18):
  conv      — lax.conv_general_dilated with feature_group_count (current impl)
  einsum    — materialized im2col patches [B,T',k,G,Cg] + one batched einsum
              "btkgc,gock->btgo"; backward via autodiff (gather→scatter)
  einsum_oa — same forward, custom VJP: dx by per-tap strided overlap-add
              (k pad-adds, no scatter)

Each timing is value_and_grad w.r.t. BOTH x and w of sum(conv(x)) (the D-update
pattern), slope-timed on device.  Writes tools/GROUPCONV.json.

Usage: python tools/bench_groupconv.py [fwd|grad] (default grad)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_train import _time_steps  # noqa: E402

# MSD scale-1 layer plan: (Cin, Cout, k, stride, groups, T_in)
LAYERS = [
    ("L2", 128, 128, 41, 2, 4, 8000),
    ("L3", 128, 256, 41, 2, 16, 4000),
    ("L4", 256, 512, 41, 4, 16, 2000),
    ("L5", 512, 1024, 41, 4, 16, 500),
    ("L6", 1024, 1024, 41, 1, 16, 125),
    ("L7", 1024, 1024, 5, 1, 1, 125),
]
B = 18


def impl_conv(x, w, stride, groups, pad):
    from conan_tpu import ops

    return ops.conv1d(x, w, None, stride=stride, padding=(pad, pad),
                      groups=groups)


def impl_blocked(x, w, stride, groups, pad):
    from conan_tpu.ops.grouped_conv import grouped_conv1d_blocked

    return grouped_conv1d_blocked(x, w, None, stride=stride,
                                  padding=(pad, pad), groups=groups)


def impl_pallas(x, w, stride, groups, pad):
    import jax.numpy as jnp

    from conan_tpu.ops.pallas_groupconv import pallas_grouped_conv1d
    from conan_tpu.ops.precision import get_precision

    # Pallas matmuls run at input dtype; mirror the bf16 'default' policy
    if str(get_precision()).lower().find("highest") < 0:
        x, w = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    return pallas_grouped_conv1d(x, w, None, stride=stride,
                                 padding=(pad, pad), groups=groups)


def _patches(x, k, stride, pad):
    """[B,T,C] -> [B,T',k,C] gather framing (static indices)."""
    import jax.numpy as jnp

    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    t_out = (x.shape[1] - k) // stride + 1
    idx = np.arange(t_out)[:, None] * stride + np.arange(k)[None, :]
    return x[:, idx], t_out


def _einsum_fwd(x, w, stride, groups, pad):
    import jax.numpy as jnp

    from conan_tpu.ops.precision import get_precision

    cout, cg, k = w.shape
    og = cout // groups
    p, _ = _patches(x, k, stride, pad)                    # [B,T',k,C]
    pg = p.reshape(*p.shape[:3], groups, cg)              # [B,T',k,G,Cg]
    wg = w.reshape(groups, og, cg, k)                     # [G,Og,Cg,k]
    y = jnp.einsum("btkgc,gock->btgo", pg, wg,
                   precision=get_precision(),
                   preferred_element_type=jnp.float32)
    return y.reshape(y.shape[0], y.shape[1], cout)


@functools.partial(__import__("jax").custom_vjp, nondiff_argnums=(2, 3, 4))
def _einsum_oa(x, w, stride, groups, pad):
    return _einsum_fwd(x, w, stride, groups, pad)


def _einsum_oa_fwd(x, w, stride, groups, pad):
    return _einsum_fwd(x, w, stride, groups, pad), (x, w)


def _einsum_oa_bwd(stride, groups, pad, res, g):
    import jax.numpy as jnp

    from conan_tpu.ops.precision import get_precision

    x, w = res
    cout, cg, k = w.shape
    og = cout // groups
    Bb, t_out, _ = g.shape
    gg = g.reshape(Bb, t_out, groups, og)
    p, _ = _patches(x, k, stride, pad)
    pg = p.reshape(Bb, t_out, k, groups, cg)
    dw = jnp.einsum("btgo,btkgc->gock", gg, pg, precision=get_precision(),
                    preferred_element_type=jnp.float32)
    dw = dw.reshape(groups * og, cg, k)
    wg = w.reshape(groups, og, cg, k)
    dp = jnp.einsum("btgo,gock->btkgc", gg, wg, precision=get_precision(),
                    preferred_element_type=jnp.float32)
    dp = dp.reshape(Bb, t_out, k, groups * cg)            # [B,T',k,C]
    # overlap-add: padded-x position t*stride + dk receives dp[:, t, dk, :]
    t_pad = x.shape[1] + 2 * pad
    dxp = jnp.zeros((Bb, t_pad, groups * cg), dp.dtype)
    span = t_out * stride
    for dk in range(k):
        # for fixed dk, writes hit positions dk, dk+s, ... — strided but
        # expressible as one pad into a length-span strided view
        seg = dp[:, :, dk, :]                             # [B,T',C]
        if stride > 1:
            seg = jnp.concatenate(
                [seg[:, :, None, :],
                 jnp.zeros((Bb, t_out, stride - 1, seg.shape[-1]), seg.dtype)],
                axis=2).reshape(Bb, span, -1)
        lo = dk
        hi = lo + (span if stride > 1 else t_out)
        if lo >= t_pad:
            continue
        if hi > t_pad:
            seg = seg[:, :t_pad - lo]
            hi = t_pad
        dxp = dxp + jnp.pad(seg, ((0, 0), (lo, t_pad - hi), (0, 0)))
    dx = dxp[:, pad:pad + x.shape[1]] if pad else dxp
    return dx, dw


_einsum_oa.defvjp(_einsum_oa_fwd, _einsum_oa_bwd)


def main():
    import jax
    import jax.numpy as jnp

    from conan_tpu.ops.precision import precision_scope

    mode = (sys.argv[1:] or ["grad"])[0]
    only = sys.argv[2] if len(sys.argv) > 2 else None
    results = []
    for name, cin, cout, k, s, gcount, t_in in LAYERS:
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.standard_normal((B, t_in, cin)).astype(np.float32))
        w0 = jnp.asarray((rng.standard_normal((cout, cin // gcount, k))
                          * 0.05).astype(np.float32))
        pad = (k - 1) // 2
        for iname, fn in [("conv", impl_conv), ("blocked", impl_blocked),
                          ("pallas", impl_pallas),
                          ("einsum", _einsum_fwd), ("einsum_oa", _einsum_oa)]:
            if only and iname != only:
                continue
            def step(state, batch, rng_, fn=fn):
                xx, ww = state["x"], state["w"]
                if mode == "fwd":
                    y = fn(xx, ww, s, gcount, pad)
                    loss = jnp.sum(y * y)
                    # thread the loss into the carried state so the chained
                    # fori_loop cannot DCE the forward (a dead per-step
                    # metric WAS eliminated — early fwd numbers were noise)
                    xx = xx * (loss * 1e-30 + 1.0)
                    dx, dw = xx, ww * 0.999  # keep state evolving
                else:
                    def loss_fn(xx, ww):
                        y = fn(xx, ww, s, gcount, pad)
                        return jnp.sum(y * y)
                    loss, (dx, dw) = jax.value_and_grad(
                        loss_fn, argnums=(0, 1))(xx, ww)
                    ww = ww - 1e-9 * dw
                    xx = xx - 1e-9 * dx
                return dict(state, x=xx, w=ww,
                            step=state["step"] + 1), {"loss": loss}

            with precision_scope("default"):
                state = {"x": x0, "w": w0, "step": jnp.zeros((), jnp.int32)}
                try:
                    ms, flops = _time_steps(step, state, {}, jax.random.PRNGKey(0))
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({"layer": name, "impl": iname,
                                      "error": repr(e)[:200]}), flush=True)
                    continue
            r = dict(layer=name, impl=iname, mode=mode, ms=round(ms, 3),
                     flops=flops,
                     tflops=round(flops / ms / 1e9, 1) if flops else None)
            print(json.dumps(r), flush=True)
            results.append(r)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"GROUPCONV_{only}.json" if only else "GROUPCONV.json")
    json.dump(results, open(path, "w"), indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
