"""Original (non-causal) HiFi-GAN generator — kept for offline comparison,
like the reference (`/root/reference/modules/vocoder/hifigan/hifigan.py:
101-152`, trained via `tasks/vocoder/hifigan_noncausal.py`).

Transposed-conv upsampling with symmetric padding; NOT streamable (no causal
guarantee) — use the causal shuffle generator for serving.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from conan_tpu import ops
from conan_tpu.models.vocoder.hifigan import HifiGanConfig, _init_wn_conv, _lrelu
from conan_tpu.nn import inits
from conan_tpu.nn.module import Params

Array = jax.Array


class NonCausalHifiGanGenerator:
    def __init__(self, cfg: HifiGanConfig, c_out: int = 1):
        self.cfg = cfg
        self.c_out = c_out
        chs = [cfg.upsample_initial_channel]
        for _ in cfg.upsample_rates:
            chs.append(chs[-1] // 2)
        self.channels = chs

    def init(self, key) -> Params:
        cfg = self.cfg
        keys = iter(jax.random.split(key, 256))
        p: Params = {"conv_pre": _init_wn_conv(next(keys), cfg.upsample_initial_channel,
                                               cfg.num_mels, 7)}
        ups, resblocks = [], []
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            cin, cout = self.channels[i], self.channels[i + 1]
            kw, kb = jax.random.split(next(keys))
            w = inits.normal(kw, (cin, cout, k), std=0.01)  # deconv [in,out,k]
            d = ops.weight_norm_init(w)
            d["b"] = inits.default_bias(kb, (cout,), (cout, cin, k))
            ups.append(d)
            for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                if cfg.resblock == "1":
                    resblocks.append({
                        "convs1": [_init_wn_conv(next(keys), cout, cout, rk)
                                   for _ in range(len(rd))],
                        "convs2": [_init_wn_conv(next(keys), cout, cout, rk)
                                   for _ in range(len(rd))],
                    })
                else:
                    resblocks.append({"convs": [_init_wn_conv(next(keys), cout, cout, rk)
                                                for _ in range(len(rd))]})
        p["ups"] = ups
        p["resblocks"] = resblocks
        p["conv_post"] = _init_wn_conv(next(keys), self.c_out, self.channels[-1], 7)
        return p

    def _resblock(self, p: Params, x: Array, rk: int, dilations) -> Array:
        if self.cfg.resblock == "1":
            for j, d in enumerate(dilations):
                xt = _lrelu(x)
                pad = d * (rk - 1) // 2
                xt = ops.conv1d(xt, ops.weight_norm_weight(p["convs1"][j]),
                                p["convs1"][j]["b"], dilation=d, padding=(pad, pad))
                xt = _lrelu(xt)
                pad2 = (rk - 1) // 2
                xt = ops.conv1d(xt, ops.weight_norm_weight(p["convs2"][j]),
                                p["convs2"][j]["b"], padding=(pad2, pad2))
                x = x + xt
        else:
            for j, d in enumerate(dilations):
                xt = _lrelu(x)
                pad = d * (rk - 1) // 2
                xt = ops.conv1d(xt, ops.weight_norm_weight(p["convs"][j]),
                                p["convs"][j]["b"], dilation=d, padding=(pad, pad))
                x = x + xt
        return x

    def apply(self, params: Params, mel: Array) -> Array:
        """mel [B, T, 80] → wav [B, T*stride, c_out]."""
        cfg = self.cfg
        x = ops.conv1d(mel, ops.weight_norm_weight(params["conv_pre"]),
                       params["conv_pre"]["b"], padding=(3, 3))
        n_rb = len(cfg.resblock_kernel_sizes)
        rb = 0
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            x = _lrelu(x)
            x = ops.conv_transpose1d(x, ops.weight_norm_weight(params["ups"][i]),
                                     params["ups"][i]["b"], stride=u,
                                     padding=(k - u) // 2)
            xs = None
            for j in range(n_rb):
                y = self._resblock(params["resblocks"][rb], x,
                                   cfg.resblock_kernel_sizes[j],
                                   cfg.resblock_dilation_sizes[j])
                xs = y if xs is None else xs + y
                rb += 1
            x = xs / n_rb
        x = jax.nn.leaky_relu(x, 0.01)  # reference uses default slope here
        x = ops.conv1d(x, ops.weight_norm_weight(params["conv_post"]),
                       params["conv_post"]["b"], padding=(3, 3))
        return jnp.tanh(x)

    def params_from_torch(self, sd: dict) -> Params:
        import numpy as np

        def wn(prefix):
            return {"v": jnp.asarray(np.asarray(sd[f"{prefix}.weight_v"])),
                    "g": jnp.asarray(np.asarray(sd[f"{prefix}.weight_g"])),
                    "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))}

        cfg = self.cfg
        p: Params = {"conv_pre": wn("conv_pre"), "ups": [], "resblocks": []}
        for i in range(len(cfg.upsample_rates)):
            p["ups"].append(wn(f"ups.{i}"))
        n_total = len(cfg.upsample_rates) * len(cfg.resblock_kernel_sizes)
        for i in range(n_total):
            nd = len(cfg.resblock_dilation_sizes[i % len(cfg.resblock_dilation_sizes)])
            if cfg.resblock == "1":
                p["resblocks"].append({
                    "convs1": [wn(f"resblocks.{i}.convs1.{j}") for j in range(nd)],
                    "convs2": [wn(f"resblocks.{i}.convs2.{j}") for j in range(nd)]})
            else:
                p["resblocks"].append({
                    "convs": [wn(f"resblocks.{i}.convs.{j}") for j in range(nd)]})
        p["conv_post"] = wn("conv_post")
        return p
