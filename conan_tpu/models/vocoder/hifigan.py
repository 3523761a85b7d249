"""Causal shuffle HiFi-GAN generator — TPU-native redesign of the reference
vocoder (`/root/reference/modules/vocoder/hifigan/hifigan_causal.py:269-341`).

mel [B, T, 80] → waveform [B, T*prod(strides), 1] at 16 kHz (total stride 320 =
one mel hop). Fully causal: every conv is left-padded, upsampling is
CausalConv1d + 1-D pixel shuffle ("shuffle", the paper's method,
`hifigan_causal.py:191-208`), with "zero" (zero-insertion) and "nn" (causal
transposed conv) variants for parity.

TPU design: channels-last, one code path for offline and streaming via the
`Stream` carry context; the streaming step is a single jitted function of
(params, state, mel_chunk) with static shapes — per-chunk synthesis compiles
once and replays (SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from conan_tpu import ops
from conan_tpu.nn import inits
from conan_tpu.nn.module import Params, State, Stream

Array = jax.Array

LRELU_SLOPE = 0.1


def _lrelu(x: Array) -> Array:
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


@dataclasses.dataclass(frozen=True)
class HifiGanConfig:
    num_mels: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: tuple[int, ...] = (8, 5, 4, 2)
    upsample_kernel_sizes: tuple[int, ...] = (16, 10, 8, 4)
    resblock: str = "1"
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample: str = "shuffle"  # shuffle | zero | nn

    @property
    def total_stride(self) -> int:
        s = 1
        for u in self.upsample_rates:
            s *= u
        return s

    @classmethod
    def from_hparams(cls, hp) -> "HifiGanConfig":
        return cls(
            num_mels=hp.get("num_mels", hp.get("audio_num_mel_bins", 80)),
            upsample_initial_channel=hp.get("upsample_initial_channel", 512),
            upsample_rates=tuple(hp["upsample_rates"]),
            upsample_kernel_sizes=tuple(hp["upsample_kernel_sizes"]),
            resblock=str(hp.get("resblock", "1")),
            resblock_kernel_sizes=tuple(hp["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(tuple(d) for d in hp["resblock_dilation_sizes"]),
            upsample=hp.get("upsample", "shuffle"),
        )


def _init_wn_conv(key, out_ch: int, in_ch: int, k: int, std: float = 0.01) -> Params:
    """weight-normed causal conv params; init N(0, 0.01) like the reference
    `init_weights` (`hifigan_causal.py:22-25`) applied after weight_norm attach."""
    kw, kb = jax.random.split(key)
    w = inits.normal(kw, (out_ch, in_ch, k), std=std)
    p = ops.weight_norm_init(w)
    p["b"] = inits.default_bias(kb, (out_ch,), (out_ch, in_ch, k))
    return p


class HifiGanGenerator:
    def __init__(self, cfg: HifiGanConfig):
        self.cfg = cfg
        # per-stage channel plan: 512 -> 256 -> 128 -> 64 -> 32
        chs = [cfg.upsample_initial_channel]
        for _ in cfg.upsample_rates:
            chs.append(chs[-1] // 2)
        self.channels = chs

    # ----------------------------------------------------------- params
    def init(self, key) -> Params:
        cfg = self.cfg
        keys = jax.random.split(key, 256)
        ki = iter(range(256))
        p: Params = {}
        p["conv_pre"] = _init_wn_conv(keys[next(ki)], cfg.upsample_initial_channel, cfg.num_mels, 7)
        ups = []
        resblocks = []
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            cin, cout = self.channels[i], self.channels[i + 1]
            if cfg.upsample == "shuffle":
                ups.append({"conv": _init_wn_conv(keys[next(ki)], cout * u, cin, k)})
            elif cfg.upsample == "zero":
                ups.append({"conv": _init_wn_conv(keys[next(ki)], cout, cin, k)})
            elif cfg.upsample == "nn":
                kw, kb = jax.random.split(keys[next(ki)])
                w = inits.normal(kw, (cin, cout, k), std=0.01)  # deconv layout [in,out,k]
                d = ops.weight_norm_init(w)
                d["b"] = inits.default_bias(kb, (cout,), (cout, cin, k))
                ups.append({"deconv": d})
            else:
                raise ValueError(cfg.upsample)
            for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                if cfg.resblock == "1":
                    resblocks.append({
                        "convs1": [_init_wn_conv(keys[next(ki)], cout, cout, rk) for _ in range(len(rd))],
                        "convs2": [_init_wn_conv(keys[next(ki)], cout, cout, rk) for _ in range(len(rd))],
                    })
                else:
                    resblocks.append({
                        "convs": [_init_wn_conv(keys[next(ki)], cout, cout, rk) for _ in range(len(rd))],
                    })
        p["ups"] = ups
        p["resblocks"] = resblocks
        p["conv_post"] = _init_wn_conv(keys[next(ki)], 1, self.channels[-1], 7)
        return p

    # ----------------------------------------------------------- state
    def init_state(self, batch: int, dtype=jnp.float32) -> State:
        """Zero streaming carries for every causal conv (zeros == the implicit
        left padding of the offline forward, so streaming ≡ offline exactly)."""
        cfg = self.cfg
        st: State = {}
        st["conv_pre"] = ops.causal_conv1d_state(batch, cfg.num_mels, 7, dtype=dtype)
        rb_idx = 0
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            cin, cout = self.channels[i], self.channels[i + 1]
            if cfg.upsample == "shuffle":
                st[f"ups.{i}"] = ops.causal_conv1d_state(batch, cin, k, dtype=dtype)
            elif cfg.upsample == "zero":
                st[f"ups.{i}"] = ops.causal_conv1d_state(batch, cin, k, dtype=dtype)
            else:
                # 'nn' (trimmed transposed conv, hifigan_causal.py:60-141) is
                # NOT incrementally streamable: emitted sample m depends on
                # input frames t ∈ [⌈m/s⌉, ⌊(m+k-1)/s⌋] — up to ⌈(k-1)/s⌉
                # frames of FUTURE input — so chunk output ≠ offline prefix by
                # construction.  The reference never streams it either (its
                # engine re-runs the full prefix each chunk and ships
                # 'shuffle'); offline parity is golden-tested.  See PARITY.md.
                raise NotImplementedError(
                    "upsample='nn' is not prefix-consistent (transposed-conv "
                    "outputs depend on future input frames); streaming is "
                    "only defined for 'shuffle' and 'zero'")
            for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                for j, d in enumerate(rd):
                    if cfg.resblock == "1":
                        st[f"rb.{rb_idx}.c1.{j}"] = ops.causal_conv1d_state(batch, cout, rk, d, dtype)
                        st[f"rb.{rb_idx}.c2.{j}"] = ops.causal_conv1d_state(batch, cout, rk, 1, dtype)
                    else:
                        st[f"rb.{rb_idx}.c.{j}"] = ops.causal_conv1d_state(batch, cout, rk, d, dtype)
                rb_idx += 1
        st["conv_post"] = ops.causal_conv1d_state(batch, self.channels[-1], 7, dtype=dtype)
        return st

    # ----------------------------------------------------------- forward
    def _resblock(self, s: Stream, path: str, p: Params, x: Array,
                  dilations: tuple[int, ...]) -> Array:
        if self.cfg.resblock == "1":
            for j, d in enumerate(dilations):
                xt = _lrelu(x)
                xt = s.causal_conv(f"{path}.c1.{j}", xt, p["convs1"][j], dilation=d)
                xt = _lrelu(xt)
                xt = s.causal_conv(f"{path}.c2.{j}", xt, p["convs2"][j], dilation=1)
                x = x + xt
        else:
            for j, d in enumerate(dilations):
                xt = _lrelu(x)
                xt = s.causal_conv(f"{path}.c.{j}", xt, p["convs"][j], dilation=d)
                x = x + xt
        return x

    def _upsample(self, s: Stream, i: int, p: Params, x: Array) -> Array:
        cfg = self.cfg
        u = cfg.upsample_rates[i]
        k = cfg.upsample_kernel_sizes[i]
        if cfg.upsample == "shuffle":
            # CausalConv1d(in -> out*u) + pixel shuffle (hifigan_causal.py:191-208)
            y = s.causal_conv(f"ups.{i}", x, p["conv"])
            return ops.pixel_shuffle_1d(y, u)
        if cfg.upsample == "zero":
            # zero-insertion then causal conv (hifigan_causal.py:151-164).
            # Reference order is upsample-then-conv; conv state lives at the
            # upsampled rate which is still chunk-exact because chunk lengths
            # are multiples of 1 input frame -> u output frames.
            B, T, C = x.shape
            up = jnp.zeros((B, T, u, C), x.dtype).at[:, :, 0, :].set(x).reshape(B, T * u, C)
            if s.streaming:
                w = ops.weight_norm_weight(p["conv"])
                y, carry = ops.causal_conv1d_step(up, s.state[f"ups.{i}"], w, p["conv"]["b"])
                # carry holds upsampled-rate tail; reuse conv-state slot
                s.new_state[f"ups.{i}"] = carry
                return y
            return ops.causal_conv1d(up, ops.weight_norm_weight(p["conv"]), p["conv"]["b"])
        if cfg.upsample == "nn":
            # Causal transposed conv with manual pad + left trim
            # (hifigan_causal.py:60-141). Offline only.
            assert not s.streaming, "streaming for upsample='nn' not supported"
            P = k // 2 - 1
            x_pad = jnp.pad(x, ((0, 0), (P, 0), (0, 0)))
            w = ops.weight_norm_weight(p["deconv"])  # [in, out, k]
            y_full = ops.conv_transpose1d(x_pad, w, p["deconv"]["b"], stride=u,
                                          padding=0, output_padding=u - 1)
            trim = P * u + k - 1
            y = y_full[:, trim:, :]
            return y[:, : x.shape[1] * u, :]
        raise ValueError(cfg.upsample)

    def _forward(self, params: Params, x: Array, s: Stream) -> Array:
        cfg = self.cfg
        x = s.causal_conv("conv_pre", x, params["conv_pre"])
        n_rb = len(cfg.resblock_kernel_sizes)
        rb_idx = 0
        for i in range(len(cfg.upsample_rates)):
            x = _lrelu(x)
            x = self._upsample(s, i, params["ups"][i], x)
            xs = None
            for _ in range(n_rb):
                y = self._resblock(s, f"rb.{rb_idx}", params["resblocks"][rb_idx], x,
                                   cfg.resblock_dilation_sizes[rb_idx % n_rb])
                xs = y if xs is None else xs + y
                rb_idx += 1
            x = xs / n_rb
        x = _lrelu(x)
        x = s.causal_conv("conv_post", x, params["conv_post"])
        return jnp.tanh(x)

    def apply(self, params: Params, mel: Array) -> Array:
        """Offline forward. mel [B, T, num_mels] → wav [B, T*stride, 1]."""
        return self._forward(params, mel, Stream(None))

    def step(self, params: Params, state: State, mel_chunk: Array) -> tuple[Array, State]:
        """Streaming step. mel_chunk [B, Tc, num_mels] → (wav [B, Tc*stride, 1], state').

        Chunk output is bit-identical to the corresponding slice of
        ``apply`` on the full sequence (prefix-consistency invariant).
        """
        s = Stream(state)
        y = self._forward(params, mel_chunk, s)
        return y, s.new_state

    # ----------------------------------------------------------- torch import
    def params_from_torch(self, sd: dict) -> Params:
        """Map a reference ``HifiGanGenerator.state_dict()`` into our params tree.

        Torch names (hifigan_causal.py): conv_pre.conv.{weight_v,weight_g,bias},
        ups.{i}.conv.conv.* (shuffle/zero) or ups.{i}.deconv.*, and
        resblocks.{i}.convs{1,2}.{j}.conv.*.
        """
        import numpy as np

        def wn(prefix):
            return {
                "v": jnp.asarray(np.asarray(sd[f"{prefix}.weight_v"])),
                "g": jnp.asarray(np.asarray(sd[f"{prefix}.weight_g"])),
                "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
            }

        cfg = self.cfg
        p: Params = {"conv_pre": wn("conv_pre.conv"), "ups": [], "resblocks": []}
        for i in range(len(cfg.upsample_rates)):
            if cfg.upsample in ("shuffle", "zero"):
                p["ups"].append({"conv": wn(f"ups.{i}.conv.conv")})
            else:
                p["ups"].append({"deconv": wn(f"ups.{i}.deconv")})
        n_total = len(cfg.upsample_rates) * len(cfg.resblock_kernel_sizes)
        for i in range(n_total):
            if cfg.resblock == "1":
                nd = len(cfg.resblock_dilation_sizes[i % len(cfg.resblock_dilation_sizes)])
                p["resblocks"].append({
                    "convs1": [wn(f"resblocks.{i}.convs1.{j}.conv") for j in range(nd)],
                    "convs2": [wn(f"resblocks.{i}.convs2.{j}.conv") for j in range(nd)],
                })
            else:
                nd = len(cfg.resblock_dilation_sizes[i % len(cfg.resblock_dilation_sizes)])
                p["resblocks"].append({
                    "convs": [wn(f"resblocks.{i}.convs.{j}.conv") for j in range(nd)],
                })
        p["conv_post"] = wn("conv_post.conv")
        return p
