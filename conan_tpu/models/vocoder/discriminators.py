"""GAN discriminators.

TPU redesigns of:
  MultiPeriodDiscriminator / MultiScaleDiscriminator
      `/root/reference/modules/vocoder/hifigan/hifigan_causal.py:347-491`
  Multi-window mel Discriminator (used by the Conan adversarial mel loss)
      `/root/reference/modules/tts/iclspeech/multi_window_disc.py:6-140`

All channels-last. Random crop windows are chosen with traced jax.random (the
reference used np.random at step time); BatchNorm in the mel disc keeps its
running stats in an explicit state pytree (train mode = batch stats, matching
torch training behaviour).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from conan_tpu import ops
from conan_tpu.nn import inits
from conan_tpu.nn.blocks import init_linear, linear
from conan_tpu.nn.module import Params

Array = jax.Array

LRELU = 0.1


def _wn_conv_init(key, out_ch, in_ch, *k):
    kw, kb = jax.random.split(key)
    shape = (out_ch, in_ch, *k)
    w = inits.kaiming_uniform(kw, shape)
    p = ops.weight_norm_init(w)
    p["b"] = inits.default_bias(kb, (out_ch,), shape)
    return p


def _cond_net_init(key, t: int):
    """ConvTranspose1d(80, 1, 2t, stride=t, padding=t//2), torch default init
    (weight [in=80, out=1, 2t]; no weight norm in the reference,
    hifigan_causal.py:353-355,426-428)."""
    kw, kb = jax.random.split(key)
    shape = (80, 1, 2 * t)
    return {"w": inits.kaiming_uniform(kw, shape),
            "b": inits.default_bias(kb, (1,), shape)}


def _cond_net_apply(p: Params, mel: Array, t: int) -> Array:
    """mel [B, T_mel, 80] -> [B, T_mel*t, 1] upsampled conditioning channel.

    Torch semantics: ConvTranspose1d(stride=t, kernel=2t, padding=t//2).
    Because kernel == 2*stride, each output sample receives exactly two
    contributions; the transposed conv decomposes into two framed matmuls +
    a one-frame overlap-add.  (The naive lhs-dilated conv lowering with
    dilation 320 / kernel 640 blows up the TPU compiler; the matmul form is
    also the MXU-native one.)  Derivation: y[n] = x[q]·W[r] + x[q-1]·W[t+r]
    where q*t + r = n + t//2, r in [0,t).
    """
    B, T, C = mel.shape
    w = p["w"][:, 0, :]  # [80, 2t]
    a = mel @ w[:, :t]   # [B, T, t]   (i = q term)
    bb = mel @ w[:, t:]  # [B, T, t]   (i = q-1 term)
    a_pad = jnp.pad(a, ((0, 0), (0, 1), (0, 0)))
    b_pad = jnp.pad(bb, ((0, 0), (1, 0), (0, 0)))
    y = (a_pad + b_pad).reshape(B, (T + 1) * t)[:, t // 2: t // 2 + T * t]
    return y[..., None] + p["b"]


# ---------------------------------------------------------------------------
# Multi-period discriminator
# ---------------------------------------------------------------------------

class DiscriminatorP:
    """Period discriminator: reshape wav to [T/p, p] and run 2-D convs
    (hifigan_causal.py:347-389).

    ``use_cond`` (hifigan_causal.py:349-355): a ConvTranspose1d upsamples the
    conditioning mel to waveform rate and joins as a second input channel.
    NOTE the reference's own cond path is broken upstream — it imports
    ``utils.hparams`` which does not exist in its tree (only
    ``utils/commons/hparams.py`` does); behaviour here follows the evident
    intent (t = hop_size)."""

    def __init__(self, period: int, kernel_size: int = 5, stride: int = 3,
                 use_cond: bool = False, hop: int = 320):
        self.period = period
        self.k = kernel_size
        self.s = stride
        self.use_cond = use_cond
        self.hop = hop
        c_in = 2 if use_cond else 1
        self.layers = [(c_in, 32), (32, 128), (128, 512), (512, 1024),
                       (1024, 1024)]

    def init(self, key) -> Params:
        keys = iter(jax.random.split(key, len(self.layers) + 2))
        convs = [_wn_conv_init(next(keys), co, ci, self.k, 1) for ci, co in self.layers]
        post = _wn_conv_init(next(keys), 1, 1024, 3, 1)
        p = {"convs": convs, "post": post}
        if self.use_cond:
            p["cond"] = _cond_net_init(next(keys), self.hop)
        return p

    def apply(self, params: Params, x: Array, mel: Array | None = None):
        """x: [B, T, 1] → (logits [B, N], fmaps)."""
        if self.use_cond:
            x_mel = _cond_net_apply(params["cond"], mel, self.hop)
            x = jnp.concatenate([x_mel, x], axis=-1)  # ref cats [x_mel, x]
        B, T, C = x.shape
        p = self.period
        if T % p != 0:
            n_pad = p - (T % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            T = T + n_pad
        x = x.reshape(B, T // p, p, C)  # [B, T/p, p, C] (H=T/p, W=p)
        fmap = []
        for i, c in enumerate(params["convs"]):
            stride = (self.s, 1) if i < 4 else (1, 1)
            pad = (2, 2) if i < 4 else (2, 2)
            x = ops.conv2d(x, ops.weight_norm_weight(c), c["b"], stride=stride,
                           padding=((pad[0], pad[1]), (0, 0)))
            x = jax.nn.leaky_relu(x, LRELU)
            fmap.append(x)
        x = ops.conv2d(x, ops.weight_norm_weight(params["post"]), params["post"]["b"],
                       padding=((1, 1), (0, 0)))
        fmap.append(x)
        return x.reshape(B, -1), fmap


class MultiPeriodDiscriminator:
    PERIODS = (2, 3, 5, 7, 11)

    def __init__(self, use_cond: bool = False, hop: int = 320):
        self.discs = [DiscriminatorP(p, use_cond=use_cond, hop=hop)
                      for p in self.PERIODS]

    def init(self, key) -> Params:
        return {"discs": [d.init(k) for d, k in
                          zip(self.discs, jax.random.split(key, len(self.discs)))]}

    def apply(self, params: Params, y: Array, y_hat: Array,
              mel: Array | None = None):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d, p in zip(self.discs, params["discs"]):
            r, fr = d.apply(p, y, mel)
            g, fg = d.apply(p, y_hat, mel)
            y_d_rs.append(r); fmap_rs.append(fr)
            y_d_gs.append(g); fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# Multi-scale discriminator
# ---------------------------------------------------------------------------

class DiscriminatorS:
    """Scale discriminator: grouped strided 1-D convs (hifigan_causal.py:419-452).

    ``use_spectral_norm=True`` (the full-rate scale, hifigan_causal.py:460)
    stores raw weights and Lipschitz-constrains them via power iteration at
    apply time (torch nn.utils.spectral_norm equivalent)."""

    def __init__(self, use_spectral_norm: bool = False,
                 use_cond: bool = False, up_t: int = 320):
        self.spectral = use_spectral_norm
        self.use_cond = use_cond
        self.up_t = up_t  # prod(upsample_rates) at this scale's wav rate
        c_in = 2 if use_cond else 1
        # (in, out, k, stride, groups, pad)
        self.LAYERS = [(c_in, 128, 15, 1, 1, 7), (128, 128, 41, 2, 4, 20),
                       (128, 256, 41, 2, 16, 20), (256, 512, 41, 4, 16, 20),
                       (512, 1024, 41, 4, 16, 20), (1024, 1024, 41, 1, 16, 20),
                       (1024, 1024, 5, 1, 1, 2)]

    def _conv_init(self, key, out_ch, in_ch, k):
        if not self.spectral:
            return _wn_conv_init(key, out_ch, in_ch, k)
        kw, kb = jax.random.split(key)
        shape = (out_ch, in_ch, k)
        return {"w": inits.kaiming_uniform(kw, shape),
                "b": inits.default_bias(kb, (out_ch,), shape)}

    def _weight(self, c: Params) -> Array:
        return ops.spectral_norm_weight(c["w"]) if self.spectral \
            else ops.weight_norm_weight(c)

    def init(self, key) -> Params:
        keys = iter(jax.random.split(key, len(self.LAYERS) + 2))
        convs = [self._conv_init(next(keys), co, ci // g, k)
                 for ci, co, k, s, g, pd in self.LAYERS]
        # note: torch Conv1d weight is [out, in/groups, k]
        post = self._conv_init(next(keys), 1, 1024, 3)
        p = {"convs": convs, "post": post}
        if self.use_cond:
            p["cond"] = _cond_net_init(next(keys), self.up_t)
        return p

    def apply(self, params: Params, x: Array, mel: Array | None = None):
        if self.use_cond:
            x_mel = _cond_net_apply(params["cond"], mel, self.up_t)
            x = jnp.concatenate([x_mel, x], axis=-1)
        fmap = []
        for (ci, co, k, s, g, pd), c in zip(self.LAYERS, params["convs"]):
            x = ops.conv1d(x, self._weight(c), c["b"], stride=s,
                           padding=(pd, pd), groups=g)
            x = jax.nn.leaky_relu(x, LRELU)
            fmap.append(x)
        x = ops.conv1d(x, self._weight(params["post"]), params["post"]["b"],
                       padding=(1, 1))
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


def _avg_pool1d(x: Array, k: int = 4, s: int = 2, pad: int = 1) -> Array:
    """torch AvgPool1d(4,2,padding=1) with count_include_pad=True."""
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    B, T, C = x.shape
    n = (T - k) // s + 1
    idx = np.arange(n)[:, None] * s + np.arange(k)[None, :]
    return x[:, idx, :].mean(axis=2)


class MultiScaleDiscriminator:
    def __init__(self, use_cond: bool = False, hop: int = 320):
        # first (full-rate) scale is spectral-normed (hifigan_causal.py:460);
        # the cond upsampler stride per scale is prod(upsample_rates) =
        # 4*4*(hop >> 4+i) = hop / 2^i, matching the avg-pooled wav rate
        # (hifigan_causal.py:458-466)
        self.discs = [
            DiscriminatorS(use_spectral_norm=True, use_cond=use_cond, up_t=hop),
            DiscriminatorS(use_cond=use_cond, up_t=hop // 2),
            DiscriminatorS(use_cond=use_cond, up_t=hop // 4)]

    def init(self, key) -> Params:
        return {"discs": [d.init(k) for d, k in
                          zip(self.discs, jax.random.split(key, 3))]}

    def apply(self, params: Params, y: Array, y_hat: Array,
              mel: Array | None = None):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, (d, p) in enumerate(zip(self.discs, params["discs"])):
            if i != 0:
                y = _avg_pool1d(y)
                y_hat = _avg_pool1d(y_hat)
            r, fr = d.apply(p, y, mel)
            g, fg = d.apply(p, y_hat, mel)
            y_d_rs.append(r); fmap_rs.append(fr)
            y_d_gs.append(g); fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# Multi-window mel discriminator (Conan adversarial mel loss)
# ---------------------------------------------------------------------------

class SingleWindowDisc:
    """3× [conv2d s2 → lrelu(0.2) → dropout2d(0.25) → BN] + linear head
    (multi_window_disc.py:6-44). BN eps=0.8 replicates the reference's
    (accidental) positional eps."""

    def __init__(self, time_length: int, freq_length: int = 80, hidden: int = 128):
        self.t = time_length
        self.f = freq_length
        self.h = hidden
        self.ds = (time_length // 8, (freq_length + 7) // 8)

    def init(self, key) -> Params:
        k1, k2, k3, k4 = jax.random.split(key, 4)

        def conv(k, ci, co):
            kw, kb = jax.random.split(k)
            return {"w": inits.kaiming_uniform(kw, (co, ci, 3, 3)),
                    "b": inits.default_bias(kb, (co,), (co, ci, 3, 3))}

        return {
            "c0": conv(k1, 1, self.h), "c1": conv(k2, self.h, self.h),
            "c2": conv(k3, self.h, self.h),
            "bn0": {"scale": inits.ones((self.h,)), "bias": inits.zeros((self.h,))},
            "bn1": {"scale": inits.ones((self.h,)), "bias": inits.zeros((self.h,))},
            "out": init_linear(k4, 1, self.h * self.ds[0] * self.ds[1]),
        }

    def _bn(self, x: Array, p: Params, eps: float = 0.8) -> Array:
        # training-mode batch stats over (B,H,W); running stats unused in the
        # training loop (discriminator is never evaluated in eval mode)
        mu = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))
        return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]

    def apply(self, params: Params, x: Array, rng=None, train: bool = False):
        """x: [B, T_win, M, 1] → (validity [B,1], hiddens)."""
        h = []
        for i, name in enumerate(["c0", "c1", "c2"]):
            c = params[name]
            x = ops.conv2d(x, c["w"], c["b"], stride=(2, 2), padding=((1, 1), (1, 1)))
            x = jax.nn.leaky_relu(x, 0.2)
            if train and rng is not None:
                rng, r = jax.random.split(rng)
                # Dropout2d: drop whole channels
                keep = jax.random.bernoulli(r, 0.75, (x.shape[0], 1, 1, x.shape[3]))
                x = jnp.where(keep, x / 0.75, 0.0)
            if i < 2:
                x = self._bn(x, params[f"bn{i}"])
            h.append(x)
        # torch view flattens [B, C, H, W] — transpose back to channels-first order
        xf = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        return linear(xf, params["out"]), h


class MultiWindowDiscriminator:
    """Random-crop windows of 32/64/128 frames (multi_window_disc.py:46-105).
    Crops are chosen by traced jax.random; a window longer than the batch's
    max length contributes zero (masked), replacing the reference's dynamic
    "skip" with a static-shape select."""

    def __init__(self, time_lengths=(32, 64, 128), freq_length: int = 80,
                 hidden: int = 128):
        self.windows = tuple(time_lengths)
        self.discs = [SingleWindowDisc(t, freq_length, hidden) for t in self.windows]

    def init(self, key) -> Params:
        return {"discs": [d.init(k) for d, k in
                          zip(self.discs, jax.random.split(key, len(self.discs)))]}

    def apply(self, params: Params, mel: Array, rng, *, train: bool = False,
              start_frames: list[Array] | None = None):
        """mel [B, T, M] → (summed validity [B,1], hiddens, start frames used,
        fit). ``fit`` is a traced scalar bool: True only when EVERY window
        engaged — the reference returns validity=None when any window does not
        fit (multi_window_disc.py:71-79) and the task then skips the GAN
        losses for that batch; callers must gate on ``fit`` the same way."""
        B, T, M = mel.shape
        x_len = (jnp.abs(mel).sum(-1) > 0).astype(jnp.int32).sum(-1)  # [B]
        validity = jnp.zeros((B, 1))
        hiddens = []
        starts_used = []
        fit = jnp.asarray(True)
        for i, (w, d, p) in enumerate(zip(self.windows, self.discs, params["discs"])):
            if T < w:  # statically impossible window
                starts_used.append(None)
                fit = fit & jnp.asarray(False)
                continue
            fit = fit & (jnp.max(x_len) >= w)  # dynamic: ref clip T_end >= 0
            if start_frames is not None and start_frames[i] is not None:
                start = start_frames[i]
            else:
                rng, r = jax.random.split(rng)
                max_start = jnp.maximum(jnp.max(x_len) - w, 0)
                start = jax.random.randint(r, (), 0, jnp.maximum(max_start, 0) + 1)
            starts_used.append(start)
            clip = jax.lax.dynamic_slice_in_dim(mel, start, w, axis=1)
            rng, r2 = jax.random.split(rng)
            v, hs = d.apply(p, clip[..., None], r2, train=train)
            validity = validity + v
            hiddens.extend(hs)
        return validity, hiddens, starts_used, fit
