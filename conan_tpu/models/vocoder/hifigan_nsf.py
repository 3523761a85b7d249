"""NSF HiFi-GAN — harmonic-plus-noise source-filter vocoder (alt vocoder).

TPU port of `/root/reference/modules/vocoder/hifigan/hifigan_nsf.py:104-179`
+ the sine source `source.py:6-137,486-533`: a SourceModuleHnNSF excitation
(8 harmonics) is injected at every upsample level of the (non-causal)
HiFi-GAN through strided noise convs. Registered as ``HifiGAN_NSF``.

Kept as the offline/alt vocoder like the reference (the causal shuffle
generator is the streaming one).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from conan_tpu import ops
from conan_tpu.models.vocoder.hifigan import HifiGanConfig, _lrelu
from conan_tpu.models.vocoder.hifigan_noncausal import NonCausalHifiGanGenerator
from conan_tpu.nn.blocks import init_conv, init_linear, linear
from conan_tpu.nn.module import Params

Array = jax.Array


def sine_gen(f0: Array, rng, *, sample_rate: int, harmonic_num: int = 8,
             sine_amp: float = 0.1, noise_std: float = 0.003,
             voiced_threshold: float = 0.0, deterministic: bool = False):
    """SineGen.forward (source.py:103-136). f0 [B, T, 1] at AUDIO rate →
    (sine_waves [B, T, H+1], uv [B, T, 1], noise)."""
    B, T, _ = f0.shape
    dim = harmonic_num + 1
    mult = jnp.arange(1, dim + 1, dtype=jnp.float32)
    f0_buf = f0 * mult[None, None, :]
    rad = (f0_buf / sample_rate) % 1.0
    r1, r2 = jax.random.split(rng)
    if not deterministic:
        rand_ini = jax.random.uniform(r1, (B, dim)).at[:, 0].set(0.0)
        rad = rad.at[:, 0, :].add(rand_ini)
    # cumulative phase with the reference's overflow-compensation trick —
    # mathematically sin(2π cumsum(rad)); computed the same way for parity
    tmp = jnp.cumsum(rad, axis=1) % 1.0
    over = jnp.pad((tmp[:, 1:] - tmp[:, :-1]) < 0, ((0, 0), (1, 0), (0, 0)))
    shift = jnp.where(over, -1.0, 0.0)
    sines = jnp.sin(jnp.cumsum(rad + shift, axis=1) * 2 * np.pi)
    sine_waves = sines * sine_amp
    uv = (f0 > voiced_threshold).astype(jnp.float32)
    noise_amp = uv * noise_std + (1 - uv) * sine_amp / 3
    if deterministic:
        noise = jnp.zeros_like(sine_waves)
    else:
        noise = noise_amp * jax.random.normal(r2, sine_waves.shape)
    return sine_waves * uv + noise, uv, noise


class NsfHifiGanGenerator(NonCausalHifiGanGenerator):
    """Non-causal HiFi-GAN + per-level harmonic source injection."""

    HARMONIC_NUM = 8

    def __init__(self, cfg: HifiGanConfig, sample_rate: int = 16000, c_out: int = 1):
        super().__init__(cfg, c_out)
        self.sample_rate = sample_rate

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        p = super().init(k1)
        # source merge linear (harmonic_num+1 → 1, tanh)
        p["source_linear"] = init_linear(k2, 1, self.HARMONIC_NUM + 1)
        # noise convs: strided downsample of the audio-rate source to each level
        rates = self.cfg.upsample_rates
        keys = jax.random.split(k3, len(rates))
        ncs = []
        for i in range(len(rates)):
            if i + 1 < len(rates):
                stride = int(np.prod(rates[i + 1:]))
                ncs.append({"conv": init_conv(keys[i], self.channels[i + 1], 1,
                                              stride * 2),
                            "stride": stride})
            else:
                ncs.append({"conv": init_conv(keys[i], self.channels[i + 1], 1, 1),
                            "stride": 1})
        p["noise_convs"] = ncs
        return p

    def apply(self, params: Params, mel: Array, f0: Array | None = None,
              rng=None, deterministic: bool = False) -> Array:
        """mel [B, T, 80], f0 [B, T] frame-rate Hz → wav [B, T*stride, 1]."""
        cfg = self.cfg
        har = None
        if f0 is not None:
            total = cfg.total_stride
            # nearest-neighbor upsample of f0 to audio rate (torch nn.Upsample)
            f0_up = jnp.repeat(f0, total, axis=1)[..., None]
            if rng is None:
                rng = jax.random.PRNGKey(0)
            sine_waves, uv, _ = sine_gen(f0_up, rng, sample_rate=self.sample_rate,
                                         harmonic_num=self.HARMONIC_NUM,
                                         deterministic=deterministic)
            har = jnp.tanh(linear(sine_waves, params["source_linear"]))  # [B,Ta,1]
        x = ops.conv1d(mel, ops.weight_norm_weight(params["conv_pre"]),
                       params["conv_pre"]["b"], padding=(3, 3))
        n_rb = len(cfg.resblock_kernel_sizes)
        rb = 0
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            x = _lrelu(x)
            x = ops.conv_transpose1d(x, ops.weight_norm_weight(params["ups"][i]),
                                     params["ups"][i]["b"], stride=u,
                                     padding=(k - u) // 2)
            if har is not None:
                nc = params["noise_convs"][i]
                stride = nc["stride"]
                pad = stride // 2 if stride > 1 else 0
                xs_src = ops.conv1d(har, nc["conv"]["w"], nc["conv"]["b"],
                                    stride=stride, padding=(pad, pad))
                x = x + xs_src[:, : x.shape[1]]
            xs = None
            for j in range(n_rb):
                y = self._resblock(params["resblocks"][rb], x,
                                   cfg.resblock_kernel_sizes[j],
                                   cfg.resblock_dilation_sizes[j])
                xs = y if xs is None else xs + y
                rb += 1
            x = xs / n_rb
        x = jax.nn.leaky_relu(x, 0.01)
        x = ops.conv1d(x, ops.weight_norm_weight(params["conv_post"]),
                       params["conv_post"]["b"], padding=(3, 3))
        return jnp.tanh(x)

    def params_from_torch(self, sd: dict) -> Params:
        p = super().params_from_torch(sd)
        p["source_linear"] = {"w": jnp.asarray(np.asarray(sd["m_source.l_linear.weight"])),
                              "b": jnp.asarray(np.asarray(sd["m_source.l_linear.bias"]))}
        rates = self.cfg.upsample_rates
        ncs = []
        for i in range(len(rates)):
            stride = int(np.prod(rates[i + 1:])) if i + 1 < len(rates) else 1
            ncs.append({"conv": {"w": jnp.asarray(np.asarray(sd[f"noise_convs.{i}.weight"])),
                                 "b": jnp.asarray(np.asarray(sd[f"noise_convs.{i}.bias"]))},
                        "stride": stride})
        p["noise_convs"] = ncs
        return p
