"""Rectified-flow heads: F0 (ReflowF0) and mel postnet (FlowMel).

TPU redesign of `/root/reference/modules/Conan/flow/{flow_f0.py,flow.py}` and
the denoiser nets `/root/reference/modules/Conan/diff/net.py`:

  * The reference integrates its "NeuralODE" on a fixed linspace grid with the
    euler solver (flow_f0.py:137-141), so the torchdyn dependency reduces to
    fixed-step Euler — here a `lax.scan` over K steps, fully jittable.
  * ``MaskedCausalConv1d`` (net.py:53-75: center-masked k=3 kernel ⇒ taps at
    offsets {-d, 0}) becomes a 2-tap causal conv — same math, no wasted tap.
  * Everything is channels-last; x states are [B, T, C] (C = 1 for F0,
    80 for mel) instead of the reference's [B, 1, M, T].
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from conan_tpu import ops
from conan_tpu.nn import inits
from conan_tpu.nn.blocks import init_conv, init_linear, linear, timestep_embedding
from conan_tpu.nn.module import Params, Stream

Array = jax.Array


def mish(x: Array) -> Array:
    return x * jnp.tanh(jax.nn.softplus(x))


@dataclasses.dataclass(frozen=True)
class DiffNetConfig:
    in_dims: int = 1           # 1 for F0, 80 for mel postnet
    encoder_hidden: int = 256
    residual_layers: int = 10
    residual_channels: int = 192
    dilation_cycle_length: int = 4

    @classmethod
    def f0_from_hparams(cls, hp) -> "DiffNetConfig":
        return cls(in_dims=1, encoder_hidden=hp["hidden_size"],
                   residual_layers=hp["f0_residual_layers"],
                   residual_channels=hp["f0_residual_channels"],
                   dilation_cycle_length=hp["f0_dilation_cycle_length"])

    @classmethod
    def mel_from_hparams(cls, hp) -> "DiffNetConfig":
        return cls(in_dims=hp.get("audio_num_mel_bins", 80),
                   encoder_hidden=hp["hidden_size"],
                   residual_layers=hp["residual_layers"],
                   residual_channels=hp["residual_channels"],
                   dilation_cycle_length=hp["dilation_cycle_length"])


class DiffNet:
    """WaveNet-style denoiser with strictly causal dilated convs
    (reference DiffNet/F0DiffNet, net.py:118-319; identical structure, the
    layer count/channels differ by config)."""

    def __init__(self, cfg: DiffNetConfig):
        self.cfg = cfg

    def init(self, key) -> Params:
        cfg = self.cfg
        C = cfg.residual_channels
        keys = iter(jax.random.split(key, 4 * cfg.residual_layers + 8))
        layers = []
        for i in range(cfg.residual_layers):
            layers.append({
                # 2-tap causal equivalent of MaskedCausalConv1d(k=3): offsets {-d, 0}
                "dilated": init_conv(next(keys), 2 * C, C, 2, init="torch"),
                "diff_proj": init_linear(next(keys), C, C),
                "cond_proj": init_conv(next(keys), 2 * C, cfg.encoder_hidden, 1,
                                       init="kaiming_relu"),
                "out_proj": init_conv(next(keys), 2 * C, C, 1, init="kaiming_relu"),
            })
        return {
            "in_proj": init_conv(next(keys), C, cfg.in_dims, 1, init="kaiming_relu"),
            "mlp1": init_linear(next(keys), 4 * C, C),
            "mlp2": init_linear(next(keys), C, 4 * C),
            "layers": layers,
            "skip_proj": init_conv(next(keys), C, C, 1, init="kaiming_relu"),
            "out_proj": {"w": inits.zeros((cfg.in_dims, C, 1)),
                         "b": inits.zeros((cfg.in_dims,))},
        }

    def apply(self, params: Params, x: Array, t: Array, cond: Array,
              *, stream: Stream | None = None, prefix: str = "dn") -> Array:
        """x: [B, T, in_dims] noisy sample, t: [B] int steps, cond: [B, T, H]
        → velocity [B, T, in_dims]."""
        cfg = self.cfg
        C = cfg.residual_channels
        s = stream or Stream(None)
        h = ops.conv1d(x, params["in_proj"]["w"], params["in_proj"]["b"])
        h = jax.nn.relu(h)
        temb = timestep_embedding(t, C)
        temb = linear(mish(linear(temb, params["mlp1"])), params["mlp2"])  # [B, C]
        skip_sum = jnp.zeros_like(h)
        for i, lp in enumerate(params["layers"]):
            d = 2 ** (i % cfg.dilation_cycle_length)
            y = h + linear(temb, lp["diff_proj"])[:, None, :]
            if s.streaming:
                y, carry = ops.causal_conv1d_step(y, s.state[f"{prefix}.{i}"],
                                                  lp["dilated"]["w"], lp["dilated"]["b"],
                                                  dilation=d)
                s.new_state[f"{prefix}.{i}"] = carry
            else:
                y = ops.causal_conv1d(y, lp["dilated"]["w"], lp["dilated"]["b"], dilation=d)
            y = y + ops.conv1d(cond, lp["cond_proj"]["w"], lp["cond_proj"]["b"])
            gate, filt = y[..., :C], y[..., C:]
            y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
            y = ops.conv1d(y, lp["out_proj"]["w"], lp["out_proj"]["b"])
            res, skip = y[..., :C], y[..., C:]
            h = (h + res) / math.sqrt(2.0)
            skip_sum = skip_sum + skip
        y = skip_sum / math.sqrt(cfg.residual_layers)
        y = ops.conv1d(y, params["skip_proj"]["w"], params["skip_proj"]["b"])
        y = jax.nn.relu(y)
        return ops.conv1d(y, params["out_proj"]["w"], params["out_proj"]["b"])

    def init_state(self, batch: int, prefix: str = "dn", dtype=jnp.float32) -> dict:
        cfg = self.cfg
        return {f"{prefix}.{i}": ops.causal_conv1d_state(
                    batch, cfg.residual_channels, 2, 2 ** (i % cfg.dilation_cycle_length), dtype)
                for i in range(cfg.residual_layers)}

    def params_from_torch(self, sd: dict, prefix: str = "") -> Params:
        """Map reference F0DiffNet/DiffNet state_dict (MaskedCausalConv1d k=3
        keeps taps 0,1 → our 2-tap kernel)."""
        import numpy as np

        def g(name):
            return jnp.asarray(np.asarray(sd[prefix + name]))

        layers = []
        i = 0
        while f"{prefix}residual_layers.{i}.dilated_conv.weight" in sd:
            layers.append({
                "dilated": {"w": g(f"residual_layers.{i}.dilated_conv.weight")[:, :, :2],
                            "b": g(f"residual_layers.{i}.dilated_conv.bias")},
                "diff_proj": {"w": g(f"residual_layers.{i}.diffusion_projection.weight"),
                              "b": g(f"residual_layers.{i}.diffusion_projection.bias")},
                "cond_proj": {"w": g(f"residual_layers.{i}.conditioner_projection.weight"),
                              "b": g(f"residual_layers.{i}.conditioner_projection.bias")},
                "out_proj": {"w": g(f"residual_layers.{i}.output_projection.weight"),
                             "b": g(f"residual_layers.{i}.output_projection.bias")},
            })
            i += 1
        return {
            "in_proj": {"w": g("input_projection.weight"), "b": g("input_projection.bias")},
            "mlp1": {"w": g("mlp.0.weight"), "b": g("mlp.0.bias")},
            "mlp2": {"w": g("mlp.2.weight"), "b": g("mlp.2.bias")},
            "layers": layers,
            "skip_proj": {"w": g("skip_projection.weight"), "b": g("skip_projection.bias")},
            "out_proj": {"w": g("output_projection.weight"), "b": g("output_projection.bias")},
        }


# ---------------------------------------------------------------------------
# Rectified flow (straight-line interpolation + Euler integration)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ReflowConfig:
    timesteps: int = 1000
    k_step: int = 100
    loss_type: str = "l1"
    sample_clip: bool = True          # hparams['f0_sample_clip']
    qsample_sigma: float = 0.0        # hparams['flow_qsample']=='sig' → 1e-4


class RectifiedFlow:
    """Shared math for ReflowF0 (flow_f0.py:44-152) and FlowMel (flow.py:71-203)."""

    def __init__(self, net: DiffNet, cfg: ReflowConfig):
        self.net = net
        self.cfg = cfg

    def q_sample(self, x1: Array, x0: Array, t: Array, rng=None) -> Array:
        tf = (t.astype(jnp.float32) / self.cfg.timesteps)[:, None, None]
        xt = tf * x1 + (1.0 - tf) * x0
        if self.cfg.qsample_sigma > 0 and rng is not None:
            xt = xt + self.cfg.qsample_sigma * jax.random.normal(rng, xt.shape)
        return xt

    def p_losses(self, params: Params, x1: Array, t: Array, cond: Array, rng,
                 nonpadding: Array | None = None) -> Array:
        """x1: [B, T, C] target; returns scalar velocity loss."""
        r0, r1 = jax.random.split(rng)
        x0 = jax.random.normal(r0, x1.shape)
        xt = self.q_sample(x1, x0, t, r1)
        v_pred = self.net.apply(params, xt, t, cond)
        ut = x1 - x0
        err = jnp.abs(ut - v_pred) if self.cfg.loss_type == "l1" else jnp.square(ut - v_pred)
        if nonpadding is not None:
            m = nonpadding[..., None] if nonpadding.ndim == 2 else nonpadding
            return jnp.sum(err * m) / (jnp.sum(jnp.broadcast_to(m, err.shape)) + 1e-8)
        return jnp.mean(err)

    def sample(self, params: Params, cond: Array, x0: Array,
               dyn_clip: tuple[Array, Array] | None = None,
               ucond: Array | None = None, cfg_scale: float = 1.0) -> Array:
        """Fixed-step Euler from t=0 to 1 over k_step steps (replaces torchdyn;
        the reference's adaptive solver ran on the same fixed grid anyway).

        cond: [B, T, H], x0: [B, T, C] initial noise → x1 [B, T, C].
        """
        K, T_steps = self.cfg.k_step, self.cfg.timesteps

        def euler_step(x, i):
            t_cont = i.astype(jnp.float32) / K
            t_idx = (t_cont * T_steps).astype(jnp.int32)
            t_b = jnp.full((x.shape[0],), t_idx, jnp.int32)
            if ucond is not None:
                v_c = self.net.apply(params, x, t_b, cond)
                v_u = self.net.apply(params, x, t_b, ucond)
                ut = v_u + cfg_scale * (v_c - v_u)
            else:
                ut = self.net.apply(params, x, t_b, cond)
            if self.cfg.sample_clip:
                # reference Wrapper (flow_f0.py:32-42): clip the implied x1
                # using the QUANTIZED t (t_idx/num_timesteps)
                tq = t_idx.astype(jnp.float32) / T_steps
                x_recon = (1.0 - tq) * ut + x
                if dyn_clip is not None:
                    x_recon = jnp.clip(x_recon, dyn_clip[0], dyn_clip[1])
                else:
                    x_recon = jnp.clip(x_recon, -1.0, 1.0)
                ut = (x_recon - x) / jnp.maximum(1.0 - tq, 1e-8)
            return x + ut / K, None

        x, _ = jax.lax.scan(euler_step, x0, jnp.arange(K))
        return x


class StreamingRectifiedFlow:
    """Chunkwise rectified-flow sampling.

    The offline sampler integrates the whole utterance jointly; because the
    denoiser is strictly causal, frame i's Euler trajectory depends only on
    frames ≤ i — so carrying, for EACH of the K Euler steps, the denoiser's
    conv input tails from the previous chunk reproduces the offline
    trajectory exactly (given the same per-frame initial noise). State is the
    K-stacked DiffNet conv-carry pytree, scanned over.
    """

    def __init__(self, flow: "RectifiedFlow"):
        self.flow = flow

    def init_state(self, batch: int, dtype=jnp.float32) -> dict:
        base = self.flow.net.init_state(batch, prefix="dn", dtype=dtype)
        K = self.flow.cfg.k_step
        return {k: jnp.broadcast_to(v, (K,) + v.shape) for k, v in base.items()}

    def step(self, params: Params, conv_states: dict, cond_chunk: Array,
             x0_chunk: Array, dyn_clip=None) -> tuple[Array, dict]:
        """cond [B, Tc, H], x0 [B, Tc, C] → (x1 [B, Tc, C], states')."""
        K, T_steps = self.flow.cfg.k_step, self.flow.cfg.timesteps
        sample_clip = self.flow.cfg.sample_clip
        net = self.flow.net

        def body(x, xs):
            i, state_k = xs
            t_cont = i.astype(jnp.float32) / K
            t_idx = (t_cont * T_steps).astype(jnp.int32)
            t_b = jnp.full((x.shape[0],), t_idx, jnp.int32)
            s = Stream(state_k)
            ut = net.apply(params, x, t_b, cond_chunk, stream=s, prefix="dn")
            if sample_clip:
                tq = t_idx.astype(jnp.float32) / T_steps
                x_recon = (1.0 - tq) * ut + x
                if dyn_clip is not None:
                    x_recon = jnp.clip(x_recon, dyn_clip[0], dyn_clip[1])
                else:
                    x_recon = jnp.clip(x_recon, -1.0, 1.0)
                ut = (x_recon - x) / jnp.maximum(1.0 - tq, 1e-8)
            return x + ut / K, s.new_state

        x, new_states = jax.lax.scan(body, x0_chunk,
                                     (jnp.arange(K), conv_states))
        return x, new_states


def minmax_norm_f0(x: Array, uv: Array | None = None) -> Array:
    """log2-F0 → [-1, 1] (reference add_flow_pitch, Conan.py:428-437)."""
    y = (x - 6.0) / 4.0 * 2.0 - 1.0
    if uv is not None:
        y = jnp.where(uv > 0, 0.0, y)
    return y


def minmax_denorm_f0(x: Array, uv: Array | None = None) -> Array:
    y = (x + 1.0) / 2.0 * 4.0 + 6.0
    if uv is not None:
        y = jnp.where(uv > 0, 0.0, y)
    return y


def norm_spec(x: Array, spec_min: Array, spec_max: Array) -> Array:
    return (x - spec_min) / (spec_max - spec_min) * 2.0 - 1.0


def denorm_spec(x: Array, spec_min: Array, spec_max: Array) -> Array:
    return (x + 1.0) / 2.0 * (spec_max - spec_min) + spec_min
