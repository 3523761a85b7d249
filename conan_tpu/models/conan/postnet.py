"""Mel rectified-flow postnet (optional stage 4).

TPU redesign of ``ConanPostnet`` (`/root/reference/modules/Conan/Conan.py:
592-629`) + ``FlowMel`` (`modules/Conan/flow/flow.py:71-203`): conditions on
concat(coarse mel_out.detach(), decoder_inp) → Linear → rectified flow over
spec-normalized mel with fixed-step Euler (K=25), optional classifier-free
guidance (Wrapper_CFG, flow.py:51-67).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from conan_tpu.models.conan.flow import (DiffNet, DiffNetConfig, RectifiedFlow,
                                         ReflowConfig, denorm_spec, norm_spec)
from conan_tpu.nn.blocks import init_linear, linear
from conan_tpu.nn.module import Params

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PostnetConfig:
    hidden_size: int = 256
    n_mels: int = 80
    timesteps: int = 1000
    k_step: int = 25
    loss_type: str = "l1"
    residual_layers: int = 20
    residual_channels: int = 256
    dilation_cycle_length: int = 4
    spec_min: tuple[float, ...] = (-6.0,) * 80
    spec_max: tuple[float, ...] = (0.0,) * 80

    @classmethod
    def from_hparams(cls, hp) -> "PostnetConfig":
        return cls(
            hidden_size=hp["hidden_size"], n_mels=hp.get("audio_num_mel_bins", 80),
            timesteps=hp.get("timesteps", 1000), k_step=hp.get("K_step", 25),
            loss_type=hp.get("flow_loss_type", "l1"),
            residual_layers=hp.get("residual_layers", 20),
            residual_channels=hp.get("residual_channels", 256),
            dilation_cycle_length=hp.get("dilation_cycle_length", 4),
            spec_min=tuple(hp["spec_min"]), spec_max=tuple(hp["spec_max"]),
        )


class ConanPostnet:
    def __init__(self, cfg: PostnetConfig):
        self.cfg = cfg
        self.net = DiffNet(DiffNetConfig(
            in_dims=cfg.n_mels, encoder_hidden=cfg.hidden_size,
            residual_layers=cfg.residual_layers,
            residual_channels=cfg.residual_channels,
            dilation_cycle_length=cfg.dilation_cycle_length))
        self.flow = RectifiedFlow(self.net, ReflowConfig(
            timesteps=cfg.timesteps, k_step=cfg.k_step, loss_type=cfg.loss_type,
            sample_clip=False))
        self.spec_min = jnp.asarray(cfg.spec_min)
        self.spec_max = jnp.asarray(cfg.spec_max)

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {
            "ln_proj": init_linear(k1, self.cfg.hidden_size,
                                   self.cfg.n_mels + self.cfg.hidden_size),
            "flownet": self.net.init(k2),
        }

    def condition(self, params: Params, coarse_mel: Array, decoder_inp: Array) -> Array:
        """g = Linear(concat(stop_grad(mel_out), decoder_inp)) (Conan.py:622-629)."""
        g = jnp.concatenate([jax.lax.stop_gradient(coarse_mel), decoder_inp], axis=-1)
        return linear(g, params["ln_proj"])

    def loss(self, params: Params, coarse_mel: Array, decoder_inp: Array,
             gt_mel: Array, rng) -> Array:
        """Training: velocity loss on spec-normalized gt mel (flow.py:120-123)."""
        g = self.condition(params, coarse_mel, decoder_inp)
        x1 = norm_spec(gt_mel, self.spec_min, self.spec_max)
        r1, r2 = jax.random.split(rng)
        t = jax.random.randint(r1, (gt_mel.shape[0],), 0, self.cfg.timesteps)
        return self.flow.p_losses(params["flownet"], x1, t, g, r2)

    def sample(self, params: Params, coarse_mel: Array, decoder_inp: Array, rng,
               *, ucond_inp: Array | None = None, cfg_scale: float = 1.0,
               noise: Array | None = None) -> Array:
        """Inference: refine the coarse mel (flow.py:124-152)."""
        g = self.condition(params, coarse_mel, decoder_inp)
        x0 = noise if noise is not None else jax.random.normal(rng, coarse_mel.shape)
        ucond = None
        if ucond_inp is not None:
            ucond = self.condition(params, coarse_mel, ucond_inp)
        x = self.flow.sample(params["flownet"], g, x0, ucond=ucond,
                             cfg_scale=cfg_scale)
        return denorm_spec(x, self.spec_min, self.spec_max)
