"""Engine composition from trained checkpoints.

The reference composes three separately trained checkpoint dirs at inference
(`/root/reference/inference/Conan.py:26-52`: work_dir + emformer_ckpt +
vocoder_ckpt, each with its own config.yaml). Same here, against conan_tpu
checkpoints (train/checkpoint.py format), plus a vocoder registry mirroring
`tasks/tts/vocoder_infer/base_vocoder.py:6-18`.
"""

from __future__ import annotations

import os

import jax

from conan_tpu.config import HParams, load_config
from conan_tpu.infer.streaming import StreamingConfig, StreamingVoiceConversion
from conan_tpu.audio.mel import MelConfig
from conan_tpu.models.conan.model import ConanConfig
from conan_tpu.models.emformer import EmformerConfig
from conan_tpu.models.vocoder.hifigan import HifiGanConfig, HifiGanGenerator
from conan_tpu.train.checkpoint import load_ckpt_state

VOCODER_REGISTRY: dict[str, type] = {}


def register_vocoder(name: str):
    def deco(cls):
        VOCODER_REGISTRY[name] = cls
        return cls
    return deco


def get_vocoder_cls(name: str):
    return VOCODER_REGISTRY[name]


register_vocoder("HifiGAN")(HifiGanGenerator)

from conan_tpu.models.vocoder.hifigan_noncausal import NonCausalHifiGanGenerator  # noqa: E402
from conan_tpu.models.vocoder.hifigan_nsf import NsfHifiGanGenerator  # noqa: E402

register_vocoder("HifiGAN_noncausal")(NonCausalHifiGanGenerator)
register_vocoder("HifiGAN_NSF")(NsfHifiGanGenerator)


def _load_dir_config(ckpt_dir: str) -> HParams:
    cfg_path = os.path.join(ckpt_dir, "config.yaml")
    if os.path.exists(cfg_path):
        return HParams(load_config(cfg_path))
    return HParams({})


def build_engine(conan_dir: str, emformer_dir: str, vocoder_dir: str,
                 hp: HParams | None = None,
                 serving_precision: str = "exact") -> StreamingVoiceConversion:
    """Load the three stage checkpoints and build the streaming engine.

    ``serving_precision`` selects the exact/high/fast matmul ladder of the
    engine (see StreamingVoiceConversion); checkpoints' ``serving_precision``
    hparam is honored when the caller does not override."""
    hp_conan = hp or _load_dir_config(conan_dir)
    hp_emf = _load_dir_config(emformer_dir)
    hp_voc = _load_dir_config(vocoder_dir)

    cfg = StreamingConfig(
        mel=MelConfig.from_hparams(hp_conan) if "hop_size" in hp_conan else MelConfig(),
        emformer=(EmformerConfig.from_hparams(hp_emf)
                  if "emformer_layers" in hp_emf else EmformerConfig()),
        conan=(ConanConfig.from_hparams(hp_conan)
               if "hidden_size" in hp_conan else ConanConfig()),
        vocoder=(HifiGanConfig.from_hparams(hp_voc)
                 if "upsample_rates" in hp_voc else HifiGanConfig()),
    )
    emformer_params = load_ckpt_state(emformer_dir, "params")
    conan_state = load_ckpt_state(conan_dir)
    vocoder_params = load_ckpt_state(vocoder_dir, "params_g")
    if serving_precision == "exact" and hp_conan.get("serving_precision"):
        serving_precision = str(hp_conan["serving_precision"])
    return StreamingVoiceConversion(
        cfg,
        jax.tree.map(jax.numpy.asarray, emformer_params),
        jax.tree.map(jax.numpy.asarray, conan_state["params_g"]),
        jax.tree.map(jax.numpy.asarray, conan_state["vq_state"])
        if conan_state.get("vq_state") is not None else None,
        jax.tree.map(jax.numpy.asarray, vocoder_params),
        serving_precision=serving_precision,
    )
