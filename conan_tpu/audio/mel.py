"""Mel-spectrogram frontends.

The reference uses TWO distinct mel transforms (SURVEY.md §7 step 2):

  1. ``wav2mel_librosa`` — feature frontend for the acoustic model/binarizer:
     librosa.stft(center=True, pad_mode="constant") → |.| → mel → log10(max(eps,.))
     (`/root/reference/utils/audio/__init__.py:37-84`)
  2. ``wav2mel_gan`` — HiFi-GAN loss mel: manual reflect pad of (n_fft-hop)/2,
     torch.stft(center=False) → sqrt(pow+1e-9) → mel → ln(clamp(.,1e-5))
     (`/root/reference/modules/vocoder/hifigan/mel_utils.py:99-120`)

Both are jittable pure functions of [B, T] waveforms, all matmul/conv on MXU.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from conan_tpu.ops.stft import mel_filterbank, stft_magnitude

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 16000
    n_fft: int = 1024
    hop: int = 320
    win_length: int = 1024
    n_mels: int = 80
    fmin: float = 80.0
    fmax: float = 7600.0

    @classmethod
    def from_hparams(cls, hp) -> "MelConfig":
        return cls(
            sample_rate=hp["audio_sample_rate"], n_fft=hp["fft_size"],
            hop=hp["hop_size"], win_length=hp["win_size"],
            n_mels=hp.get("audio_num_mel_bins", 80),
            fmin=float(hp["fmin"]), fmax=float(hp["fmax"]),
        )


def wav2mel_librosa(wav: Array, cfg: MelConfig, eps: float = 1e-6) -> Array:
    """[B, T] → [B, frames, n_mels] log10-mel, librosa_wav2spec-compatible."""
    mag = stft_magnitude(
        wav, n_fft=cfg.n_fft, hop=cfg.hop, win_length=cfg.win_length,
        center=True, pad_mode="constant",
    )  # [B, F, bins]
    basis = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    mel = mag @ basis.T
    return jnp.log10(jnp.maximum(eps, mel))


def wav2mel_frontend(wav: Array, cfg: MelConfig) -> Array:
    """Jitted feature frontend used by the serving engine and binarizer.

    On TPU this runs the fused Pallas log-mel kernel (bit-identical to the
    XLA path, ~1.3× faster); elsewhere the XLA path. Inference/data-prep only
    (training losses use the differentiable transforms)."""
    return _frontend_jit(wav, cfg)


@functools.lru_cache(maxsize=None)
def _frontend_fn(cfg: MelConfig):
    import jax

    if jax.default_backend() == "tpu":
        from conan_tpu.ops.pallas_stft import pallas_wav2mel_librosa

        return jax.jit(lambda w: pallas_wav2mel_librosa(w, cfg))
    return jax.jit(lambda w: wav2mel_librosa(w, cfg))


def _frontend_jit(wav: Array, cfg: MelConfig) -> Array:
    return _frontend_fn(cfg)(wav)


def wav2mel_gan(wav: Array, cfg: MelConfig, clip_val: float = 1e-5) -> Array:
    """[B, T] → [B, frames, n_mels] ln-mel, cal_mel_spec-compatible.

    frames = T // hop when (n_fft - hop) is the total manual pad, matching the
    reference's ``int((n_fft - hop_size)/2)`` reflect pad on both sides.
    """
    wav = jnp.clip(wav, -1.0, 1.0)
    p = (cfg.n_fft - cfg.hop) // 2
    wav = jnp.pad(wav, ((0, 0), (p, p)), mode="reflect")
    mag = stft_magnitude(
        wav, n_fft=cfg.n_fft, hop=cfg.hop, win_length=cfg.win_length,
        center=False, eps_under_sqrt=1e-9,
    )
    basis = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    mel = mag @ basis.T
    return jnp.log(jnp.clip(mel, min=clip_val))
