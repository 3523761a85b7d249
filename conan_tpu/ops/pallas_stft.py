"""Pallas TPU kernel: fused log-mel spectrogram tail.

The XLA path (`conan_tpu.ops.stft`) computes |STFT| and mel as separate HLOs
with the [B, frames, 2·bins] real/imag tensor materialized in HBM between
them. Here the whole post-framing chain — windowed-DFT matmul (MXU) →
magnitude (VPU) → mel projection (MXU) → log — runs in one VMEM-resident
kernel per frame tile; only the framed wav goes in and only the [tile, mels]
log-mel comes out.

Framing itself (overlapping hop-strided windows) is left to an XLA gather:
Mosaic requires provably aligned dynamic VMEM loads, which hop=320 strides
can't satisfy, and the gather is a trivially-pipelined memory op.

This is the hot op of GAN vocoder training: every step computes 3-resolution
320-bin mel losses over raw waveforms (SURVEY.md §2.2 ◆ torch.stft
replacement).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conan_tpu.ops.stft import _dft_kernel_np, mel_filterbank_np

TILE_F = 128  # frames per program


def _kernel(frames_ref, basis_ref, mel_ref, out_ref, *, n_bins: int,
            eps_under_sqrt: float, log10: bool, clip: float):
    ri = jnp.dot(frames_ref[0], basis_ref[:], preferred_element_type=jnp.float32)
    re = ri[:, :n_bins]
    im = ri[:, n_bins:]
    mag = jnp.sqrt(re * re + im * im + eps_under_sqrt)
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32)
    out = jnp.log(jnp.maximum(mel, clip))
    if log10:
        out = out * (1.0 / np.log(10.0))
    out_ref[0] = out


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "win_length", "n_mels", "sample_rate",
                     "fmin", "fmax", "log10", "center", "pad_mode",
                     "eps_under_sqrt", "clip", "interpret"))
def pallas_logmel(wav, *, n_fft: int, hop: int, win_length: int, n_mels: int,
                  sample_rate: int, fmin: float, fmax: float, log10: bool,
                  center: bool = True, pad_mode: str = "constant",
                  eps_under_sqrt: float = 0.0, clip: float = 1e-6,
                  interpret: bool = False):
    """[B, T] wav → [B, frames, n_mels] log-mel; numerics match the XLA path
    in conan_tpu.audio.mel (same basis/filterbank constants)."""
    B, T = wav.shape
    if center:
        p = n_fft // 2
        wav = jnp.pad(wav, ((0, 0), (p, p)), mode=pad_mode)
        T = T + 2 * p
    n_frames = (T - n_fft) // hop + 1
    n_tiles = -(-n_frames // TILE_F)
    f_pad = n_tiles * TILE_F
    need = (f_pad - 1) * hop + n_fft
    if need > T:
        wav = jnp.pad(wav, ((0, 0), (0, need - T)))
    # framing as an XLA gather: [B, f_pad, n_fft]
    idx = np.arange(f_pad)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = wav[:, idx]
    basis = jnp.asarray(_dft_kernel_np(n_fft, win_length))  # [n_fft, 2nb]
    melw = jnp.asarray(mel_filterbank_np(sample_rate, n_fft, n_mels,
                                         float(fmin), float(fmax))).T  # [bins, mels]
    n_bins = n_fft // 2 + 1
    kern = functools.partial(_kernel, n_bins=n_bins, eps_under_sqrt=eps_under_sqrt,
                             log10=log10, clip=clip)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, f_pad, n_mels), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE_F, n_fft), lambda b, f: (b, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, 2 * n_bins), lambda b, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, n_mels), lambda b, f: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_F, n_mels), lambda b, f: (b, f, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(frames, basis, melw)
    return out[:, :n_frames]


# ---------------------------------------------------------------------------
# Differentiable wrapper (custom VJP): forward = fused Pallas kernel,
# backward = the analytic chain in XLA (log → mel → magnitude → DFT →
# overlap-add). Lets the GAN training mel losses run the fused forward.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def logmel_diff(wav, static: tuple):
    (n_fft, hop, win_length, n_mels, sample_rate, fmin, fmax, log10,
     eps_under_sqrt, clip, interpret) = static
    return pallas_logmel(wav, n_fft=n_fft, hop=hop, win_length=win_length,
                         n_mels=n_mels, sample_rate=sample_rate, fmin=fmin,
                         fmax=fmax, log10=log10, center=False,
                         eps_under_sqrt=eps_under_sqrt, clip=clip,
                         interpret=interpret)


def _logmel_fwd(wav, static):
    return logmel_diff(wav, static), wav


def _logmel_bwd(static, wav, g):
    (n_fft, hop, win_length, n_mels, sample_rate, fmin, fmax, log10,
     eps_under_sqrt, clip, _interpret) = static
    B, T = wav.shape
    n_frames = (T - n_fft) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = wav[:, idx]                                         # [B, F, n_fft]
    basis = jnp.asarray(_dft_kernel_np(n_fft, win_length))
    melw = jnp.asarray(mel_filterbank_np(sample_rate, n_fft, n_mels,
                                         float(fmin), float(fmax))).T
    n_bins = n_fft // 2 + 1
    ri = frames @ basis
    re, im = ri[..., :n_bins], ri[..., n_bins:]
    mag = jnp.sqrt(re * re + im * im + eps_under_sqrt)
    mel = mag @ melw
    g = g[:, :n_frames]
    if log10:
        g = g * (1.0 / np.log(10.0))
    dmel = jnp.where(mel > clip, g / jnp.maximum(mel, clip), 0.0)
    dmag = dmel @ melw.T
    scale = dmag / mag
    dri = jnp.concatenate([scale * re, scale * im], axis=-1)
    dframes = dri @ basis.T                                      # [B, F, n_fft]
    # overlap-add (VJP of the gather framing)
    dwav = jnp.zeros_like(wav)
    dwav = dwav.at[:, idx.reshape(-1)].add(dframes.reshape(B, -1))
    return (dwav,)


logmel_diff.defvjp(_logmel_fwd, _logmel_bwd)


def pallas_wav2mel_gan_diff(wav, cfg, clip_val: float = 1e-5,
                            interpret: bool = False):
    """Differentiable GAN-mel transform with the fused Pallas forward —
    drop-in for audio.mel.wav2mel_gan inside training losses on TPU."""
    wav = jnp.clip(wav, -1.0, 1.0)
    p = (cfg.n_fft - cfg.hop) // 2
    wav = jnp.pad(wav, ((0, 0), (p, p)), mode="reflect")
    static = (cfg.n_fft, cfg.hop, cfg.win_length, cfg.n_mels, cfg.sample_rate,
              float(cfg.fmin), float(cfg.fmax), False, 1e-9, clip_val, interpret)
    return logmel_diff(wav, static)


def pallas_wav2mel_librosa(wav, cfg, interpret: bool = False):
    """Drop-in for audio.mel.wav2mel_librosa (log10, constant center pad)."""
    return pallas_logmel(wav, n_fft=cfg.n_fft, hop=cfg.hop, win_length=cfg.win_length,
                         n_mels=cfg.n_mels, sample_rate=cfg.sample_rate,
                         fmin=cfg.fmin, fmax=cfg.fmax, log10=True, center=True,
                         pad_mode="constant", clip=1e-6, interpret=interpret)


def pallas_wav2mel_gan(wav, cfg, interpret: bool = False):
    """Drop-in for audio.mel.wav2mel_gan (ln, reflect pad, sqrt(x+1e-9))."""
    wav = jnp.clip(wav, -1.0, 1.0)
    p = (cfg.n_fft - cfg.hop) // 2
    wav = jnp.pad(wav, ((0, 0), (p, p)), mode="reflect")
    return pallas_logmel(wav, n_fft=cfg.n_fft, hop=cfg.hop, win_length=cfg.win_length,
                         n_mels=cfg.n_mels, sample_rate=cfg.sample_rate,
                         fmin=cfg.fmin, fmax=cfg.fmax, log10=False, center=False,
                         eps_under_sqrt=1e-9, clip=1e-5, interpret=interpret)
