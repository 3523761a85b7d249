"""Spectral-subtraction denoise — TPU-native equivalent of the reference's
post-vocoder cleanup (`/root/reference/tasks/tts/vocoder_infer/hifigan_nsf.py:14-22`,
applied when ``vocoder_denoise_c > 0`` at `:81-82`).

The reference round-trips the waveform through librosa stft → clamp the
magnitude down by a constant ``v`` → istft.  Here both transforms are framed
matmuls (MXU-native; a C_in=1 conv-DFT lowers pathologically on TPU — see
`conan_tpu/ops/stft.py`), and the overlap-add uses the same hop-phase
decomposition as the STFT VJP instead of a scatter-add.  The iSTFT follows
librosa/torch semantics: inverse rDFT per frame, synthesis window, overlap-add,
divide by the overlap-added squared window (golden-tested against
``torch.istft`` in tests/test_stft_mel.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from conan_tpu.ops.stft import _overlap_add, stft_realimag

Array = jax.Array


@functools.lru_cache(maxsize=None)
def _window_np(n_fft: int, win_length: int) -> np.ndarray:
    """Periodic Hann, zero-padded symmetrically to n_fft (matches the forward
    DFT kernel's window in ops/stft._dft_kernel_np)."""
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    w_full = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    w_full[off:off + win_length] = window
    return w_full.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _idft_kernel_np(n_fft: int) -> np.ndarray:
    """[2*n_bins, n_fft] inverse rDFT basis: x[t] = (1/n)·Σ_k c_k(re_k cosθ −
    im_k sinθ), c_k = 2 except DC/Nyquist (conjugate-symmetric half spectrum)."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[None, :]
    k = np.arange(n_bins)[:, None]
    angle = 2.0 * np.pi * k * t / n_fft
    c = np.full((n_bins, 1), 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    basis = np.concatenate([c * np.cos(angle), -c * np.sin(angle)], axis=0)
    return (basis / n_fft).astype(np.float32)  # [2nb, n_fft]


@functools.lru_cache(maxsize=None)
def _win_sumsquare_np(n_fft: int, hop: int, win_length: int,
                      n_frames: int) -> np.ndarray:
    """Overlap-added squared synthesis window (librosa window_sumsquare),
    floored at a tiny value where the window stack never covers a sample."""
    w2 = _window_np(n_fft, win_length).astype(np.float64) ** 2
    t_total = n_fft + (n_frames - 1) * hop
    out = np.zeros(t_total)
    for f in range(n_frames):
        out[f * hop:f * hop + n_fft] += w2
    return np.maximum(out, 1e-10).astype(np.float32)


def istft_realimag(spec_ri: Array, *, n_fft: int, hop: int,
                   win_length: int | None = None, center: bool = True,
                   length: int | None = None) -> Array:
    """Inverse of ops/stft.stft_realimag: [B, F, 2·n_bins] → [B, T].

    T defaults to ``(F-1)·hop`` for ``center=True`` (librosa's istft default);
    pass ``length`` to crop/zero-pad explicitly."""
    win_length = win_length or n_fft
    B, F, _ = spec_ri.shape
    from conan_tpu.ops.precision import get_precision

    basis = jnp.asarray(_idft_kernel_np(n_fft))
    frames = jnp.matmul(spec_ri, basis, precision=get_precision(),
                        preferred_element_type=jnp.float32)
    frames = frames * jnp.asarray(_window_np(n_fft, win_length))
    t_total = n_fft + (F - 1) * hop
    sig = _overlap_add(frames, hop, t_total)
    sig = sig / jnp.asarray(_win_sumsquare_np(n_fft, hop, win_length, F))
    if center:
        sig = sig[:, n_fft // 2: t_total - n_fft // 2]
    if length is None:
        return sig
    if sig.shape[1] >= length:
        return sig[:, :length]
    return jnp.pad(sig, ((0, 0), (0, length - sig.shape[1])))


@functools.partial(jax.jit, static_argnames=("v", "n_fft", "hop", "win_length"))
def spectral_denoise(wav: Array, *, v: float, n_fft: int, hop: int,
                     win_length: int | None = None) -> Array:
    """Constant-magnitude spectral subtraction: |X| ← max(|X| − v, 0), phase
    kept (reference hifigan_nsf.py:14-22).  ``wav`` [B, T] → [B, (T//hop)·hop]
    (librosa's default istft length for a centered stft)."""
    win_length = win_length or n_fft
    spec = stft_realimag(wav, n_fft=n_fft, hop=hop, win_length=win_length,
                         center=True, pad_mode="constant")
    n_bins = n_fft // 2 + 1
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    mag = jnp.sqrt(re * re + im * im)
    scale = jnp.maximum(mag - v, 0.0) / jnp.maximum(mag, 1e-12)
    spec = jnp.concatenate([re * scale, im * scale], axis=-1)
    return istft_realimag(spec, n_fft=n_fft, hop=hop, win_length=win_length,
                          center=True)
