"""STFT as a framed matmul — the TPU-native replacement for `torch.stft` /
`librosa.stft` (SURVEY.md §2.2 ◆: framed-matmul STFT on TPU).

The DFT is expressed as a strided conv of the waveform against a
``[win, 1, 2*(n_fft//2+1)]`` kernel holding windowed cos / −sin basis rows, so
XLA lowers it onto the MXU. Magnitude and mel projection fuse behind it.

Matches:
  - librosa.stft(center=True, pad_mode="constant")   — reference
    `/root/reference/utils/audio/__init__.py:66-70`
  - torch.stft(center=False) after manual reflect pad — reference
    `/root/reference/modules/vocoder/hifigan/mel_utils.py:70-86` (cal_mel_spec)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


@functools.lru_cache(maxsize=None)
def _dft_kernel_np(n_fft: int, win_length: int) -> np.ndarray:
    """[n_fft, 2*n_bins] windowed DFT basis (host-side, cached).

    X_k = sum_t w[t] x[t] exp(-2πi k t / n_fft): real rows then imag rows.
    Window is periodic Hann (torch.hann_window / scipy sym=False), zero-padded
    symmetrically to n_fft like torch.stft when win_length < n_fft.
    """
    n_bins = n_fft // 2 + 1
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    w_full = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    w_full[off:off + win_length] = window
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = 2.0 * np.pi * t * k / n_fft
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=1)  # [n_fft, 2*n_bins]
    return (w_full[:, None] * basis).astype(np.float32)  # [n_fft, 2nb]


def frame_count(n_samples: int, n_fft: int, hop: int, center: bool) -> int:
    if center:
        return n_samples // hop + 1
    return (n_samples - n_fft) // hop + 1


def stft_realimag(
    wav: Array,
    *,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "constant",
) -> Array:
    """STFT of ``wav`` [B, T] → [B, frames, 2*n_bins] (re ∥ im).

    Framing is a gather against a static [frames, n_fft] index matrix followed
    by ONE [.., n_fft] @ [n_fft, 2·n_bins] matmul — the MXU-native shape.  (A
    strided-conv formulation with C_in=1 and a 2048-wide window lowers
    pathologically on TPU: the sc/mag loss pair cost 22 ms/step that way vs
    ~1 ms as a matmul; see tools/DECOMPOSE.json.)  The backward is a custom
    VJP: overlap-add by hop-phase decomposition — ⌈n_fft/hop⌉ padded adds —
    instead of the autodiff scatter-add, which is slow on TPU and slow enough
    on the CPU mesh to trip XLA's hardcoded 40 s collective-rendezvous abort
    on a loaded 4-core host.  Honors the matmul precision policy."""
    win_length = win_length or n_fft
    if center:
        p = n_fft // 2
        wav = jnp.pad(wav, ((0, 0), (p, p)), mode=pad_mode)
    return _framed_dft(wav, n_fft, hop, win_length)


def _overlap_add(dframes: Array, hop: int, t_out: int) -> Array:
    """Transpose of gather-framing: [B, F, W] frame grads → [B, t_out].

    Segment j·hop:(j+1)·hop of successive frames tiles the output contiguously
    (offset by j·hop), so overlap-add is ⌈W/hop⌉ pad-and-adds — no scatter."""
    B, F, W = dframes.shape
    q = -(-W // hop)
    dframes = jnp.pad(dframes, ((0, 0), (0, 0), (0, q * hop - W)))
    out = jnp.zeros((B, t_out), dframes.dtype)
    span = F * hop
    for j in range(q):
        seg = dframes[:, :, j * hop:(j + 1) * hop].reshape(B, span)
        start, stop = j * hop, j * hop + span
        if start >= t_out:
            continue
        if stop > t_out:  # last frames' tails fall off the (unpadded) end
            seg = seg[:, :t_out - start]
            stop = t_out
        out = out + jnp.pad(seg, ((0, 0), (start, t_out - stop)))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _framed_dft(wav: Array, n_fft: int, hop: int, win_length: int) -> Array:
    from conan_tpu.ops.precision import get_precision

    basis = jnp.asarray(_dft_kernel_np(n_fft, win_length))  # [n_fft, 2nb]
    n_frames = (wav.shape[1] - n_fft) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = wav[:, idx]  # [B, frames, n_fft]
    return jnp.matmul(frames, basis, precision=get_precision(),
                      preferred_element_type=jnp.float32)


def _framed_dft_fwd(wav, n_fft, hop, win_length):
    # zero-size residual carries wav's dtype (dtype objects aren't JAX types)
    return (_framed_dft(wav, n_fft, hop, win_length),
            (wav.shape[1], jnp.zeros((0,), wav.dtype)))


def _framed_dft_bwd(n_fft, hop, win_length, res, g):
    from conan_tpu.ops.precision import get_precision

    t_in, dtype_token = res
    wav_dtype = dtype_token.dtype
    basis = jnp.asarray(_dft_kernel_np(n_fft, win_length))
    dframes = jnp.matmul(g, basis.T, precision=get_precision(),
                         preferred_element_type=jnp.float32)
    # overlap-add accumulates in f32; the cotangent must match wav's dtype
    # (custom_vjp checks it at trace time even where autodiff would cast).
    return (_overlap_add(dframes, hop, t_in).astype(wav_dtype),)


_framed_dft.defvjp(_framed_dft_fwd, _framed_dft_bwd)


def stft_magnitude(
    wav: Array,
    *,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "constant",
    eps_under_sqrt: float = 0.0,
) -> Array:
    """|STFT| of ``wav`` [B, T] → [B, frames, n_bins]."""
    ri = stft_realimag(wav, n_fft=n_fft, hop=hop, win_length=win_length,
                       center=center, pad_mode=pad_mode)
    n_bins = n_fft // 2 + 1
    re, im = ri[..., :n_bins], ri[..., n_bins:]
    return jnp.sqrt(re * re + im * im + eps_under_sqrt)


# ---------------------------------------------------------------------------
# librosa-compatible mel filterbank (slaney norm, non-htk)
# ---------------------------------------------------------------------------

def _hz_to_mel(f: np.ndarray | float, htk: bool = False):
    if htk:
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)
    # Slaney formula
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):  # f=0 falls in the linear branch of the where
        return np.where(
            f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mels)


def _mel_to_hz(m: np.ndarray, htk: bool = False):
    if htk:
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=None)
def mel_filterbank_np(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float,
    htk: bool = False, norm: str | None = "slaney",
) -> np.ndarray:
    """Reimplementation of ``librosa.filters.mel`` defaults → [n_mels, n_bins]."""
    n_bins = n_fft // 2 + 1
    fftfreqs = np.linspace(0, sr / 2, n_bins)
    mel_f = _mel_to_hz(np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2), htk)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> Array:
    return jnp.asarray(mel_filterbank_np(sr, n_fft, n_mels, fmin, fmax))
