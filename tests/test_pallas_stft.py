"""Pallas fused log-mel kernel: parity vs the XLA path (interpret mode on the
CPU test mesh; the real-TPU run is exercised by bench.py)."""

import numpy as np
import jax.numpy as jnp

from conan_tpu.audio.mel import MelConfig, wav2mel_gan, wav2mel_librosa
from conan_tpu.ops.pallas_stft import pallas_wav2mel_gan, pallas_wav2mel_librosa


def test_pallas_logmel_matches_xla_librosa(rng):
    cfg = MelConfig()
    wav = (rng.standard_normal((2, 16000)) * 0.2).astype(np.float32)
    ref = np.asarray(wav2mel_librosa(jnp.asarray(wav), cfg))
    got = np.asarray(pallas_wav2mel_librosa(jnp.asarray(wav), cfg, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_pallas_logmel_matches_xla_gan(rng):
    cfg = MelConfig(n_fft=512, hop=160, win_length=512, n_mels=320,
                    fmin=0.0, fmax=8000.0)
    wav = (rng.standard_normal((1, 6400)) * 0.3).astype(np.float32)
    ref = np.asarray(wav2mel_gan(jnp.asarray(wav), cfg))
    got = np.asarray(pallas_wav2mel_gan(jnp.asarray(wav), cfg, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)
