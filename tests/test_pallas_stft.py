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


def test_logmel_custom_vjp_matches_xla_grad(rng):
    """Gradient of the Pallas-forward transform equals the XLA autodiff."""
    import jax

    from conan_tpu.ops.pallas_stft import pallas_wav2mel_gan_diff

    cfg = MelConfig(n_fft=512, hop=160, win_length=512, n_mels=64,
                    fmin=0.0, fmax=8000.0)
    wav = jnp.asarray((rng.standard_normal((1, 3200)) * 0.3).astype(np.float32))

    def loss_xla(w):
        return jnp.mean(jnp.abs(wav2mel_gan(w, cfg)))

    def loss_pl(w):
        return jnp.mean(jnp.abs(pallas_wav2mel_gan_diff(w, cfg, interpret=True)))

    g_xla = jax.grad(loss_xla)(wav)
    g_pl = jax.grad(loss_pl)(wav)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_xla),
                               atol=2e-6, rtol=1e-3)
