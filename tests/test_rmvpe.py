"""RMVPE port: golden parity of the E2E0 network and mel frontend vs the
mounted reference (torch), plus decode/postprocess numerics."""

import numpy as np
import jax.numpy as jnp
import torch

from conan_tpu.models.rmvpe import (E2E0, RMVPEConfig, mel_spectrogram,
                                    postprocess_f0, resample_align_curve,
                                    to_local_average_f0)
from tests.ref_loader import load_reference


def test_e2e0_golden_parity(rng):
    load_reference()
    from modules.pe.rmvpe.model import E2E0 as RefE2E0

    torch.manual_seed(0)
    tmodel = RefE2E0(1, 1, (2, 2)).eval()  # n_blocks=1 for test speed
    cfg = RMVPEConfig(n_blocks=1)
    model = E2E0(cfg)
    params = model.params_from_torch(
        {k: v.numpy() for k, v in tmodel.state_dict().items()})
    mel = rng.standard_normal((2, 128, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(mel)).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(mel)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_mel_frontend_matches_reference_math(rng):
    """htk mel + centered stft (spec.py) vs torch.stft equivalent."""
    wav = (rng.standard_normal((1, 16000)) * 0.2).astype(np.float32)
    from conan_tpu.ops.stft import mel_filterbank_np

    basis = torch.from_numpy(mel_filterbank_np(16000, 1024, 128, 30, 8000, htk=True))
    a = torch.from_numpy(wav)
    a = torch.nn.functional.pad(a, (512, 512))  # win//2, (win+1)//2 for even win
    spec = torch.stft(a, 1024, hop_length=160, win_length=1024,
                      window=torch.hann_window(1024), center=False,
                      return_complex=True).abs()
    ref = torch.log(torch.clamp(basis @ spec, min=1e-5)).numpy()
    got = np.asarray(mel_spectrogram(jnp.asarray(wav), 160))
    np.testing.assert_allclose(got, ref, atol=3e-3, rtol=1e-3)


def test_decode_matches_reference(rng):
    load_reference()
    from modules.pe.rmvpe.utils import to_local_average_f0 as ref_decode

    hidden = rng.random((2, 40, 360)).astype(np.float32) * 0.5
    ref = ref_decode(torch.from_numpy(hidden))
    got = to_local_average_f0(hidden)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_postprocess_and_resample():
    f0 = np.array([0, 500, 500, 0, 200, 200, 200, 0, 2000, 100], float)
    out = postprocess_f0(f0, min_gap=2)
    assert out[1] == 0 and out[2] == 0       # short glitch removed
    assert out[8] == 0                        # >fmax removed
    assert out[4] == 200                      # long run kept
    curve = resample_align_curve(np.arange(10, dtype=float), 0.01, 0.02, 5)
    np.testing.assert_allclose(curve, [0, 2, 4, 6, 8])


def test_viterbi_matches_bruteforce(rng):
    """The Viterbi decoder (librosa.sequence.viterbi reimplementation —
    librosa absent in image) must find the exact max-likelihood path:
    oracle = exhaustive enumeration over a small state space."""
    import itertools

    from conan_tpu.models.rmvpe import _viterbi

    S, T = 4, 6
    prob = rng.random((S, T)).astype(np.float64) + 1e-3
    trans = rng.random((S, S)).astype(np.float64) + 1e-3
    trans /= trans.sum(1, keepdims=True)
    got = _viterbi(prob, trans)
    best, best_ll = None, -np.inf
    for path in itertools.product(range(S), repeat=T):
        ll = np.log(1.0 / S) + np.log(prob[path[0], 0])
        for t in range(1, T):
            ll += np.log(trans[path[t - 1], path[t]]) + np.log(prob[path[t], t])
        if ll > best_ll:
            best_ll, best = ll, path
    assert tuple(got) == best


def test_viterbi_f0_smooths_outlier(rng):
    """An isolated one-frame 100-bin jump survives local-average decode but is
    smoothed away by the banded-transition Viterbi (utils.py:27-44: jumps of
    ≥30 bins have zero transition probability)."""
    from conan_tpu.models.rmvpe import to_viterbi_f0

    T = 20
    hidden = np.full((1, T, 360), 1e-4, np.float32)
    path = np.full(T, 180)
    path[10] = 300  # outlier
    hidden[0, np.arange(T), path] = 0.9
    hidden[0, 10, 180] = 0.5  # the true bin still has some mass
    f0_local = to_local_average_f0(hidden)
    f0_vit = to_viterbi_f0(hidden)
    semis_local = np.abs(np.diff(np.log2(f0_local[0] + 1e-9)))
    semis_vit = np.abs(np.diff(np.log2(f0_vit[0] + 1e-9)))
    assert semis_local.max() > 1.0      # local decode keeps the glitch
    assert semis_vit.max() < 0.5        # viterbi rejects the >=30-bin jump
    # away from the outlier the two decodes agree
    np.testing.assert_allclose(f0_vit[0, :9], f0_local[0, :9], rtol=1e-6)
