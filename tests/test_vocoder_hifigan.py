"""Causal shuffle HiFi-GAN: golden parity vs the mounted reference + the two
streaming invariants (causality, prefix consistency) from the reference's own
verification harness (`hifigan_causal.py:550-797`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from conan_tpu.models.vocoder.hifigan import HifiGanConfig, HifiGanGenerator
from tests.ref_loader import load_reference

SMALL = dict(
    num_mels=80, upsample_initial_channel=64,
    upsample_rates=[8, 5, 4, 2], upsample_kernel_sizes=[16, 10, 8, 4],
    resblock="1", resblock_kernel_sizes=[3, 7, 11],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
)


def _build_pair(upsample: str, init_ch: int = 64):
    load_reference()
    from modules.vocoder.hifigan import hifigan_causal as ref

    hp = dict(SMALL, upsample=upsample, upsample_initial_channel=init_ch)
    torch.manual_seed(0)
    tgen = ref.HifiGanGenerator(hp).eval()
    cfg = HifiGanConfig.from_hparams(hp)
    jgen = HifiGanGenerator(cfg)
    params = jgen.params_from_torch({k: v.numpy() for k, v in tgen.state_dict().items()})
    return tgen, jgen, params


@pytest.mark.parametrize("upsample", ["shuffle", "zero", "nn"])
def test_golden_parity_vs_reference(rng, upsample):
    tgen, jgen, params = _build_pair(upsample)
    mel = rng.standard_normal((2, 80, 23)).astype(np.float32)
    with torch.no_grad():
        ref_wav = tgen(torch.from_numpy(mel)).numpy()  # [B, 1, T*320]
    got = np.asarray(jgen.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))  # [B, T*320, 1]
    assert got.shape == (2, 23 * 320, 1)
    np.testing.assert_allclose(got[:, :, 0], ref_wav[:, 0, :], atol=2e-5, rtol=1e-4)


def test_full_size_golden_parity(rng):
    """Production config (512 channels, `egs/hifi_16k320_shuffle.yaml:4-6,20`)."""
    tgen, jgen, params = _build_pair("shuffle", init_ch=512)
    mel = rng.standard_normal((1, 80, 12)).astype(np.float32)
    with torch.no_grad():
        ref_wav = tgen(torch.from_numpy(mel)).numpy()
    got = np.asarray(jgen.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(got[:, :, 0], ref_wav[:, 0, :], atol=5e-5, rtol=1e-4)


def test_streaming_equals_offline(rng):
    cfg = HifiGanConfig.from_hparams(dict(SMALL, upsample="shuffle"))
    gen = HifiGanGenerator(cfg)
    params = gen.init(jax.random.PRNGKey(0))
    T, chunk = 16, 4
    mel = jnp.asarray(rng.standard_normal((1, T, 80)).astype(np.float32))
    y_off = gen.apply(params, mel)
    state = gen.init_state(1)
    outs = []
    step = jax.jit(gen.step)
    for s in range(0, T, chunk):
        y, state = step(params, state, mel[:, s:s + chunk])
        outs.append(y)
    y_str = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_str), np.asarray(y_off), atol=1e-5, rtol=1e-4)


def test_folded_weight_norm_equals_unfolded(rng):
    """Inference-time weight-norm pre-folding (ops/conv.py fold_weight_norm):
    folded {"w"} params must reproduce the {"v","g"} recompose bit-for-bit on
    both the offline and streaming paths (serving uses folding to drop the
    per-step g·v/||v|| sweeps — tools/bench_vocoder_ceiling.py)."""
    from conan_tpu.ops.conv import fold_weight_norm

    cfg = HifiGanConfig.from_hparams(dict(SMALL, upsample="shuffle"))
    gen = HifiGanGenerator(cfg)
    params = gen.init(jax.random.PRNGKey(0))
    folded = fold_weight_norm(params)
    mel = jnp.asarray(rng.standard_normal((1, 12, 80)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(gen.apply(folded, mel)),
                               np.asarray(gen.apply(params, mel)),
                               atol=1e-6, rtol=1e-6)
    state_f, state_u = gen.init_state(1), gen.init_state(1)
    y_f, _ = gen.step(folded, state_f, mel[:, :4])
    y_u, _ = gen.step(params, state_u, mel[:, :4])
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               atol=1e-6, rtol=1e-6)


def test_streaming_equals_offline_zero_upsample(rng):
    cfg = HifiGanConfig.from_hparams(dict(SMALL, upsample="zero"))
    gen = HifiGanGenerator(cfg)
    params = gen.init(jax.random.PRNGKey(1))
    T, chunk = 12, 4
    mel = jnp.asarray(rng.standard_normal((1, T, 80)).astype(np.float32))
    y_off = gen.apply(params, mel)
    state = gen.init_state(1)
    outs = []
    for s in range(0, T, chunk):
        y, state = gen.step(params, state, mel[:, s:s + chunk])
        outs.append(y)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, 1)), np.asarray(y_off),
                               atol=1e-5, rtol=1e-4)


def test_prefix_consistency(rng):
    """generator(mel[:T1]) == prefix of generator(mel[:T2]) — the invariant
    that makes chunked vocoding artifact-free (`hifigan_causal.py:603-680`)."""
    cfg = HifiGanConfig.from_hparams(dict(SMALL, upsample="shuffle"))
    gen = HifiGanGenerator(cfg)
    params = gen.init(jax.random.PRNGKey(2))
    t1, t2 = 8, 16
    mel = jnp.asarray(rng.standard_normal((1, t2, 80)).astype(np.float32))
    y_short = gen.apply(params, mel[:, :t1])
    y_long = gen.apply(params, mel)
    np.testing.assert_allclose(np.asarray(y_short), np.asarray(y_long[:, :t1 * 320]),
                               atol=1e-6, rtol=1e-5)


def test_causality_perturbation(rng):
    """Perturb inputs after frame t; outputs ≤ t*stride must be unchanged
    (`hifigan_causal.py:550-599`)."""
    cfg = HifiGanConfig.from_hparams(dict(SMALL, upsample="shuffle"))
    gen = HifiGanGenerator(cfg)
    params = gen.init(jax.random.PRNGKey(3))
    T = 10
    mel = rng.standard_normal((1, T, 80)).astype(np.float32)
    y0 = np.asarray(gen.apply(params, jnp.asarray(mel)))
    for t in [2, 5, 8]:
        mel_p = mel.copy()
        mel_p[:, t:] += rng.standard_normal(mel_p[:, t:].shape).astype(np.float32) * 1e-3
        yp = np.asarray(gen.apply(params, jnp.asarray(mel_p)))
        np.testing.assert_allclose(yp[:, :t * 320], y0[:, :t * 320], atol=1e-6)
