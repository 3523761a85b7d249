"""GAN discriminator golden parity vs the mounted torch reference
(`hifigan_causal.py:347-491`), including:

  * the blocked grouped-conv fast path (ops/grouped_conv.py) inside the MSD
  * spectral norm on the full-rate MSD scale (loose tol: torch carries a
    persistent power-iteration buffer; ours re-runs 3 iters from a fixed
    start — both converge to the same sigma)
  * the conditional-discriminator variants (`use_cond`,
    hifigan_causal.py:349-355,423-428).  NOTE the reference's own MPD cond
    path is broken upstream (`from utils.hparams import hparams` — no such
    module in its tree); the test installs an alias so the oracle can run.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from conan_tpu.models.vocoder.discriminators import (DiscriminatorP,
                                                     DiscriminatorS,
                                                     MultiPeriodDiscriminator,
                                                     MultiScaleDiscriminator)
from tests.ref_loader import load_reference, ref_hparams

HOP = 320


def _ref():
    load_reference()
    ref_hparams({"hop_size": HOP})
    import utils.commons.hparams as rhp

    # the reference MPD cond path imports the nonexistent utils.hparams
    sys.modules.setdefault("utils.hparams", rhp)
    from modules.vocoder.hifigan import hifigan_causal as ref

    return ref


def _np(t):
    return t.detach().numpy()


def _wn_conv(sd, pre):
    return {"v": jnp.asarray(_np(sd[f"{pre}.weight_v"])),
            "g": jnp.asarray(_np(sd[f"{pre}.weight_g"])),
            "b": jnp.asarray(_np(sd[f"{pre}.bias"]))}


def _sn_conv(sd, pre):
    return {"w": jnp.asarray(_np(sd[f"{pre}.weight_orig"])),
            "b": jnp.asarray(_np(sd[f"{pre}.bias"]))}


def _disc_params(sd, n_convs, spectral=False, cond=False):
    conv = _sn_conv if spectral else _wn_conv
    p = {"convs": [conv(sd, f"convs.{i}") for i in range(n_convs)],
         "post": conv(sd, "conv_post")}
    if cond:
        p["cond"] = {"w": jnp.asarray(_np(sd["cond_net.weight"])),
                     "b": jnp.asarray(_np(sd["cond_net.bias"]))}
    return p


@pytest.mark.parametrize("use_cond", [False, True])
def test_discriminator_p_golden(rng, use_cond):
    ref = _ref()
    torch.manual_seed(0)
    tdisc = ref.DiscriminatorP(3, use_cond=use_cond).eval()
    sd = tdisc.state_dict()
    jdisc = DiscriminatorP(3, use_cond=use_cond, hop=HOP)
    params = _disc_params(sd, 5, cond=use_cond)
    T_mel = 6
    wav = rng.standard_normal((2, 1, T_mel * HOP)).astype(np.float32)
    mel = rng.standard_normal((2, 80, T_mel)).astype(np.float32)
    with torch.no_grad():
        want, want_f = tdisc(torch.from_numpy(wav),
                             torch.from_numpy(mel) if use_cond else None)
    got, got_f = jdisc.apply(params, jnp.asarray(wav.transpose(0, 2, 1)),
                             jnp.asarray(mel.transpose(0, 2, 1))
                             if use_cond else None)
    np.testing.assert_allclose(np.asarray(got), _np(want), atol=2e-4, rtol=1e-4)
    assert len(got_f) == len(want_f)
    # fmaps: torch [B,C,H,W] vs ours [B,H,W,C]
    np.testing.assert_allclose(np.asarray(got_f[0]).transpose(0, 3, 1, 2),
                               _np(want_f[0]), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("use_cond", [False, True])
def test_discriminator_s_weightnorm_golden(rng, use_cond):
    """Weight-normed scale — exercises the blocked grouped-conv path."""
    ref = _ref()
    torch.manual_seed(1)
    tdisc = ref.DiscriminatorS(use_cond=use_cond,
                               upsample_rates=[4, 4, HOP // 16]).eval()
    sd = tdisc.state_dict()
    jdisc = DiscriminatorS(use_cond=use_cond, up_t=HOP)
    params = _disc_params(sd, 7, cond=use_cond)
    T_mel = 5
    wav = rng.standard_normal((2, 1, T_mel * HOP)).astype(np.float32)
    mel = rng.standard_normal((2, 80, T_mel)).astype(np.float32)
    with torch.no_grad():
        want, want_f = tdisc(torch.from_numpy(wav),
                             torch.from_numpy(mel) if use_cond else None)
    got, got_f = jdisc.apply(params, jnp.asarray(wav.transpose(0, 2, 1)),
                             jnp.asarray(mel.transpose(0, 2, 1))
                             if use_cond else None)
    np.testing.assert_allclose(np.asarray(got), _np(want), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_f[2]).transpose(0, 2, 1),
                               _np(want_f[2]), atol=5e-4, rtol=1e-3)


def test_discriminator_s_spectralnorm_golden(rng):
    ref = _ref()
    torch.manual_seed(2)
    tdisc = ref.DiscriminatorS(use_spectral_norm=True,
                               upsample_rates=[4, 4, HOP // 16])
    wav = rng.standard_normal((1, 1, 1600)).astype(np.float32)
    # converge torch's power-iteration buffers (1 iter per training forward)
    for _ in range(8):
        tdisc(torch.from_numpy(wav), None)
    tdisc = tdisc.eval()
    sd = tdisc.state_dict()
    jdisc = DiscriminatorS(use_spectral_norm=True)
    params = _disc_params(sd, 7, spectral=True)
    with torch.no_grad():
        want, _ = tdisc(torch.from_numpy(wav), None)
    got, _ = jdisc.apply(params, jnp.asarray(wav.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got), _np(want), atol=1e-2, rtol=1e-2)


def test_msd_cond_golden(rng):
    """Full conditional MSD: per-scale cond upsampler rates + avg-pool chain
    (hifigan_causal.py:455-491)."""
    ref = _ref()
    torch.manual_seed(3)
    tmsd = ref.MultiScaleDiscriminator(use_cond=True)
    jmsd = MultiScaleDiscriminator(use_cond=True, hop=HOP)
    T_mel = 5
    wav = rng.standard_normal((2, 1, T_mel * HOP)).astype(np.float32)
    wav2 = rng.standard_normal((2, 1, T_mel * HOP)).astype(np.float32)
    mel = rng.standard_normal((2, 80, T_mel)).astype(np.float32)
    # converge scale-0 spectral-norm buffers IN TRAIN MODE (eval freezes u at
    # its attach state, whose bad sigma estimate makes torch itself blow up)
    for _ in range(8):
        tmsd(torch.from_numpy(wav), torch.from_numpy(wav2),
             torch.from_numpy(mel))
    tmsd = tmsd.eval()
    params = {"discs": []}
    for i, td in enumerate(tmsd.discriminators):
        params["discs"].append(
            _disc_params(td.state_dict(), 7, spectral=(i == 0), cond=True))
    with torch.no_grad():
        w_r, w_g, _, _ = tmsd(torch.from_numpy(wav), torch.from_numpy(wav2),
                              torch.from_numpy(mel))
    g_r, g_g, _, _ = jmsd.apply(params, jnp.asarray(wav.transpose(0, 2, 1)),
                                jnp.asarray(wav2.transpose(0, 2, 1)),
                                jnp.asarray(mel.transpose(0, 2, 1)))
    for i in range(3):
        tol = 1e-2 if i == 0 else 1e-3
        np.testing.assert_allclose(np.asarray(g_r[i]), _np(w_r[i]),
                                   atol=tol, rtol=tol)
        np.testing.assert_allclose(np.asarray(g_g[i]), _np(w_g[i]),
                                   atol=tol, rtol=tol)


def test_mpd_cond_golden(rng):
    ref = _ref()
    torch.manual_seed(4)
    tmpd = ref.MultiPeriodDiscriminator(use_cond=True).eval()
    jmpd = MultiPeriodDiscriminator(use_cond=True, hop=HOP)
    params = {"discs": [_disc_params(td.state_dict(), 5, cond=True)
                        for td in tmpd.discriminators]}
    T_mel = 4
    wav = rng.standard_normal((2, 1, T_mel * HOP)).astype(np.float32)
    wav2 = rng.standard_normal((2, 1, T_mel * HOP)).astype(np.float32)
    mel = rng.standard_normal((2, 80, T_mel)).astype(np.float32)
    with torch.no_grad():
        w_r, w_g, _, _ = tmpd(torch.from_numpy(wav), torch.from_numpy(wav2),
                              torch.from_numpy(mel))
    g_r, g_g, _, _ = jmpd.apply(params, jnp.asarray(wav.transpose(0, 2, 1)),
                                jnp.asarray(wav2.transpose(0, 2, 1)),
                                jnp.asarray(mel.transpose(0, 2, 1)))
    for i in range(5):
        np.testing.assert_allclose(np.asarray(g_r[i]), _np(w_r[i]),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(g_g[i]), _np(w_g[i]),
                                   atol=5e-4, rtol=1e-3)
