"""NSF HiFi-GAN: golden parity vs reference with randomness zeroed (shared
deterministic sine source)."""

from unittest import mock

import numpy as np
import jax
import jax.numpy as jnp
import torch

from conan_tpu.models.vocoder.hifigan import HifiGanConfig
from conan_tpu.models.vocoder.hifigan_nsf import NsfHifiGanGenerator, sine_gen
from tests.ref_loader import load_reference, ref_hparams

# the NSF source-injection requires exact-multiple upsampling (the reference
# crashes on the odd 16k/320 [8,5,4,2] rates); it ships with the [8,8,2,2]
# vocoder base config (egs/egs_bases/tts/vocoder/hifigan.yaml)
HP = dict(num_mels=80, upsample_initial_channel=64,
          upsample_rates=[8, 8, 2, 2], upsample_kernel_sizes=[16, 16, 4, 4],
          resblock="1", resblock_kernel_sizes=[3, 7, 11],
          resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
          use_pitch_embed=True, audio_sample_rate=16000)


def test_nsf_golden_parity(rng):
    load_reference()
    ref_hparams(HP)
    # the reference's hifigan_nsf imports a nonexistent modules.parallel_wavegan
    # package (broken in the reference repo); satisfy it from the reference's
    # own local source.py implementation
    import sys
    import types

    if "modules.parallel_wavegan" not in sys.modules:
        from modules.vocoder.hifigan import source as ref_source

        pw = types.ModuleType("modules.parallel_wavegan")
        layers = types.ModuleType("modules.parallel_wavegan.layers")
        layers.UpsampleNetwork = object
        layers.ConvInUpsampleNetwork = object
        models = types.ModuleType("modules.parallel_wavegan.models")
        msource = types.ModuleType("modules.parallel_wavegan.models.source")
        msource.SourceModuleHnNSF = ref_source.SourceModuleHnNSF
        models.source = msource
        pw.layers = layers
        pw.models = models
        for name, mod in [("modules.parallel_wavegan", pw),
                          ("modules.parallel_wavegan.layers", layers),
                          ("modules.parallel_wavegan.models", models),
                          ("modules.parallel_wavegan.models.source", msource)]:
            sys.modules[name] = mod
    from modules.vocoder.hifigan.hifigan_nsf import HifiGanGenerator as RefGen

    torch.manual_seed(0)
    tgen = RefGen(HP).eval()
    gen = NsfHifiGanGenerator(HifiGanConfig.from_hparams(HP))
    params = gen.params_from_torch({k: v.numpy() for k, v in tgen.state_dict().items()})
    T = 16
    mel = rng.standard_normal((1, 80, T)).astype(np.float32)
    f0 = (np.abs(rng.standard_normal((1, T))) * 200 + 80).astype(np.float32)
    f0[:, 5:8] = 0.0  # unvoiced span
    # zero the reference's stochastic pieces so both sides share the source
    with torch.no_grad(), \
         mock.patch.object(torch, "rand",
                           side_effect=lambda *s, **k: torch.zeros(*s, **k)), \
         mock.patch.object(torch, "randn_like",
                           side_effect=lambda x, **k: torch.zeros_like(x)):
        ref = tgen(torch.from_numpy(mel), torch.from_numpy(f0)).numpy()
    got = np.asarray(gen.apply(params, jnp.asarray(mel.transpose(0, 2, 1)),
                               jnp.asarray(f0), deterministic=True))
    assert got.shape == (ref.shape[0], ref.shape[2], 1)
    np.testing.assert_allclose(got[:, :, 0], ref[:, 0, :], atol=1e-4, rtol=1e-3)


def test_sine_gen_harmonics(rng):
    """Pure-tone f0 → sine with that frequency per harmonic."""
    sr, f = 16000, 100.0
    T = 1600
    f0 = jnp.full((1, T, 1), f)
    waves, uv, _ = sine_gen(f0, jax.random.PRNGKey(0), sample_rate=sr,
                            harmonic_num=2, deterministic=True)
    assert uv.min() == 1.0
    x = np.asarray(waves[0, :, 0])
    spec = np.abs(np.fft.rfft(x * np.hanning(T)))
    peak_hz = np.argmax(spec) * sr / T
    assert abs(peak_hz - f) < 20
