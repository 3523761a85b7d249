"""Non-causal (original) HiFi-GAN: golden parity vs the mounted reference."""

import numpy as np
import jax.numpy as jnp
import torch

from conan_tpu.models.vocoder.hifigan import HifiGanConfig
from conan_tpu.models.vocoder.hifigan_noncausal import NonCausalHifiGanGenerator
from tests.ref_loader import load_reference


def test_noncausal_golden_parity(rng):
    load_reference()
    from modules.vocoder.hifigan.hifigan import HifiGanGenerator as RefGen

    hp = dict(num_mels=80, upsample_initial_channel=64,
              upsample_rates=[8, 5, 4, 2], upsample_kernel_sizes=[16, 10, 8, 4],
              resblock="1", resblock_kernel_sizes=[3, 7, 11],
              resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]])
    torch.manual_seed(0)
    tgen = RefGen(hp).eval()
    gen = NonCausalHifiGanGenerator(HifiGanConfig.from_hparams(hp))
    params = gen.params_from_torch({k: v.numpy() for k, v in tgen.state_dict().items()})
    mel = rng.standard_normal((2, 80, 19)).astype(np.float32)
    with torch.no_grad():
        ref = tgen(torch.from_numpy(mel)).numpy()
    got = np.asarray(gen.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))
    # note: the odd k=10/u=5 stage makes torch emit a few extra samples too —
    # match the reference's exact output length
    assert got.shape == (ref.shape[0], ref.shape[2], 1)
    np.testing.assert_allclose(got[:, :, 0], ref[:, 0, :], atol=3e-5, rtol=1e-4)
