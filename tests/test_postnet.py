"""Mel postnet: golden parity vs reference ConanPostnet/FlowMel (euler-stub
torchdyn, shared noise) and a train-step smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from conan_tpu.models.conan.postnet import ConanPostnet, PostnetConfig
from tests.ref_loader import load_reference, ref_hparams

HP = dict(
    hidden_size=32, audio_num_mel_bins=80, keep_bins=80,
    timesteps=1000, K_step=5, flow_loss_type="l1", flow_decoder_type="wavenet",
    residual_layers=2, residual_channels=16, dilation_cycle_length=2,
    spec_min=[-6.0] * 80, spec_max=[0.5] * 80,
)


def _build():
    load_reference()
    ref_hparams(HP)
    from modules.Conan.Conan import ConanPostnet as RefPostnet

    torch.manual_seed(0)
    tnet = RefPostnet().eval()
    cfg = PostnetConfig.from_hparams(HP)
    net = ConanPostnet(cfg)
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    sub = {k[len("postflow.denoise_fn."):]: v for k, v in sd.items()
           if k.startswith("postflow.denoise_fn.")}
    params = {
        "ln_proj": {"w": jnp.asarray(sd["ln_proj.weight"]),
                    "b": jnp.asarray(sd["ln_proj.bias"])},
        "flownet": net.net.params_from_torch(sub),
    }
    return tnet, net, params


def test_postnet_sample_parity(rng):
    tnet, net, params = _build()
    B, T, H, M = 2, 12, 32, 80
    coarse = rng.standard_normal((B, T, M)).astype(np.float32)
    dec_inp = rng.standard_normal((B, T, H)).astype(np.float32)
    noise = rng.standard_normal((B, T, M)).astype(np.float32)
    # reference forward (infer): ret dict carries mel_out/decoder_inp
    ret = {"mel_out": torch.from_numpy(coarse),
           "decoder_inp": torch.from_numpy(dec_inp)}
    with torch.no_grad():
        tnet(None, True, ret, cfg=False, cfg_scale=1.0,
             noise=torch.from_numpy(noise.transpose(0, 2, 1))[:, None, :, :])
    ref_mel = ret["mel_out"].numpy()  # overwritten with refined mel
    got = np.asarray(net.sample(params, jnp.asarray(coarse), jnp.asarray(dec_inp),
                                jax.random.PRNGKey(0), noise=jnp.asarray(noise)))
    np.testing.assert_allclose(got, ref_mel, atol=2e-4, rtol=1e-3)


def test_postnet_train_loss_finite(rng):
    _, net, params = _build()
    B, T = 2, 12
    loss = net.loss(params, jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32)),
                    jnp.asarray(rng.standard_normal((B, T, 32)).astype(np.float32)),
                    jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32)),
                    jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
