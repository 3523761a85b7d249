"""Golden parity: conan_tpu Conan acoustic model vs the mounted reference
(`modules/Conan/Conan.py`), weights copied 1:1, eval mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from conan_tpu.models.conan.model import Conan, ConanConfig
from conan_tpu.utils.torch_compat import conan_from_torch
from tests.ref_loader import load_reference, ref_hparams

HP = dict(
    hidden_size=64, kernel_size=3, style=True, nVQ=32, vae_dropout=0.0,
    lambda_commit=0.25, f0_gen="orig", predictor_kernel=5, predictor_grad=1.0,
    lambda_f0=1.0, silent_token=57, content_embedding_dim=102,
    audio_num_mel_bins=80, enc_layers=4, dec_layers=4, decoder_type="conv",
    enc_dec_norm="ln", dec_dilations=[1, 1, 1, 1], dec_kernel_size=5,
    dec_post_net_kernel=3, layers_in_block=2, dropout=0.0, use_spk_id=False,
    use_spk_embed=False, predictor_hidden=-1, use_pitch_embed=True,
    dec_inp_add_noise=False, vq_start=20500, forcing=20000,
    f0_timesteps=1000, f0_K_step=5, f0_sample_clip=True, flow_qsample="direct",
    f0_residual_layers=2, f0_residual_channels=16, f0_dilation_cycle_length=2,
    frames_multiple=1, pitch_type="frame", use_uv=True,
)


def _build(f0_gen="orig", seed=0):
    load_reference()
    hp = dict(HP, f0_gen=f0_gen)
    ref_hparams(hp)
    from modules.Conan.Conan import Conan as RefConan

    torch.manual_seed(seed)
    tmodel = RefConan(0, hp).eval()
    cfg = ConanConfig.from_hparams(hp)
    model = Conan(cfg)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, vq_state = conan_from_torch(sd, cfg)
    return tmodel, model, params, vq_state, cfg


def _data(seed=0, B=2, T=12, Tr=16):
    rng = np.random.default_rng(seed)
    content = rng.integers(0, 100, (B, T)).astype(np.int64)
    content[0, -2:] = 57  # silent token
    ref = (rng.standard_normal((B, Tr, 80)) * 0.5 - 0.3).astype(np.float32)
    f0 = (rng.standard_normal((B, T)) * 0.5 + 7.5).astype(np.float32)
    uv = (rng.random((B, T)) < 0.25).astype(np.float32)
    return content, ref, f0, uv


def test_infer_parity():
    tmodel, model, params, vq_state, cfg = _build()
    content, ref, _, _ = _data()
    with torch.no_grad():
        tret = tmodel(torch.from_numpy(content), ref=torch.from_numpy(ref),
                      infer=True, global_steps=200000)
    ret = model.apply(params, jnp.asarray(content), ref=jnp.asarray(ref),
                      vq_state=vq_state, infer=True, global_step=200000)
    np.testing.assert_allclose(np.asarray(ret["uv_pred"]),
                               tret["uv_pred"].numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ret["f0_denorm_pred"]),
                               tret["f0_denorm_pred"].numpy(), atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ret["mel_out"]),
                               tret["mel_out"].numpy(), atol=5e-5, rtol=1e-4)


def test_train_mode_parity_losses():
    """infer=False (teacher-forced f0/uv), early schedule: no_vq + forcing."""
    tmodel, model, params, vq_state, cfg = _build(seed=1)
    content, ref, f0, uv = _data(seed=1)
    with torch.no_grad():
        tret = tmodel(torch.from_numpy(content), ref=torch.from_numpy(ref),
                      f0=torch.from_numpy(f0), uv=torch.from_numpy(uv),
                      infer=False, global_steps=0)
    ret = model.apply(params, jnp.asarray(content), ref=jnp.asarray(ref),
                      vq_state=vq_state, f0=jnp.asarray(f0), uv=jnp.asarray(uv),
                      infer=False, global_step=0)
    np.testing.assert_allclose(np.asarray(ret["mel_out"]), tret["mel_out"].numpy(),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(float(ret["fdiff"]), float(tret["fdiff"]),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(ret["gloss"]), float(tret["gloss"]),
                               atol=1e-5, rtol=1e-4)
    assert "vq_loss" not in tret  # no_vq phase in the reference


def test_train_mode_parity_vq_phase():
    """Late schedule: VQ active + soft attention."""
    tmodel, model, params, vq_state, cfg = _build(seed=2)
    content, ref, f0, uv = _data(seed=2)
    with torch.no_grad():
        tret = tmodel(torch.from_numpy(content), ref=torch.from_numpy(ref),
                      f0=torch.from_numpy(f0), uv=torch.from_numpy(uv),
                      infer=False, global_steps=50000)
    ret = model.apply(params, jnp.asarray(content), ref=jnp.asarray(ref),
                      vq_state=vq_state, f0=jnp.asarray(f0), uv=jnp.asarray(uv),
                      infer=False, global_step=50000)
    np.testing.assert_allclose(np.asarray(ret["mel_out"]), tret["mel_out"].numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(float(ret["vq_loss"]), float(tret["vq_loss"]),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(ret["ppl"]), float(tret["ppl"]),
                               atol=1e-3, rtol=1e-3)


def test_flow_f0_infer_parity():
    """f0_gen='flow': rectified-flow Euler sampling vs reference (torchdyn
    stubbed to the same fixed-step euler), shared initial noise."""
    tmodel, model, params, vq_state, cfg = _build(f0_gen="flow", seed=3)
    content, ref, _, _ = _data(seed=3)
    B, T = content.shape
    rng = np.random.default_rng(33)
    noise = rng.standard_normal((B, 1, 1, T)).astype(np.float32)
    with torch.no_grad():
        tret = tmodel(torch.from_numpy(content), ref=torch.from_numpy(ref),
                      infer=True, global_steps=200000,
                      initial_noise=torch.from_numpy(noise))
    noise_j = jnp.asarray(np.transpose(noise[:, 0], (0, 2, 1)))  # [B,T,1]
    ret = model.apply(params, jnp.asarray(content), ref=jnp.asarray(ref),
                      vq_state=vq_state, infer=True, global_step=200000,
                      initial_noise=noise_j)
    np.testing.assert_allclose(np.asarray(ret["f0_denorm_pred"]),
                               tret["f0_denorm_pred"].numpy(), atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ret["mel_out"]),
                               tret["mel_out"].numpy(), atol=2e-4, rtol=1e-3)


def test_streaming_equals_offline():
    """Causal chunk steps reproduce the offline infer forward — the invariant
    that licenses replacing the reference's O(T²) prefix re-run."""
    _, model, params, vq_state, cfg = _build(seed=4)
    content, ref, _, _ = _data(seed=4, T=16)
    ret_off = model.apply(params, jnp.asarray(content), ref=jnp.asarray(ref),
                          vq_state=vq_state, infer=True, global_step=200000)
    style_ctx = model.prepare_style(params, vq_state, jnp.asarray(ref))
    state = model.init_stream_state(content.shape[0])
    outs = []
    step = jax.jit(model.stream_step)
    for s in range(0, content.shape[1], 4):
        ret_c, state = step(params, state, jnp.asarray(content[:, s:s + 4]), style_ctx)
        outs.append(ret_c["mel_out"])
    mel_str = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(mel_str), np.asarray(ret_off["mel_out"]),
                               atol=5e-5, rtol=1e-4)


def test_streaming_equals_offline_flow_f0():
    """f0_gen='flow': chunkwise Euler with per-step conv carries reproduces
    the offline rectified-flow trajectory (shared initial noise)."""
    _, model, params, vq_state, cfg = _build(f0_gen="flow", seed=5)
    content, ref, _, _ = _data(seed=5, T=16)
    B, T = content.shape
    rng_np = np.random.default_rng(55)
    noise = jnp.asarray(rng_np.standard_normal((B, T, 1)).astype(np.float32))
    ret_off = model.apply(params, jnp.asarray(content), ref=jnp.asarray(ref),
                          vq_state=vq_state, infer=True, global_step=200000,
                          initial_noise=noise)
    style_ctx = model.prepare_style(params, vq_state, jnp.asarray(ref))
    state = model.init_stream_state(B)
    outs, f0s = [], []
    for s in range(0, T, 4):
        ret_c, state = model.stream_step(params, state,
                                         jnp.asarray(content[:, s:s + 4]),
                                         style_ctx, f0_noise=noise[:, s:s + 4])
        outs.append(ret_c["mel_out"])
        f0s.append(ret_c["f0_denorm_pred"])
    np.testing.assert_allclose(np.asarray(jnp.concatenate(f0s, 1)),
                               np.asarray(ret_off["f0_denorm_pred"]),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, 1)),
                               np.asarray(ret_off["mel_out"]), atol=1e-4, rtol=1e-3)
