"""Train-step smoke + DP tests: each task runs compiled steps on the virtual
8-device CPU mesh with a sharded batch; losses stay finite and decrease is
not asserted (2 steps) but parameter movement is."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conan_tpu.parallel import make_mesh, replicate, shard_batch, shard_train_step
from conan_tpu.train.tasks import ConanTask, EmformerTask, VocoderTask

VOC_HP = {
    "audio_sample_rate": 16000, "hop_size": 320, "fft_size": 1024, "win_size": 1024,
    "num_mels": 80, "upsample_initial_channel": 16,
    "upsample_rates": [8, 5, 4, 2], "upsample_kernel_sizes": [16, 10, 8, 4],
    "resblock": "1", "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3, 5]],
    "upsample": "shuffle", "lambda_mel": 5.0, "lambda_adv": 1.0,
    "use_fm_loss": False, "use_ms_stft": True,
    "stft_loss_param": {"fft_sizes": [512], "hop_sizes": [160], "win_lengths": [512]},
    "mel_loss_param": {"mel_bin": 320, "fft_sizes": [512], "hop_sizes": [160],
                       "win_lengths": [512]},
    "generator_optimizer_params": {"lr": 2e-4},
    "generator_scheduler_params": {"step_size": 600, "gamma": 0.999},
    "discriminator_optimizer_params": {"lr": 2e-4},
    "discriminator_scheduler_params": {"step_size": 600, "gamma": 0.999},
    "generator_grad_norm": 10.0, "discriminator_grad_norm": 1.0,
}

CONAN_HP = {
    "hidden_size": 32, "kernel_size": 3, "audio_num_mel_bins": 80,
    "content_embedding_dim": 102, "silent_token": 57, "style": True, "nVQ": 16,
    "vae_dropout": 0.0, "lambda_commit": 0.25, "f0_gen": "orig",
    "predictor_kernel": 5, "predictor_grad": 1.0, "lambda_f0": 1.0, "lambda_uv": 1.0,
    "dec_dilations": [1], "dec_kernel_size": 5, "dec_post_net_kernel": 3,
    "layers_in_block": 1, "dropout": 0.0, "lr": 5e-4, "scheduler": "warmup",
    "warmup_updates": 4000, "optimizer_adam_beta1": 0.9, "optimizer_adam_beta2": 0.98,
    "weight_decay": 0.0, "clip_grad_norm": 1.0, "disc_lr": 1e-4,
    "disc_win_num": 1, "mel_disc_hidden_size": 8,
    "disc_start_steps": 0, "vq_start": -1, "forcing": 1, "random_speaker_steps": 100000,
    "lambda_mel_adv": 0.05, "mel_losses": "l1:0.5|ssim:0.5",
    "discriminator_scheduler_params": {"step_size": 40000, "gamma": 0.5},
    "discriminator_optimizer_params": {"eps": 1e-6, "weight_decay": 0.0},
}

EMF_HP = {
    "emformer_input_dim": 16, "emformer_layers": 2, "chunk_size": 80,
    "right_context": 2, "emformer_output_dim": 100, "lr": 1e-4,
    "warmup_steps": 100, "warmup_init_lr": 1e-7, "lr_decay": 0.995,
    "decay_interval": 2500, "min_lr": 1e-6, "optimizer_adam_beta1": 0.9,
    "optimizer_adam_beta2": 0.98, "weight_decay": 0.0, "clip_grad_norm": 1.0,
}


def _leaf_delta(a, b):
    return max(float(jnp.abs(x - y).max()) for x, y in
               zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_vocoder_train_step(rng):
    task = VocoderTask(VOC_HP)
    state = task.init_state(jax.random.PRNGKey(0))
    B, T = 8, 40
    batch = {
        "mels": jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32)),
        "wavs": jnp.asarray((rng.standard_normal((B, T * 320)) * 0.1).astype(np.float32)),
    }
    mesh = make_mesh(8)
    step = shard_train_step(task.train_step, mesh)
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    key = replicate(jax.random.PRNGKey(1), mesh)
    new_state, metrics = step(state_r, batch_s, key)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert {"mel", "a_p", "a_s", "sc", "mag", "r_p", "f_p", "r_s", "f_s"} <= set(metrics)
    assert _leaf_delta(new_state["params_g"], state["params_g"]) > 0
    assert int(new_state["step"]) == 1


def test_vocoder_train_step_cond_spec_disc(rng):
    """Optional adversarial variants (reference tasks/vocoder/hifigan.py:
    65-75,152-158,181-196): conditional MPD/MSD with rolled-mel negatives +
    the spectrogram discriminator over the loss mels."""
    hp = dict(VOC_HP, use_cond_disc=True, use_spec_disc=True,
              fmin=80, fmax=7600, lambda_mel_adv=1.0)
    task = VocoderTask(hp)
    state = task.init_state(jax.random.PRNGKey(0))
    B, T = 8, 40  # T=40 >= the largest spec-disc window (32) -> fit engages
    batch = {
        "mels": jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32)),
        "wavs": jnp.asarray((rng.standard_normal((B, T * 320)) * 0.1).astype(np.float32)),
    }
    mesh = make_mesh(8)
    step = shard_train_step(task.train_step, mesh)
    new_state, metrics = step(replicate(state, mesh), shard_batch(batch, mesh),
                              replicate(jax.random.PRNGKey(1), mesh))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert {"a_mel", "r_mel", "f_mel",
            "f_p_cd1", "f_p_cd2", "f_s_cd1", "f_s_cd2"} <= set(metrics)
    assert float(metrics["r_mel"]) != 0.0  # windows fit -> spec disc engaged
    assert _leaf_delta(new_state["params_d"]["specd"],
                       state["params_d"]["specd"]) > 0
    assert _leaf_delta(new_state["params_d"]["mpd"]["discs"][0]["cond"],
                       state["params_d"]["mpd"]["discs"][0]["cond"]) > 0


def test_conan_train_step(rng):
    task = ConanTask(CONAN_HP)
    state = task.init_state(jax.random.PRNGKey(0))
    B, T, Tr = 8, 160, 32
    f0 = (rng.standard_normal((B, T)) * 0.5 + 7.5).astype(np.float32)
    batch = {
        "content": jnp.asarray(rng.integers(0, 100, (B, T))),
        "mels": jnp.asarray((rng.standard_normal((B, T, 80)) * 0.5).astype(np.float32)),
        "ref_mels": jnp.asarray((rng.standard_normal((B, Tr, 80)) * 0.5).astype(np.float32)),
        "f0": jnp.asarray(f0),
        "uv": jnp.asarray((rng.random((B, T)) < 0.25).astype(np.float32)),
    }
    mesh = make_mesh(8)
    step = shard_train_step(task.train_step, mesh)
    state_r = replicate(state, mesh)
    new_state, metrics = step(state_r, shard_batch(batch, mesh),
                              replicate(jax.random.PRNGKey(1), mesh))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert {"l1", "ssim", "fdiff", "uv", "gloss", "vq_loss", "a"} <= set(metrics)
    assert _leaf_delta(new_state["params_g"], state["params_g"]) > 0
    # VQ EMA state must advance identically on every replica (psum'd stats)
    assert _leaf_delta(new_state["vq_state"], state["vq_state"]) > 0


def test_conan_vq_kmeans_bootstrap(rng):
    """Host-side kmeans init path (prosody_util.py:56-65 equivalent)."""
    task = ConanTask(CONAN_HP)
    state = task.init_state(jax.random.PRNGKey(0))
    x = rng.standard_normal((500, CONAN_HP["hidden_size"])).astype(np.float32)
    vq2 = task.model.prosody.vq.kmeans_init_host(state["vq_state"], x)
    assert float(vq2["initialized"]) == 1.0
    assert np.isfinite(np.asarray(vq2["embedding"])).all()
    assert np.asarray(vq2["ema_count"]).sum() == pytest.approx(500, abs=1)


def test_emformer_train_step(rng):
    task = EmformerTask(EMF_HP)
    state = task.init_state(jax.random.PRNGKey(0))
    B, T = 8, 24
    batch = {
        "mels": jnp.asarray(rng.standard_normal((B, T + 2, 16)).astype(np.float32)),
        "content": jnp.asarray(rng.integers(0, 100, (B, T))),
    }
    mesh = make_mesh(8)
    step = shard_train_step(task.train_step, mesh)
    new_state, metrics = step(replicate(state, mesh), shard_batch(batch, mesh),
                              replicate(jax.random.PRNGKey(1), mesh))
    assert np.isfinite(float(metrics["ce"]))
    assert 0.0 <= float(metrics["acc"]) <= 1.0
    # 2nd step from the new state (jit cache hit)
    state3, m3 = step(new_state, shard_batch(batch, mesh),
                      replicate(jax.random.PRNGKey(2), mesh))
    assert int(state3["step"]) == 2


def test_conan_vq_kmeans_hook(rng):
    """Trainer-side kmeans bootstrap initializes the codebook from batch
    prosody features, retries on starved batches, and no-ops once done."""
    import jax

    hp = dict(CONAN_HP, vq_start=3)
    task = ConanTask(hp)
    state = task.init_state(jax.random.PRNGKey(0))
    assert float(state["vq_state"]["initialized"]) == 0.0
    B, T = 4, 160
    batch = {
        "content": np.asarray(rng.integers(0, 100, (B, T))),
        "mels": (rng.standard_normal((B, T, 80)) * 0.5).astype(np.float32),
        "ref_mels": (rng.standard_normal((B, 32, 80)) * 0.5).astype(np.float32),
        "f0": (rng.standard_normal((B, T)) * 0.5 + 7.5).astype(np.float32),
        "uv": (rng.random((B, T)) < 0.25).astype(np.float32),
    }
    # a starved batch (too few prosody rows for kmeans) defers, not skips
    tiny = dict(batch, mels=batch["mels"][:1, :32])
    new, done = task.host_hook(dict(state), 4, tiny)
    assert new is None and not done
    new, done = task.host_hook(dict(state), 5, batch)
    assert done and float(new["vq_state"]["initialized"]) == 1.0
    emb = np.asarray(new["vq_state"]["embedding"])
    assert np.abs(emb).max() > 1.0 / 512  # not the tiny uniform init anymore
    # once initialized the hook is a no-op
    again, done2 = task.host_hook(new, 6, batch)
    assert again is None and done2


def test_mel_disc_window_fit_gating(rng):
    """The mel disc reports fit=False when any crop window does not engage —
    statically (T < w) or dynamically (all utterances shorter than w) — and
    the reference's validity=None path then skips the GAN losses."""
    from conan_tpu.models.vocoder.discriminators import MultiWindowDiscriminator

    disc = MultiWindowDiscriminator(time_lengths=(8, 16), freq_length=12, hidden=8)
    params = disc.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    long = jnp.asarray(rng.standard_normal((2, 24, 12)).astype(np.float32) + 3.0)
    _, _, _, fit = disc.apply(params, long, key)
    assert bool(fit)
    # statically impossible window (T=12 < 16)
    _, _, _, fit_static = disc.apply(params, long[:, :12], key)
    assert not bool(fit_static)
    # dynamically too short: padded to T=24 but only 10 nonzero frames
    padded = jnp.concatenate([long[:, :10], jnp.zeros((2, 14, 12))], axis=1)
    _, _, _, fit_dyn = disc.apply(params, padded, key)
    assert not bool(fit_dyn)


def test_vocoder_valid_fn_signature(rng):
    """make_vocoder_valid_fn must track the task's loss signature (a stale
    call crashed the r3 soak at its first validation)."""
    from conan_tpu.train.validation import make_vocoder_valid_fn

    task = VocoderTask(VOC_HP)
    state = jax.device_get(task.init_state(jax.random.PRNGKey(0)))
    batch = {
        "mels": rng.standard_normal((2, 12, 80)).astype(np.float32),
        "wavs": (rng.standard_normal((2, 12 * 320)) * 0.1).astype(np.float32),
    }
    vm = make_vocoder_valid_fn(task, [batch])(state, 0)
    assert np.isfinite(vm["val_loss"])


def test_conan_disc_interval_gates_d_update(rng):
    """disc_interval=2: D params update only on even steps
    (tasks/Conan/Conan.py:170)."""
    hp = dict(CONAN_HP, disc_interval=2)
    task = ConanTask(hp)
    state = task.init_state(jax.random.PRNGKey(0))
    B, T, Tr = 2, 96, 32
    f0 = (rng.standard_normal((B, T)) * 0.5 + 7.5).astype(np.float32)
    batch = {
        "content": jnp.asarray(rng.integers(0, 100, (B, T))),
        "mels": jnp.asarray((rng.standard_normal((B, T, 80)) * 0.5).astype(np.float32)),
        "ref_mels": jnp.asarray((rng.standard_normal((B, Tr, 80)) * 0.5).astype(np.float32)),
        "f0": jnp.asarray(f0),
        "uv": jnp.asarray((rng.random((B, T)) < 0.25).astype(np.float32)),
    }
    step = jax.jit(task.train_step)
    # step 0: 0 % 2 == 0 -> D updates
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    assert _leaf_delta(s1["params_d"], state["params_d"]) > 0
    # step 1: 1 % 2 != 0 -> D frozen (G still moves)
    s2, _ = step(s1, batch, jax.random.PRNGKey(2))
    assert _leaf_delta(s2["params_d"], s1["params_d"]) == 0
    assert _leaf_delta(s2["params_g"], s1["params_g"]) > 0


def test_emformer_distillation_temperature(rng):
    """Temperature-scaled CE × lambda (Emformer.py:15-46,57-58)."""
    B, T = 2, 24
    mel = jnp.asarray((rng.standard_normal((B, T + 2, 16)) * 0.5).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 100, (B, T)))
    batch = {"mels": mel, "content": codes}
    t1 = EmformerTask(EMF_HP)
    base, _ = t1._loss(t1.init_state(jax.random.PRNGKey(0))["params"], batch)
    t2 = EmformerTask(dict(EMF_HP, distillation_temperature=2.0,
                           lambda_distillation=3.0))
    scaled, _ = t2._loss(t2.init_state(jax.random.PRNGKey(0))["params"], batch)
    # same params, T=2 flattens logits -> CE near ln(100) for random logits;
    # lambda multiplies. Both must differ from the base and stay finite.
    assert np.isfinite(float(base)) and np.isfinite(float(scaled))
    assert abs(float(scaled) - float(base)) > 1e-3
    # lambda is a pure scale: lambda=3 at T=1 is exactly 3x the base loss
    t3 = EmformerTask(dict(EMF_HP, lambda_distillation=3.0))
    tripled, _ = t3._loss(t3.init_state(jax.random.PRNGKey(0))["params"], batch)
    assert float(tripled) == pytest.approx(3.0 * float(base), rel=1e-6)
