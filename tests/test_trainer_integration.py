"""Trainer integration: CLI config → task → compiled steps → checkpoint →
resume, on the synthetic corpus and the virtual CPU mesh."""

import json

import jax

import numpy as np
import yaml

from conan_tpu.config import HParams
from conan_tpu.train.checkpoint import (get_all_checkpoints, get_last_checkpoint,
                                        load_ckpt_state, save_checkpoint)
from conan_tpu.train.trainer import Trainer
from conan_tpu.train.tasks import EmformerTask
from tests.test_data_pipeline import _write_synth_corpus
from conan_tpu.data.binarizer import ConanBinarizer


def test_checkpoint_roundtrip(tmp_path, rng):
    state = {"params": {"w": rng.standard_normal((4, 4))},
             "step": np.asarray(7)}
    p1 = save_checkpoint(str(tmp_path), 100, state, {"lr": 0.1})
    save_checkpoint(str(tmp_path), 200, state)
    save_checkpoint(str(tmp_path), 300, state)
    save_checkpoint(str(tmp_path), 400, state, num_keep=3)
    paths = get_all_checkpoints(str(tmp_path))
    assert len(paths) == 3 and "400" in paths[0]
    ckpt, path = get_last_checkpoint(str(tmp_path))
    assert ckpt["global_step"] == 400
    sub = load_ckpt_state(str(tmp_path), "params")
    np.testing.assert_array_equal(sub["w"], state["params"]["w"])


def test_trainer_fit_and_resume(tmp_path, rng):
    speakers = _write_synth_corpus(tmp_path, rng, n_items=6)
    hp_dict = {
        "processed_data_dir": str(tmp_path / "processed"),
        "binary_data_dir": str(tmp_path / "binary"),
        "audio_sample_rate": 16000, "hop_size": 320, "fft_size": 1024,
        "win_size": 1024, "audio_num_mel_bins": 80, "fmin": 80, "fmax": 7600,
        "valid_prefixes": [speakers[0]], "test_prefixes": [speakers[0]],
        "max_frames": 3000,
        # emformer task params (tiny)
        "emformer_input_dim": 80, "emformer_layers": 1, "chunk_size": 80,
        "right_context": 2, "emformer_output_dim": 100, "lr": 1e-4,
        "warmup_steps": 10, "optimizer_adam_beta1": 0.9,
        "optimizer_adam_beta2": 0.98, "weight_decay": 0.0, "clip_grad_norm": 1.0,
        "max_updates": 4, "val_check_interval": 2, "tb_log_interval": 2,
        "max_tokens": 2000, "max_sentences": 2, "seed": 0,
    }
    hp = HParams(hp_dict)
    ConanBinarizer(hp).process()
    work = str(tmp_path / "exp")

    from conan_tpu.train.run import build_train_iter

    # monkey-free: tiny ffn via direct config tweak is not exposed in hparams;
    # full-size 1-layer emformer on 80 dims is small enough for CPU.
    task = EmformerTask(hp)
    trainer = Trainer(task, hp, work)
    state = trainer.fit(build_train_iter(hp, "emformer"))
    assert int(np.asarray(state["step"])) == 4
    assert len(get_all_checkpoints(work)) >= 1
    # metrics written
    lines = [json.loads(l) for l in open(f"{work}/metrics.jsonl")]
    assert any(l["prefix"] == "tr" and "ce" in l for l in lines)
    # resume continues from step 4
    trainer2 = Trainer(task, hp.replace(max_updates=6), work)
    state2 = trainer2.fit(build_train_iter(hp, "emformer"))
    assert int(np.asarray(state2["step"])) == 6


def test_build_valid_fn_statistics(tmp_path, rng):
    """Validation covers num_valid_stats items with bounded shapes (round-1
    weakness: 4 single-item batches; reference evaluates the whole split,
    utils/commons/trainer.py:259-300)."""
    import types

    from conan_tpu.train.run import build_valid_fn

    speakers = _write_synth_corpus(tmp_path, rng, n_items=10)
    hp = HParams({
        "processed_data_dir": str(tmp_path / "processed"),
        "binary_data_dir": str(tmp_path / "binary"),
        "audio_sample_rate": 16000, "hop_size": 320, "fft_size": 1024,
        "win_size": 1024, "audio_num_mel_bins": 80, "fmin": 80, "fmax": 7600,
        "valid_prefixes": [speakers[0]], "test_prefixes": [speakers[0]],
        "max_frames": 3000, "max_samples": 2560, "num_valid_stats": 8,
        "emformer_input_dim": 80, "emformer_layers": 1, "chunk_size": 80,
        "right_context": 2, "emformer_output_dim": 100, "lr": 1e-4,
        "warmup_steps": 10, "optimizer_adam_beta1": 0.9,
        "optimizer_adam_beta2": 0.98, "weight_decay": 0.0,
        "clip_grad_norm": 1.0, "work_dir": str(tmp_path / "exp"),
    })
    ConanBinarizer(hp).process()

    # emformer: multi-item −1-masked batches, executes end to end
    task = EmformerTask(hp)
    vf = build_valid_fn(hp, task, "emformer")
    n_items = sum(b["nsamples"] for b in vf.batches)
    assert n_items >= 4 and any(b["nsamples"] > 1 for b in vf.batches)
    assert all(b["mels"].shape[1] % 4 == 2 for b in vf.batches)  # seg+rc pad
    state = task.init_state(jax.random.PRNGKey(0))
    m = vf(state, 0)
    assert "val_loss" in m and np.isfinite(m["val_loss"])

    # conan: single-item unmasked batches, frame-cropped onto a 64 grid
    stub = types.SimpleNamespace(hp=hp, model=None)
    vf = build_valid_fn(hp, stub, "conan")
    assert len(vf.batches) >= 4
    for b in vf.batches:
        assert b["nsamples"] == 1
        T = b["mels"].shape[1]
        assert T < 64 or (T & (T - 1)) == 0  # short kept; others p2-cropped
        assert (b["content"] != -1).all()  # crop, never pad

    # vocoder: fixed-size crops batch together
    vf = build_valid_fn(hp, stub, "vocoder")
    mf = hp["max_samples"] // hp["hop_size"]
    assert sum(b["mels"].shape[0] for b in vf.batches) >= 4
    assert all(b["mels"].shape[1] == mf for b in vf.batches)


def test_run_test_vocoder_infer(tmp_path, rng):
    """Vocoder --infer: copy-synthesis of the test split with the on-data
    incremental-consistency guard (reference tasks/vocoder/hifigan.py:277-444)."""
    import os

    from conan_tpu.models.vocoder.hifigan import HifiGanConfig, HifiGanGenerator
    from conan_tpu.train.run import run_test_vocoder

    speakers = _write_synth_corpus(tmp_path, rng, n_items=6)
    hp = HParams({
        "processed_data_dir": str(tmp_path / "processed"),
        "binary_data_dir": str(tmp_path / "binary"),
        "audio_sample_rate": 16000, "hop_size": 320, "fft_size": 1024,
        "win_size": 1024, "audio_num_mel_bins": 80, "fmin": 80, "fmax": 7600,
        "valid_prefixes": [speakers[0]], "test_prefixes": [speakers[0]],
        "max_frames": 3000, "work_dir": str(tmp_path / "exp"),
        # tiny generator matching hop 320 = 8*5*4*2
        "upsample_initial_channel": 16,
        "upsample_rates": [8, 5, 4, 2], "upsample_kernel_sizes": [16, 10, 8, 4],
        "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
        "test_consistency_interval": 2,
    })
    ConanBinarizer(hp).process()
    gen = HifiGanGenerator(HifiGanConfig.from_hparams(hp))
    save_checkpoint(hp["work_dir"], 10,
                    {"params_g": gen.init(jax.random.PRNGKey(0))})
    run_test_vocoder(hp)  # raises on stream/offline drift
    wavs = os.listdir(f"{hp['work_dir']}/generated_test")
    assert len(wavs) > 0 and all(w.endswith(".wav") for w in wavs)
