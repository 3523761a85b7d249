"""Full user journey: train (tiny) stages → checkpoint dirs with configs →
compose engine from 3 dirs → batch VC runner CLI writes output wavs."""

import json
import os

import numpy as np
import yaml

from conan_tpu.config import HParams
from conan_tpu.data.binarizer import ConanBinarizer
from conan_tpu.train.checkpoint import save_checkpoint
from conan_tpu.train.tasks import ConanTask, EmformerTask, VocoderTask
from tests.test_data_pipeline import _write_synth_corpus
from tests.test_train_steps import CONAN_HP, EMF_HP, VOC_HP


def test_compose_and_run_vc(tmp_path, rng):
    import jax

    # --- tiny stage checkpoints (vocoder/emformer random-init; conan 1 step)
    emf_hp = dict(EMF_HP, emformer_input_dim=80, emformer_layers=1)
    voc_hp = dict(VOC_HP)
    # denoise_c > 0 exercises the post-vocoder spectral subtraction in the
    # runner (ADVICE r4 high: the _post hook shipped with a dead AttributeError
    # and no test covered the run_vc wiring)
    conan_hp = dict(CONAN_HP, vocoder_denoise_c=0.002)
    dirs = {}
    for name, task_cls, hp in (("emformer", EmformerTask, emf_hp),
                               ("vocoder", VocoderTask, voc_hp),
                               ("conan", ConanTask, conan_hp)):
        task = task_cls(HParams(hp))
        state = task.init_state(jax.random.PRNGKey(0))
        d = str(tmp_path / name)
        os.makedirs(d)
        save_checkpoint(d, 1, jax.device_get(state), hp)
        yaml.safe_dump(hp, open(f"{d}/config.yaml", "w"))
        dirs[name] = d

    # --- synthetic wav pair + runner CLI
    speakers = _write_synth_corpus(tmp_path, rng, n_items=2)
    wavs = sorted((tmp_path / "wavs").glob("*.wav"))
    pairs = [{"source": str(wavs[0]), "reference": str(wavs[1]),
              "output": str(tmp_path / "out" / "converted.wav")}]
    pairs_path = str(tmp_path / "pairs.json")
    json.dump(pairs, open(pairs_path, "w"))

    from conan_tpu.infer.run_vc import main

    main(["--pairs", pairs_path, "--conan_dir", dirs["conan"],
          "--emformer_dir", dirs["emformer"], "--vocoder_dir", dirs["vocoder"]])
    from scipy.io import wavfile

    sr, wav = wavfile.read(pairs[0]["output"])
    assert sr == 16000 and len(wav) > 16000 // 2
    assert np.abs(wav).max() > 0

    # --serving_precision plumbs the ladder through the CLI; codes are exact
    # in every rung (emformer stays HIGHEST) so output stays close to exact
    pairs[0]["output"] = str(tmp_path / "out" / "converted_high.wav")
    json.dump(pairs, open(pairs_path, "w"))
    main(["--pairs", pairs_path, "--conan_dir", dirs["conan"],
          "--emformer_dir", dirs["emformer"], "--vocoder_dir", dirs["vocoder"],
          "--serving_precision", "high"])
    sr2, wav_high = wavfile.read(pairs[0]["output"])
    assert sr2 == sr and wav_high.shape == wav.shape
    # int16 wavs; high-rung drift is ~1e-5 full-scale (SERVING_LADDER.json)
    assert np.abs(wav_high.astype(np.int32) - wav.astype(np.int32)).max() <= 2


def test_postprocess_denoise(rng):
    """run_vc.postprocess: denoise returns the input length, attenuates a
    noisy waveform, and pads lengths onto a power-of-two hop ladder (one XLA
    compile per bucket instead of one per utterance length)."""
    from conan_tpu.audio.mel import MelConfig
    from conan_tpu.infer.run_vc import postprocess

    cfg = MelConfig()
    wav = rng.standard_normal(13_211).astype(np.float32) * 0.05
    out = postprocess(wav, cfg, denoise_c=0.05)
    assert out.shape == wav.shape
    # spectral subtraction of a constant magnitude strictly shrinks noise
    assert np.abs(out).mean() < np.abs(wav).mean()
    # denoise_c == 0 is the identity
    np.testing.assert_array_equal(postprocess(wav, cfg, 0.0), wav)


def test_run_test_infer_with_guard(tmp_path, rng):
    """--infer over the binarized test split through the composed engine:
    writes wavs + infer_manifest.json with per-item stream-vs-offline guard
    results (reference ConanTask.test_step, tasks/Conan/Conan.py:214-284)."""
    import jax

    from tests.test_data_pipeline import _write_synth_corpus as _corpus2
    from conan_tpu.data.binarizer import ConanBinarizer

    speakers = _corpus2(tmp_path, rng, n_items=4, n_speakers=2)
    base = {
        "processed_data_dir": str(tmp_path / "processed"),
        "binary_data_dir": str(tmp_path / "binary"),
        "audio_sample_rate": 16000, "hop_size": 320, "fft_size": 1024,
        "win_size": 1024, "audio_num_mel_bins": 80, "fmin": 80, "fmax": 7600,
        "valid_prefixes": [speakers[0]], "test_prefixes": [speakers[0]],
        "max_frames": 3000, "max_samples": 2560,
    }
    ConanBinarizer(HParams(base)).process()

    emf_hp = dict(EMF_HP, emformer_input_dim=80, emformer_layers=1)
    voc_hp = dict(VOC_HP)
    conan_hp = dict(CONAN_HP, **base)
    dirs = {}
    for name, task_cls, hp in (("emformer", EmformerTask, emf_hp),
                               ("vocoder", VocoderTask, voc_hp),
                               ("conan", ConanTask, conan_hp)):
        task = task_cls(HParams(hp))
        state = task.init_state(jax.random.PRNGKey(0))
        d = str(tmp_path / name)
        os.makedirs(d)
        save_checkpoint(d, 1, jax.device_get(state), hp)
        yaml.safe_dump(hp, open(f"{d}/config.yaml", "w"))
        dirs[name] = d

    from conan_tpu.train.run import run_test

    hp = HParams(dict(conan_hp, work_dir=dirs["conan"],
                      emformer_ckpt=dirs["emformer"],
                      vocoder_ckpt=dirs["vocoder"],
                      test_consistency_interval=2,
                      test_consistency_atol=1e-3))
    run_test(hp)  # raises on stream/offline drift
    gen = tmp_path / "conan" / "generated_last"
    wavs = sorted(gen.glob("*.wav"))
    assert len(wavs) >= 1
    man = json.load(open(gen / "infer_manifest.json"))
    assert man["guard_passed"] and man["guard_checked"] >= 1
    guards = [it["guard"] for it in man["items"] if it["guard"]]
    assert guards and all(g["ok"] for g in guards)
    assert all(it["chunks"] > 0 for it in man["items"])
