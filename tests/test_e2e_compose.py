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
    conan_hp = dict(CONAN_HP)
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
