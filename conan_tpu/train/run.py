"""Training CLI — ``python -m conan_tpu.train.run --config <yaml> --exp_name <n>``.

Reference-compatible entry (`/root/reference/tasks/run.py:9-19`): the config's
``task_cls`` selects the workload; reference task paths are mapped onto the
conan_tpu tasks. ``--infer`` runs the task's test/inference path.
"""

from __future__ import annotations

import logging
import sys

from conan_tpu.config import set_hparams
from conan_tpu.data.batching import BucketLadder
from conan_tpu.data.datasets import ConanDataset, EmformerDataset, VocoderDataset
from conan_tpu.data.loader import BatchIterator
from conan_tpu.train.trainer import Trainer

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(name)s: %(message)s")
log = logging.getLogger("conan_tpu.run")

TASK_ALIASES = {
    "tasks.Conan.Conan.ConanTask": "conan",
    "tasks.Conan.Conan.VCPostnetTask": "postnet",
    "tasks.Emformer.Emformer.EmformerTask": "emformer",
    "tasks.vocoder.hifigan.HifiGanTask": "vocoder",
    "conan": "conan", "emformer": "emformer", "vocoder": "vocoder",
    "postnet": "postnet",
}


def build_task(hp):
    name = TASK_ALIASES.get(hp.get("task_cls", "conan"))
    if name == "conan":
        from conan_tpu.train.tasks import ConanTask

        return ConanTask(hp), "conan"
    if name == "emformer":
        from conan_tpu.train.tasks import EmformerTask

        return EmformerTask(hp), "emformer"
    if name == "vocoder":
        from conan_tpu.train.tasks import VocoderTask

        return VocoderTask(hp), "vocoder"
    if name == "postnet":
        import numpy as np

        from conan_tpu.train.checkpoint import load_ckpt_state
        from conan_tpu.train.tasks import PostnetTask

        pre = load_ckpt_state(hp["fs2_ckpt_dir"])
        hp2 = hp
        if hp.get("spec_min") is None:  # load computed dataset stats
            stats = np.load(f"{hp['binary_data_dir']}/spec_stats.npz")
            hp2 = hp.replace(spec_min=[float(x) for x in stats["spec_min"]],
                             spec_max=[float(x) for x in stats["spec_max"]])
        return PostnetTask(hp2, pre["params_g"], pre.get("vq_state")), "postnet"
    raise ValueError(f"unknown task_cls: {hp.get('task_cls')}")


def build_train_iter(hp, kind: str):
    data_dir = hp["binary_data_dir"]
    ladder = BucketLadder(min_len=64, max_len=hp.get("max_frames", 3000))
    if kind == "conan":
        ds = ConanDataset(data_dir, "train", hp)

        def collate_conan(samples, target_len=None):
            # bucket the REF mel length too — otherwise every distinct
            # reference length is a fresh XLA compile
            ref_max = max(s["ref_mel"].shape[0] for s in samples)
            return ds.collate(samples, target_len, ladder.fit(ref_max))

        return iter(BatchIterator(ds, collate_conan, max_tokens=hp.get("max_tokens"),
                                  max_sentences=hp.get("max_sentences"),
                                  bucket=ladder))
    if kind == "emformer":
        ds = EmformerDataset(data_dir, "train", hp)

        def collate(samples, target_len=None):
            return ds.collate(samples, target_len,
                              seg=hp["chunk_size"] // 20, rc=hp["right_context"])

        return iter(BatchIterator(ds, collate, max_tokens=hp.get("max_tokens"),
                                  max_sentences=hp.get("max_sentences"),
                                  bucket=ladder))
    if kind == "vocoder":
        ds = VocoderDataset(data_dir, "train", hp)
        return iter(BatchIterator(ds, ds.collate, max_tokens=None,
                                  max_sentences=hp.get("max_sentences", 16)))
    if kind == "postnet":
        ds = ConanDataset(data_dir, "train", hp)

        def collate_post(samples, target_len=None):
            ref_max = max(s["ref_mel"].shape[0] for s in samples)
            return ds.collate(samples, target_len, ladder.fit(ref_max))

        return iter(BatchIterator(ds, collate_post, max_tokens=hp.get("max_tokens"),
                                  max_sentences=hp.get("max_sentences"),
                                  bucket=ladder))
    raise ValueError(kind)


def build_valid_fn(hp, task, kind: str, n_batches: int = 4):
    """A few fixed validation batches (reference num_sanity_val_steps-style)."""
    import os

    data_dir = hp["binary_data_dir"]
    if not os.path.exists(f"{data_dir}/valid_lengths.npy"):
        return None
    try:
        if kind == "conan":
            from conan_tpu.train.validation import make_conan_valid_fn

            ds = ConanDataset(data_dir, "valid", hp)
            batches = [ds.collate([ds[i]]) for i in range(min(n_batches, len(ds)))]
            return make_conan_valid_fn(task, batches, work_dir=hp["work_dir"])
        if kind == "emformer":
            from conan_tpu.train.validation import make_emformer_valid_fn

            ds = EmformerDataset(data_dir, "valid", hp)
            batches = [ds.collate([ds[i]], seg=hp["chunk_size"] // 20,
                                  rc=hp["right_context"])
                       for i in range(min(n_batches, len(ds)))]
            return make_emformer_valid_fn(task, batches)
        if kind == "vocoder":
            from conan_tpu.train.validation import make_vocoder_valid_fn

            ds = VocoderDataset(data_dir, "valid", hp)
            batches = [ds.collate([ds[i]]) for i in range(min(n_batches, len(ds)))]
            return make_vocoder_valid_fn(task, batches)
    except Exception as e:  # missing split etc. — validation is optional
        log.warning("no validation set: %s", e)
    return None


def run_test(hp) -> None:
    """--infer: convert the test split chunkwise through the composed
    streaming engine and save wavs (reference ConanTask.test_step,
    tasks/Conan/Conan.py:214-284)."""
    import os

    import numpy as np

    from conan_tpu.data.datasets import ConanDataset
    from conan_tpu.infer.build import build_engine
    from conan_tpu.infer.run_vc import save_wav

    eng = build_engine(hp["work_dir"], hp["emformer_ckpt"], hp["vocoder_ckpt"], hp)
    ds = ConanDataset(hp["binary_data_dir"], "test", hp)
    gen_dir = os.path.join(hp["work_dir"],
                           f"generated_{hp.get('resume_from_checkpoint', 'last')}")
    os.makedirs(gen_dir, exist_ok=True)
    import jax.numpy as jnp

    for i in range(len(ds)):
        s = ds[i]
        # codes come from the binarized teacher stream; style from ref mel
        style = eng._prepare(jnp.asarray(s["ref_mel"][None]))
        state = eng.init_state(1)
        T = len(s["content"])
        seg, rc = eng.cfg.seg, eng.cfg.rc
        T_pad = -(-T // seg) * seg
        mel_src = np.pad(s["mel"], ((0, T_pad - T + rc), (0, 0)), mode="edge")
        chunks = []
        for t in range(0, T_pad, seg):
            wav, _codes, state = eng._step(state,
                                           jnp.asarray(mel_src[None, t:t + seg + rc]),
                                           style)
            chunks.append(np.asarray(wav[0, :, 0]))
        wav_full = np.concatenate(chunks)[: T * hp["hop_size"]]
        save_wav(os.path.join(gen_dir, f"{s['item_name']}.wav"), wav_full,
                 hp["audio_sample_rate"])
        log.info("[%d/%d] %s", i + 1, len(ds), s["item_name"])


def main(argv=None) -> None:
    hp = set_hparams(argv=argv if argv is not None else sys.argv[1:])
    if hp.get("infer"):
        run_test(hp)
        return
    task, kind = build_task(hp)
    static = {}
    if kind == "conan":
        static["use_random_ref_after"] = hp.get("random_speaker_steps", 100000)
    trainer = Trainer(task, hp, hp["work_dir"], static_step_kwargs=static)
    train_iter = build_train_iter(hp, kind)
    valid_fn = build_valid_fn(hp, task, kind)
    log.info("starting %s training in %s (precision=%s)", kind, hp["work_dir"],
             hp.get("train_precision", "highest"))
    from conan_tpu.ops.precision import precision_scope

    with precision_scope(hp.get("train_precision", "highest")):
        trainer.fit(train_iter, valid_fn)


if __name__ == "__main__":
    main()
