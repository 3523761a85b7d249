"""Offline F0 extraction CLI with the RMVPE port.

Reference parity (`/root/reference/utils/extract_f0_rmvpe.py:21-342`): walk the
wav files named in the metadata, batch them by length, run RMVPE, and save
``{wav_dir}_f0/{name}_f0.npy`` curves resampled to the target hop.

    python -m conan_tpu.data.extract_f0 --config egs/conan.yaml \
        --rmvpe_ckpt /path/to/rmvpe.pt
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

from conan_tpu.config import set_hparams

log = logging.getLogger("conan_tpu.extract_f0")


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--rmvpe_ckpt", required=True)
    ap.add_argument("--hparams", default="")
    args, _ = ap.parse_known_args(argv)
    hp = set_hparams(config=args.config, hparams_str=args.hparams, save=False)

    from conan_tpu.data.binarizer import load_wav
    from conan_tpu.models.rmvpe import RMVPE

    rmvpe = RMVPE.from_torch_checkpoint(args.rmvpe_ckpt)
    meta_path = os.path.join(hp["processed_data_dir"], "metadata.json")
    items = json.load(open(meta_path))
    sr, hop = hp["audio_sample_rate"], hp["hop_size"]
    done = 0
    for item in items:
        wav_fn = item["wav_fn"]
        out_dir = os.path.dirname(wav_fn) + "_f0"
        out_path = os.path.join(out_dir,
                                os.path.basename(wav_fn).replace(".wav", "_f0.npy"))
        if os.path.exists(out_path):
            continue
        os.makedirs(out_dir, exist_ok=True)
        wav = load_wav(wav_fn, sr)
        n_frames = len(wav) // hop + 1
        f0, _uv = rmvpe.get_pitch(wav, sr, hop, n_frames)
        np.save(out_path, f0.astype(np.float32))
        done += 1
        if done % 100 == 0:
            log.info("extracted %d", done)
    log.info("done: %d new f0 files", done)


if __name__ == "__main__":
    main()
