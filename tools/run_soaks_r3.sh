#!/bin/sh
# Round-3 TPU soak chain (sequential — one chip):
#   1. vocoder fp32 + bf16 precision pair (VERDICT r2 next#3)
#   2. emformer + conan + postnet with real upstream checkpoints, fixing the
#      r2 gap where conan's emformer_ckpt was empty (VERDICT r2 missing#1)
# Prereq: python tools/make_soak_corpus.py  (writes /tmp/soak_corpus)
set -e
cd "$(dirname "$0")/.."
log() { echo "[soak-chain $(date +%H:%M:%S)] $*"; }

log "vocoder fp32 control"
python -m conan_tpu.train.run --config egs/soak/vocoder.yaml \
    --exp_name soak_r3_voc_fp32 --hparams "train_precision=highest" --reset
log "vocoder bf16 (shipped precision)"
python -m conan_tpu.train.run --config egs/soak/vocoder.yaml \
    --exp_name soak_r3_voc --hparams "train_precision=default" --reset
log "emformer"
python -m conan_tpu.train.run --config egs/soak/emformer.yaml \
    --exp_name soak_r3_emf --reset
log "conan (vocoder_ckpt=soak_r3_voc emformer_ckpt=soak_r3_emf)"
python -m conan_tpu.train.run --config egs/soak/conan.yaml \
    --exp_name soak_r3_conan --reset
log "postnet (frozen soak_r3_conan)"
python -m conan_tpu.train.run --config egs/soak/postnet.yaml \
    --exp_name soak_r3_post --reset
log "chain done"
