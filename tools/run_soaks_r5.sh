#!/bin/sh
# Round-5 TPU soak chain (sequential — one chip): same 4-stage shape as
# round 4's (tools/run_soaks_r4.sh) but at PRODUCTION geometry (VERDICT r4
# missing #2 / next-round #2): 6-layer Emformer, 256-hidden Conan, 512-channel
# shuffle vocoder — the shipped egs sizes — so the committed trained
# composition IS the production composition bench.py measures.  The --infer
# guard runs on EVERY test item (test_consistency_interval: 1, weak #6).
set -e
cd "$(dirname "$0")/.."
log() { echo "[soak-chain-r5 $(date +%H:%M:%S)] $*"; }

if [ ! -f /tmp/soak_corpus/binary/train.idx ]; then
    log "soak corpus missing — regenerating"
    python tools/make_soak_corpus.py
fi

log "spec_stats (postnet normalization)"
python -m conan_tpu.data.spec_stats --config egs/soak_r5/postnet.yaml

log "vocoder (production 512ch, bf16 train precision)"
python -m conan_tpu.train.run --config egs/soak_r5/vocoder.yaml \
    --exp_name soak_r5_voc --reset
log "emformer (production 6 layers)"
python -m conan_tpu.train.run --config egs/soak_r5/emformer.yaml \
    --exp_name soak_r5_emf --reset
log "conan (production hidden 256; vocoder_ckpt=soak_r5_voc emformer_ckpt=soak_r5_emf)"
python -m conan_tpu.train.run --config egs/soak_r5/conan.yaml \
    --exp_name soak_r5_conan --reset
log "postnet (production 20x256 flow, frozen soak_r5_conan)"
python -m conan_tpu.train.run --config egs/soak_r5/postnet.yaml \
    --exp_name soak_r5_post --reset

log "trained 3-stage composition --infer, stream-vs-offline guard on EVERY item"
timeout 6000 python -m conan_tpu.train.run --config egs/soak_r5/conan.yaml \
    --exp_name soak_r5_conan --infer

log "strip deploy checkpoints for commit"
python tools/strip_ckpt.py checkpoints/soak_r5_voc checkpoints/soak_r5_emf \
    checkpoints/soak_r5_conan checkpoints/soak_r5_post

log "manifests"
python tools/soak_manifest.py checkpoints/soak_r5_voc checkpoints/soak_r5_emf \
    checkpoints/soak_r5_conan checkpoints/soak_r5_post
log "chain done"
