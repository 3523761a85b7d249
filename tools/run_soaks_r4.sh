#!/bin/sh
# Round-4 TPU soak chain (sequential — one chip).  Same shape as round 3's
# (tools/run_soaks_r3.sh) with one fix: round 3 never COMMITTED the trained
# weights (checkpoints/ is gitignored and the soak dirs were stripped to
# metrics/configs), so the trained 3-stage composition in BENCH_r03 was not
# reproducible from the repo.  This chain re-trains the four stages and then
# tools/strip_ckpt.py writes small inference-only deploy checkpoints that DO
# get committed (a few MB total), plus the --infer guard artifact.
# Prereq: python tools/make_soak_corpus.py  (writes /tmp/soak_corpus)
set -e
cd "$(dirname "$0")/.."
log() { echo "[soak-chain-r4 $(date +%H:%M:%S)] $*"; }

log "spec_stats (postnet normalization — round 3 stalled on this missing step)"
python -m conan_tpu.data.spec_stats --config egs/soak/postnet.yaml

log "vocoder bf16 (shipped precision)"
python -m conan_tpu.train.run --config egs/soak/vocoder.yaml \
    --exp_name soak_r4_voc --reset
log "emformer"
python -m conan_tpu.train.run --config egs/soak/emformer.yaml \
    --exp_name soak_r4_emf --reset
log "conan (vocoder_ckpt=soak_r4_voc emformer_ckpt=soak_r4_emf)"
python -m conan_tpu.train.run --config egs/soak/conan.yaml \
    --exp_name soak_r4_conan --reset
log "postnet (frozen soak_r4_conan)"
python -m conan_tpu.train.run --config egs/soak/postnet.yaml \
    --exp_name soak_r4_post --reset

log "trained 3-stage composition --infer with stream-vs-offline guard"
timeout 3000 python -m conan_tpu.train.run --config egs/soak/conan.yaml \
    --exp_name soak_r4_conan --infer

log "strip deploy checkpoints for commit"
python tools/strip_ckpt.py checkpoints/soak_r4_voc checkpoints/soak_r4_emf \
    checkpoints/soak_r4_conan checkpoints/soak_r4_post

log "manifests"
python tools/soak_manifest.py checkpoints/soak_r4_voc checkpoints/soak_r4_emf \
    checkpoints/soak_r4_conan checkpoints/soak_r4_post
log "chain done"
