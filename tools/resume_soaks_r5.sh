#!/bin/sh
# Resume the round-5 soak chain after a transient axon tunnel failure
# (observed: "remote_compile: read body: response body closed" mid-compile
# killed the conan stage).  Each stage retries up to 3 times; retries drop
# --reset so the Trainer auto-resumes from the newest checkpoint
# (reference-parity behavior, utils/commons/trainer.py:153-163).
cd "$(dirname "$0")/.."
log() { echo "[soak-resume-r5 $(date +%H:%M:%S)] $*"; }

run_retry() {
    _name="$1"; shift
    _reset="$1"; shift
    n=0
    while [ $n -lt 3 ]; do
        if [ $n -eq 0 ] && [ "$_reset" = reset ]; then
            log "$_name (attempt $((n + 1)), --reset)"
            "$@" --reset && return 0
        else
            log "$_name (attempt $((n + 1)))"
            "$@" && return 0
        fi
        n=$((n + 1))
        log "$_name failed (rc $?) — retrying in 30s"
        sleep 30
    done
    log "$_name FAILED after 3 attempts"
    return 1
}

set -e
run_retry "conan" reset python -m conan_tpu.train.run \
    --config egs/soak_r5/conan.yaml --exp_name soak_r5_conan
run_retry "postnet" reset python -m conan_tpu.train.run \
    --config egs/soak_r5/postnet.yaml --exp_name soak_r5_post
run_retry "infer+guard-every-item" noreset timeout 6000 python -m conan_tpu.train.run \
    --config egs/soak_r5/conan.yaml --exp_name soak_r5_conan --infer
log "strip deploy checkpoints"
python tools/strip_ckpt.py checkpoints/soak_r5_voc checkpoints/soak_r5_emf \
    checkpoints/soak_r5_conan checkpoints/soak_r5_post
log "manifests"
python tools/soak_manifest.py checkpoints/soak_r5_voc checkpoints/soak_r5_emf \
    checkpoints/soak_r5_conan checkpoints/soak_r5_post
log "chain done"
