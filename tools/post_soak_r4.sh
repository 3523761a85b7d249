#!/bin/sh
# After tools/run_soaks_r4.sh completes: refresh measurements on the idle
# chip, ordered by evidence value (the round can be cut at any time).
set -x
cd "$(dirname "$0")/.."

# 1. BENCH_TRAIN emformer rows are stale (pre-banded-attention 34 ms); the
#    grouped slice-stack attention landed after the last refresh
timeout 3000 python bench_train.py \
    --only emformer_distill:default,emformer_distill:highest \
    > /tmp/bt_r4_emf.log 2>&1

# 2. fast-mode quality deltas (bench.py cites tools/SERVING_FAST.json)
timeout 3000 python tools/bench_fast_quality.py > /tmp/fastq_r4.log 2>&1

# 3. serving chunk-step decomposition, single stream + capacity-knee batches
timeout 3000 python tools/bench_serving_parts.py > /tmp/parts_b1.log 2>&1
timeout 3000 python tools/bench_serving_parts.py --streams 8 > /tmp/parts_b8.log 2>&1
timeout 3000 python tools/bench_serving_parts.py --streams 64 > /tmp/parts_b64.log 2>&1

# 4. refresh the vocoder train-step decomposition on current code (the
#    committed rows predate the block-diagonal grouped-conv fast path)
timeout 3000 python tools/bench_decompose.py vocoder > /tmp/decomp_r4.log 2>&1

# 5. soak manifests (ckpt hashes + trajectories; CPU)
python tools/soak_manifest.py checkpoints/soak_r4_voc checkpoints/soak_r4_emf \
    checkpoints/soak_r4_conan checkpoints/soak_r4_post > /tmp/manifests_r4.log 2>&1
