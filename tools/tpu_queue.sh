#!/bin/bash
# Serialize TPU benchmark jobs (one chip; concurrent runs distort slope timing).
# Waits for any running bench_decompose/bench_train to finish first.
set -u
cd /root/repo
while pgrep -f "bench_decompose.py|bench_train.py" > /dev/null; do sleep 30; done
echo "=== vocoder_disc decompose ==="
timeout 3600 python tools/bench_decompose.py vocoder_disc
echo "=== bench_train conan/emformer bf16 ==="
timeout 3600 python bench_train.py --only conan_gan:default,emformer_distill:default
echo "=== queue done ==="
