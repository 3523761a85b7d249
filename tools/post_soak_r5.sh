#!/bin/sh
# After tools/run_soaks_r5.sh (+ resume) completes: refresh measurements on
# the idle chip, ordered by evidence value (the round can be cut anytime).
# Every tool enables the persistent compile cache, so reruns are cheap.
set -x
cd "$(dirname "$0")/.."

# 1. refresh the stale D-side rows in tools/DECOMPOSE.json (VERDICT r4
#    weak #4 / next #5: dupd_* rows predate the block-diag MSD and
#    contradict the 83.4 ms full step in the same file)
timeout 5400 python tools/bench_decompose.py vocoder_disc > /tmp/decomp_r5.log 2>&1

# 2. vocoder serving ceiling: precision rungs + stage ablation (next #4)
timeout 5400 python tools/bench_vocoder_ceiling.py > /tmp/vocceil_r5.log 2>&1

# 3. serving-precision ladder on the TRAINED production composition (next #3,
#    also fixes weak #5: quality rows on trained weights + corpus audio)
timeout 5400 python tools/bench_serving_ladder.py --budget 3600 > /tmp/ladder_r5.log 2>&1

# 4. driver-bench prewarm: fills the persistent cache for every config
#    bench.py touches, so the end-of-round driver run is warm and completes
#    inside its budget with the full capacity sweeps
BENCH_BUDGET_S=5400 timeout 6000 python bench.py > /tmp/bench_prewarm.json 2> /tmp/bench_prewarm.log

# 5. warm validation: a second bench.py run must now land in minutes
BENCH_BUDGET_S=1500 timeout 1800 python bench.py > /tmp/bench_warm.json 2> /tmp/bench_warm.log
