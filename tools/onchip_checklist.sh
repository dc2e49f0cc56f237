#!/bin/bash
# Round-3 on-chip validation queue (docs/PERF.md checklist + VERDICT r2 #2/#4/#7).
# Runs every candidate serially on the one real TPU chip, each step bounded,
# logs under $OUT. Failures don't block later steps.
set -u
OUT=${1:-/tmp/onchip_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout 1800 env "$@" > "$OUT/$name.log" 2>&1
  echo "    rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}

# 0. compiled-kernel equality tier (STANDARD GATE since round 4 — proves
#    the COMPILED Mosaic kernels on the real chip, incl. the f32
#    bit-exactness of the banded gather; found the r3 precision bug)
run tests_tpu python -m pytest tests_tpu/ -q

# 1. new-protocol full bench: spread on every metric + first ddim50 number
run bench_full python bench.py

# 2. adaptive starts alone (same S — expect ~same speed; validates compiled
#    (B,G)-starts kernels + einsum scatter fold on real hardware)
run bench_adaptive BENCH_FULL=0 AM_BANDED_ADAPTIVE=1 python bench.py

# 3. W=128 hilbert candidates (L0 slice 640->384): with + without adaptive
run bench_adaptive_w128 BENCH_FULL=0 AM_BANDED_ADAPTIVE=1 AM_BANDED_WINDOW=128 python bench.py
run bench_w128 BENCH_FULL=0 AM_BANDED_WINDOW=128 python bench.py

# 4. flash attention (samplers expected to gain most)
run bench_flash AM_FLASH_ATTN=1 python bench.py

# 5. fused qkv (round-2 candidate, never benched)
run bench_fused_qkv BENCH_FULL=0 BENCH_FUSED_QKV=1 python bench.py

# 6. metric A/B of the combined candidate stack (banded leg picks up the env;
#    exact leg ignores it) — accuracy gate for flipping defaults
run metric_ab_candidate AM_BANDED_ADAPTIVE=1 AM_BANDED_WINDOW=128 AM_FLASH_ATTN=1 \
  python tools/metric_ab.py --out "$OUT/metric_ab_candidate.json"

# 7. scaling points: batch + dispatch
run bench_b64 BENCH_FULL=0 BENCH_BATCH=64 python bench.py
run bench_b128 BENCH_FULL=0 BENCH_BATCH=128 python bench.py
run bench_dispatch4 BENCH_FULL=0 BENCH_DISPATCH=4 python bench.py

echo "=== queue done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
