#!/bin/bash
# Round-3 phase-2 on-chip runs: official new-default bench, adaptive-only
# metric A/B (accuracy evidence for the flipped default), sampler batch
# scaling (the sampler is transformer-only — unlike training, batch should
# scale well).
set -u
OUT=${1:-/tmp/onchip_r3b}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout 1800 env "$@" > "$OUT/$name.log" 2>&1
  echo "    rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}

# 1. official round-3 default recipe (adaptive starts on)
run bench_official python bench.py

# 2. metric A/B at the new defaults (banded leg = adaptive, W=256)
run metric_ab_newdefault python tools/metric_ab.py --out "$OUT/metric_ab_newdefault.json"

# 3. sampler batch scaling (ddpm-1000 + ddim50 at b64 / b128)
run sampler_b64 BENCH_ONLY=sampler,ddim BENCH_BATCH=64 python bench.py
run sampler_b128 BENCH_ONLY=sampler,ddim BENCH_BATCH=128 python bench.py

# 4. dispatch-hang isolation: the r3 queue's BENCH_DISPATCH=4 run stalled
#    >25min in compile with adaptive starts on; bisect adaptive vs scan
run dispatch2_noadapt BENCH_FULL=0 BENCH_DISPATCH=2 AM_BANDED_ADAPTIVE=0 python bench.py
run dispatch2_adapt BENCH_FULL=0 BENCH_DISPATCH=2 python bench.py

echo "=== phase2 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
