#!/bin/bash
# On-chip measurement battery — run when the axon TPU tunnel recovers.
# Runs every pending chip validation/measurement in priority order, logging
# to /tmp/chip_battery/. Each step is individually time-bounded so one hang
# doesn't block the rest. Safe to re-run (persistent compile cache).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/chip_battery
mkdir -p "$OUT"

run() {  # run NAME TIMEOUT_S CMD...
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc" | tee -a "$OUT/summary.log"
  tail -15 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}

# 0. tunnel sanity
run probe 120 python -c "import jax,jax.numpy as jnp; x=jnp.ones((256,256),jnp.bfloat16); print('OK',float(jnp.sum(x@x)))"
grep -q OK "$OUT/probe.log" || { echo "TUNNEL STILL DOWN"; exit 1; }

# 1. int8 attention microbench + block sweep (decides the serving kernel cfg)
run int8_attn_micro 1800 python tools/bench_int8_attn.py --iters 10
run int8_block_sweep 3600 python tools/sweep_int8_blocks.py --iters 10 --pv

# 2. flagship ID-resample anyl e2e smoke (the round-2 unvalidated item)
run smoke_anyl_resample 5400 python tools/smoke_chip_anyl.py --resample --steps 6

# 3. full bench ladder (headline: int8 W8A8 + int8-QK^T attention at 42L)
run bench_full 7200 python bench.py

echo "=== battery done ($(date +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
