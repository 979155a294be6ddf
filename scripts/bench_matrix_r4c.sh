#!/bin/bash
# Round-4 wave-4 on-chip matrix: single-copy quantized serving + int8-KV
# bisect stage.
#
# Wave 3: tiles12+int8w+g4 = 0.706 tiles/s; timed-run split admit 8.2 s
# (24 B2-prefills, half at the 4096 bucket) + decode 7.2 s (10.2 ms/step).
# Single-copy (pre-quantized tree, no bf16 copy) frees ~6 GB and unlocks
# 16-24 slots with int8 weights — the weight-read amortization lever.
# RISK probed here: the r2-era note says an int8 prefill graph crashed the
# axon remote XLA compiler; single-copy prefill IS quantized, so run 16
# first and watch for compile failure.
set -u
cd /root/repo
OUT=/tmp/bench_matrix_r4c
mkdir -p "$OUT"

run_one() {
  local tag="$1"; shift
  echo "=== $tag ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/summary.txt"
  env "$@" SOCIO_TRACE=1 timeout 2400 python - > "$OUT/$tag.log" 2>&1 <<'EOF'
import json, sys
from bench import bench_socioseg
tps, detail = bench_socioseg()
print(json.dumps({"tag_tiles_per_s": round(tps, 3), "detail": detail}))
EOF
  local rc=$?
  tail -1 "$OUT/$tag.log" | tee -a "$OUT/summary.txt"
  echo "rc=$rc" | tee -a "$OUT/summary.txt"
  return $rc
}

# 0. int8-KV kernel bisect stage first (quick; chip state independent).
echo "=== bisect_kernel ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/summary.txt"
timeout 1200 python scripts/bisect_int8kv.py kernel \
  > "$OUT/bisect_kernel.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -2 "$OUT/bisect_kernel.log" | tee -a "$OUT/summary.txt"

# 1. Single-copy at 16 tiles (the config that OOMed hybrid).
run_one tiles16_int8w_g4_sc SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=16 \
  SOCIO_BENCH_WEIGHT_QUANT=int8 SOCIO_BENCH_SINGLE_COPY=1 SOCIO_GROUP_SIZE=4
# 2. Single-copy at 24 tiles (weight reads amortize over 24 slots).
run_one tiles24_int8w_g4_sc SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=24 \
  SOCIO_BENCH_WEIGHT_QUANT=int8 SOCIO_BENCH_SINGLE_COPY=1 SOCIO_GROUP_SIZE=4
# 3. Group 6 at 24 tiles (restage batch vs slot-fullness tradeoff).
run_one tiles24_int8w_g6_sc SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=24 \
  SOCIO_BENCH_WEIGHT_QUANT=int8 SOCIO_BENCH_SINGLE_COPY=1 SOCIO_GROUP_SIZE=6
echo "matrix done $(date -u)" | tee -a "$OUT/summary.txt"
