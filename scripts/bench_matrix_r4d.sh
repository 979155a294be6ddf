#!/bin/bash
# Round-4 wave-5 on-chip matrix: decompose admit (prefill_dev_s now printed
# in the engine stats), tighter s2 bucket, concurrency push, int8-KV bisect
# engine stage.
#
# Wave 4: tiles24+int8w+g6+single-copy = 0.772 tiles/s (batch 31.08 s; warm
# split admit 16.7 s / decode 8.9 s / ~5.5 s outside the engine). Admit is
# now 2x decode — prefill is the target. s2 prompts are ~2540 tokens and pad
# to the 3072 bucket; a 2560 bucket cuts 17% of s2 prefill FLOPs.
set -u
cd /root/repo
OUT=/tmp/bench_matrix_r4d
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
  grep "stats:" "$OUT/$tag.log" | tail -1 | tee -a "$OUT/summary.txt"
  echo "rc=$rc" | tee -a "$OUT/summary.txt"
  return $rc
}

# 0. int8-KV bisect: engine stage (text-only 3B, 24 slots, kv_quant=int8).
echo "=== bisect_engine ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/summary.txt"
timeout 2400 python scripts/bisect_int8kv.py engine \
  > "$OUT/bisect_engine.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -3 "$OUT/bisect_engine.log" | tee -a "$OUT/summary.txt"

# 1. Wave-4 best, re-run with the admit decomposition (prefill_dev_s).
run_one tiles24_g6_sc_base SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=24 \
  SOCIO_BENCH_WEIGHT_QUANT=int8 SOCIO_BENCH_SINGLE_COPY=1 SOCIO_GROUP_SIZE=6
# 2. Same + tight 2560 bucket for s2 prompts (s1 stays at 2048).
run_one tiles24_g6_sc_b2560 SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=24 \
  SOCIO_BENCH_WEIGHT_QUANT=int8 SOCIO_BENCH_SINGLE_COPY=1 SOCIO_GROUP_SIZE=6 \
  SOCIO_BENCH_BUCKETS=2048,2560,3072
# 3. Concurrency push: 32 tiles, max_len 3328 (3072 bucket + 256 new),
#    group 8. bf16 KV at 32x3328 = 3.8 GB + 3.4 GB int8 params.
run_one tiles32_g8_sc SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=32 \
  SOCIO_BENCH_WEIGHT_QUANT=int8 SOCIO_BENCH_SINGLE_COPY=1 SOCIO_GROUP_SIZE=8 \
  SOCIO_BENCH_MAXLEN=3328 SOCIO_BENCH_BUCKETS=2048,2560,3072
echo "matrix done $(date -u)" | tee -a "$OUT/summary.txt"
