#!/bin/bash
# Round-3 on-chip experiment matrix for the socioseg north-star metric.
#
# Runs the socioseg two-stage phase alone (not the full bench.py) under a
# sequence of configs, one JAX process at a time, each bounded by `timeout`.
# Results land in /tmp/bench_matrix/<tag>.log; a one-line summary per config
# is appended to /tmp/bench_matrix/summary.txt.
#
# Usage: scripts/bench_matrix.sh   (from /root/repo, with the TPU tunnel up)
set -u
cd /root/repo
OUT=/tmp/bench_matrix
mkdir -p "$OUT"

run_one() {
  local tag="$1"; shift
  echo "=== $tag ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/summary.txt"
  env "$@" SOCIO_TRACE=1 timeout 1500 python - > "$OUT/$tag.log" 2>&1 <<'EOF'
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

# 1. Confirm HEAD completes at the shipped default (8 tiles, bf16).
run_one base8 || exit 1
# 1b. Ablate the packed ViT embed dispatch (per-sample fallback) to price it.
run_one base8_nopack SOCIO_PACK_EMBEDS=0
# 2. Scale slots: 16 tiles (est ~12 GB HBM; 24 OOMed in r2 — do NOT try 24).
run_one tiles16 SOCIO_BENCH_TILES=16
# 3. int8 weights at 8 tiles (decode 11.7 -> 7.3 ms/step in isolation).
run_one int8w8 SOCIO_BENCH_WEIGHT_QUANT=int8
# 4. Combined, only reached if both singles passed.
run_one tiles16_int8w SOCIO_BENCH_TILES=16 SOCIO_BENCH_WEIGHT_QUANT=int8
# 5. int4 weights (group-128 w4a16): first probe the compiler via the
#    isolated decode ablation, then the full socioseg phase if it compiled.
timeout 1500 python scripts/ablate_decode.py int4 > "$OUT/ablate_int4.log" 2>&1 \
  && run_one int4w8 SOCIO_BENCH_WEIGHT_QUANT=int4
tail -2 "$OUT/ablate_int4.log" | tee -a "$OUT/summary.txt"
echo "matrix done $(date -u)" | tee -a "$OUT/summary.txt"
