#!/bin/bash
# Round-4 on-chip experiment matrix for the socioseg north-star metric.
#
# The r3 matrix (docs/BENCH_MATRIX_r4.md) established: per-sample embed
# dispatch ("nopack") beats the packed ViT dispatch on-chip (0.525 vs 0.398
# tiles/s at 8 tiles bf16), tiles16 OOMs with the packed path, int8 weights
# barely move the packed number. This matrix measures the combos the r3
# matrix never reached: nopack+int8w, tiles16 under nopack, and the restage
# group-size sweep at the winning config.
#
# Usage: scripts/bench_matrix_r4.sh   (from /root/repo, with the TPU tunnel up)
set -u
cd /root/repo
OUT=/tmp/bench_matrix_r4
mkdir -p "$OUT"

run_one() {
  local tag="$1"; shift
  echo "=== $tag ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/summary.txt"
  env "$@" SOCIO_TRACE=1 timeout 1800 python - > "$OUT/$tag.log" 2>&1 <<'EOF'
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

# 1. Concurrency lever under the nopack winner: 16 tiles, bf16.
#    (r3's tiles16 OOMed with packed embeds; nopack has a smaller ViT peak.)
run_one tiles16_nopack SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=16
# 2. Quant lever measured cleanly at the winner: 8 tiles, int8 weights.
run_one nopack_int8w SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_WEIGHT_QUANT=int8
# 3. Combined (both params copies + 16-slot KV ~15.9 GB: may OOM on v5e).
run_one tiles16_nopack_int8w SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=16 \
  SOCIO_BENCH_WEIGHT_QUANT=int8
# 4. Fallback concurrency point if 16+int8w OOMs.
run_one tiles12_nopack_int8w SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=12 \
  SOCIO_BENCH_WEIGHT_QUANT=int8
# 5. Restage group-size sweep at 16 tiles (default is n//2=8; try 4).
run_one tiles16_nopack_g4 SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=16 \
  SOCIO_GROUP_SIZE=4
echo "matrix done $(date -u)" | tee -a "$OUT/summary.txt"
