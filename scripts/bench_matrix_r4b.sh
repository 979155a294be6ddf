#!/bin/bash
# Round-4 wave-3 on-chip matrix for the socioseg north-star metric.
#
# Wave 2 (docs/BENCH_MATRIX_r4.md) established: tiles12+nopack+int8w is the
# best verified config (0.679 tiles/s); tiles16+int8w OOMs (dual bf16+int8
# param copies); restage group 4 gained +15% at tiles16 bf16. This wave
# measures the group-size lever ON the int8w winner, a larger admission
# batch, and collects the new admit/decode wall-time split (engine stats)
# to direct the next optimization.
#
# Usage: scripts/bench_matrix_r4b.sh   (from /root/repo, with the TPU tunnel up)
set -u
cd /root/repo
OUT=/tmp/bench_matrix_r4b
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

# 1. Group-size lever on the wave-2 winner (no new compiles: same graphs).
run_one tiles12_int8w_g4 SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=12 \
  SOCIO_BENCH_WEIGHT_QUANT=int8 SOCIO_GROUP_SIZE=4
run_one tiles12_int8w_g2 SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=12 \
  SOCIO_BENCH_WEIGHT_QUANT=int8 SOCIO_GROUP_SIZE=2
# 2. Admission batch 4 (new prefill graphs: B4 x bucket x img8192 — one-time
#    compile cost through the remote compiler, excluded by the warmup run).
run_one tiles12_int8w_g4_pb4 SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=12 \
  SOCIO_BENCH_WEIGHT_QUANT=int8 SOCIO_GROUP_SIZE=4 SOCIO_BENCH_PREFILL_BATCH=4
# 3. Concurrency at bf16 with the g4 lever beyond 16.
run_one tiles20_nopack_g4 SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=20 \
  SOCIO_GROUP_SIZE=4
echo "matrix done $(date -u)" | tee -a "$OUT/summary.txt"
