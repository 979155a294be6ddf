#!/bin/bash
# Round-4 wave-7: fixed prefill profile (fork-free), deep-queue at 32 slots,
# int8-KV bisect continued (prefill scatter suspect + dense-engine control).
#
# Wave 6: probe showed transfers/dispatch are ~ms (readback ~30 ms) — the
# ~0.4 s fixed prefill cost is INSIDE the executable. chunkloop (decode
# composition) passed → prime suspect is the prefill's quantized-cache
# scatter, whose async execution would surface a fault at the next readback
# (the observed "crash in first decode chunk").
set -u
cd /root/repo
OUT=/tmp/bench_matrix_r4f
mkdir -p "$OUT"

stamp() { echo "=== $1 ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/summary.txt"; }

# 1. prefill fixed-vs-slope, fork-free, with no-image ablation
stamp profile_prefill_int8
timeout 2400 python scripts/profile_prefill.py --weight-quant int8 \
  > "$OUT/profile_prefill_int8.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
grep -E "bucket|RESULT|MFU" "$OUT/profile_prefill_int8.log" | tee -a "$OUT/summary.txt"

# 2. deep queue at 32 slots: 40 tiles (occupancy + decode amortization)
stamp tiles40_slots32
env SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=40 SOCIO_BENCH_SLOTS=32 \
  SOCIO_BENCH_WEIGHT_QUANT=int8 SOCIO_BENCH_SINGLE_COPY=1 SOCIO_GROUP_SIZE=8 \
  SOCIO_BENCH_MAXLEN=3328 SOCIO_BENCH_BUCKETS=2048,2560,3072 SOCIO_TRACE=1 \
  timeout 2400 python - > "$OUT/tiles40_slots32.log" 2>&1 <<'EOF'
import json
from bench import bench_socioseg
tps, detail = bench_socioseg()
print(json.dumps({"tag_tiles_per_s": round(tps, 3), "detail": detail}))
EOF
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -1 "$OUT/tiles40_slots32.log" | tee -a "$OUT/summary.txt"
grep "stats:" "$OUT/tiles40_slots32.log" | tail -1 | tee -a "$OUT/summary.txt"

# 3. bisect: prefill quantized-cache scatter at exact shapes (crash risk —
#    after the bench legs)
stamp bisect_prefillscatter
timeout 1200 python scripts/bisect_int8kv.py prefillscatter \
  > "$OUT/bisect_prefillscatter.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -2 "$OUT/bisect_prefillscatter.log" | tee -a "$OUT/summary.txt"

# 4. bisect: engine with Pallas kernels disabled (dense dequant fallback).
#    Crash here exonerates the paged kernel entirely.
stamp bisect_engine_dense
timeout 2400 python scripts/bisect_int8kv.py engine --dense \
  > "$OUT/bisect_engine_dense.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -2 "$OUT/bisect_engine_dense.log" | tee -a "$OUT/summary.txt"
echo "matrix done $(date -u)" | tee -a "$OUT/summary.txt"
