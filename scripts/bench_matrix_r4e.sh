#!/bin/bash
# Round-4 wave-6: diagnose the prefill fixed cost (relay RTT / per-arg
# transfer), deep-queue occupancy leg, int8-KV chunkloop bisect.
#
# Wave 5: tiles24+int8w+sc+g6+b2560 = 0.791 tiles/s. Per-prefill-call cost
# decomposes as ~0.43 s FIXED + FLOP slope; steady decode chunks show only
# ~0.15 s fixed -> suspect the ~9 per-call host->device transfers. Decode
# occupancy swings 702->1786 steps run-to-run at tiles == slots.
set -u
cd /root/repo
OUT=/tmp/bench_matrix_r4e
mkdir -p "$OUT"

stamp() { echo "=== $1 ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/summary.txt"; }

# 0. relay primitive costs
stamp probe_dispatch
timeout 900 python scripts/probe_dispatch.py > "$OUT/probe_dispatch.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
grep "probe" "$OUT/probe_dispatch.log" | tee -a "$OUT/summary.txt"

# 1. prefill fixed-vs-slope at the production geometry (int8 single-copy)
stamp profile_prefill_int8
timeout 1800 python scripts/profile_prefill.py --weight-quant int8 \
  > "$OUT/profile_prefill_int8.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
grep -E "bucket|RESULT|MFU" "$OUT/profile_prefill_int8.log" | tee -a "$OUT/summary.txt"

# 2. deep queue: 48 tiles over 24 slots (occupancy stays high across the
#    s1->restage->s2 boundary; the serving shape of the 250-tile eval)
stamp tiles48_slots24
env SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=48 SOCIO_BENCH_SLOTS=24 \
  SOCIO_BENCH_WEIGHT_QUANT=int8 SOCIO_BENCH_SINGLE_COPY=1 SOCIO_GROUP_SIZE=6 \
  SOCIO_BENCH_BUCKETS=2048,2560,3072 SOCIO_TRACE=1 \
  timeout 2400 python - > "$OUT/tiles48_slots24.log" 2>&1 <<'EOF'
import json
from bench import bench_socioseg
tps, detail = bench_socioseg()
print(json.dumps({"tag_tiles_per_s": round(tps, 3), "detail": detail}))
EOF
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -1 "$OUT/tiles48_slots24.log" | tee -a "$OUT/summary.txt"
grep "stats:" "$OUT/tiles48_slots24.log" | tail -1 | tee -a "$OUT/summary.txt"

# 3. int8-KV chunkloop bisect (full composition first; expect crash -> then
#    narrow by hand). Runs LAST: a kernel fault takes the device down ~3 min.
stamp chunkloop_full
timeout 1200 python scripts/bisect_int8kv.py chunkloop \
  > "$OUT/chunkloop_full.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -2 "$OUT/chunkloop_full.log" | tee -a "$OUT/summary.txt"
echo "matrix done $(date -u)" | tee -a "$OUT/summary.txt"
