#!/bin/bash
# Round-4 wave-9: w8a8 prefill A/B (the 2x-int8-MXU lever), int8-KV bisect
# prefill-vs-decode discriminator.
#
# Wave 8: prefill is FLOP-bound at 0.51-0.55 MFU (fwd_cache 235 ms at
# (2,2048)); pb3 no win (0.852 vs 0.879); engine --exact ALSO crashed ->
# approx_max_k cleared as the int8-KV trigger.
set -u
cd /root/repo
OUT=/tmp/bench_matrix_r4h
mkdir -p "$OUT"

stamp() { echo "=== $1 ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/summary.txt"; }

# 1. w8a8 prefill bucket timing A/B vs w8a16
stamp profile_prefill_w8a8
timeout 2400 python scripts/profile_prefill.py --weight-quant int8 --act-quant \
  > "$OUT/profile_prefill_w8a8.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
grep -E "bucket|RESULT|MFU" "$OUT/profile_prefill_w8a8.log" | tee -a "$OUT/summary.txt"

# 2. best config + act_quant (w8a8 prefill end-to-end)
stamp tiles32_w8a8
env SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=32 SOCIO_BENCH_ACT_QUANT=int8 \
  SOCIO_BENCH_WEIGHT_QUANT=int8 SOCIO_BENCH_SINGLE_COPY=1 SOCIO_GROUP_SIZE=8 \
  SOCIO_BENCH_MAXLEN=3328 SOCIO_BENCH_BUCKETS=2048,2560,3072 SOCIO_TRACE=1 \
  timeout 2400 python - > "$OUT/tiles32_w8a8.log" 2>&1 <<'EOF'
import json
from bench import bench_socioseg
tps, detail = bench_socioseg()
print(json.dumps({"tag_tiles_per_s": round(tps, 3), "detail": detail}))
EOF
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -1 "$OUT/tiles32_w8a8.log" | tee -a "$OUT/summary.txt"
grep "stats:" "$OUT/tiles32_w8a8.log" | tail -1 | tee -a "$OUT/summary.txt"

# 3. bisect: prefill-only engine (requests finish at admission; NO decode
#    chunk ever runs). Crash -> the prefill graph (quantized scatter in
#    context) is the fault; pass -> the decode graph is.
stamp bisect_engine_prefillonly
timeout 2400 python scripts/bisect_int8kv.py engine --n-new 1 \
  > "$OUT/bisect_engine_prefillonly.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -3 "$OUT/bisect_engine_prefillonly.log" | tee -a "$OUT/summary.txt"
echo "matrix done $(date -u)" | tee -a "$OUT/summary.txt"
