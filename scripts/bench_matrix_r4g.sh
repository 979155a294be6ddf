#!/bin/bash
# Round-4 wave-8: prefill MFU dissection (int8 vs bf16), batch-3 prefill,
# int8-KV bisect continued (--exact sampling discriminator, chunkloop
# --sample/--mlp).
#
# Wave 7: fork-free profile shows prefill ~linear at 0.44-0.49 MFU (no
# mystery fixed cost; image table ~6 ms); the bench's 0.65 s/call includes
# waiting behind concurrent SAM/ViT restage dispatches. Bisect: kernel,
# chunkloop, prefillscatter, dense-engine ALL pass; only the Pallas-kernel
# engine crashes -> suspect approx_max_k (PartialReduce) + Mosaic in one
# while_loop body, or transformer-scale VMEM pressure.
set -u
cd /root/repo
OUT=/tmp/bench_matrix_r4g
mkdir -p "$OUT"

stamp() { echo "=== $1 ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/summary.txt"; }

# 1-2. prefill graph dissection, int8 then bf16
stamp dissect_int8
timeout 2400 python scripts/dissect_prefill.py --weight-quant int8 \
  > "$OUT/dissect_int8.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
grep -E "fwd|full" "$OUT/dissect_int8.log" | tee -a "$OUT/summary.txt"

stamp dissect_bf16
timeout 2400 python scripts/dissect_prefill.py \
  > "$OUT/dissect_bf16.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
grep -E "fwd|full" "$OUT/dissect_bf16.log" | tee -a "$OUT/summary.txt"

# 3. batch-3 prefill at the best config (image bucket 4608 via the
#    batch-aware formula)
stamp tiles32_pb3
env SOCIO_PACK_EMBEDS=0 SOCIO_BENCH_TILES=32 SOCIO_BENCH_PREFILL_BATCH=3 \
  SOCIO_BENCH_WEIGHT_QUANT=int8 SOCIO_BENCH_SINGLE_COPY=1 SOCIO_GROUP_SIZE=8 \
  SOCIO_BENCH_MAXLEN=3328 SOCIO_BENCH_BUCKETS=2048,2560,3072 SOCIO_TRACE=1 \
  timeout 2400 python - > "$OUT/tiles32_pb3.log" 2>&1 <<'EOF'
import json
from bench import bench_socioseg
tps, detail = bench_socioseg()
print(json.dumps({"tag_tiles_per_s": round(tps, 3), "detail": detail}))
EOF
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -1 "$OUT/tiles32_pb3.log" | tee -a "$OUT/summary.txt"
grep "stats:" "$OUT/tiles32_pb3.log" | tail -1 | tee -a "$OUT/summary.txt"

# 4. bisect: engine with EXACT top-k sampling (no approx_max_k). Passing
#    here fingers the PartialReduce+Mosaic interaction; crashing clears it.
stamp bisect_engine_exact
timeout 2400 python scripts/bisect_int8kv.py engine --exact \
  > "$OUT/bisect_engine_exact.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -2 "$OUT/bisect_engine_exact.log" | tee -a "$OUT/summary.txt"

# 5. bisect: chunkloop + approx_max_k (+ mlp) — the synthetic reproducer
stamp bisect_chunkloop_sample
timeout 1800 python scripts/bisect_int8kv.py chunkloop --sample --mlp \
  > "$OUT/bisect_chunkloop_sample.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -2 "$OUT/bisect_chunkloop_sample.log" | tee -a "$OUT/summary.txt"
echo "matrix done $(date -u)" | tee -a "$OUT/summary.txt"
