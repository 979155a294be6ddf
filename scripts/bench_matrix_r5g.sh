#!/bin/bash
# Round-5 wave 16a: deep-queue headline candidate (int8-KV hung at production
# shape — wave 15 — so the queue-depth lever rides bf16 KV).
#   tiles48 > slots32: wave 6 measured decode occupancy 0.94 when the queue
#   is deeper than the slot count (restage raggedness can no longer idle
#   slots across the s1→restage→s2 boundary); all graphs identical to the
#   tiles32 defaults → warm remote HLO cache.
cd /root/repo
set -x

SOCIO_BENCH_TILES=48 SOCIO_BENCH_SLOTS=32 SOCIO_BENCH_RUNS=3 \
  SOCIO_BENCH_INT8=0 SOCIO_BENCH_W8A8=0 SOCIO_BENCH_TRAIN=0 \
  timeout 5400 python bench.py > /tmp/r5_bench_deepq.log 2>&1
echo "bench_deepq exit $?"
