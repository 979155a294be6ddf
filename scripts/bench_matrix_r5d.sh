#!/bin/bash
# Round-5 wave 15: the headline A/B after the wave-14 promotions.
#   (1) full socioseg bench with int8 KV (decode_inner=32 workaround) + the
#       new bq256/bk512 flash defaults — the candidate record;
#   (2) quant-accuracy bounds for every promoted serving knob (VERDICT r4
#       item 3);
#   (3) full bench at current defaults (no int8 KV) — the A/B control.
# Sequential: one JAX/TPU process at a time (axon tunnel contention).
cd /root/repo
set -x

SOCIO_BENCH_KV_QUANT=int8 SOCIO_BENCH_DECODE_INNER=32 SOCIO_BENCH_RUNS=3 \
  SOCIO_BENCH_INT8=0 SOCIO_BENCH_TRAIN=0 \
  timeout 4200 python bench.py > /tmp/r5_bench_int8kv.log 2>&1
echo "bench_int8kv exit $?"

timeout 2400 python scripts/quant_accuracy.py > /tmp/r5_quant_acc.log 2>&1
echo "quant_acc exit $?"

SOCIO_BENCH_RUNS=3 SOCIO_BENCH_INT8=0 SOCIO_BENCH_TRAIN=0 \
  timeout 4200 python bench.py > /tmp/r5_bench_defaults.log 2>&1
echo "bench_defaults exit $?"
