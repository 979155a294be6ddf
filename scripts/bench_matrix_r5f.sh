#!/bin/bash
# Round-5 wave 15 RELAUNCH (the r5d run died with the builder session at
# ~08:44 UTC during the int8-KV bench warmup; logs confirmed no result).
#   (1) int8-KV socioseg bench (decode_inner=32 workaround, wave-14
#       validated at engine level) — the candidate record; extra phases off
#       to get the headline number fast;
#   (2) all non-socioseg phases (prefill/decode/int8/w8a8/TRAIN) — the
#       train-step phase (VERDICT r4 item 4) has never run on-chip;
#   (3) quant-accuracy bounds (VERDICT r4 item 3).
# Sequential: one JAX/TPU process at a time (axon tunnel contention).
cd /root/repo
set -x

SOCIO_BENCH_KV_QUANT=int8 SOCIO_BENCH_DECODE_INNER=32 SOCIO_BENCH_RUNS=3 \
  SOCIO_BENCH_INT8=0 SOCIO_BENCH_W8A8=0 SOCIO_BENCH_TRAIN=0 \
  timeout 4500 python bench.py > /tmp/r5_bench_int8kv.log 2>&1
echo "bench_int8kv exit $?"

SOCIO_BENCH_SOCIO=0 timeout 3600 python bench.py > /tmp/r5_bench_phases.log 2>&1
echo "bench_phases exit $?"

timeout 2400 python scripts/quant_accuracy.py > /tmp/r5_quant_acc.log 2>&1
echo "quant_acc exit $?"
