#!/bin/bash
# Round-5 wave 15: (1) quant-accuracy bounds for every promoted serving knob
# (VERDICT r4 item 3) — bf16 vs int8w vs +w8a8 vs int4w, logit closeness +
# greedy-token agreement; (2) the socioseg bench at the r5 promoted defaults
# (bq256/bk512 flash, int8 KV decode_inner=32 if wave 14 validated it) for
# the headline record.
cd /root/repo
set -x

timeout 2400 python scripts/quant_accuracy.py > /tmp/r5_quant_acc.log 2>&1
echo "quant_acc exit $?"

SOCIO_BENCH_RUNS=3 timeout 5400 python bench.py > /tmp/r5_bench_defaults.log 2>&1
echo "bench_defaults exit $?"
