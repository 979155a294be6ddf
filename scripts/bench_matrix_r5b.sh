#!/bin/bash
# Round-5 wave 14: (1) re-sweep the flash kernel after the bf16-matmul-input
# fix (the f32 upcast capped it at ~11 TFLOP/s), (2) validate decode_inner=32
# under int8-KV at 128 new tokens (chunk-64 readback economics, 32-iteration
# executables — the fault-free size), (3) full socioseg bench with int8-KV +
# the new flash defaults promoted.
cd /root/repo
set -x

timeout 2400 python scripts/tune_flash_prefill.py > /tmp/r5_tune_flash2.log 2>&1
echo "tune_flash2 exit $?"

timeout 1800 python scripts/bisect_int8kv.py engine --n-new 129 \
  --decode-chunk 64 --decode-inner 32 > /tmp/r5_engine_inner32.log 2>&1
INNER=$?
echo "engine_inner32 exit $INNER"

if [ "$INNER" -eq 0 ]; then
  SOCIO_BENCH_KV_QUANT=int8 SOCIO_BENCH_DECODE_INNER=32 SOCIO_BENCH_RUNS=3 \
    timeout 5400 python bench.py > /tmp/r5_bench_int8kv.log 2>&1
  echo "bench_int8kv exit $?"
else
  SOCIO_BENCH_RUNS=3 timeout 5400 python bench.py > /tmp/r5_bench_flash.log 2>&1
  echo "bench_flash exit $?"
fi
