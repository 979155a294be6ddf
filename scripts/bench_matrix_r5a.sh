#!/bin/bash
# Round-5 wave 13: int8-KV chunk-size bisect (2 PASS / 64 CRASH) + prefill
# flash-attn block sweep + quant accuracy bounds. One TPU process at a time.
cd /root/repo
set -x

timeout 1500 python scripts/bisect_int8kv.py engine --n-new 17 --decode-chunk 16 \
  > /tmp/r5_engine_c16.log 2>&1
C16=$?
echo "chunk16 exit $C16"

if [ "$C16" -eq 0 ]; then
  timeout 1500 python scripts/bisect_int8kv.py engine --n-new 33 --decode-chunk 32 \
    > /tmp/r5_engine_c32.log 2>&1
  C32=$?
  echo "chunk32 exit $C32"
  if [ "$C32" -eq 0 ]; then
    timeout 1500 python scripts/bisect_int8kv.py engine --n-new 49 --decode-chunk 48 \
      > /tmp/r5_engine_c48.log 2>&1
    echo "chunk48 exit $?"
  else
    timeout 1500 python scripts/bisect_int8kv.py engine --n-new 25 --decode-chunk 24 \
      > /tmp/r5_engine_c24.log 2>&1
    echo "chunk24 exit $?"
  fi
else
  timeout 1500 python scripts/bisect_int8kv.py engine --n-new 9 --decode-chunk 8 \
    > /tmp/r5_engine_c8.log 2>&1
  echo "chunk8 exit $?"
fi

timeout 2400 python scripts/tune_flash_prefill.py > /tmp/r5_tune_flash.log 2>&1
echo "tune_flash exit $?"

timeout 2400 python scripts/quant_accuracy.py > /tmp/r5_quant_acc.log 2>&1
echo "quant_acc exit $?"
