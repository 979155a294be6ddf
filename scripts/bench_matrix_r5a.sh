#!/bin/bash
# Round-5 wave 13: int8-KV fault — first retest chunk=64 WITH the decode-kernel
# OOB clamp (commit 2880e80); if it still crashes, bisect the chunk size
# (2 PASS / 64 CRASH pre-clamp). Then prefill flash-attn block sweep + quant
# accuracy bounds. One TPU process at a time.
cd /root/repo
set -x

timeout 1800 python scripts/bisect_int8kv.py engine --n-new 65 --decode-chunk 64 \
  > /tmp/r5_engine_c64.log 2>&1
C64=$?
echo "chunk64(clamped) exit $C64"

if [ "$C64" -ne 0 ]; then
  timeout 1800 python scripts/bisect_int8kv.py engine --n-new 17 --decode-chunk 16 \
    > /tmp/r5_engine_c16.log 2>&1
  C16=$?
  echo "chunk16 exit $C16"
  if [ "$C16" -eq 0 ]; then
    timeout 1800 python scripts/bisect_int8kv.py engine --n-new 33 --decode-chunk 32 \
      > /tmp/r5_engine_c32.log 2>&1
    echo "chunk32 exit $?"
  else
    timeout 1800 python scripts/bisect_int8kv.py engine --n-new 9 --decode-chunk 8 \
      > /tmp/r5_engine_c8.log 2>&1
    echo "chunk8 exit $?"
  fi
fi

timeout 2400 python scripts/tune_flash_prefill.py > /tmp/r5_tune_flash.log 2>&1
echo "tune_flash exit $?"

timeout 2400 python scripts/quant_accuracy.py > /tmp/r5_quant_acc.log 2>&1
echo "quant_acc exit $?"
