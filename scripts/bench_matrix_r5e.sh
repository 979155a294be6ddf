#!/bin/bash
# Round-5 wave 16: VPU-opt flash kernel + deep queue under int8 KV.
#   (1) flash sweep with the VPU-opt kernel (scale folded into q, interior
#       blocks in an unmasked loop, masked edge loop) — validates Mosaic +
#       measures the delta over wave 14;
#   (2) socioseg bench: int8 KV + deep queue tiles48/slots32 — queue deeper
#       than slots pins occupancy (wave 6: 0.94) and the 32-slot int8-KV
#       decode graph is already in the remote HLO cache from wave 15;
#   (3) tiles48/slots40: +25% weight-read amortization per decode token
#       (int8 KV frees the cache HBM for 8 more slots; fresh ~9 min decode
#       compile, untimed warmup).
# Requires the VPU-opt kernel applied to the working tree first.
cd /root/repo
set -x

timeout 2400 python scripts/tune_flash_prefill.py > /tmp/r5_tune_flash3.log 2>&1
echo "tune_flash3 exit $?"

SOCIO_BENCH_KV_QUANT=int8 SOCIO_BENCH_DECODE_INNER=32 \
  SOCIO_BENCH_TILES=48 SOCIO_BENCH_SLOTS=32 SOCIO_BENCH_RUNS=3 \
  SOCIO_BENCH_INT8=0 SOCIO_BENCH_W8A8=0 SOCIO_BENCH_TRAIN=0 \
  timeout 4800 python bench.py > /tmp/r5_bench_deepq32.log 2>&1
echo "bench_deepq32 exit $?"

SOCIO_BENCH_KV_QUANT=int8 SOCIO_BENCH_DECODE_INNER=32 \
  SOCIO_BENCH_TILES=48 SOCIO_BENCH_SLOTS=40 SOCIO_BENCH_RUNS=3 \
  SOCIO_BENCH_INT8=0 SOCIO_BENCH_W8A8=0 SOCIO_BENCH_TRAIN=0 \
  timeout 4800 python bench.py > /tmp/r5_bench_deepq40.log 2>&1
echo "bench_deepq40 exit $?"
