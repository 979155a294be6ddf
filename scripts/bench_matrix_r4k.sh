#!/bin/bash
# Round-4 wave-12: clean re-runs on a quiet host (wave-11 ran concurrently
# with a host pytest sweep — contaminated), plus the fork fix validation.
#
# Changes under test: single-width gather/scatter fork (one compile; the
# per-bucket unrolled copies compiled mid-run and caused the wave-10
# 135->79 tok/s fork regression) and the packed steps row (one D2H per
# decode chunk instead of two).
set -u
cd /root/repo
OUT=/tmp/bench_matrix_r4k
mkdir -p "$OUT"

stamp() { echo "=== $1 ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/summary.txt"; }

# 1. driver-parity bench with the packed-steps change (defaults unchanged)
stamp driver_bench
timeout 3000 python bench.py > "$OUT/driver_bench.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
grep -E "^\[bench\]|socioseg_tiles" "$OUT/driver_bench.log" | tail -5 | tee -a "$OUT/summary.txt"

# 2. fork fix validation (admit/decode split printed)
stamp grpo_fork_fixed
timeout 2400 python scripts/bench_grpo_knobs.py fork \
  > "$OUT/grpo_fork_fixed.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
grep -E "prefix_fork|split|RESULT" "$OUT/grpo_fork_fixed.log" | tee -a "$OUT/summary.txt"

# 3. ViT int8 isolated probe (wave-11's full-bench A/B was contaminated)
stamp vision_quant_probe
timeout 1800 python scripts/profile_vision_quant.py \
  > "$OUT/vision_quant_probe.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
grep -E "bf16|int8|closeness" "$OUT/vision_quant_probe.log" | tee -a "$OUT/summary.txt"

# 4. ViT int8 full bench with trace (phase decomposition either way)
stamp vit_int8_bench_trace
SOCIO_TRACE=1 SOCIO_BENCH_VIT_QUANT=int8 timeout 3000 python bench.py \
  > "$OUT/vit_int8_bench.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
grep -E "^\[bench\] socioseg" "$OUT/vit_int8_bench.log" | tee -a "$OUT/summary.txt"

# 5. bisect: one full decode chunk (64 steps)
stamp bisect_engine_n65
timeout 2400 python scripts/bisect_int8kv.py engine --n-new 65 \
  > "$OUT/bisect_engine_n65.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -2 "$OUT/bisect_engine_n65.log" | tee -a "$OUT/summary.txt"

# 6. bisect: full budget, chunk=1 (localizes the faulting step index)
stamp bisect_engine_n129_chunk1
timeout 3000 python scripts/bisect_int8kv.py engine --n-new 129 --decode-chunk 1 \
  > "$OUT/bisect_engine_n129_chunk1.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -2 "$OUT/bisect_engine_n129_chunk1.log" | tee -a "$OUT/summary.txt"
echo "matrix done $(date -u)" | tee -a "$OUT/summary.txt"
