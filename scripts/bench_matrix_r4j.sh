#!/bin/bash
# Round-4 wave-11: ViT w8a8 full bench (the >1.0 tiles/s candidate), the
# prefix-fork regression decomposed (admit/decode split), int8-KV bisect
# narrowed by decode-step count.
#
# Wave 10: driver bench 0.966 tiles/s with the new defaults; prefix_fork
# REGRESSED 135->79 tok/s at GRPO fan-out shape (decomposition below);
# engine --n-new 2 PASSED (one decode step is fine -> fault needs more
# steps or specific step indices).
set -u
cd /root/repo
OUT=/tmp/bench_matrix_r4j
mkdir -p "$OUT"

stamp() { echo "=== $1 ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/summary.txt"; }

# 1. ViT int8 (w8a8 vision tower) on top of the current defaults
stamp vit_int8_bench
SOCIO_BENCH_VIT_QUANT=int8 timeout 3000 python bench.py \
  > "$OUT/vit_int8_bench.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -1 "$OUT/vit_int8_bench.log" | tee -a "$OUT/summary.txt"

# 2. fork regression decomposition (now prints admit/decode split)
stamp grpo_fork_split
timeout 2400 python scripts/bench_grpo_knobs.py fork \
  > "$OUT/grpo_fork_split.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
grep -E "prefix_fork|split|RESULT" "$OUT/grpo_fork_split.log" | tee -a "$OUT/summary.txt"

# 3. bisect: one full decode chunk (64 steps after the prefill token)
stamp bisect_engine_n65
timeout 2400 python scripts/bisect_int8kv.py engine --n-new 65 \
  > "$OUT/bisect_engine_n65.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -2 "$OUT/bisect_engine_n65.log" | tee -a "$OUT/summary.txt"

# 4. bisect: full budget but chunk=1 (129 separate chunk dispatches —
#    localizes the faulting step index if the crash is step-dependent)
stamp bisect_engine_n129_chunk1
timeout 3000 python scripts/bisect_int8kv.py engine --n-new 129 --decode-chunk 1 \
  > "$OUT/bisect_engine_n129_chunk1.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -2 "$OUT/bisect_engine_n129_chunk1.log" | tee -a "$OUT/summary.txt"
echo "matrix done $(date -u)" | tee -a "$OUT/summary.txt"
