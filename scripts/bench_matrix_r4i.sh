#!/bin/bash
# Round-4 wave-10: driver-parity full bench with the new defaults, GRPO
# knob quantification (VERDICT item 9), int8-KV bisect continued.
#
# Wave 9: w8a8 prefill 264->198 ms at the 2048 bucket; tiles32 e2e
# 0.879 -> 0.921 tiles/s. Prefill-only engine (incl. quantized scatter)
# PASSED -> the int8-KV fault is in the real decode graph specifically.
set -u
cd /root/repo
OUT=/tmp/bench_matrix_r4i
mkdir -p "$OUT"

stamp() { echo "=== $1 ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/summary.txt"; }

# 1. the exact driver invocation (new defaults: tiles32, int8w single-copy,
#    w8a8 prefill, maxlen 3328)
stamp driver_bench
timeout 3000 python bench.py > "$OUT/driver_bench.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -1 "$OUT/driver_bench.log" | tee -a "$OUT/summary.txt"

# 2. GRPO prefix-fork rollout tps at 3B (VERDICT item 9)
stamp grpo_fork
timeout 2400 python scripts/bench_grpo_knobs.py fork \
  > "$OUT/grpo_fork.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
grep -E "prefix_fork|RESULT" "$OUT/grpo_fork.log" | tee -a "$OUT/summary.txt"

# 3. GRPO overlap_restage on/off (tiny pipeline, 2 steps each)
stamp grpo_overlap
timeout 2400 python scripts/bench_grpo_knobs.py overlap \
  > "$OUT/grpo_overlap.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
grep -E "overlap_restage" "$OUT/grpo_overlap.log" | tee -a "$OUT/summary.txt"

# 4. bisect: scatter-executable then chunk-executable on the same donated
#    buffers (crash risk — last)
stamp bisect_scatterthenchunk
timeout 1800 python scripts/bisect_int8kv.py scatterthenchunk \
  > "$OUT/bisect_scatterthenchunk.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -2 "$OUT/bisect_scatterthenchunk.log" | tee -a "$OUT/summary.txt"

# 5. bisect: engine with a single decode step (budget 2: prefill token +
#    one chunk that early-exits after 1 step)
stamp bisect_engine_n2
timeout 2400 python scripts/bisect_int8kv.py engine --n-new 2 \
  > "$OUT/bisect_engine_n2.log" 2>&1
echo "rc=$?" | tee -a "$OUT/summary.txt"
tail -2 "$OUT/bisect_engine_n2.log" | tee -a "$OUT/summary.txt"
echo "matrix done $(date -u)" | tee -a "$OUT/summary.txt"
