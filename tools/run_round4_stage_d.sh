#!/bin/bash
# Round-4 stage D: measurement pass after stage C frees the TPU lane.
#  1. EndoSurf serving render-kernel BLOCK_R sweep (1024, 2048; the 256
#     datapoint is bench1's 184k) — the shipping 256 was chosen under the
#     round-3 setter-staleness bug (ADVICE r3 high); the DNeRF render
#     kernel's win at 2048 says large blocks may transfer. One subprocess
#     per setting via the env var (no setter staleness).
#  2. chunks_per_call=4 (serving dispatch amortization, the steps_per_call
#     analog) at block 1024.
#  3. Fresh step attribution at shipping defaults (fold_aux+presample in).
#  4. Scoreboard refresh -> logs/r4_bench2.json.
# Units are kept few: every process exit risks a 10-45 min tunnel wedge
# (CLAUDE.md round-2 data).
set -u
cd /root/repo
mkdir -p logs/r4_results
LOG=logs/r4_queue.log
echo "=== round-4 stage D armed $(date) ===" >> "$LOG"

probe() {
  timeout 240 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8))
assert float(np.asarray(x @ x)[0, 0]) == 8.0
" >/dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 40); do
    probe && return 0
    echo "--- r4d wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}
abort() { echo "=== r4d ABORT: $1 $(date) ===" >> "$LOG"; exit 1; }

# Gate on stage C (up to 12 h).
for i in $(seq 1 144); do
  [ -f logs/r4_results/stage_c_done.marker ] && break
  sleep 300
done
[ -f logs/r4_results/stage_c_done.marker ] || abort "stage C never finished"

# Unit 1: ES serving block sweep (block 256 baseline = bench1's 184k).
for B in 1024 2048; do
  if [ ! -f "logs/r4_results/es_render_blk_${B}.done" ]; then
    wait_tunnel || abort "wedged before es render blk ${B}"
    echo "=== unit es_render_blk_${B} $(date) ===" >> "$LOG"
    ESN_RENDER_BLOCK_R=$B timeout 5400 python tools/bench_eval.py \
      --model endosurf --render-kernel auto --chunks 2048 \
      --chunks-per-call 1 --frames 2 \
      > "logs/r4_es_render_blk_${B}.log" 2>&1 \
      && touch "logs/r4_results/es_render_blk_${B}.done"
  fi
done

# Unit 2: serving dispatch amortization (chunks_per_call=4, block 1024).
if [ ! -f logs/r4_results/es_render_cpc4.done ]; then
  wait_tunnel || abort "wedged before es cpc4"
  echo "=== unit es_render_cpc4 $(date) ===" >> "$LOG"
  ESN_RENDER_BLOCK_R=1024 timeout 5400 python tools/bench_eval.py \
    --model endosurf --render-kernel auto --chunks 2048 \
    --chunks-per-call 4 --frames 2 \
    > logs/r4_es_render_cpc4.log 2>&1 \
    && touch logs/r4_results/es_render_cpc4.done
fi

# Unit 3: fresh step attribution at shipping defaults.
if [ ! -f logs/r4_results/profile_step.done ]; then
  wait_tunnel || abort "wedged before profile_step"
  echo "=== unit profile_step $(date) ===" >> "$LOG"
  timeout 5400 python tools/profile_step.py --precision default \
    --activation-dtype bfloat16 --jac-mode linearize --megakernel auto \
    > logs/r4_profile_step.log 2>&1 \
    && touch logs/r4_results/profile_step.done
fi

# Unit 4: scoreboard refresh.
if [ ! -f logs/r4_results/bench2.done ]; then
  wait_tunnel || abort "wedged before bench2"
  echo "=== unit bench2 $(date) ===" >> "$LOG"
  timeout 7200 python bench.py > logs/r4_bench2.json 2> logs/r4_bench2.err \
    && touch logs/r4_results/bench2.done
fi

echo "=== round-4 stage D finished $(date) ===" >> "$LOG"
touch logs/r4_results/stage_d_done.marker
