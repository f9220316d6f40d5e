#!/bin/bash
# Round-4 stage C: re-run the fold_aux A/B (its first queue pass crashed on
# a donated-buffer reuse in the tool, since fixed), then two consecutive
# full pytest suites (VERDICT item 6 done-criterion: 2 clean full-suite
# runs on this box) while the TPU lane is idle.
set -u
cd /root/repo
mkdir -p logs/r4_results
LOG=logs/r4_queue.log
echo "=== round-4 stage C armed $(date) ===" >> "$LOG"

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
    echo "--- r4c wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}
abort() { echo "=== r4c ABORT: $1 $(date) ===" >> "$LOG"; exit 1; }

# Gate on stage B (up to 10 h).
for i in $(seq 1 120); do
  [ -f logs/r4_results/stage_b_done.marker ] && break
  sleep 300
done
[ -f logs/r4_results/stage_b_done.marker ] || abort "stage B never finished"

if [ ! -f logs/r4_results/ab_fold_aux.done ]; then
  wait_tunnel || abort "wedged before ab_fold_aux rerun"
  echo "=== unit ab_fold_aux (rerun) $(date) ===" >> "$LOG"
  timeout 7200 python tools/ab_fold_aux.py \
    > logs/r4_ab_fold_aux.log 2>&1 \
    && touch logs/r4_results/ab_fold_aux.done
fi

# Two consecutive full pytest runs (CPU; the TPU lane is free after the
# unit above — tests pin jax to the CPU platform in conftest).
for n in 1 2; do
  if [ ! -f "logs/r4_results/pytest_full_${n}.done" ]; then
    echo "=== unit pytest_full_${n} $(date) ===" >> "$LOG"
    timeout 7200 python -m pytest tests/ -q \
      > "logs/r4_pytest_full_${n}.log" 2>&1 \
      && touch "logs/r4_results/pytest_full_${n}.done"
    tail -2 "logs/r4_pytest_full_${n}.log" >> "$LOG"
  fi
done

echo "=== round-4 stage C finished $(date) ===" >> "$LOG"
touch logs/r4_results/stage_c_done.marker
