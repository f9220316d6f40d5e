#!/bin/bash
# Round-5 stage C: close the round (serialized TPU lane; gates on stage B).
#
#  1. tools/ab_surf_neig_parts.py — the stage-A run crashed on the
#     march-reuse signature churn (fixed in 9bc60eb); re-run for the
#     march-vs-second-order attribution that justifies (or bounds) the
#     march-reuse lever.
#  2. WAIT for logs/r5_results/r5_defaults_flipped.marker — the session
#     analyzes stage B (march-reuse step A/Bs + quality gate) and flips
#     train.surf_march_reuse's shipping default if and only if the win is
#     real at loss/quality parity, then touches the marker.
#  3. Final bench refresh -> logs/r5_bench.json (bench.py now retries the
#     serving subprocess, so the eval_rays_per_sec=null of r4_bench3
#     should recover).
set -u
cd /root/repo
mkdir -p logs/r5_results
LOG=logs/r5_queue.log
echo "=== round-5 stage C armed $(date) ===" >> "$LOG"

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
    echo "--- r5c wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}
abort() { echo "=== r5c ABORT: $1 $(date) ===" >> "$LOG"; exit 1; }

# Gate on stage B (up to 20 h).
for i in $(seq 1 240); do
  [ -f logs/r5_results/stage_b_done.marker ] && break
  sleep 300
done
[ -f logs/r5_results/stage_b_done.marker ] || abort "stage B never finished"

if [ ! -f logs/r5_results/ab_surf_neig_parts.done ]; then
  wait_tunnel || abort "wedged before ab_surf_neig_parts rerun"
  echo "=== unit ab_surf_neig_parts (rerun) $(date) ===" >> "$LOG"
  timeout 7200 python tools/ab_surf_neig_parts.py \
    > logs/r5_ab_surf_neig_parts2.log 2>&1 \
    && touch logs/r5_results/ab_surf_neig_parts.done
fi

# Decision gate: the session must analyze stage B/C results and flip (or
# keep) shipping defaults before the final bench measures them.
for i in $(seq 1 240); do
  [ -f logs/r5_results/r5_defaults_flipped.marker ] && break
  sleep 300
done
[ -f logs/r5_results/r5_defaults_flipped.marker ] \
  || abort "defaults decision never landed"

if [ ! -f logs/r5_results/bench_final.done ]; then
  for att in 1 2 3; do
    wait_tunnel || abort "wedged before final bench"
    echo "=== unit bench_final attempt $att $(date) ===" >> "$LOG"
    if timeout 10800 python bench.py > logs/r5_bench_stdout.log 2> \
        logs/r5_bench.err; then
      tail -1 logs/r5_bench_stdout.log > logs/r5_bench.json
      touch logs/r5_results/bench_final.done
      break
    fi
    echo "--- bench_final attempt $att failed ---" >> "$LOG"
  done
fi

echo "=== round-5 stage C finished $(date) ===" >> "$LOG"
touch logs/r5_results/stage_c_done.marker
