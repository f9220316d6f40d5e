#!/bin/bash
# Round-5 stage B: march-reuse decision data (serialized TPU lane; gates on
# stage A so the noisy-depth ablations land first).
#
#  1. tools/probe_upsample_sdf.py — REAL-TPU Mosaic numbers probe of the
#     new fused_upsample_z(return_sdf=True) variant (CLAUDE.md rule:
#     interpret parity does not validate Mosaic lowering). ABORTS the
#     stage if numbers are off — no point timing a broken kernel.
#  2. tools/ab_march_reuse.py at secant=0 and secant=2 — one-process
#     interleaved step A/B, march vs reuse.
#  3. 8k-orbit quality gate with --march-reuse (same protocol as the r4
#     ablation suite; compare against results/r4/abl_baseline.json).
set -u
cd /root/repo
mkdir -p logs/r5_results
LOG=logs/r5_queue.log
echo "=== round-5 stage B armed $(date) ===" >> "$LOG"

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
    echo "--- r5b wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}
abort() { echo "=== r5b ABORT: $1 $(date) ===" >> "$LOG"; exit 1; }

# Gate on stage A (up to 20 h).
for i in $(seq 1 240); do
  [ -f logs/r5_results/stage_a_done.marker ] && break
  sleep 300
done
[ -f logs/r5_results/stage_a_done.marker ] || abort "stage A never finished"

if [ ! -f logs/r5_results/probe_upsample_sdf.done ]; then
  wait_tunnel || abort "wedged before upsample-sdf probe"
  echo "=== unit probe_upsample_sdf $(date) ===" >> "$LOG"
  if timeout 3600 python tools/probe_upsample_sdf.py \
      > logs/r5_probe_upsample_sdf.log 2>&1; then
    touch logs/r5_results/probe_upsample_sdf.done
  else
    abort "upsample-sdf probe FAILED (see logs/r5_probe_upsample_sdf.log)"
  fi
fi

if [ ! -f logs/r5_results/ab_march_reuse_s0.done ]; then
  wait_tunnel || abort "wedged before ab_march_reuse s0"
  echo "=== unit ab_march_reuse secant=0 $(date) ===" >> "$LOG"
  ESN_REUSE_SECANT=0 timeout 7200 python tools/ab_march_reuse.py \
    > logs/r5_ab_march_reuse_s0.log 2>&1 \
    && touch logs/r5_results/ab_march_reuse_s0.done
fi

if [ ! -f logs/r5_results/ab_march_reuse_s2.done ]; then
  wait_tunnel || abort "wedged before ab_march_reuse s2"
  echo "=== unit ab_march_reuse secant=2 $(date) ===" >> "$LOG"
  ESN_REUSE_SECANT=2 timeout 7200 python tools/ab_march_reuse.py \
    > logs/r5_ab_march_reuse_s2.log 2>&1 \
    && touch logs/r5_results/ab_march_reuse_s2.done
fi

if [ ! -f logs/r5_results/quality_march_reuse.json ]; then
  for att in 1 2 3; do
    wait_tunnel || abort "wedged before march-reuse quality gate"
    echo "=== unit quality_march_reuse attempt $att $(date) ===" >> "$LOG"
    timeout 10800 python tools/validate_synthetic.py --steps 8000 \
      --orbit 30 --steps-per-call 20 --march-reuse \
      --exp-dir logs/r5_quality_march_reuse \
      > logs/r5_quality_march_reuse.log 2>&1
    if grep -q '"status": "done"' logs/r5_quality_march_reuse.log; then
      grep '"status": "done"' logs/r5_quality_march_reuse.log | tail -1 \
        > logs/r5_results/quality_march_reuse.json
      break
    fi
    echo "--- quality_march_reuse attempt $att incomplete ---" >> "$LOG"
  done
fi

echo "=== round-5 stage B finished $(date) ===" >> "$LOG"
touch logs/r5_results/stage_b_done.marker
