#!/bin/bash
# Round-3 recovery master (fresh machine: the round-2 logs/ tree, 100k
# checkpoint, and XLA cache were wiped with the host). Regenerates the
# round-3 evidence with as FEW process exits as possible (each exit wedges
# the tunnel 10-45 min; CLAUDE.md):
#   A. 100k "high"-precision control — ONE process (K=20 => ~5k dispatches)
#   B. deform-capacity sweep + EndoNeRF 8k — ONE process (in-process driver)
#   C. res-128/256 demos vs the stage-A checkpoint — ONE process
#   D. bench_eval + profile + bench refresh
set -u
cd /root/repo
LOG=logs/r3_recover.log
mkdir -p logs/r3_results

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
    echo "--- wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}

echo "=== recover start $(date) ===" >> "$LOG"

# --- stage A: 100k high control, single process --------------------------
if [ ! -f logs/r3_results/es100k_high.json ]; then
  for i in $(seq 1 8); do
    wait_tunnel
    echo "=== es100k_high attempt $i $(date) ===" >> "$LOG"
    timeout 21600 python tools/validate_synthetic.py \
      --steps 100000 --orbit 30 --frames 16 --mc-res 96 \
      --exp-dir /root/repo/logs/es100k_high --i-eval 20000 \
      --precision high --sampling-precision default \
      --megakernel off --steps-per-call 20 > logs/es100k_high_out.log 2>&1
    if grep -q '"status": "done"' logs/es100k_high_out.log; then
      grep '"status": "done"' logs/es100k_high_out.log | tail -1 \
        > logs/r3_results/es100k_high.json
      break
    fi
    echo "--- attempt $i ended without done; resuming ---" >> "$LOG"
    tail -5 logs/es100k_high_out.log >> "$LOG"
    sleep 120
  done
fi

# --- stage B: sweep + EndoNeRF 8k, one in-process driver -----------------
for i in $(seq 1 6); do
  [ -f logs/r3_results/en8k_default.json ] \
    && [ -f logs/r3_results/sweep_w512lr2.json ] && break
  wait_tunnel
  echo "=== sweep driver attempt $i $(date) ===" >> "$LOG"
  timeout 21600 python tools/round3_recover_driver.py sweep \
    >> logs/r3_sweep.log 2>&1 && break
  sleep 120
done

# --- stage C: reference-resolution demos ---------------------------------
if [ -f logs/r3_results/es100k_high.json ]; then
  for i in $(seq 1 4); do
    [ -f logs/r3_results/demo256_3d.json ] && break
    wait_tunnel
    echo "=== demos attempt $i $(date) ===" >> "$LOG"
    timeout 14400 python tools/round3_recover_driver.py demos \
      >> logs/r3_demos.log 2>&1 && break
    sleep 120
  done
fi

# --- stage D: serving-path + attribution + bench refresh -----------------
if [ ! -f logs/r3_results/bench_eval.done ]; then
  wait_tunnel
  echo "=== bench_eval $(date) ===" >> "$LOG"
  timeout 5400 python tools/bench_eval.py --chunks 2048 4096 \
    --chunks-per-call 1 8 32 --megakernel auto > logs/r3_bench_eval.log 2>&1 \
    && touch logs/r3_results/bench_eval.done
fi
if [ ! -f logs/r3_results/profile.done ]; then
  wait_tunnel
  echo "=== profile_step $(date) ===" >> "$LOG"
  timeout 5400 python tools/profile_step.py --precision default \
    --activation-dtype bfloat16 --jac-mode linearize --megakernel on \
    > logs/r3_profile.log 2>&1 && touch logs/r3_results/profile.done
fi
if [ ! -f logs/r3_results/bench.done ]; then
  wait_tunnel
  echo "=== bench refresh $(date) ===" >> "$LOG"
  timeout 3600 python bench.py > logs/r3_bench.json 2>logs/r3_bench.err \
    && touch logs/r3_results/bench.done
fi

echo "=== recover finished $(date) ===" >> "$LOG"
touch logs/r3_results/recover_done.marker
