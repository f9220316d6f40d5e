#!/bin/bash
# Follower master: stage A (100k-high) is already running as an orphan
# process. Wait for it to finish (done JSON or process exit), then run the
# remaining stages exactly like run_round3_recover.sh.
set -u
cd /root/repo
LOG=logs/r3_recover.log

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

echo "=== follower v3 start $(date) ===" >> "$LOG"

# --- stage A: wait for the in-flight run; resume it if it died early -----
if [ ! -f logs/r3_results/es100k_high.json ]; then
  for i in $(seq 1 16); do
    if grep -q '"status": "done"' logs/es100k_high_out.log 2>/dev/null; then
      grep '"status": "done"' logs/es100k_high_out.log | tail -1 \
        > logs/r3_results/es100k_high.json
      break
    fi
    if ! pgrep -f "exp-dir /root/repo/logs/es100k_high" > /dev/null; then
      # orphan died without the done line — resume it
      wait_tunnel
      echo "=== es100k_high resume attempt $i $(date) ===" >> "$LOG"
      timeout 21600 python tools/validate_synthetic.py \
        --steps 100000 --orbit 30 --frames 16 --mc-res 96 \
        --exp-dir /root/repo/logs/es100k_high --i-eval 20000 \
        --precision high --sampling-precision default \
        --megakernel off --steps-per-call 20 \
        > logs/es100k_high_out.log 2>&1
    else
      sleep 600
    fi
  done
fi

# --- stage A2: sampler-megakernel TPU bring-up + A/B ---------------------
if [ ! -f logs/r3_results/bench_sampler.done ]; then
  wait_tunnel
  echo "=== bench_sampler $(date) ===" >> "$LOG"
  timeout 7200 python tools/bench_sampler.py --megakernel auto \
    > logs/r3_bench_sampler.log 2>&1 \
    && touch logs/r3_results/bench_sampler.done
  tail -20 logs/r3_bench_sampler.log >> "$LOG"
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

echo "=== follower finished $(date) ===" >> "$LOG"
touch logs/r3_results/recover_done.marker
