#!/bin/bash
# Stage G: closing quality controls — the 8k gate at the true shipping
# config (all kernels on) and the EndoNeRF 8k high-precision control.
# Strict sequencing: refuses to start unless stage F actually finished
# (no fall-through launches against a busy or wedged tunnel).
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
    echo "--- stage-g wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}

# Wait for stage F (up to 12 h) — and REQUIRE it before any TPU work.
for i in $(seq 1 144); do
  [ -f logs/r3_results/stage_f_done.marker ] && break
  sleep 300
done
if [ ! -f logs/r3_results/stage_f_done.marker ]; then
  echo "=== stage-g ABORT: stage F never finished $(date) ===" >> "$LOG"
  exit 1
fi

for i in $(seq 1 4); do
  [ -f logs/r3_results/es8k_kernels.json ] \
    && [ -f logs/r3_results/en8k_high.json ] && break
  wait_tunnel || { echo "=== stage-g ABORT: tunnel wedged $(date) ===" \
                     >> "$LOG"; exit 1; }
  echo "=== stage-g quality attempt $i $(date) ===" >> "$LOG"
  timeout 14400 python tools/round3_recover_driver.py quality \
    >> logs/r3_quality.log 2>&1 && break
  sleep 120
done
echo "=== stage-g finished $(date) ===" >> "$LOG"
touch logs/r3_results/stage_g_done.marker
