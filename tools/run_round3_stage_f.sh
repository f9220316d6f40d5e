#!/bin/bash
# Stage F: after stage E (train-step sampler A/B), run the EndoNeRF 100k
# full-schedule control (reference budget for the baseline vertical) and
# the EndoNeRF step profiler attribution.
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
    echo "--- stage-f wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}

# Wait for stage E (up to 10 h) — and REQUIRE it before any TPU work
# (one-TPU-lane rule: never launch alongside a still-running stage).
for i in $(seq 1 120); do
  [ -f logs/r3_results/stage_e_done.marker ] && break
  sleep 300
done
if [ ! -f logs/r3_results/stage_e_done.marker ]; then
  echo "=== stage-f ABORT: stage E never finished $(date) ===" >> "$LOG"
  exit 1
fi

# demo128 first (it failed on the HIGH-precision Mosaic gap, now fixed —
# the driver skips the already-done demo256_3d unit).
for i in $(seq 1 3); do
  [ -f logs/r3_results/demo128.json ] && break
  wait_tunnel || { echo "=== stage-f ABORT: wedged $(date) ===" >> "$LOG"; exit 1; }
  echo "=== stage-f demo128 attempt $i $(date) ===" >> "$LOG"
  timeout 14400 python tools/round3_recover_driver.py demos \
    >> logs/r3_demos.log 2>&1 && break
  sleep 120
done

for i in $(seq 1 4); do
  [ -f logs/r3_results/en100k_default.json ] && break
  wait_tunnel || { echo "=== stage-f ABORT: wedged $(date) ===" >> "$LOG"; exit 1; }
  echo "=== stage-f en100k attempt $i $(date) ===" >> "$LOG"
  timeout 21600 python tools/round3_recover_driver.py en100k \
    >> logs/r3_en100k.log 2>&1 && break
  sleep 120
done

if [ ! -f logs/r3_results/profile_endonerf.done ]; then
  wait_tunnel
  echo "=== stage-f profile_endonerf $(date) ===" >> "$LOG"
  timeout 5400 python tools/profile_endonerf.py \
    > logs/r3_profile_endonerf.log 2>&1 \
    && touch logs/r3_results/profile_endonerf.done
fi
echo "=== stage-f finished $(date) ===" >> "$LOG"
touch logs/r3_results/stage_f_done.marker
