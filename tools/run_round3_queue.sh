#!/bin/bash
# Round-3 TPU work queue (single chip; stages gated by tunnel probes):
#   1. reference-resolution demos vs the 100k checkpoint (VERDICT item 6)
#   2. resume the 100k "high"-precision control (item 3; 20k -> 100k)
#   3. deform-capacity sweep (item 4)
#   4. EndoNeRF 8k orbit at shipping precision (item 5)
# Each stage's own driver already rides tunnel wedges; this script only
# sequences them and skips completed stages on re-invocation.
set -u
cd /root/repo
LOG=logs/round3_queue.log
EXP100=/root/repo/logs/es100k/validate/endosurf-synthetic-pulsating_sphere

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8))
assert float(np.asarray(x @ x)[0, 0]) == 8.0
" >/dev/null 2>&1
}

wait_tunnel() {
  for i in $(seq 1 40); do
    probe && return 0
    echo "--- tunnel wedged $(date); sleeping 300s ---" >> "$LOG"
    sleep 300
  done
  return 1
}

echo "=== round3 queue start $(date) ===" >> "$LOG"

# --- stage 1: demos at reference resolutions ------------------------------
if [ ! -f logs/demo128_done.marker ]; then
  wait_tunnel
  echo "=== demo res128 $(date) ===" >> "$LOG"
  timeout 5400 python -m endosurf_tpu --cfg "$EXP100/cfg_res128.yml" \
    --mode demo >> "$LOG" 2>&1 && touch logs/demo128_done.marker
fi
if [ ! -f logs/demo256_done.marker ]; then
  wait_tunnel
  echo "=== demo_3d res256 $(date) ===" >> "$LOG"
  timeout 7200 python -m endosurf_tpu --cfg "$EXP100/cfg_res256.yml" \
    --mode demo_3d >> "$LOG" 2>&1 && touch logs/demo256_done.marker
fi

# --- stage 2: 100k high-precision control (resumes at 20k) ----------------
if [ ! -f logs/es100k_high_done.marker ]; then
  echo "=== es100k_high resume $(date) ===" >> "$LOG"
  bash tools/run_es100k_high.sh
fi

# --- stage 3: deform-capacity sweep ---------------------------------------
if [ ! -f logs/deform_sweep_done.marker ]; then
  echo "=== deform sweep $(date) ===" >> "$LOG"
  bash tools/run_deform_sweep.sh
fi

# --- stage 4: EndoNeRF 8k at shipping precision ---------------------------
if [ ! -f logs/en8k_default_done.marker ]; then
  EXP=/root/repo/logs/en_orbit8k_default
  mkdir -p "$EXP"
  for i in $(seq 1 12); do
    wait_tunnel
    echo "=== en8k_default chunk $i $(date) ===" >> "$LOG"
    timeout 7200 python tools/validate_synthetic.py \
      --model endonerf --steps 8000 --orbit 30 --frames 16 --mc-res 96 \
      --exp-dir "$EXP" --chunk 8000 --precision default \
      >> "$LOG" 2>&1
    if tail -3 "$LOG" | grep -q '"status": "done"'; then
      touch logs/en8k_default_done.marker
      break
    fi
    sleep 300
  done
fi

echo "=== round3 queue finished $(date) ===" >> "$LOG"
touch logs/round3_queue_done.marker
