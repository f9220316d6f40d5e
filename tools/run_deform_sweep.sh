#!/bin/bash
# Deform-capacity sweep (VERDICT r2 item 4): does the extreme-frame geo
# error (15-17 mm at the +-10%-radius pulsation extremes vs ~5 mm at
# neutral frames, VALIDATION.md) move when the deform net gets more
# capacity? 4 variants x 8k steps on the orbit scene, vs the baseline
# 8k row (9x256 deform, 6 time octaves, shared LR). Reference net config
# being varied: endosurf.py:692-738 / base_pull.yml net.deform_network.
#
# Chunked + probe-gated like tools/run_es100k_high.sh (the tunnel wedges
# after process exits; CLAUDE.md).
set -u
cd /root/repo
LOG=logs/deform_sweep.log
mkdir -p logs

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8))
assert float(np.asarray(x @ x)[0, 0]) == 8.0
" >/dev/null 2>&1
}

run_variant() {
  name=$1; shift
  EXP=/root/repo/logs/sweep_$name
  mkdir -p "$EXP"
  for i in $(seq 1 30); do
    if grep -q "\"status\": \"done\".*sweep_marker_$name" "$LOG" 2>/dev/null \
       || grep -q "sweep_done_$name" "$LOG" 2>/dev/null; then
      return 0
    fi
    if ! probe; then
      echo "--- [$name] probe failed $(date); sleeping 600s ---" >> "$LOG"
      sleep 600
      continue
    fi
    echo "=== [$name] chunk $i $(date) ===" >> "$LOG"
    timeout 7200 python tools/validate_synthetic.py \
      --steps 8000 --orbit 30 --frames 16 --mc-res 96 \
      --exp-dir "$EXP" --chunk 8000 --precision default \
      "$@" >> "$LOG" 2>&1
    rc=$?
    if grep -q '"status": "done"' <(tail -1 "$LOG") 2>/dev/null; then
      echo "sweep_done_$name $(date)" >> "$LOG"
      return 0
    fi
    if [ $rc -ne 0 ]; then
      echo "--- [$name] chunk rc=$rc $(date); sleeping 300s ---" >> "$LOG"
      sleep 300
    fi
  done
  echo "sweep_exhausted_$name $(date)" >> "$LOG"
  return 1
}

echo "=== deform sweep driver start $(date) ===" >> "$LOG"
run_variant width512 --deform-width 512
run_variant oct12 --time-octaves 12
run_variant lr2x --deform-lr-mult 2.0
run_variant w512lr2 --deform-width 512 --deform-lr-mult 2.0
echo "=== deform sweep driver finished $(date) ===" >> "$LOG"
touch logs/deform_sweep_done.marker
