#!/bin/bash
# TPU measurement queue for after the 100k full-schedule run lands.
# Waits for logs/es100k_done.marker, then runs, in order (quick first):
#   1. profile_step at the shipping precision, with and without the
#      narrow bf16 MLP interior (HBM-traffic question, VALIDATION.md);
#   2. bench.py at the shipping default (fresh number for the round);
#   3. full CLI demo (2D+3D, video/gif) against the 100k checkpoint on
#      the real TPU at full demo sizes (VERDICT round-1 item 6);
#   4. quality sweep of the narrow-interior mode (only meaningful if 1
#      shows a real win — cheap enough to always run);
#   5. EndoNeRF 8k-step orbit run (longer-horizon point for the round-2
#      table), chunked like everything else.
# Probes the tunnel before each stage and sleeps through wedges.
set -u
cd /root/repo
LOG=logs/post100k.log

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8))
assert float(np.asarray(x @ x)[0, 0]) == 8.0
" >/dev/null 2>&1
}

wait_tpu() {
  for _ in $(seq 1 30); do
    probe && return 0
    echo "--- probe failed $(date); sleep 600 ---" >> "$LOG"
    sleep 600
  done
  return 1
}

echo "=== post100k queue started $(date) ===" >> "$LOG"
while [ ! -f logs/es100k_done.marker ]; do sleep 300; done
echo "=== es100k marker seen $(date) ===" >> "$LOG"

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  wait_tpu || { echo "--- $tag: tunnel never recovered ---" >> "$LOG"; return 1; }
  echo "=== $tag start $(date) ===" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "=== $tag rc=$? $(date) ===" >> "$LOG"
}

run bench_matrix 5400 python tools/bench_matrix.py
run demo100k 5400 python -m endosurf_tpu \
  --cfg logs/es100k/validate/endosurf-synthetic-pulsating_sphere/cfg.yml \
  --mode demo
run profile_modes 5400 python tools/profile_modes.py --steps 30
run bench 3600 python bench.py
run bench_eval 2400 python tools/bench_eval.py
run quality_bf16store 5400 python tools/quality_precision.py --steps 2000 \
  --orbit 30 --modes default:default:bfloat16
for i in $(seq 1 4); do
  if grep -q '"model": "endonerf", "status": "done"' "$LOG" 2>/dev/null; then break; fi
  run en8k_try$i 5400 python tools/validate_synthetic.py \
    --steps 8000 --orbit 30 --frames 16 --mc-res 96 --model endonerf \
    --exp-dir /root/repo/logs/en_orbit8k --precision high
done
echo "=== post100k queue done $(date) ===" >> "$LOG"
touch logs/post100k_done.marker
