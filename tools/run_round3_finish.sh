#!/bin/bash
# Round-3 finisher: after run_round3_queue.sh completes, retry the demo_3d
# res-256 stage (its first invocation hit a mid-edit ImportError), run
# queue part 2 (shipping-config attribution + serving bench), and refresh
# bench.py numbers with the megakernel dispatch in its committed state.
set -u
cd /root/repo
LOG=logs/round3_finish.log
EXP100=/root/repo/logs/es100k/validate/endosurf-synthetic-pulsating_sphere

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8))
assert float(np.asarray(x @ x)[0, 0]) == 8.0
" >/dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 60); do
    probe && return 0
    echo "--- wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}

echo "=== finisher start $(date) ===" >> "$LOG"
while [ ! -f logs/round3_queue_done.marker ]; do sleep 300; done
echo "=== queue1 done; finisher active $(date) ===" >> "$LOG"

if [ ! -f logs/demo256_done.marker ]; then
  wait_tunnel
  echo "=== demo_3d res256 retry $(date) ===" >> "$LOG"
  timeout 7200 python -m endosurf_tpu --cfg "$EXP100/cfg_res256.yml" \
    --mode demo_3d >> "$LOG" 2>&1 && touch logs/demo256_done.marker
fi

if [ ! -f logs/round3_queue2_done.marker ]; then
  bash tools/run_round3_queue2.sh
fi

if [ ! -f logs/bench_r3_done.marker ]; then
  wait_tunnel
  echo "=== bench refresh $(date) ===" >> "$LOG"
  timeout 3600 python bench.py > logs/bench_r3.json 2>> "$LOG" \
    && touch logs/bench_r3_done.marker
  cat logs/bench_r3.json >> "$LOG"
fi
echo "=== finisher done $(date) ===" >> "$LOG"
touch logs/round3_finish_done.marker
