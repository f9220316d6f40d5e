#!/bin/bash
# Round-4 stage G: final scoreboard refresh after (a) stage F's sweeps and
# (b) the session flipping any shipping defaults those sweeps justify
# (signalled by logs/r4_results/defaults_flipped.marker, created manually
# after analysis so bench3 always measures the FINAL defaults).
set -u
cd /root/repo
mkdir -p logs/r4_results
LOG=logs/r4_queue.log
echo "=== round-4 stage G armed $(date) ===" >> "$LOG"

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
    echo "--- r4g wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}
abort() { echo "=== r4g ABORT: $1 $(date) ===" >> "$LOG"; exit 1; }

# Gate on stage F + the defaults-flipped signal (up to 18 h).
for i in $(seq 1 216); do
  [ -f logs/r4_results/stage_f_done.marker ] \
    && [ -f logs/r4_results/defaults_flipped.marker ] && break
  sleep 300
done
[ -f logs/r4_results/stage_f_done.marker ] || abort "stage F never finished"
[ -f logs/r4_results/defaults_flipped.marker ] || abort "no defaults signal"

if [ ! -f logs/r4_results/bench3.done ]; then
  wait_tunnel || abort "wedged before bench3"
  echo "=== unit bench3 $(date) ===" >> "$LOG"
  timeout 7200 python bench.py > logs/r4_bench3.json 2> logs/r4_bench3.err \
    && touch logs/r4_results/bench3.done
fi

echo "=== round-4 stage G finished $(date) ===" >> "$LOG"
touch logs/r4_results/stage_g_done.marker
