#!/bin/bash
# Round-4 stage F: sampler-kernel BLOCK_R sweep on the train step
# (tools/ab_sampler_block.py) after stage E frees the TPU lane.
# The shipping 256 for fused_upsample_z/fused_ray_march predates the
# round-3 setter-staleness fix; the megakernel's post-fix sweep won 1.14x
# at larger blocks, so this is the remaining unswept block surface
# (march 4.0 ms + upsample 2.9 ms of the ~23 ms step).
set -u
cd /root/repo
mkdir -p logs/r4_results
LOG=logs/r4_queue.log
echo "=== round-4 stage F armed $(date) ===" >> "$LOG"

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
    echo "--- r4f wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}
abort() { echo "=== r4f ABORT: $1 $(date) ===" >> "$LOG"; exit 1; }

# Gate on stage E (up to 16 h).
for i in $(seq 1 192); do
  [ -f logs/r4_results/stage_e_done.marker ] && break
  sleep 300
done
[ -f logs/r4_results/stage_e_done.marker ] || abort "stage E never finished"

if [ ! -f logs/r4_results/ab_sampler_block.done ]; then
  wait_tunnel || abort "wedged before ab_sampler_block"
  echo "=== unit ab_sampler_block $(date) ===" >> "$LOG"
  timeout 7200 python tools/ab_sampler_block.py \
    > logs/r4_ab_sampler_block.log 2>&1 \
    && touch logs/r4_results/ab_sampler_block.done
fi

# Unit 2: steps_per_call K=1 vs K=5 per-step-rate A/B (host-dispatch
# overhead on the 1-core box; K=5 is bit-identical by construction).
if [ ! -f logs/r4_results/ab_steps_per_call.done ]; then
  wait_tunnel || abort "wedged before ab_steps_per_call"
  echo "=== unit ab_steps_per_call $(date) ===" >> "$LOG"
  timeout 7200 python tools/ab_steps_per_call.py \
    > logs/r4_ab_steps_per_call.log 2>&1 \
    && touch logs/r4_results/ab_steps_per_call.done
fi

echo "=== round-4 stage F finished $(date) ===" >> "$LOG"
touch logs/r4_results/stage_f_done.marker
