#!/bin/bash
# Stage E: after the recover3 follower finishes, run the train-step
# sampler-kernel A/B that stage A2 lost (its process was killed while the
# old unrolled march kernel was mid-compile; the fori_loop kernels since
# measured 2.4x / 1.15x isolated — logs/r3_bench_sampler_v2.log).
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
    echo "--- stage-e wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}

# Wait for the main follower to finish (up to 8 h).
for i in $(seq 1 96); do
  [ -f logs/r3_results/recover_done.marker ] && break
  sleep 300
done

if [ ! -f logs/r3_results/bench_sampler_step.done ]; then
  wait_tunnel
  echo "=== stage-e bench_sampler step A/B $(date) ===" >> "$LOG"
  timeout 7200 python tools/bench_sampler.py --megakernel auto \
    > logs/r3_bench_sampler_step.log 2>&1 \
    && touch logs/r3_results/bench_sampler_step.done
  grep -h '"section"' logs/r3_bench_sampler_step.log >> "$LOG" || true
fi
echo "=== stage-e finished $(date) ===" >> "$LOG"
touch logs/r3_results/stage_e_done.marker
