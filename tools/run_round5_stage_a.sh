#!/bin/bash
# Round-5 stage A: serialized TPU lane after the round-4 queue closes
# (gates on stage G's marker so bench3 measures final round-4 defaults).
#
#  1. entry() TPU compile probe (driver contract check, /verify item)
#  2. tools/ab_surf_neig_parts.py — pins where the surf_neig 3.39 ms lives
#  3. sampler-block retry (512/1024 died on transient HTTP 500 compile
#     errors in stage F; one quiet-window retry decides transient-vs-real)
#  4. noisy-depth ablations: baseline / no_sdf / no_angle at sigma=2mm,
#     plus baseline / no_sdf at sigma=5mm (VERDICT r4 item 3 — does the
#     sdf-on-depth term earn its keep under realistic stereo noise?)
set -u
cd /root/repo
mkdir -p logs/r5_results
LOG=logs/r5_queue.log
echo "=== round-5 stage A armed $(date) ===" >> "$LOG"

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
    echo "--- r5a wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}
abort() { echo "=== r5a ABORT: $1 $(date) ===" >> "$LOG"; exit 1; }

# Gate on round-4 stage G (up to 20 h).
for i in $(seq 1 240); do
  [ -f logs/r4_results/stage_g_done.marker ] && break
  sleep 300
done
[ -f logs/r4_results/stage_g_done.marker ] || abort "stage G never finished"

if [ ! -f logs/r5_results/entry_probe.done ]; then
  wait_tunnel || abort "wedged before entry probe"
  echo "=== unit entry_probe $(date) ===" >> "$LOG"
  timeout 1800 python -c "
import numpy as np
import jax
import __graft_entry__
fn, a = __graft_entry__.entry()
out = np.asarray(jax.jit(fn)(*a))
assert np.isfinite(out).all()
print('entry OK', out.shape, 'device', jax.devices()[0].platform)
" > logs/r5_entry_probe.log 2>&1 \
    && touch logs/r5_results/entry_probe.done
fi

if [ ! -f logs/r5_results/ab_surf_neig_parts.done ]; then
  wait_tunnel || abort "wedged before ab_surf_neig_parts"
  echo "=== unit ab_surf_neig_parts $(date) ===" >> "$LOG"
  timeout 7200 python tools/ab_surf_neig_parts.py \
    > logs/r5_ab_surf_neig_parts.log 2>&1 \
    && touch logs/r5_results/ab_surf_neig_parts.done
fi

if [ ! -f logs/r5_results/sampler_block_retry.done ]; then
  wait_tunnel || abort "wedged before sampler retry"
  echo "=== unit sampler_block_retry $(date) ===" >> "$LOG"
  ESN_AB_BLOCKS=256,512,1024 timeout 7200 \
    python tools/ab_sampler_block.py \
    > logs/r5_sampler_block_retry.log 2>&1 \
    && touch logs/r5_results/sampler_block_retry.done
fi

run_noisy() {
  local name="$1" sigma="$2"; shift 2
  [ -f "logs/r5_results/noisy_${name}.json" ] && return 0
  for att in 1 2 3; do
    wait_tunnel || abort "wedged before noisy_${name}"
    echo "=== unit noisy_${name} attempt $att $(date) ===" >> "$LOG"
    timeout 10800 python tools/validate_synthetic.py --steps 8000 \
      --orbit 30 --steps-per-call 20 --depth-noise-mm "$sigma" \
      --exp-dir "logs/r5_noisy_${name}" "$@" \
      > "logs/r5_noisy_${name}.log" 2>&1
    if grep -q '"status": "done"' "logs/r5_noisy_${name}.log"; then
      grep '"status": "done"' "logs/r5_noisy_${name}.log" | tail -1 \
        > "logs/r5_results/noisy_${name}.json"
      return 0
    fi
    echo "--- noisy_${name} attempt $att incomplete; retrying ---" >> "$LOG"
  done
  echo "--- noisy_${name} FAILED after retries ---" >> "$LOG"
}

run_noisy baseline_s2 2.0
run_noisy no_sdf_s2 2.0 --ablation no_sdf
run_noisy no_angle_s2 2.0 --ablation no_angle
run_noisy baseline_s5 5.0
run_noisy no_sdf_s5 5.0 --ablation no_sdf

echo "=== round-5 stage A finished $(date) ===" >> "$LOG"
touch logs/r5_results/stage_a_done.marker
