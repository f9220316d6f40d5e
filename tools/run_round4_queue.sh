#!/bin/bash
# Round-4 TPU queue (ONE serialized lane — CLAUDE.md): validate the new
# round-4 kernels on real TPU, A/B the fold_aux step change, refresh the
# scoreboard, then run the reference ablation suite (VERDICT r3 item 1).
# Results land incrementally in logs/r4_results/*.json + unit logs so a
# session crash or tunnel wedge loses at most the unit in flight.
set -u
cd /root/repo
mkdir -p logs/r4_results
LOG=logs/r4_queue.log
echo "=== round-4 queue start $(date) ===" >> "$LOG"

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
    echo "--- r4 wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}
abort() { echo "=== r4 ABORT: $1 $(date) ===" >> "$LOG"; exit 1; }

# Unit 1: DNeRF whole-pipeline render kernel bring-up probe (numbers vs the
# composed path + block sweep). NEW Mosaic program — must pass before any
# queue stage exercises it (round-3 rule).
if [ ! -f logs/r4_results/dnerf_probe.done ]; then
  wait_tunnel || abort "wedged before dnerf probe"
  echo "=== unit dnerf_probe $(date) ===" >> "$LOG"
  timeout 5400 python tools/probe_dnerf_render_kernel.py 1024,2048 \
    > logs/r4_dnerf_probe.log 2>&1
  grep -q "PROBE OK" logs/r4_dnerf_probe.log \
    && touch logs/r4_results/dnerf_probe.done \
    || abort "dnerf render probe failed (logs/r4_dnerf_probe.log)"
fi

# Unit 2: fold_aux step-level A/B (interleaved windows, loss parity).
if [ ! -f logs/r4_results/ab_fold_aux.done ]; then
  wait_tunnel || abort "wedged before ab_fold_aux"
  echo "=== unit ab_fold_aux $(date) ===" >> "$LOG"
  timeout 7200 python tools/ab_fold_aux.py \
    > logs/r4_ab_fold_aux.log 2>&1 \
    && touch logs/r4_results/ab_fold_aux.done
fi

# Unit 3: EndoNeRF serving A/B at frame scale (composed vs fused kernel).
if [ ! -f logs/r4_results/endonerf_serving.done ]; then
  wait_tunnel || abort "wedged before endonerf serving"
  echo "=== unit endonerf_serving $(date) ===" >> "$LOG"
  timeout 5400 python tools/bench_eval.py --model endonerf \
    --render-kernel off auto --chunks 2048 --chunks-per-call 1 --frames 2 \
    > logs/r4_endonerf_serving.log 2>&1 \
    && touch logs/r4_results/endonerf_serving.done
fi

# Unit 4: scoreboard refresh (train ES/EN + ES serving).
if [ ! -f logs/r4_results/bench1.done ]; then
  wait_tunnel || abort "wedged before bench"
  echo "=== unit bench1 $(date) ===" >> "$LOG"
  timeout 7200 python bench.py > logs/r4_bench1.json 2> logs/r4_bench1.err \
    && touch logs/r4_results/bench1.done
fi

# Units 5-9: ablation suite on the 8k orbit protocol (VERDICT item 1) —
# baseline (also quality-gates the new fold_aux default) + the 4 reference
# ablation configs. Single process each (~1600 dispatches at K=5... use
# K=20 -> 400 train dispatches + eval/demo).
run_abl() {  # $1 = name, $2 = extra args
  local name=$1; shift
  [ -f "logs/r4_results/abl_${name}.json" ] && return 0
  wait_tunnel || abort "wedged before abl_${name}"
  echo "=== unit abl_${name} $(date) ===" >> "$LOG"
  for att in 1 2; do
    timeout 10800 python tools/validate_synthetic.py --steps 8000 \
      --orbit 30 --steps-per-call 20 --exp-dir "logs/r4_abl_${name}" "$@" \
      > "logs/r4_abl_${name}.log" 2>&1
    # final line is the result JSON when status=done
    if grep -q '"status": "done"' "logs/r4_abl_${name}.log"; then
      grep '"status": "done"' "logs/r4_abl_${name}.log" | tail -1 \
        > "logs/r4_results/abl_${name}.json"
      return 0
    fi
    echo "--- abl_${name} attempt $att incomplete; retrying ---" >> "$LOG"
    wait_tunnel || abort "wedged mid abl_${name}"
  done
  echo "--- abl_${name} FAILED after retries ---" >> "$LOG"
}

run_abl baseline
run_abl no_sdf --ablation no_sdf
run_abl no_angle --ablation no_angle
run_abl no_eikonal --ablation no_eikonal
run_abl no_surf_neig --ablation no_surf_neig

echo "=== round-4 queue finished $(date) ===" >> "$LOG"
touch logs/r4_results/queue_a_done.marker
