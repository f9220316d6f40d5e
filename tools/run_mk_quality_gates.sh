#!/bin/bash
# Quality gates for the D-NeRF megakernel + new EndoSurf block defaults:
# same 8k orbit protocol as the round-3 kernel gates (run_round3_queue.sh
# stage 4 / stage-D). Serialized, marker-gated, tunnel-probe before each.
cd /root/repo
LOG=logs/mk_quality_gates.log
probe() {
  timeout 300 python - <<'PY'
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((8, 8)); print(float(np.asarray(x @ x)[0, 0]))
PY
}
if [ ! -f logs/r3_results/en8k_mk.done ]; then
  probe >> "$LOG" 2>&1 || exit 1
  echo "=== en8k_mk $(date) ===" >> "$LOG"
  timeout 10800 python tools/validate_synthetic.py \
    --model endonerf --steps 8000 --orbit 30 --frames 16 --mc-res 96 \
    --exp-dir /root/repo/logs/en_orbit8k_mk --precision default \
    --megakernel auto >> "$LOG" 2>&1 \
    && touch logs/r3_results/en8k_mk.done
fi
if [ ! -f logs/r3_results/es8k_blk1024.done ]; then
  probe >> "$LOG" 2>&1 || exit 1
  echo "=== es8k_blk1024 $(date) ===" >> "$LOG"
  timeout 10800 python tools/validate_synthetic.py \
    --model endosurf --steps 8000 --orbit 30 --frames 16 --mc-res 96 \
    --exp-dir /root/repo/logs/es_orbit8k_blk1024 --precision default \
    --megakernel auto >> "$LOG" 2>&1 \
    && touch logs/r3_results/es8k_blk1024.done
fi
echo "=== gates done $(date) ===" >> "$LOG"
