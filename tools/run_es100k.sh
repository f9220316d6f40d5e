#!/bin/bash
# Full-schedule 100k-step EndoSurf run on the orbiting synthetic scene,
# chunked at 2500 steps/process to respect the TPU-tunnel dispatch limit
# (CLAUDE.md). Probes the tunnel with a tiny matmul before each chunk and
# backs off while it is wedged. Idempotent: every invocation resumes from
# the orbax checkpoint in --exp-dir.
set -u
cd /root/repo
LOG=logs/es100k.log
EXP=/root/repo/logs/es100k
mkdir -p "$EXP"

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8))
assert float(np.asarray(x @ x)[0, 0]) == 8.0
" >/dev/null 2>&1
}

echo "=== es100k driver start $(date) ===" >> "$LOG"
for i in $(seq 1 120); do
  if grep -q '"status": "done"' "$LOG" 2>/dev/null; then
    touch logs/es100k_done.marker
    echo "=== es100k DONE $(date) ===" >> "$LOG"
    exit 0
  fi
  if ! probe; then
    echo "--- probe failed (tunnel wedged?) $(date); sleeping 600s ---" >> "$LOG"
    sleep 600
    continue
  fi
  echo "=== chunk invocation $i $(date) ===" >> "$LOG"
  timeout 5400 python tools/validate_synthetic.py \
    --steps 100000 --orbit 30 --frames 16 --mc-res 96 \
    --exp-dir "$EXP" --chunk 20000 --i-eval 20000 \
    --precision default --sampling-precision default >> "$LOG" 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "--- chunk rc=$rc $(date); sleeping 300s before retry ---" >> "$LOG"
    sleep 300
  fi
done
echo "=== es100k driver exhausted retries $(date) ===" >> "$LOG"
exit 1
