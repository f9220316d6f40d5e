#!/bin/bash
# 100k-step "high"-precision (bf16x3 matmuls, f32 interior, jacfwd) control
# for the round-2 100k bf16 run: settles whether the late-schedule eval
# depth-RMSE drift (0.60 -> 6.35 mm) and SSIM slide were precision artifacts
# or the deform-capacity property claimed (VALIDATION.md 100k caveat;
# VERDICT r2 item 3). Same scene, same chunked wedge-riding machinery as
# tools/run_es100k.sh.
set -u
cd /root/repo
LOG=logs/es100k_high.log
EXP=/root/repo/logs/es100k_high
mkdir -p "$EXP"

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8))
assert float(np.asarray(x @ x)[0, 0]) == 8.0
" >/dev/null 2>&1
}

echo "=== es100k_high driver start $(date) ===" >> "$LOG"
for i in $(seq 1 120); do
  if grep -q '"status": "done"' "$LOG" 2>/dev/null; then
    touch logs/es100k_high_done.marker
    echo "=== es100k_high DONE $(date) ===" >> "$LOG"
    exit 0
  fi
  if ! probe; then
    echo "--- probe failed (tunnel wedged?) $(date); sleeping 600s ---" >> "$LOG"
    sleep 600
    continue
  fi
  echo "=== chunk invocation $i $(date) ===" >> "$LOG"
  timeout 7200 python tools/validate_synthetic.py \
    --steps 100000 --orbit 30 --frames 16 --mc-res 96 \
    --exp-dir "$EXP" --chunk 20000 --i-eval 20000 \
    --precision high --sampling-precision default \
    --megakernel off >> "$LOG" 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "--- chunk rc=$rc $(date); sleeping 300s before retry ---" >> "$LOG"
    sleep 300
  fi
done
echo "=== es100k_high driver exhausted retries $(date) ===" >> "$LOG"
exit 1
