#!/bin/bash
# 8k-step confirmation of the shipping bf16-interior default on the orbit
# scene (mirrors the earlier matmul-precision gate). Waits for the
# post-100k measurement queue to drain, then runs in one process (K=5
# keeps it at ~1600 dispatches).
set -u
cd /root/repo
LOG=logs/val_es_bf16int8k.log

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8))
assert float(np.asarray(x @ x)[0, 0]) == 8.0
" >/dev/null 2>&1
}

echo "=== es_bf16int8k waiter started $(date) ===" >> "$LOG"
while [ ! -f logs/post100k_done.marker ]; do sleep 120; done
for i in $(seq 1 6); do
  if grep -q '"status": "done"' "$LOG" 2>/dev/null; then break; fi
  if ! probe; then
    echo "--- probe failed $(date); sleep 600 ---" >> "$LOG"
    sleep 600
    continue
  fi
  echo "=== attempt $i $(date) ===" >> "$LOG"
  timeout 5400 python tools/validate_synthetic.py \
    --steps 8000 --orbit 30 --frames 16 --mc-res 96 \
    --exp-dir /root/repo/logs/es_bf16int8k \
    --precision default --sampling-precision default >> "$LOG" 2>&1
done
echo "=== es_bf16int8k done $(date) ===" >> "$LOG"
