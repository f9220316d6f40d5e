#!/bin/bash
# Wait for the TPU tunnel to respond to a tiny matmul probe, then run bench.py.
# Writes probe attempts to logs/tpu_wait.log and bench output to logs/r3_bench4.json.
cd /root/repo
mkdir -p logs
echo "$(date +%T) prober start" >> logs/tpu_wait.log
while true; do
  timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np, time
t0=time.time()
x = jnp.ones((8,8))
y = float(np.asarray(x @ x)[0,0])
print('probe ok', y, round(time.time()-t0,1), 's')
" >> logs/tpu_wait.log 2>&1
  if [ $? -eq 0 ]; then
    echo "$(date +%T) tunnel alive — launching bench" >> logs/tpu_wait.log
    break
  fi
  echo "$(date +%T) probe failed, retrying in 60s" >> logs/tpu_wait.log
  sleep 60
done
timeout 3600 python bench.py > logs/r3_bench4.json 2> logs/r3_bench4.err
echo "$(date +%T) bench done rc=$?" >> logs/tpu_wait.log
touch logs/BENCH_DONE.marker
