#!/bin/bash
# Stage follower: after the sweep, run the kernel-adjacent test files first
# (fast signal on the block-setter change), then the full suite if time
# remains. One-core host: serialized behind all TPU work.
cd /root/repo
while [ ! -f logs/SWEEP_DONE.marker ]; do sleep 30; done
echo "$(date +%T) sweep done — starting targeted pytest" >> logs/tpu_wait.log
timeout 1800 python -m pytest tests/test_fused_sampler.py \
    tests/test_fused_render.py tests/test_fused_train_pallas.py \
    tests/test_fused_train_dnerf.py tests/test_parallel.py -q \
    > logs/pytest_targeted.log 2>&1
echo "$(date +%T) targeted pytest rc=$?" >> logs/tpu_wait.log
touch logs/PYTEST_TARGETED_DONE.marker
timeout 3600 python -m pytest tests/ -q > logs/pytest_r3c.log 2>&1
echo "$(date +%T) full pytest rc=$?" >> logs/tpu_wait.log
touch logs/PYTEST_DONE.marker
