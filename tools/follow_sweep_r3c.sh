#!/bin/bash
# Stage follower: wait for bench.py to finish (logs/BENCH_DONE.marker), then
# run the one-process block sweep. Serializes all TPU work in one lane.
cd /root/repo
while [ ! -f logs/BENCH_DONE.marker ]; do sleep 30; done
echo "$(date +%T) bench done — starting block sweep" >> logs/tpu_wait.log
timeout 5400 python tools/sweep_blocks_r3c.py > logs/r3c_block_sweep.jsonl 2> logs/r3c_block_sweep.err
echo "$(date +%T) sweep done rc=$?" >> logs/tpu_wait.log
touch logs/SWEEP_DONE.marker
