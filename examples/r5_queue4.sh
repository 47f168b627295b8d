#!/bin/bash
# Round-5 queue 4: waits for queue 3, then runs the TPU serving-stress
# measurement (first attempt crashed on a non-factor-divisible init
# length; fixed + CPU-smoked since).
#   nohup bash examples/r5_queue4.sh > runs/r5_queue4.log 2>&1 &
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

for pidfile in /tmp/queue.pid /tmp/capqueue.pid /tmp/queue3.pid; do
    while kill -0 "$(cat $pidfile 2>/dev/null)" 2>/dev/null; do
        sleep 60
    done
done

echo "=== Q4 STEP: serving stress ($(date -u +%H:%M:%S)) ==="
timeout 3600 python examples/serve_stress.py

echo "Q4 DONE"
