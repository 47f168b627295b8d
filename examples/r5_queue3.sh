#!/bin/bash
# Round-5 queue 3: waits for the caption queue (tracked by
# /tmp/capqueue.pid) to release the TPU, then re-runs the task-model
# quality eval — the first attempt died on the Griffin-Lim anchor
# (complex exp unimplemented on the TPU backend; fixed + sections
# isolated since). ONE TPU process at a time.
#   nohup bash examples/r5_queue3.sh > runs/r5_queue3.log 2>&1 &
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

for pidfile in /tmp/queue.pid /tmp/capqueue.pid; do
    while kill -0 "$(cat $pidfile 2>/dev/null)" 2>/dev/null; do
        sleep 60
    done
done

echo "=== Q3 STEP: task quality eval rerun ($(date -u +%H:%M:%S)) ==="
timeout 7200 python examples/task_quality_eval.py

echo "Q3 DONE"
