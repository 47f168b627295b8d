#!/bin/bash
# Round-5 caption-capstone queue: waits for the main retrain queue
# (tracked by /tmp/queue.pid) to release the TPU, then trains the
# caption-conditional model on the truthful-caption corpus and runs the
# semantic-conditioning eval. ONE TPU process at a time.
#   nohup bash examples/r5_queue_cap.sh > runs/r5_queue_cap.log 2>&1 &
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while kill -0 "$(cat /tmp/queue.pid 2>/dev/null)" 2>/dev/null; do
    sleep 60
done

echo "=== CAP STEP: train captioncond ($(date -u +%H:%M:%S)) ==="
timeout 5400 python -m audio_diffusion_tpu train --data corpus_cap/ \
    --preset configs/captioncond.json --steps 9000 --batch 8 \
    --crop 131072 --caption-dir corpus_cap/ --text-encoder random \
    --embedding-mask-proba 0.1 --ema-decay 0.999 \
    --checkpoint-every 1000 --log-every 200 --out runs/captioncond

echo "=== CAP STEP: caption eval ($(date -u +%H:%M:%S)) ==="
timeout 5400 python examples/caption_conditional_eval.py

echo "CAPQUEUE DONE"
