#!/bin/bash
# Round-5 retrain + re-score queue (runs/ was wiped between sessions; the
# environment note in ROUND_NOTES.md warned persistence is not guaranteed).
# Rebuilds every trained artifact the round-5 evals need, then runs the
# recorded-results passes. ONE TPU process at a time: run this solo.
#   nohup bash examples/r5_queue.sh > runs/r5_queue2.log 2>&1 &
set -x
cd /root/repo
mkdir -p runs
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

step() { echo "=== QUEUE STEP: $1 ($(date -u +%H:%M:%S)) ==="; }

step "flagship 12k"
timeout 7200 python -m audio_diffusion_tpu train --data corpus/ \
    --preset UNCONDITIONAL_48K --steps 12000 --batch 8 --crop 262144 \
    --out runs/flagship_r3 --ema-decay 0.999 --checkpoint-every 1000 \
    --log-every 200

step "distill flagship 64->8"
timeout 3600 python examples/distill_flagship.py

step "autoencoder 20k (VERDICT fix pass: 6k was the weakest row)"
timeout 7200 python -m audio_diffusion_tpu train --data corpus/ \
    --preset AUTOENCODER_48K --steps 20000 --batch 8 --crop 262144 \
    --out runs/ae --ema-decay 0.999 --checkpoint-every 2000 \
    --log-every 200

step "vocoder 6k"
timeout 3600 python -m audio_diffusion_tpu train --data corpus/ \
    --preset VOCODER_48K --steps 6000 --batch 8 --crop 262144 \
    --out runs/vocoder --ema-decay 0.999 --checkpoint-every 1000 \
    --log-every 200

step "upsampler 6k"
timeout 3600 python -m audio_diffusion_tpu train --data corpus/ \
    --preset UPSAMPLER_16X --steps 6000 --batch 8 --crop 262144 \
    --out runs/upsampler --ema-decay 0.999 --checkpoint-every 1000 \
    --log-every 200

step "ar 6k"
timeout 3600 python -m audio_diffusion_tpu train --data corpus/ \
    --preset UNCONDITIONAL_48K --task ar --steps 6000 --batch 8 \
    --crop 131072 --num-splits 4 --out runs/ar --ema-decay 0.999 \
    --checkpoint-every 1000 --log-every 200

step "perc 8k"
timeout 3600 python -m audio_diffusion_tpu train --data corpus_perc/ \
    --preset configs/perc_uncond.json --steps 8000 --batch 8 \
    --crop 131072 --out runs/perc --ema-decay 0.999 \
    --checkpoint-every 1000 --log-every 200

step "profile embeddings"
python examples/make_profile_embeddings.py --data corpus \
    --out runs/profile_embs

step "profcond 9k"
timeout 3600 python -m audio_diffusion_tpu train --data corpus/ \
    --preset configs/profcond.json --steps 9000 --batch 8 --crop 131072 \
    --out runs/profcond --embedding-dir runs/profile_embs \
    --embedding-mask-proba 0.1 --ema-decay 0.999 \
    --checkpoint-every 1000 --log-every 200

step "profcond guided distill 64->8"
timeout 3600 python -m audio_diffusion_tpu distill \
    --model runs/profcond/model --data corpus \
    --embedding-dir runs/profile_embs --guidance-scale 3.0 \
    --guidance-steps 600 --base-steps 64 --target-steps 8 \
    --stage-steps 400 --crop 131072

step "task quality eval (vocoder GL anchor + AE 20k rescore)"
timeout 7200 python examples/task_quality_eval.py

step "retrieval CI: teacher guided (64 targets x 2 seeds = 128)"
timeout 3600 python examples/profile_conditional_eval.py \
    --model runs/profcond/model --data corpus \
    --embeddings runs/profile_embs --steps 50 --scale 3.0 \
    --retrieval 64 --num 2

step "retrieval CI: teacher unguided"
timeout 3600 python examples/profile_conditional_eval.py \
    --model runs/profcond/model --data corpus \
    --embeddings runs/profile_embs --steps 50 --scale 1.0 \
    --retrieval 64 --num 2

step "retrieval CI: distilled single-pass student"
timeout 3600 python examples/profile_conditional_eval.py \
    --model runs/profcond/model_distilled8 --data corpus \
    --embeddings runs/profile_embs --steps 8 --scale 1.0 \
    --retrieval 64 --num 2

step "embedding-metric eval (train embedder, validate, re-score claims)"
timeout 10800 python examples/embed_metric_eval.py

step "serving stress (distilled flagship)"
timeout 3600 python examples/serve_stress.py

step "QUEUE DONE"
