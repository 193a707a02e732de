#!/bin/bash
# Flagship from-scratch recipe — hyperparameter mirror of the reference
# examples/training/t5gemma_2b-2b.sh (bf16, ScaledAdam lr=0.035, warmup 2%,
# 30000 tokens/device, neighbor prompts 0.5, no_loss_on_prefix,
# x_sep=255999, 143391 steps), launched as one SPMD process instead of
# torchrun.
set -euo pipefail

DATASET_DIR=${DATASET_DIR:-/data/emilia_prepared}
EXP_DIR=${EXP_DIR:-./exp/t5gemma_2b-2b}

python -m t5gemma_tts_tpu.train.cli \
  --dataset_dir "$DATASET_DIR" \
  --exp_dir "$EXP_DIR" \
  --backbone_preset 2b-2b \
  --precision bfloat16 \
  --optimizer_name ScaledAdam \
  --lr 0.035 \
  --warmup_fraction 0.02 \
  --num_steps 143391 \
  --max_num_tokens 30000 \
  --val_max_num_tokens 6000 \
  --audio_max_length 40 \
  --audio_min_length 2 \
  --neighbor_prompt_prob 0.5 \
  --no_loss_on_prefix 1 \
  --x_sep_token 255999 \
  --audio_vocab_size 65536 \
  --n_special 5 \
  --progress_scale 2000 \
  --gradient_accumulation_steps 4 \
  --val_every_n_steps 500 \
  --inference_every_n_steps 3000 \
  --tp 1 \
  "$@"
