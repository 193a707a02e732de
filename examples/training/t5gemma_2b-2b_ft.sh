#!/bin/bash
# Full fine-tune from a released checkpoint (HF-export dir or bundle).
set -euo pipefail
python -m t5gemma_tts_tpu.train.cli \
  --dataset_dir "${DATASET_DIR:-/data/corpus}" \
  --exp_dir "${EXP_DIR:-./exp/ft}" \
  --load_model_from "${BASE_MODEL:-./t5gemma_voice_hf}" \
  --backbone_preset 2b-2b --precision bfloat16 \
  --optimizer_name ScaledAdam --lr 0.01 --warmup_fraction 0.02 \
  --num_steps 20000 --max_num_tokens 30000 --audio_max_length 40 \
  --neighbor_prompt_prob 0.5 --no_loss_on_prefix 1 --x_sep_token 255999 \
  "$@"
