#!/bin/bash
# LoRA fine-tune (r=16, alpha=32 over q/k/v/o/gate/up/down, like the
# reference peft recipe).
set -euo pipefail
python -m t5gemma_tts_tpu.train.cli \
  --dataset_dir "${DATASET_DIR:-/data/corpus}" \
  --exp_dir "${EXP_DIR:-./exp/lora}" \
  --load_model_from "${BASE_MODEL:-./t5gemma_voice_hf}" \
  --backbone_preset 2b-2b --precision bfloat16 \
  --use_lora 1 --lora_r 16 --lora_alpha 32 \
  --optimizer_name AdamW --lr 1e-4 --num_steps 10000 \
  --max_num_tokens 30000 --audio_max_length 40 \
  "$@"
