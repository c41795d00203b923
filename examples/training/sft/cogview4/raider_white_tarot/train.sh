#!/usr/bin/env bash
# cogview4 LoRA finetune — raider_white_tarot
# (mirrors the reference recipe examples/training/sft/cogview4/raider_white_tarot/train.sh:
# 5000 steps, LoRA rank 32/alpha 32, lr 3e-5 constant+1000 warmup,
# adamw b=(0.9,0.99) wd=1e-4, logit-normal flow weighting)
set -euo pipefail
cd "$(dirname "$0")/../../../../.."

MODEL_PATH=${MODEL_PATH:-/data/cogview4-6b}
DATA_ROOT=${DATA_ROOT:-/data/raider-waite-tarot}
OUTPUT_DIR=${OUTPUT_DIR:-output/sft_cogview4_raider_white_tarot}

python train.py \
  --model_name cogview4 \
  --training_type lora \
  --pretrained_model_name_or_path "$MODEL_PATH" \
  --data_root "$DATA_ROOT" \
  --dataset_config examples/training/sft/cogview4/raider_white_tarot/training.json \
  --image_resolution_buckets 1280x720 \
  --rank 32 --lora_alpha 32 \
  --target_modules "to_q to_k to_v to_out" \
  --batch_size 1 --train_steps 5000 \
  --flow_weighting_scheme logit_normal \
  --optimizer adamw --lr 3e-5 --lr_scheduler constant_with_warmup --lr_warmup_steps 1000 \
  --beta1 0.9 --beta2 0.99 --weight_decay 1e-4 \
  --gradient_checkpointing --mask_caption_ratio 0.0 \
  --checkpointing_steps 500 --checkpointing_limit 2 \
  --validation_dataset_file examples/training/sft/cogview4/raider_white_tarot/validation.json \
  --validation_steps 500 \
  --output_dir "$OUTPUT_DIR" \
  --resume_from_checkpoint latest
