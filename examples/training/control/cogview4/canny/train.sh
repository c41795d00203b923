#!/usr/bin/env bash
# CogView4 control: canny-edge conditioned image generation (control LoRA)
# (mirrors the reference recipe examples/training/control/cogview4/canny/train.sh)
set -euo pipefail
cd "$(dirname "$0")/../../../../.."

MODEL_PATH=${MODEL_PATH:-/data/cogview4-6b}
DATA_ROOT=${DATA_ROOT:-/data/VAP-Data}
OUTPUT_DIR=${OUTPUT_DIR:-output/cogview4_control_canny}

python train.py \
  --model_name cogview4 \
  --training_type control_lora \
  --pretrained_model_name_or_path "$MODEL_PATH" \
  --data_root "$DATA_ROOT" \
  --dataset_config examples/training/control/cogview4/canny/training.json \
  --image_resolution_buckets 1024x1024 \
  --control_type canny \
  --rank 64 --lora_alpha 64 \
  --batch_size 1 --train_steps 5000 \
  --flow_weighting_scheme logit_normal \
  --optimizer adamw --lr 3e-5 --lr_scheduler constant_with_warmup --lr_warmup_steps 250 \
  --gradient_checkpointing \
  --checkpointing_steps 500 --checkpointing_limit 2 --validation_steps 250 \
  --validation_dataset_file examples/training/control/cogview4/canny/validation.json \
  --output_dir "$OUTPUT_DIR" --resume_from_checkpoint latest
