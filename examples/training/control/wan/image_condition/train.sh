#!/usr/bin/env bash
# Wan2.1-T2V-1.3B control: frame conditioning (image-to-video via control channel concat)
# (mirrors the reference recipe examples/training/control/wan/image_condition/train.sh)
set -euo pipefail
cd "$(dirname "$0")/../../../../.."

MODEL_PATH=${MODEL_PATH:-/data/wan2.1-t2v-1.3b}
DATA_ROOT=${DATA_ROOT:-/data/VAP-Data}
OUTPUT_DIR=${OUTPUT_DIR:-output/wan_control_image_condition}

python train.py \
  --model_name wan \
  --training_type control_lora \
  --pretrained_model_name_or_path "$MODEL_PATH" \
  --data_root "$DATA_ROOT" \
  --dataset_config examples/training/control/wan/image_condition/training.json \
  --video_resolution_buckets 49x480x832 \
  --control_type none \
  --frame_conditioning_type index --frame_conditioning_index 0 \
  --frame_conditioning_concatenate_mask \
  --rank 64 --lora_alpha 64 --train_qk_norm \
  --batch_size 1 --train_steps 10000 \
  --flow_weighting_scheme logit_normal \
  --optimizer adamw --lr 3e-5 --lr_scheduler constant_with_warmup --lr_warmup_steps 500 \
  --gradient_checkpointing \
  --checkpointing_steps 1000 --checkpointing_limit 2 --validation_steps 500 \
  --validation_dataset_file examples/training/control/wan/image_condition/validation.json \
  --output_dir "$OUTPUT_DIR" --resume_from_checkpoint latest
