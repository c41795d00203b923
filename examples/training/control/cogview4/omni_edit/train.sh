#!/usr/bin/env bash
# CogView4 control: instruction-based image editing on OmniEdit pairs
# (mirrors the reference recipe examples/training/control/cogview4/omni_edit/
# train.sh: control_type custom, 10k steps, LoRA rank 128/alpha 128, lr 3e-5
# constant+2k warmup, logit-normal flow weighting). The dataset must carry
# control_image columns (the source image) next to image/caption — the
# reference renames OmniEdit's src_img/edited_img on the fly; prepare the
# folder with those names instead.
set -euo pipefail
cd "$(dirname "$0")/../../../../.."

MODEL_PATH=${MODEL_PATH:-/data/cogview4-6b}
DATA_ROOT=${DATA_ROOT:-/data/omni-edit-mini}
OUTPUT_DIR=${OUTPUT_DIR:-output/cogview4_control_omni_edit}

python train.py \
  --model_name cogview4 \
  --training_type control_lora \
  --pretrained_model_name_or_path "$MODEL_PATH" \
  --data_root "$DATA_ROOT" \
  --dataset_config examples/training/control/cogview4/omni_edit/training.json \
  --image_resolution_buckets 1024x1024 \
  --control_type custom \
  --rank 128 --lora_alpha 128 \
  --target_modules "to_q to_k to_v to_out" \
  --batch_size 1 --train_steps 10000 \
  --flow_weighting_scheme logit_normal \
  --optimizer adamw --lr 3e-5 --lr_scheduler constant_with_warmup --lr_warmup_steps 2000 \
  --beta1 0.9 --beta2 0.99 --weight_decay 1e-4 \
  --gradient_checkpointing \
  --checkpointing_steps 500 --checkpointing_limit 2 \
  --validation_dataset_file examples/training/control/cogview4/omni_edit/validation.json \
  --validation_steps 500 \
  --output_dir "$OUTPUT_DIR" \
  --resume_from_checkpoint latest
