#!/usr/bin/env bash
# wan LoRA finetune — 3dgs_dissolve
# (mirrors the reference recipe examples/training/sft/wan_t2v/3dgs_dissolve/train.sh:
# 3000 steps, LoRA rank 32/alpha 32, lr 5e-5 constant+1000 warmup,
# adamw b=(0.9,0.99) wd=1e-4, logit-normal flow weighting).
# Plain-trunk finetune (config_plain.json: no MoT blocks); sample
# validation samples run the plain trunk (prompt-driven generic
# validation JSON; T2V rows need no image).)
# T2V checkpoint: see wan_t2v/crush_smol_lora/train.sh.
set -euo pipefail
cd "$(dirname "$0")/../../../../.."

MODEL_PATH=${MODEL_PATH:-/data/wan2.1-t2v-1.3b}
DATA_ROOT=${DATA_ROOT:-/data/finetrainers-3dgs-dissolve}
OUTPUT_DIR=${OUTPUT_DIR:-output/sft_wan_t2v_3dgs_dissolve}

python train.py \
  --model_name wan \
  --training_type lora \
  --pretrained_model_name_or_path "$MODEL_PATH" \
  --data_root "$DATA_ROOT" \
  --model_structure_config examples/training/sft/wan_t2v/3dgs_dissolve/config_plain.json \
  --dataset_config examples/training/sft/wan_t2v/3dgs_dissolve/training.json \
  --video_resolution_buckets 49x480x832 \
  --rank 32 --lora_alpha 32 \
  --target_modules "to_q to_k to_v to_out" \
  --batch_size 1 --train_steps 3000 \
  --flow_weighting_scheme logit_normal \
  --optimizer adamw --lr 5e-5 --lr_scheduler constant_with_warmup --lr_warmup_steps 1000 \
  --beta1 0.9 --beta2 0.99 --weight_decay 1e-4 \
  --gradient_checkpointing --mask_caption_ratio 0.0 \
  --checkpointing_steps 500 --checkpointing_limit 2 \
  --validation_dataset_file examples/training/sft/wan_t2v/3dgs_dissolve/validation.json \
  --validation_steps 500 \
  --output_dir "$OUTPUT_DIR" \
  --resume_from_checkpoint latest
