#!/usr/bin/env bash
# Ablation 1: single trunk over [target || refs], LoRA r=64 (DDP 4)
# (mirrors the reference recipe examples/training/sft/cogvideox/vap_mot/ablation/1-single_branch_lora.sh)
set -euo pipefail
cd "$(dirname "$0")/../../../../../.."

MODEL_PATH=${MODEL_PATH:-/data/cogvideox-5b-i2v}
DATA_ROOT=${DATA_ROOT:-/data/VAP-Data}
OUTPUT_DIR=${OUTPUT_DIR:-output/cogvideox_ablation_1-single_branch_lora}

python train.py \
  --model_name cogvideox \
  --training_type video_as_prompt_mot \
  --pretrained_model_name_or_path "$MODEL_PATH" \
  --data_root "$DATA_ROOT" --meta_df_name vap_data.csv \
  --video_resolution_buckets 49x480x720 \
  --batch_size 1 --train_steps 60000 \
  --optimizer adamw --beta1 0.9 --beta2 0.99 --weight_decay 1e-4 \
  --gradient_checkpointing \
  --ref_videos_num 10 --sample_ref_videos_num 1 --mask_ref_ratio 0.0 \
  --lr 1e-5 --lr_scheduler constant_with_warmup --lr_warmup_steps 1000 \
  --checkpointing_steps 1000 --checkpointing_limit 1 --validation_dataset_file examples/training/sft/cogvideox/vap_mot/validation.json \
  --validation_steps 100 \
  --output_dir "$OUTPUT_DIR" --resume_from_checkpoint latest \
  --data_degree 4 \
  --ablation_single_branch --rank 64 --lora_alpha 64 \
  --target_modules "(transformer_blocks|single_transformer_blocks).*(to_q|to_k|to_v|to_out.0)"
