#!/usr/bin/env bash
# Wan2.1-14B Video-As-Prompt MoT training (reference recipe: HSDP 2x4 -> here
# mesh data=2 x fsdp=4, otherwise identical hyperparameters).
set -euo pipefail
cd "$(dirname "$0")/../../../../.."

MODEL_PATH=${MODEL_PATH:-/data/wan2.1-i2v-14b}
DATA_ROOT=${DATA_ROOT:-/data/VAP-Data}
OUTPUT_DIR=${OUTPUT_DIR:-output/wan_vap_mot}

python train.py \
  --model_name wan \
  --training_type video_as_prompt_mot \
  --pretrained_model_name_or_path "$MODEL_PATH" \
  --model_structure_config examples/training/sft/wan/vap_mot/config_ori_d_20.json \
  --data_root "$DATA_ROOT" --meta_df_name vap_data.csv \
  --dataset_config examples/training/sft/wan/vap_mot/training.json \
  --video_resolution_buckets 49x480x832 \
  --data_degree 2 --fsdp_degree 4 --seq_degree 1 \
  --batch_size 1 --train_steps 60000 \
  --lr 1e-5 --lr_scheduler constant_with_warmup --lr_warmup_steps 1000 \
  --optimizer adamw --beta1 0.9 --beta2 0.99 --weight_decay 1e-4 \
  --gradient_checkpointing \
  --flow_weighting_scheme logit_normal \
  --sample_ref_videos_num 1 --mask_caption_ratio 0.02 \
  --checkpointing_steps 500 --checkpointing_limit 2 \
  --validation_dataset_file examples/training/sft/wan/vap_mot/validation.json \
  --validation_steps 200 \
  --output_dir "$OUTPUT_DIR" \
  --resume_from_checkpoint latest
