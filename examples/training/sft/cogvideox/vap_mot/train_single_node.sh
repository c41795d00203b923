#!/usr/bin/env bash
# CogVideoX-5B Video-As-Prompt MoT training, single v5p host
# (mirrors the reference recipe examples/training/sft/cogvideox/vap_mot/
# train_single_node.sh: 60k steps, batch 1/chip data-parallel, lr 1e-5
# constant + 1k warmup, adamw b=(0.9,0.99) wd=1e-4, grad ckpt, MoT in all 42
# blocks, buckets 49x480x720, mask_caption 0.02).
set -euo pipefail
cd "$(dirname "$0")/../../../../.."

MODEL_PATH=${MODEL_PATH:-/data/cogvideox-5b-i2v}
DATA_ROOT=${DATA_ROOT:-/data/VAP-Data}
OUTPUT_DIR=${OUTPUT_DIR:-output/cogvideox_vap_mot}

python train.py \
  --model_name cogvideox \
  --training_type video_as_prompt_mot \
  --pretrained_model_name_or_path "$MODEL_PATH" \
  --model_structure_config examples/training/sft/cogvideox/vap_mot/config_ori.json \
  --data_root "$DATA_ROOT" --meta_df_name vap_data.csv \
  --dataset_config examples/training/sft/cogvideox/vap_mot/training.json \
  --video_resolution_buckets 49x480x720 \
  --data_degree 4 --fsdp_degree 1 --seq_degree 1 \
  --batch_size 1 --train_steps 60000 \
  --lr 1e-5 --lr_scheduler constant_with_warmup --lr_warmup_steps 1000 \
  --optimizer adamw --beta1 0.9 --beta2 0.99 --weight_decay 1e-4 \
  --gradient_checkpointing \
  --sample_ref_videos_num 1 --mask_caption_ratio 0.02 \
  --checkpointing_steps 500 --checkpointing_limit 2 \
  --validation_dataset_file examples/training/sft/cogvideox/vap_mot/validation.json \
  --validation_steps 100 \
  --output_dir "$OUTPUT_DIR" \
  --resume_from_checkpoint latest
