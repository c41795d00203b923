#!/usr/bin/env bash
# Wan2.1-14B VAP MoT training, multi-host TPU pod slice (data_degree 48)
# (mirrors the reference recipe examples/training/sft/wan/vap_mot/train_multi_node.sh)
set -euo pipefail
cd "$(dirname "$0")/../../../../.."

MODEL_PATH=${MODEL_PATH:-/data/wan2.1-i2v-14b-480p}
DATA_ROOT=${DATA_ROOT:-/data/VAP-Data}
OUTPUT_DIR=${OUTPUT_DIR:-output/wan_vap_mot_multinode}

export VAP_MULTIHOST=1

python train.py \
  --model_name wan \
  --training_type video_as_prompt_mot \
  --pretrained_model_name_or_path "$MODEL_PATH" \
  --model_structure_config examples/training/sft/wan/vap_mot/config_ori.json \
  --data_root "$DATA_ROOT" --meta_df_name vap_data.csv \
  --video_resolution_buckets 49x480x832 \
  --batch_size 1 --train_steps 60000 \
  --flow_weighting_scheme logit_normal \
  --ref_videos_num 10 --sample_ref_videos_num 1 \
  --mask_ref_ratio 0.0 --mask_caption_ratio 0.02 --alignment_score_threshold 10 \
  --optimizer adamw --beta1 0.9 --beta2 0.99 --weight_decay 1e-4 \
  --gradient_checkpointing \
  --lr 1e-5 --lr_scheduler constant_with_warmup --lr_warmup_steps 2000 \
  --checkpointing_steps 1000 --checkpointing_limit 1 --validation_steps 200 \
  --validation_dataset_file examples/training/sft/wan/vap_mot/validation.json \
  --output_dir "$OUTPUT_DIR" --resume_from_checkpoint latest \
  --data_degree 48 --fsdp_degree 1 --seq_degree 1
