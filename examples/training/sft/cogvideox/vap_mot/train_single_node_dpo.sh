#!/usr/bin/env bash
# CogVideoX-5B VAP MoT DPO, single host (LoRA policy over the frozen MoT base)
# (mirrors the reference recipe examples/training/sft/cogvideox/vap_mot/train_single_node_dpo.sh)
set -euo pipefail
cd "$(dirname "$0")/../../../../.."

MODEL_PATH=${MODEL_PATH:-/data/cogvideox-5b-i2v}
DATA_ROOT=${DATA_ROOT:-/data/VAP-Data}
OUTPUT_DIR=${OUTPUT_DIR:-output/cogvideox_vap_mot_dpo}

python train.py \
  --model_name cogvideox \
  --training_type video_as_prompt_mot \
  --pretrained_model_name_or_path "$MODEL_PATH" \
  --data_root "$DATA_ROOT" --meta_df_name vap_data.csv \
  --video_resolution_buckets 49x480x720 \
  --batch_size 1 --train_steps 60000 \
  --optimizer adamw --beta1 0.9 --beta2 0.99 --weight_decay 1e-4 \
  --gradient_checkpointing \
  --model_structure_config examples/training/sft/cogvideox/vap_mot/config_ori.json \
  --data_degree 4 --fsdp_degree 1 --seq_degree 1 \
  --dpo --rank 32 --lora_alpha 32 \
  --target_modules "(transformer_blocks|single_transformer_blocks).*(to_q|to_k|to_v|to_out.0)" \
  --lr 5e-5 --lr_scheduler constant \
  --sample_ref_videos_num 1 --mask_ref_ratio 0.0 --mask_caption_ratio 0.02 \
  --checkpointing_steps 501 --checkpointing_limit 1 --validation_dataset_file examples/training/sft/cogvideox/vap_mot/validation.json \
  --validation_steps 100 \
  --output_dir "$OUTPUT_DIR" --resume_from_checkpoint latest
