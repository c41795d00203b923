#!/usr/bin/env bash
# CogVideoX-5B VAP MoT training, multi-host TPU pod slice (6 hosts x 8 chips -> data_degree 48)
# (mirrors the reference recipe examples/training/sft/cogvideox/vap_mot/train_multi_node.sh (torchrun DDP_48))
set -euo pipefail
cd "$(dirname "$0")/../../../../.."

MODEL_PATH=${MODEL_PATH:-/data/cogvideox-5b-i2v}
DATA_ROOT=${DATA_ROOT:-/data/VAP-Data}
OUTPUT_DIR=${OUTPUT_DIR:-output/cogvideox_vap_mot_multinode}

# Multi-host rendezvous: the TPU-native replacement for torchrun
# (train.py:82-84 calls jax.distributed.initialize() when set). On Cloud TPU
# pod slices the topology is auto-discovered; on other fabrics export
# JAX_COORDINATOR_ADDRESS=<host0>:<port> and per-host JAX_PROCESS_ID/NUM.
export VAP_MULTIHOST=1

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
  --data_degree 48 --fsdp_degree 1 --seq_degree 1 \
  --lr 1e-5 --lr_scheduler constant_with_warmup --lr_warmup_steps 1000 \
  --sample_ref_videos_num 1 --mask_caption_ratio 0.02 \
  --checkpointing_steps 500 --checkpointing_limit 2 --validation_dataset_file examples/training/sft/cogvideox/vap_mot/validation.json \
  --validation_steps 500 \
  --output_dir "$OUTPUT_DIR" --resume_from_checkpoint latest
