"""vap_tpu training entry point (mirrors the reference train.py:26-101).

Example (CogVideoX VAP MoT, cf. examples/training/sft/cogvideox/vap_mot/
train_single_node.sh):

    python train.py \
        --model_name cogvideox --training_type video_as_prompt_mot \
        --pretrained_model_name_or_path /path/to/cogvideox-5b-i2v \
        --data_root /path/to/VAP-Data --meta_df_name vap_data.csv \
        --train_steps 60000 --lr 1e-5 --lr_warmup_steps 1000 \
        --video_resolution_buckets 49x480x720
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from vap_tpu.models.cogvideox import CogVideoXMOTConfig, convert_cogvideox_mot_state_dict, init_cogvideox_mot
from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig, init_cogvideox_vae
from vap_tpu.models.cogvideox.vae_weights import convert_cogvideox_vae_state_dict
from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
from vap_tpu.training.args import parse_args
from vap_tpu.training.checkpoint import load_safetensors
from vap_tpu.training.specs import build_mot_state_dict_from_base, get_model_spec_cls
from vap_tpu.training.trainer import SFTTrainer
from vap_tpu.utils.logging import get_logger

logger = get_logger("vap_tpu.train")


def _load_or_init_params(args, t_cfg, vae_cfg, txt_cfg, dtype):
    key = jax.random.PRNGKey(args.seed)
    params = {}
    base = args.pretrained_model_name_or_path

    def maybe(path):
        return path if path and os.path.exists(path) else None

    mot_path = maybe(args.videoasprompt_mot_name_or_path)
    tr_path = maybe(os.path.join(base, "transformer", "model.safetensors")) if base else None
    if mot_path:
        params["transformer"] = convert_cogvideox_mot_state_dict(load_safetensors(mot_path), t_cfg, dtype)
        logger.info(f"loaded MoT transformer from {mot_path}")
    elif tr_path:
        sd = build_mot_state_dict_from_base(load_safetensors(tr_path), t_cfg)
        params["transformer"] = convert_cogvideox_mot_state_dict(sd, t_cfg, dtype)
        logger.info(f"built MoT transformer from base {tr_path}")
    else:
        params["transformer"] = init_cogvideox_mot(key, t_cfg, dtype)
        logger.info("random-initialized transformer (no checkpoint found)")

    vae_path = maybe(os.path.join(base, "vae", "model.safetensors")) if base else None
    if vae_path:
        params["vae"] = convert_cogvideox_vae_state_dict(load_safetensors(vae_path), vae_cfg, dtype)
    else:
        params["vae"] = init_cogvideox_vae(jax.random.fold_in(key, 1), vae_cfg, dtype)

    # text encoder: converted T5 weights or random (tests)
    t5_path = maybe(os.path.join(base, "text_encoder", "model.safetensors")) if base else None
    if t5_path:
        from vap_tpu.models.text_encoders.t5 import convert_t5_state_dict

        params["text_encoder"] = convert_t5_state_dict(load_safetensors(t5_path), txt_cfg, dtype)
    else:
        params["text_encoder"] = init_t5_encoder(jax.random.fold_in(key, 2), txt_cfg, dtype)
    return params


def main(argv=None):
    args = parse_args(argv)
    if args.attn_provider_training not in (None, "", "auto"):
        os.environ.setdefault("VAP_ATTN_PROVIDER", args.attn_provider_training)

    # multi-host: the TPU-native replacement for torchrun/NCCL rendezvous
    # (reference train_single_node.sh:128-133). On TPU pods jax.distributed
    # auto-discovers the topology; set JAX_COORDINATOR_ADDRESS to force.
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("VAP_MULTIHOST"):
        jax.distributed.initialize()

    from vap_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    structure = args.model_structure()
    if args.model_name == "cogvideox":
        structure_kw = {k: tuple(v) if isinstance(v, list) else v for k, v in structure.items()
                        if k in ("block_idx_with_mot_ref", "supported_effect_types",
                                 "num_ref_embeddings", "num_layers", "num_attention_heads",
                                 "attention_head_dim", "ablation_single_encoder",
                                 "ablation_residual_addition")}
        if args.ablation_single_branch:
            # single-trunk ablation: plain CogVideoX, no MoT branch params
            # (reference sft_trainer/trainer.py:123 -> load_diffusion_models)
            structure_kw["block_idx_with_mot_ref"] = ()
        if args.ablation_single_encoder:
            structure_kw["ablation_single_encoder"] = True
        if args.ablation_residual_addition:
            structure_kw["ablation_residual_addition"] = True
        t_cfg = CogVideoXMOTConfig.cogvideox_5b_i2v_vap(
            reference_train_mode=args.reference_train_mode, **structure_kw)
        vae_cfg = CogVideoXVAEConfig()
        txt_cfg = T5Config.t5_xxl()
        dtype = jnp.bfloat16 if args.transformer_dtype == "bfloat16" else jnp.float32
        params = _load_or_init_params(args, t_cfg, vae_cfg, txt_cfg, dtype)
    else:  # wan
        from vap_tpu.models.wan import (
            WanMOTConfig,
            convert_wan_mot_state_dict,
            convert_wan_state_dict,
            expand_patch_embedding,
            init_wan,
            init_wan_mot,
        )
        from vap_tpu.models.wan.vae import WanVAEConfig
        from vap_tpu.models.wan.vae_weights import convert_wan_vae_state_dict
        from vap_tpu.models.text_encoders.t5 import convert_t5_state_dict

        structure_kw = {k: tuple(v) if isinstance(v, list) else v for k, v in structure.items()
                        if k in ("block_idx_with_mot_ref", "num_layers", "num_attention_heads",
                                 "attention_head_dim")}
        is_control = args.training_type.startswith("control")
        if is_control:
            base_cfg = WanMOTConfig.wan_1_3b_t2v(
                **{k: v for k, v in structure_kw.items() if k != "block_idx_with_mot_ref"})
        else:
            base_cfg = WanMOTConfig.wan_14b_i2v_vap(**structure_kw)
        t_cfg = base_cfg
        vae_cfg = WanVAEConfig()
        txt_cfg = T5Config.umt5_xxl()
        dtype = jnp.bfloat16 if args.transformer_dtype == "bfloat16" else jnp.float32
        base = args.pretrained_model_name_or_path

        def maybe(path):
            return path if path and os.path.exists(path) else None

        key = jax.random.PRNGKey(args.seed)
        tr = maybe(os.path.join(base, "transformer", "model.safetensors")) if base else None
        if is_control:
            # plain T2V weights, input layer widened for [noisy ‖ control(+mask)]
            # (reference control trainer._prepare_models, trainer.py:100-106)
            import dataclasses as _dc

            from vap_tpu.training.control_trainer import control_in_channels

            transformer = (convert_wan_state_dict(load_safetensors(tr), base_cfg, dtype)
                           if tr else init_wan(key, base_cfg, dtype))
            new_in = control_in_channels(
                base_cfg.in_channels, args.frame_conditioning_concatenate_mask)
            transformer = expand_patch_embedding(
                transformer, base_cfg, new_in - base_cfg.in_channels)
            t_cfg = _dc.replace(base_cfg, in_channels=new_in)
            params = {"transformer": transformer}
        else:
            params = {
                "transformer": (convert_wan_mot_state_dict(load_safetensors(tr), t_cfg, dtype)
                                if tr else init_wan_mot(key, t_cfg, dtype)),
            }
        vp = maybe(os.path.join(base, "vae", "model.safetensors")) if base else None
        if vp:
            params["vae"] = convert_wan_vae_state_dict(load_safetensors(vp), vae_cfg, dtype)
        else:
            raise FileNotFoundError("wan training needs a VAE checkpoint (no random init for 14B runs)")
        te = maybe(os.path.join(base, "text_encoder", "model.safetensors")) if base else None
        if te:
            params["text_encoder"] = convert_t5_state_dict(load_safetensors(te), txt_cfg, dtype)
        else:
            params["text_encoder"] = init_t5_encoder(jax.random.fold_in(key, 2), txt_cfg, dtype)

        clip_cfg = None
        if not is_control:
            # Wan-I2V needs the CLIP ViT-H image encoder for conditioning
            # (reference WanModelSpecification.load_condition_models); the T2V
            # control backbone does not.
            from vap_tpu.models.text_encoders.clip_vision import (
                CLIPVisionConfig, convert_clip_vision_state_dict, init_clip_vision)

            clip_cfg = CLIPVisionConfig()
            ie = maybe(os.path.join(base, "image_encoder", "model.safetensors")) if base else None
            if ie:
                params["image_encoder"] = convert_clip_vision_state_dict(
                    load_safetensors(ie), clip_cfg, dtype)
            else:
                params["image_encoder"] = init_clip_vision(jax.random.fold_in(key, 3), clip_cfg, dtype)

    tokenizer = None
    if args.pretrained_model_name_or_path:
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(
                os.path.join(args.pretrained_model_name_or_path, "tokenizer"))
        except Exception:
            logger.warning("no tokenizer found; pass precomputed embeddings")

    spec_cls = get_model_spec_cls(args.model_name, args.training_type)
    if args.model_name == "wan":
        spec = spec_cls(t_cfg, vae_cfg, txt_cfg, params, tokenizer, clip_cfg, dtype)
    else:
        spec = spec_cls(t_cfg, vae_cfg, txt_cfg, params, tokenizer, dtype)

    if args.training_type.startswith("control"):
        from vap_tpu.training.control_trainer import ControlTrainer

        trainer = ControlTrainer(args, spec)
    else:
        trainer = SFTTrainer(args, spec)
    try:
        state = trainer.run()
        trainer.export()
        logger.info(f"training finished at step {state.step}")
    except KeyboardInterrupt:
        logger.warning("interrupted; saving checkpoint")
        trainer.checkpointer.save(trainer.train_state.step, params=trainer.train_params,
                                  opt_state=trainer.opt_state, train_state=trainer.train_state)
        trainer.checkpointer.wait()


if __name__ == "__main__":
    main()
