"""vap_tpu training entry point (mirrors the reference train.py:26-101 and the
per-family dispatch in finetrainers/config.py:48-84 — every supported family
is constructible from the CLI, not just the two flagships).

Example (CogVideoX VAP MoT, cf. examples/training/sft/cogvideox/vap_mot/
train_single_node.sh):

    python train.py \
        --model_name cogvideox --training_type video_as_prompt_mot \
        --pretrained_model_name_or_path /path/to/cogvideox-5b-i2v \
        --data_root /path/to/VAP-Data --meta_df_name vap_data.csv \
        --train_steps 60000 --lr 1e-5 --lr_warmup_steps 1000 \
        --video_resolution_buckets 49x480x720

Component configs resolve in three layers (later wins): the family preset,
the checkpoint component's config.json (HF layout), then the
--model_structure_config JSON. A flat structure JSON applies to the
transformer (reference config_ori.json compatibility); a nested one may
carry {"transformer": {...}, "vae": {...}, "text_encoder": {...},
"text_encoder_2": {...}} sections.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from vap_tpu.training.args import parse_args
from vap_tpu.training.checkpoint import load_safetensors
from vap_tpu.training.specs import build_mot_state_dict_from_base, get_model_spec_cls
from vap_tpu.training.trainer import SFTTrainer
from vap_tpu.utils.logging import get_logger

logger = get_logger("vap_tpu.train")

_STRUCTURE_SECTIONS = ("transformer", "vae", "text_encoder", "text_encoder_2",
                       "image_encoder")


def _sections(structure):
    """Split a structure-config dict into per-component override sections.
    A flat dict (no known section keys) is transformer-only, matching the
    reference's config_ori.json usage."""
    if any(k in structure for k in _STRUCTURE_SECTIONS):
        return {k: dict(structure.get(k, {})) for k in _STRUCTURE_SECTIONS}
    out = {k: {} for k in _STRUCTURE_SECTIONS}
    out["transformer"] = dict(structure)
    return out


def _tuplify(v):
    return tuple(_tuplify(x) for x in v) if isinstance(v, list) else v


def _cfg_kwargs(cfg_cls, *layers):
    """Merge config layers keeping only keys that are fields of cfg_cls
    (checkpoint config.json files carry extra HF metadata like _class_name)."""
    names = {f.name for f in dataclasses.fields(cfg_cls)}
    out = {}
    for layer in layers:
        for k, v in (layer or {}).items():
            if k in names:
                out[k] = _tuplify(v)
    return out


def _maybe(path):
    return path if path and os.path.exists(path) else None


def _component_dir(base, name):
    return _maybe(os.path.join(base, name)) if base else None


def _component_config(base, name):
    d = _component_dir(base, name)
    if not d:
        return {}
    cfg = os.path.join(d, "config.json")
    if not os.path.exists(cfg):
        return {}
    with open(cfg) as f:
        return json.load(f)


def _weights(base, name):
    """Merged state dict for a checkpoint component dir, or None (handles
    both single-file and sharded safetensors)."""
    d = _component_dir(base, name)
    if not d:
        return None
    try:
        return load_safetensors(d)
    except FileNotFoundError:
        return None


def _tokenizer(base, name="tokenizer"):
    d = _component_dir(base, name)
    if not d:
        return None
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(d)
    except Exception:
        logger.warning(f"no usable tokenizer at {d}; pass precomputed embeddings")
        return None


def _convert_or_init(name, sd, convert, init, key, cfg, dtype):
    if sd is not None:
        logger.info(f"loaded {name} weights from checkpoint")
        return convert(sd, cfg, dtype)
    logger.info(f"random-initialized {name} (no checkpoint found)")
    return init(key, cfg, dtype)


# ---------------------------------------------------------------------------
# family builders: args -> ModelSpecification
# ---------------------------------------------------------------------------

def _build_cogvideox(args, sec, dtype):
    from vap_tpu.models.cogvideox import (
        CogVideoXMOTConfig,
        convert_cogvideox_mot_state_dict,
        init_cogvideox_mot,
    )
    from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig, init_cogvideox_vae
    from vap_tpu.models.cogvideox.vae_weights import convert_cogvideox_vae_state_dict
    from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
    from vap_tpu.models.text_encoders.t5 import convert_t5_state_dict

    base = args.pretrained_model_name_or_path
    structure_kw = _cfg_kwargs(CogVideoXMOTConfig,
                               _component_config(base, "transformer"),
                               sec["transformer"])
    if args.ablation_single_branch:
        # single-trunk ablation: plain CogVideoX, no MoT branch params
        # (reference sft_trainer/trainer.py:123 -> load_diffusion_models)
        structure_kw["block_idx_with_mot_ref"] = ()
    if args.ablation_single_encoder:
        structure_kw["ablation_single_encoder"] = True
    if args.ablation_residual_addition:
        structure_kw["ablation_residual_addition"] = True
    # the CLI flag wins unless the structure json carries an explicit mode
    # (a full-asdict json serializes the field as null)
    if structure_kw.get("reference_train_mode") is None:
        structure_kw["reference_train_mode"] = args.reference_train_mode
    t_cfg = CogVideoXMOTConfig.cogvideox_5b_i2v_vap(**structure_kw)
    vae_cfg = CogVideoXVAEConfig(
        **_cfg_kwargs(CogVideoXVAEConfig, _component_config(base, "vae"), sec["vae"]))
    # HF T5 config field names (d_model/d_kv/d_ff/num_layers/num_heads/...)
    # match T5Config's, so the checkpoint's text_encoder/config.json layers in
    txt_cfg = T5Config.t5_xxl(
        **_cfg_kwargs(T5Config, _component_config(base, "text_encoder"),
                      sec["text_encoder"]))

    key = jax.random.PRNGKey(args.seed)
    params = {}
    mot_path = _maybe(args.videoasprompt_mot_name_or_path)
    tr_sd = _weights(base, "transformer")
    if mot_path:
        params["transformer"] = convert_cogvideox_mot_state_dict(
            load_safetensors(mot_path), t_cfg, dtype)
        logger.info(f"loaded MoT transformer from {mot_path}")
    elif tr_sd is not None:
        # clone-from-base is a no-op on keys already present, so a finetuned
        # MoT checkpoint loaded via pretrained_model_name_or_path keeps its
        # trained branch (it only fills mot names a stock checkpoint lacks)
        sd = build_mot_state_dict_from_base(tr_sd, t_cfg)
        params["transformer"] = convert_cogvideox_mot_state_dict(sd, t_cfg, dtype)
        logger.info("built MoT transformer from base checkpoint")
    else:
        params["transformer"] = init_cogvideox_mot(key, t_cfg, dtype)
        logger.info("random-initialized transformer (no checkpoint found)")
    params["vae"] = _convert_or_init(
        "vae", _weights(base, "vae"), convert_cogvideox_vae_state_dict,
        init_cogvideox_vae, jax.random.fold_in(key, 1), vae_cfg, dtype)
    params["text_encoder"] = _convert_or_init(
        "text_encoder", _weights(base, "text_encoder"), convert_t5_state_dict,
        init_t5_encoder, jax.random.fold_in(key, 2), txt_cfg, dtype)

    spec_cls = get_model_spec_cls(args.model_name, args.training_type)
    return spec_cls(t_cfg, vae_cfg, txt_cfg, params, _tokenizer(base), dtype=dtype)


def _build_wan(args, sec, dtype):
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
    from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
    from vap_tpu.models.text_encoders.t5 import convert_t5_state_dict

    base = args.pretrained_model_name_or_path
    structure_kw = _cfg_kwargs(WanMOTConfig,
                               _component_config(base, "transformer"),
                               sec["transformer"])
    is_control = args.training_type.startswith("control")
    if is_control:
        base_cfg = WanMOTConfig.wan_1_3b_t2v(
            **{k: v for k, v in structure_kw.items() if k != "block_idx_with_mot_ref"})
    else:
        base_cfg = WanMOTConfig.wan_14b_i2v_vap(**structure_kw)
    t_cfg = base_cfg
    vae_cfg = WanVAEConfig(
        **_cfg_kwargs(WanVAEConfig, _component_config(base, "vae"), sec["vae"]))
    txt_cfg = T5Config.umt5_xxl(
        **_cfg_kwargs(T5Config, _component_config(base, "text_encoder"),
                      sec["text_encoder"]))

    key = jax.random.PRNGKey(args.seed)
    tr_sd = _weights(base, "transformer")
    if is_control:
        # plain T2V weights, input layer widened for [noisy ‖ control(+mask)]
        # (reference control trainer._prepare_models, trainer.py:100-106)
        from vap_tpu.training.control_trainer import control_in_channels

        transformer = (convert_wan_state_dict(tr_sd, base_cfg, dtype)
                       if tr_sd is not None else init_wan(key, base_cfg, dtype))
        new_in = control_in_channels(
            base_cfg.in_channels, args.frame_conditioning_concatenate_mask)
        transformer = expand_patch_embedding(
            transformer, base_cfg, new_in - base_cfg.in_channels)
        t_cfg = dataclasses.replace(base_cfg, in_channels=new_in)
        params = {"transformer": transformer}
    else:
        from vap_tpu.training.specs import build_wan_mot_state_dict_from_base

        mot_path = _maybe(args.videoasprompt_mot_name_or_path)
        if mot_path:
            # finetuned MoT checkpoint (reference wan base_specification.py:582-587)
            params = {"transformer": convert_wan_mot_state_dict(
                load_safetensors(mot_path), t_cfg, dtype)}
            logger.info(f"loaded MoT transformer from {mot_path}")
        elif tr_sd is not None:
            # stock Wan checkpoint: clone the trunk into the MoT expert
            # branch (reference wan base_specification.py:599-633). A no-op
            # on keys already present, so a finetuned MoT checkpoint keeps
            # its trained branch and a partial one heals the missing blocks.
            tr_sd = build_wan_mot_state_dict_from_base(tr_sd, t_cfg)
            params = {"transformer": convert_wan_mot_state_dict(tr_sd, t_cfg, dtype)}
            logger.info("built MoT transformer from base checkpoint")
        else:
            params = {"transformer": init_wan_mot(key, t_cfg, dtype)}
            logger.info("random-initialized transformer (no checkpoint found)")
    vae_sd = _weights(base, "vae")
    if vae_sd is None:
        raise FileNotFoundError(
            "wan training needs a VAE checkpoint (no random init for 14B runs)")
    params["vae"] = convert_wan_vae_state_dict(vae_sd, vae_cfg, dtype)
    params["text_encoder"] = _convert_or_init(
        "text_encoder", _weights(base, "text_encoder"), convert_t5_state_dict,
        init_t5_encoder, jax.random.fold_in(key, 2), txt_cfg, dtype)

    clip_cfg = None
    if not is_control and t_cfg.image_dim is not None:
        # Wan-I2V needs the CLIP ViT-H image encoder for conditioning
        # (reference WanModelSpecification.load_condition_models); T2V
        # configs (image_dim=None) and the control backbone do not.
        from vap_tpu.models.text_encoders.clip_vision import (
            CLIPVisionConfig, convert_clip_vision_state_dict, init_clip_vision)

        clip_cfg = CLIPVisionConfig(
            **_cfg_kwargs(CLIPVisionConfig, _component_config(base, "image_encoder"),
                          sec["image_encoder"]))
        params["image_encoder"] = _convert_or_init(
            "image_encoder", _weights(base, "image_encoder"),
            convert_clip_vision_state_dict, init_clip_vision,
            jax.random.fold_in(key, 3), clip_cfg, dtype)

    spec_cls = get_model_spec_cls(args.model_name, args.training_type)
    return spec_cls(t_cfg, vae_cfg, txt_cfg, params, _tokenizer(base),
                    clip_cfg=clip_cfg, dtype=dtype)


def _build_flux(args, sec, dtype):
    """Flux: CLIP-L pooled + T5 sequence conditions over a 16ch AutoencoderKL
    (reference FluxModelSpecification.load_condition_models /
    load_latent_models, finetrainers/models/flux/base_specification.py)."""
    from vap_tpu.models.autoencoder_kl import (
        AutoencoderKLConfig,
        convert_autoencoder_kl_state_dict,
        init_autoencoder_kl,
    )
    from vap_tpu.models.flux import FluxConfig, convert_flux_state_dict, init_flux
    from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
    from vap_tpu.models.text_encoders.clip_text import (
        CLIPTextConfig, convert_clip_text_state_dict, init_clip_text)
    from vap_tpu.models.text_encoders.t5 import convert_t5_state_dict

    base = args.pretrained_model_name_or_path
    vae_cfg = AutoencoderKLConfig.flux(
        **_cfg_kwargs(AutoencoderKLConfig, _component_config(base, "vae"), sec["vae"]))
    t_cfg = FluxConfig.flux_dev(
        **_cfg_kwargs(FluxConfig, _component_config(base, "transformer"),
                      sec["transformer"]))
    clip_cfg = CLIPTextConfig.clip_vit_l(
        **_cfg_kwargs(CLIPTextConfig, _component_config(base, "text_encoder"),
                      sec["text_encoder"]))
    txt_cfg = T5Config.t5_xxl(
        **_cfg_kwargs(T5Config, _component_config(base, "text_encoder_2"),
                      sec["text_encoder_2"]))

    key = jax.random.PRNGKey(args.seed)
    params = {
        "transformer": _convert_or_init(
            "transformer", _weights(base, "transformer"), convert_flux_state_dict,
            init_flux, key, t_cfg, dtype),
        "vae": _convert_or_init(
            "vae", _weights(base, "vae"), convert_autoencoder_kl_state_dict,
            init_autoencoder_kl, jax.random.fold_in(key, 1), vae_cfg, dtype),
        "text_encoder": _convert_or_init(
            "text_encoder", _weights(base, "text_encoder"),
            convert_clip_text_state_dict, init_clip_text,
            jax.random.fold_in(key, 2), clip_cfg, dtype),
        "text_encoder_2": _convert_or_init(
            "text_encoder_2", _weights(base, "text_encoder_2"),
            convert_t5_state_dict, init_t5_encoder,
            jax.random.fold_in(key, 3), txt_cfg, dtype),
    }
    spec_cls = get_model_spec_cls(args.model_name, args.training_type)
    # HF layout: tokenizer = CLIP, tokenizer_2 = T5; the spec takes (T5, CLIP)
    return spec_cls(t_cfg, vae_cfg, txt_cfg, params,
                    tokenizer=_tokenizer(base, "tokenizer_2"),
                    clip_tokenizer=_tokenizer(base, "tokenizer"),
                    clip_text_cfg=clip_cfg, dtype=dtype)


def _build_cogview4(args, sec, dtype):
    """CogView4: GLM text conditions over an SD-style AutoencoderKL
    (reference CogView4ModelSpecification)."""
    from vap_tpu.models.autoencoder_kl import (
        AutoencoderKLConfig,
        convert_autoencoder_kl_state_dict,
        init_autoencoder_kl,
    )
    from vap_tpu.models.cogview4 import (
        CogView4Config, convert_cogview4_state_dict, init_cogview4)
    from vap_tpu.models.text_encoders.glm import (
        GlmConfig, convert_glm_state_dict, init_glm)

    base = args.pretrained_model_name_or_path
    vae_cfg = AutoencoderKLConfig.sd(
        **_cfg_kwargs(AutoencoderKLConfig, {"latent_channels": 16},
                      _component_config(base, "vae"), sec["vae"]))
    t_cfg = CogView4Config.cogview4_6b(
        **_cfg_kwargs(CogView4Config, _component_config(base, "transformer"),
                      sec["transformer"]))
    glm_cfg = GlmConfig.glm_4_9b(
        **_cfg_kwargs(GlmConfig, _component_config(base, "text_encoder"),
                      sec["text_encoder"]))

    key = jax.random.PRNGKey(args.seed)
    params = {
        "transformer": _convert_or_init(
            "transformer", _weights(base, "transformer"), convert_cogview4_state_dict,
            init_cogview4, key, t_cfg, dtype),
        "vae": _convert_or_init(
            "vae", _weights(base, "vae"), convert_autoencoder_kl_state_dict,
            init_autoencoder_kl, jax.random.fold_in(key, 1), vae_cfg, dtype),
        "text_encoder": _convert_or_init(
            "text_encoder", _weights(base, "text_encoder"), convert_glm_state_dict,
            init_glm, jax.random.fold_in(key, 2), glm_cfg, dtype),
    }
    spec_cls = get_model_spec_cls(args.model_name, args.training_type)
    return spec_cls(t_cfg, vae_cfg, glm_cfg, params, _tokenizer(base), dtype=dtype)


def _build_ltx_video(args, sec, dtype):
    """LTX-Video: T5 conditions over the LTX causal VAE (reference
    LTXVideoModelSpecification)."""
    from vap_tpu.models.ltx_video import (
        LTXVideoConfig, convert_ltx_video_state_dict, init_ltx_video)
    from vap_tpu.models.ltx_video.vae import (
        LTXVideoVAEConfig, convert_ltx_vae_state_dict, init_ltx_vae)
    from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
    from vap_tpu.models.text_encoders.t5 import convert_t5_state_dict

    base = args.pretrained_model_name_or_path
    vae_cfg = LTXVideoVAEConfig.ltx_video(
        **_cfg_kwargs(LTXVideoVAEConfig, _component_config(base, "vae"), sec["vae"]))
    t_cfg = LTXVideoConfig.ltx_video_2b(
        **_cfg_kwargs(LTXVideoConfig, _component_config(base, "transformer"),
                      sec["transformer"]))
    txt_cfg = T5Config.t5_xxl(
        **_cfg_kwargs(T5Config, _component_config(base, "text_encoder"),
                      sec["text_encoder"]))

    key = jax.random.PRNGKey(args.seed)
    params = {
        "transformer": _convert_or_init(
            "transformer", _weights(base, "transformer"), convert_ltx_video_state_dict,
            init_ltx_video, key, t_cfg, dtype),
        "vae": _convert_or_init(
            "vae", _weights(base, "vae"), convert_ltx_vae_state_dict,
            init_ltx_vae, jax.random.fold_in(key, 1), vae_cfg, dtype),
        "text_encoder": _convert_or_init(
            "text_encoder", _weights(base, "text_encoder"), convert_t5_state_dict,
            init_t5_encoder, jax.random.fold_in(key, 2), txt_cfg, dtype),
    }
    spec_cls = get_model_spec_cls(args.model_name, args.training_type)
    return spec_cls(t_cfg, vae_cfg, txt_cfg, params, _tokenizer(base), dtype=dtype)


def _build_hunyuan_video(args, sec, dtype):
    """HunyuanVideo: LLaMA text embeds + CLIP-L pooled conditions over the
    Hunyuan causal VAE (reference HunyuanVideoModelSpecification)."""
    from vap_tpu.models.hunyuan_video import (
        HunyuanVideoConfig, convert_hunyuan_video_state_dict, init_hunyuan_video)
    from vap_tpu.models.hunyuan_video.vae import (
        HunyuanVideoVAEConfig, convert_hunyuan_vae_state_dict, init_hunyuan_vae)
    from vap_tpu.models.text_encoders.clip_text import (
        CLIPTextConfig, convert_clip_text_state_dict, init_clip_text)
    from vap_tpu.models.text_encoders.llama import (
        LlamaConfig, convert_llama_state_dict, init_llama)

    base = args.pretrained_model_name_or_path
    vae_cfg = HunyuanVideoVAEConfig.hunyuan_video(
        **_cfg_kwargs(HunyuanVideoVAEConfig, _component_config(base, "vae"), sec["vae"]))
    t_cfg = HunyuanVideoConfig.hunyuan_video_t2v(
        **_cfg_kwargs(HunyuanVideoConfig, _component_config(base, "transformer"),
                      sec["transformer"]))
    llama_cfg = LlamaConfig.llava_llama_8b(
        **_cfg_kwargs(LlamaConfig, _component_config(base, "text_encoder"),
                      sec["text_encoder"]))
    clip_cfg = CLIPTextConfig.clip_vit_l(
        **_cfg_kwargs(CLIPTextConfig, _component_config(base, "text_encoder_2"),
                      sec["text_encoder_2"]))

    key = jax.random.PRNGKey(args.seed)
    params = {
        "transformer": _convert_or_init(
            "transformer", _weights(base, "transformer"),
            convert_hunyuan_video_state_dict, init_hunyuan_video, key, t_cfg, dtype),
        "vae": _convert_or_init(
            "vae", _weights(base, "vae"), convert_hunyuan_vae_state_dict,
            init_hunyuan_vae, jax.random.fold_in(key, 1), vae_cfg, dtype),
        "text_encoder": _convert_or_init(
            "text_encoder", _weights(base, "text_encoder"), convert_llama_state_dict,
            init_llama, jax.random.fold_in(key, 2), llama_cfg, dtype),
        "text_encoder_2": _convert_or_init(
            "text_encoder_2", _weights(base, "text_encoder_2"),
            convert_clip_text_state_dict, init_clip_text,
            jax.random.fold_in(key, 3), clip_cfg, dtype),
    }
    spec_cls = get_model_spec_cls(args.model_name, args.training_type)
    # HF layout: tokenizer = LLaMA, tokenizer_2 = CLIP
    return spec_cls(t_cfg, vae_cfg, llama_cfg, params, _tokenizer(base),
                    clip_text_cfg=clip_cfg, dtype=dtype,
                    clip_tokenizer=_tokenizer(base, "tokenizer_2"))


FAMILY_BUILDERS = {
    "cogvideox": _build_cogvideox,
    "wan": _build_wan,
    "flux": _build_flux,
    "cogview4": _build_cogview4,
    "ltx_video": _build_ltx_video,
    "hunyuan_video": _build_hunyuan_video,
}


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

    get_model_spec_cls(args.model_name, args.training_type)  # fail fast
    dtype = jnp.bfloat16 if args.transformer_dtype == "bfloat16" else jnp.float32
    sec = _sections(args.model_structure())
    spec = FAMILY_BUILDERS[args.model_name](args, sec, dtype)

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
