"""Model specifications — the model-facing plugin layer (reference L3,
ModelSpecification, finetrainers/models/modeling_utils.py:37-313).

Each spec knows how to: load / init its component params, encode conditions
(text), encode latents (VAE), collate, and expose the loss-forward used by the
trainer. The registry maps (model_name, training_type) -> spec class like the
reference SUPPORTED_MODEL_CONFIGS (finetrainers/config.py:48-84).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.cogvideox.config import CogVideoXMOTConfig
from ..models.cogvideox.vae import CogVideoXVAEConfig, vae_encode, posterior_mode
from ..models.text_encoders.t5 import T5Config, t5_encode
from .train_step import TrainStepConfig, cogvideox_vap_loss


def expected_mot_ref_shapes(cfg: CogVideoXMOTConfig) -> Dict[str, tuple]:
    """HF-layout shapes of every `*_mot_ref` parameter a config-built MoT model
    would carry (the target side of the reference's clone loop, cogvideox spec
    base_specification.py:398-422). Used to detect base-vs-target shape
    mismatches when a custom (non-config_ori) structure JSON changes dims."""
    d, t, e = cfg.inner_dim, cfg.time_embed_dim, cfg.text_embed_dim
    p, pt, hd = cfg.patch_size, cfg.patch_size_t, cfg.attention_head_dim
    shapes: Dict[str, tuple] = {
        "patch_embed_mot_ref.proj.weight":
            (d, cfg.in_channels * p * p * pt) if pt else (d, cfg.in_channels, p, p),
        "patch_embed_mot_ref.proj.bias": (d,),
        "patch_embed_mot_ref.text_proj.weight": (d, e),
        "patch_embed_mot_ref.text_proj.bias": (d,),
        "time_embedding_mot_ref.linear_1.weight": (t, d),
        "time_embedding_mot_ref.linear_1.bias": (t,),
        "time_embedding_mot_ref.linear_2.weight": (t, t),
        "time_embedding_mot_ref.linear_2.bias": (t,),
    }
    if cfg.use_learned_positional_embeddings:
        shapes["patch_embed_mot_ref.pos_embedding"] = (1, cfg.joint_pos_embed_length, d)
    for i in cfg.block_idx_with_mot_ref:
        pre = f"transformer_blocks.{i}."
        for nrm in ("norm1_mot_ref", "norm2_mot_ref"):
            shapes[pre + nrm + ".linear.weight"] = (6 * d, t)
            shapes[pre + nrm + ".linear.bias"] = (6 * d,)
            shapes[pre + nrm + ".norm.weight"] = (d,)
            shapes[pre + nrm + ".norm.bias"] = (d,)
        for proj in ("to_q", "to_k", "to_v", "to_out.0"):
            shapes[pre + f"attn1_mot_ref.{proj}.weight"] = (d, d)
            shapes[pre + f"attn1_mot_ref.{proj}.bias"] = (d,)
        for qk in ("norm_q", "norm_k"):
            shapes[pre + f"attn1_mot_ref.{qk}.weight"] = (hd,)
            shapes[pre + f"attn1_mot_ref.{qk}.bias"] = (hd,)
        shapes[pre + "ff_mot_ref.net.0.proj.weight"] = (4 * d, d)
        shapes[pre + "ff_mot_ref.net.0.proj.bias"] = (4 * d,)
        shapes[pre + "ff_mot_ref.net.2.weight"] = (d, 4 * d)
        shapes[pre + "ff_mot_ref.net.2.bias"] = (d,)
    if cfg.reference_train_mode == "reference_independent":
        out_dim = (cfg.out_channels or cfg.in_channels) * p * p * (pt or 1)
        shapes.update({
            "norm_final_mot_ref.weight": (d,),
            "norm_final_mot_ref.bias": (d,),
            "norm_out_mot_ref.linear.weight": (2 * d, t),
            "norm_out_mot_ref.linear.bias": (2 * d,),
            "norm_out_mot_ref.norm.weight": (d,),
            "norm_out_mot_ref.norm.bias": (d,),
            "proj_out_mot_ref.weight": (out_dim, d),
            "proj_out_mot_ref.bias": (out_dim,),
        })
    return shapes


def _xavier_uniform(rng: np.random.Generator, shape: tuple) -> np.ndarray:
    """torch.nn.init.xavier_uniform_ (gain=1): fan_in/out per torch's
    _calculate_fan_in_and_fan_out (receptive field folded into both fans)."""
    recep = int(np.prod(shape[2:])) if len(shape) > 2 else 1
    fan_out, fan_in = shape[0] * recep, shape[1] * recep
    a = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return rng.uniform(-a, a, size=shape).astype(np.float32)


def build_mot_state_dict_from_base(sd: Dict[str, np.ndarray], cfg: CogVideoXMOTConfig,
                                   seed: int = 0) -> Dict[str, np.ndarray]:
    """Clone a plain CogVideoX checkpoint's weights into the MoT expert branch
    (reference load_videoasprompt_mot_models, cogvideox spec
    base_specification.py:398-431): every `X` gains an `X_mot_ref` copy when
    shapes match; on a base-vs-target shape mismatch (custom structure JSON),
    weights are xavier-uniform, norm weights 1+0.02*noise, biases zero
    (:404-417); effect/ref embeddings are ZERO-initialized (:424-431) — they
    are fresh parameters the optimizer grows from nothing."""
    out = dict(sd)
    targets = expected_mot_ref_shapes(cfg)
    rng = np.random.default_rng(seed)

    def _fresh(tgt: str, shape: tuple) -> np.ndarray:
        if len(shape) > 1:
            return _xavier_uniform(rng, shape)
        if tgt.endswith(".weight") and "norm" in tgt:
            return (np.ones(shape) + 0.02 * rng.standard_normal(shape)).astype(np.float32)
        if tgt.endswith(".bias"):
            return np.zeros(shape, dtype=np.float32)
        raise ValueError(f"no base parameter for {tgt} with shape {shape}")

    def _clone(src_prefix: str, dst_prefix: str):
        for k in list(sd):
            if k.startswith(src_prefix):
                tgt = k.replace(src_prefix, dst_prefix, 1)
                if tgt in out:  # keep a finetuned checkpoint's MoT branch
                    continue
                want = targets.get(tgt)
                if want is not None and tuple(np.asarray(sd[k]).shape) != want:
                    out[tgt] = _fresh(tgt, want)
                else:
                    out[tgt] = sd[k]

    for name in ("patch_embed", "time_embedding"):
        _clone(name + ".", name + "_mot_ref.")
    for i in cfg.block_idx_with_mot_ref:
        pre = f"transformer_blocks.{i}."
        for sub in ("norm1", "attn1", "norm2", "ff"):
            _clone(pre + sub + ".", pre + sub + "_mot_ref.")
    if cfg.reference_train_mode == "reference_independent":
        for name in ("norm_final", "norm_out", "proj_out"):
            _clone(name + ".", name + "_mot_ref.")
    dim = cfg.inner_dim
    for t in cfg.supported_effect_types:
        if f"effect_embeddings.{t}" not in out:
            out[f"effect_embeddings.{t}"] = np.zeros((1, 1, dim), dtype=np.float32)
    for idx in range(cfg.num_ref_embeddings or 0):
        if f"ref_embeddings.ref_{idx}" not in out:
            out[f"ref_embeddings.ref_{idx}"] = np.zeros((1, 1, dim), dtype=np.float32)
    return out


def build_wan_mot_state_dict_from_base(sd: Dict[str, np.ndarray], cfg) -> Dict[str, np.ndarray]:
    """Clone a plain Wan checkpoint's weights into the MoT expert branch
    (reference WanModelSpecification.load_diffusion_models,
    wan/base_specification.py:599-633: every `X_mot_ref` parameter is
    initialized from its base `X`; shapes always match for the supported
    configs since the reference branch consumes the same 36-ch conditioning).
    No-op for keys already present (a finetuned MoT checkpoint keeps its
    trained branch)."""
    out = dict(sd)

    def clone(prefix: str):
        plen = len(prefix)
        for k in list(sd):
            if k == prefix or (k.startswith(prefix) and k[plen] == "."):
                tgt = prefix + "_mot_ref" + k[plen:]
                if tgt not in out:
                    out[tgt] = sd[k]

    clone("patch_embedding")
    clone("condition_embedder")
    for i in cfg.block_idx_with_mot_ref:
        for sub in ("attn1", "attn2", "norm2", "ffn", "scale_shift_table"):
            clone(f"blocks.{i}.{sub}")
    if cfg.reference_train_mode == "reference_independent":
        clone("proj_out")
        clone("scale_shift_table")
    return out


class CogVideoXSpec:
    """CogVideoX VAP model spec (reference CogVideoXModelSpecification,
    finetrainers/models/cogvideox/base_specification.py)."""

    family = "cogvideox"

    def __init__(self, transformer_cfg: CogVideoXMOTConfig, vae_cfg: CogVideoXVAEConfig,
                 text_cfg: T5Config, params: Dict[str, Any], tokenizer=None,
                 dtype=jnp.bfloat16):
        self.transformer_cfg = transformer_cfg
        self.vae_cfg = vae_cfg
        self.text_cfg = text_cfg
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self._t5 = jax.jit(lambda p, ids: t5_encode(p, text_cfg, ids), static_argnums=())
        self._vae = jax.jit(
            lambda p, v: posterior_mode(vae_encode(p, vae_cfg, v)) * vae_cfg.scaling_factor)

    # ---- condition / latent preprocessing (reference ProcessorMixin chain) --
    def prepare_conditions(self, sample: Dict[str, Any], max_length: int = 226) -> Dict[str, Any]:
        def encode(text: str):
            toks = self.tokenizer([text], padding="max_length", max_length=max_length,
                                  truncation=True, add_special_tokens=True, return_tensors="np")
            return np.asarray(self._t5(self.params["text_encoder"], jnp.asarray(toks["input_ids"])))

        cond = {"encoder_hidden_states": encode(sample["caption"])}
        if sample.get("caption_mot_ref"):
            ref_embeds = [encode(c) for c in sample["caption_mot_ref"]]
            cond["encoder_hidden_states_mot_ref"] = np.concatenate(ref_embeds, axis=1)
        if self.transformer_cfg.supported_effect_types and sample.get("effect_types"):
            type_to_id = {t: i for i, t in enumerate(self.transformer_cfg.supported_effect_types)}
            cond["effect_ids"] = np.asarray([type_to_id[t] for t in sample["effect_types"]])
        return cond

    def prepare_latents(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        """VAE-encode target video, first-frame image, each ref video + its
        first frame. Output layout [B, F, C, H, W] latents, already scaled."""
        def enc(video_np: np.ndarray) -> np.ndarray:
            v = jnp.asarray(video_np, jnp.float32)[None].astype(self.dtype)
            z = np.asarray(self._vae(self.params["vae"], v), np.float32)
            return z.transpose(0, 1, 4, 2, 3)  # channel-last -> [B, F, C, h, w]

        video = sample["video"]
        latents = enc(video)
        f_lat = latents.shape[1]
        # plain T2V finetune (in_channels == latent channels) carries no
        # first-frame conditioning; I2V concatenates it channel-wise
        i2v = self.transformer_cfg.in_channels > latents.shape[2]
        out = {"latents": latents}
        if i2v:
            image_latent = enc(video[:1])
            pad = np.zeros((1, f_lat - 1) + image_latent.shape[2:], np.float32)
            out["image_latents"] = np.concatenate([image_latent, pad], axis=1)
        if not sample.get("ref_videos"):
            return out  # generic (non-VAP) sample -> plain-trunk loss path

        ref_lat, ref_img_lat = [], []
        for rv in sample["ref_videos"]:
            ref_lat.append(enc(rv))
            fi = enc(rv[:1])
            pad = np.zeros((1, f_lat - 1) + fi.shape[2:], np.float32)
            ref_img_lat.append(np.concatenate([fi, pad], axis=1))
        out["latents_mot_ref"] = np.concatenate(ref_lat, axis=1)
        out["image_latents_mot_ref"] = np.concatenate(ref_img_lat, axis=1)
        return out

    def loss_fn(self, cfg: TrainStepConfig):
        return cogvideox_vap_loss


SUPPORTED_MODEL_SPECS = {
    ("cogvideox", "video_as_prompt_mot"): CogVideoXSpec,
    ("cogvideox", "sft"): CogVideoXSpec,
    ("cogvideox", "lora"): CogVideoXSpec,
    ("cogvideox", "dpo"): CogVideoXSpec,
}


def get_model_spec_cls(model_name: str, training_type: str):
    if training_type.startswith("control"):
        from . import control_specs  # noqa: F401 — registers control specs
    key = (model_name, training_type)
    if key not in SUPPORTED_MODEL_SPECS:
        raise ValueError(f"unsupported (model, training_type): {key}")
    return SUPPORTED_MODEL_SPECS[key]


def _validation_image(sample: Dict[str, Any], height: int, width: int):
    """Resolve a validation row's conditioning image: an in-memory array
    ("image"), a file path ("image_path", the reference validation-JSON
    field), or None (plain T2V sampling)."""
    if sample.get("image") is not None:
        return sample["image"]
    path = sample.get("image_path")
    if not path:
        return None
    import cv2

    from ..data.video import normalize_video, resize_video

    img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    return normalize_video(resize_video(
        img[None].astype(np.float32) / 255.0, height, width))[0]


def _cogvideox_validation(spec: "CogVideoXSpec", merged_params: Dict[str, Any],
                          sample: Dict[str, Any], **gen_kwargs):
    """Run a full generation with live training weights (reference
    spec.validation, cogvideox spec :821-899). Samples without ref videos
    run the plain trunk (crush_smol-style finetunes); image may come from
    "image", "image_path", or be absent (T2V). Returns video [F, H, W, 3]."""
    from ..pipelines.cogvideox_i2v_mot import CogVideoXVAPPipeline

    pipe = CogVideoXVAPPipeline(
        transformer_cfg=spec.transformer_cfg, vae_cfg=spec.vae_cfg, text_cfg=spec.text_cfg,
        params={**spec.params, "transformer": merged_params},
        tokenizer=spec.tokenizer, dtype=spec.dtype,
    )
    defaults = dict(num_inference_steps=50, guidance_scale=6.0, use_dynamic_cfg=True,
                    max_sequence_length=spec.transformer_cfg.max_text_seq_length)
    defaults.update(gen_kwargs)
    image = _validation_image(sample, defaults.get("height", 480),
                              defaults.get("width", 720))
    video = pipe(
        image=image, prompt=sample["caption"],
        ref_videos=sample.get("ref_videos"),
        prompt_mot_ref=sample.get("caption_mot_ref"),
        **defaults,
    )
    return video[0]


CogVideoXSpec.validation = _cogvideox_validation


class HunyuanVideoSpec:
    """HunyuanVideo spec (reference HunyuanVideoModelSpecification,
    finetrainers/models/hunyuan_video/base_specification.py): LLaMA text
    embeds + CLIP-L pooled conditions, causal-3D-VAE latents, flow-matching
    SFT with a fixed distilled-guidance embedding. The LLaMA (GQA) text
    encoder, CLIP-L pooled conditions, and the Hunyuan causal VAE all run
    natively when their params/configs are supplied; precomputed
    `encoder_hidden_states` / `latents` in the sample are used otherwise."""

    family = "hunyuan_video"

    def __init__(self, transformer_cfg, vae_cfg, text_cfg, params: Dict[str, Any],
                 tokenizer=None, clip_text_cfg=None, dtype=jnp.bfloat16,
                 clip_tokenizer=None):
        self.transformer_cfg = transformer_cfg
        self.vae_cfg = vae_cfg
        self.text_cfg = text_cfg  # LlamaConfig (or None for precomputed embeds)
        self.clip_text_cfg = clip_text_cfg
        self.params = params
        self.tokenizer = tokenizer
        # HF layout: tokenizer = LLaMA, tokenizer_2 = CLIP. Feeding LLaMA ids
        # into CLIP's embedding table silently gathers garbage (JAX clamps
        # out-of-range indices), so the CLIP branch needs its own tokenizer.
        self.clip_tokenizer = clip_tokenizer
        self.dtype = dtype

    def prepare_conditions(self, sample: Dict[str, Any], clip_max_length: int = 77,
                           max_length: int = 256, **_) -> Dict[str, Any]:
        if "encoder_hidden_states" in sample:
            cond = {"encoder_hidden_states": np.asarray(sample["encoder_hidden_states"],
                                                        np.float32)}
        elif self.text_cfg is not None and self.tokenizer is not None \
                and "text_encoder" in self.params:
            # reference LlamaProcessor (finetrainers/processors/llama.py:
            # 37-117): llava template + crop_start 95, conditioning from
            # hidden_states[-3] (num_layers_to_skip=2)
            from ..models.text_encoders.llama import llama_encode
            from ..pipelines.hunyuan_video import (
                DEFAULT_PROMPT_TEMPLATE_PREFIX, DEFAULT_PROMPT_TEMPLATE_SUFFIX)

            crop_start = 95
            text = (DEFAULT_PROMPT_TEMPLATE_PREFIX + sample["caption"] +
                    DEFAULT_PROMPT_TEMPLATE_SUFFIX)
            toks = self.tokenizer([text], padding="max_length",
                                  max_length=max_length + crop_start,
                                  truncation=True, return_tensors="np")
            hidden = llama_encode(self.params["text_encoder"], self.text_cfg,
                                  jnp.asarray(toks["input_ids"]),
                                  jnp.asarray(toks["attention_mask"]),
                                  hidden_layer=-3)[:, crop_start:]
            mask = np.asarray(toks["attention_mask"], np.float32)[:, crop_start:]
            cond = {"encoder_hidden_states": np.asarray(hidden, np.float32),
                    "prompt_attention_mask": mask}
        else:
            raise NotImplementedError(
                "provide a LLaMA text encoder (params['text_encoder'] + LlamaConfig "
                "+ tokenizer) or precomputed sample['encoder_hidden_states']")
        if "prompt_attention_mask" in sample:
            cond["prompt_attention_mask"] = np.asarray(sample["prompt_attention_mask"], np.float32)
        if "pooled_projections" in sample:
            cond["pooled_projections"] = np.asarray(sample["pooled_projections"], np.float32)
        elif self.clip_text_cfg is not None and \
                (self.clip_tokenizer or self.tokenizer) is not None:
            from ..models.text_encoders.clip_text import clip_text_encode

            tok2 = self.clip_tokenizer or self.tokenizer
            toks = tok2([sample["caption"]], padding="max_length",
                        max_length=min(clip_max_length,
                                       self.clip_text_cfg.max_position_embeddings),
                        truncation=True, return_tensors="np")
            _, pooled = clip_text_encode(self.params["text_encoder_2"], self.clip_text_cfg,
                                         jnp.asarray(toks["input_ids"]))
            cond["pooled_projections"] = np.asarray(pooled, np.float32)
        return cond

    def prepare_latents(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        if "latents" in sample:
            return {"latents": np.asarray(sample["latents"], np.float32)}
        if self.vae_cfg is not None and "vae" in self.params:
            from ..models.hunyuan_video.vae import hunyuan_vae_encode

            video = jnp.asarray(sample["video"], jnp.float32)[None].astype(self.dtype)
            moments = hunyuan_vae_encode(self.params["vae"], self.vae_cfg, video)
            mean = moments[..., : self.vae_cfg.latent_channels]
            lat = np.asarray(mean, np.float32) * self.vae_cfg.scaling_factor
            return {"latents": lat.transpose(0, 4, 1, 2, 3)}  # -> [B, C, F, H, W]
        raise NotImplementedError(
            "provide a Hunyuan VAE (params['vae'] + HunyuanVideoVAEConfig) or "
            "precomputed latents (sample['latents'], [B, C, F, H, W], scaled)")


SUPPORTED_MODEL_SPECS[("hunyuan_video", "sft")] = HunyuanVideoSpec
SUPPORTED_MODEL_SPECS[("hunyuan_video", "lora")] = HunyuanVideoSpec


class CogView4Spec:
    """CogView4 text-to-image spec (reference CogView4ModelSpecification,
    finetrainers/models/cogview4/base_specification.py): GLM text conditions,
    SD-style 2D AutoencoderKL latents with SDXL-like size conditions,
    flow-matching SFT with resolution-dependent sigma shift. The GLM-4 text
    encoder runs natively when params/config/tokenizer are supplied (falls
    back to precomputed `encoder_hidden_states`); latents/size conditions are
    fully implemented."""

    family = "cogview4"

    def __init__(self, transformer_cfg, vae_cfg, text_cfg, params: Dict[str, Any],
                 tokenizer=None, dtype=jnp.bfloat16):
        from ..models.autoencoder_kl import scale_latents, vae2d_encode

        self.transformer_cfg = transformer_cfg
        self.vae_cfg = vae_cfg
        self.text_cfg = text_cfg
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype

        def _enc(p, img):
            moments = vae2d_encode(p, vae_cfg, img)
            return scale_latents(vae_cfg, moments[..., : vae_cfg.latent_channels])

        self._vae = jax.jit(_enc)

    def prepare_conditions(self, sample: Dict[str, Any], max_length: int = 224,
                           **_) -> Dict[str, Any]:
        if "encoder_hidden_states" in sample:
            return {"encoder_hidden_states": np.asarray(sample["encoder_hidden_states"],
                                                        np.float32)}
        if self.text_cfg is not None and self.tokenizer is not None \
                and "text_encoder" in self.params:
            # reference CogView4GLMProcessor: 'longest' + LEFT-pad to a
            # multiple of 16 (always at least 16 in the training processor),
            # penultimate hidden layer, no attention mask
            from ..models.text_encoders.glm import cogview4_glm_embeds

            hidden = cogview4_glm_embeds(
                self.params["text_encoder"], self.text_cfg, self.tokenizer,
                sample["caption"], max_sequence_length=max_length, always_pad=True)
            return {"encoder_hidden_states": np.asarray(hidden, np.float32)}
        raise NotImplementedError(
            "provide a GLM text encoder (params['text_encoder'] + GlmConfig + "
            "tokenizer) or precomputed sample['encoder_hidden_states']")

    def prepare_latents(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        image = sample["image"] if "image" in sample else sample["video"][0]
        oh, ow = sample.get("original_size", image.shape[:2])
        img = jnp.asarray(image, jnp.float32)[None].astype(self.dtype)
        lat = np.asarray(self._vae(self.params["vae"], img), np.float32)
        # transformer layout is NCHW
        lat = lat.transpose(0, 3, 1, 2)
        return {
            "latents": lat,
            "original_size": np.asarray([[oh, ow]], np.float32),
            "target_size": np.asarray([[image.shape[0], image.shape[1]]], np.float32),
            "crop_coords": np.zeros((1, 2), np.float32),
        }


SUPPORTED_MODEL_SPECS[("cogview4", "sft")] = CogView4Spec
SUPPORTED_MODEL_SPECS[("cogview4", "lora")] = CogView4Spec


class LTXVideoSpec:
    """LTX-Video spec (reference LTXVideoModelSpecification,
    finetrainers/models/ltx_video/base_specification.py): T5 conditions with
    attention mask, per-channel-normalized 3D latents, flow-matching SFT with
    first-frame conditioning. The LTX causal VAE (0.9.0) encodes natively when
    params/config are supplied (falls back to precomputed `latents`); the
    transformer, loss, and conditions are fully implemented and parity-tested."""

    family = "ltx_video"

    def __init__(self, transformer_cfg, vae_cfg, text_cfg, params: Dict[str, Any],
                 tokenizer=None, dtype=jnp.bfloat16):
        self.transformer_cfg = transformer_cfg
        self.vae_cfg = vae_cfg
        self.text_cfg = text_cfg
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self._t5 = jax.jit(lambda p, ids: t5_encode(p, text_cfg, ids))

    def prepare_conditions(self, sample: Dict[str, Any], max_length: int = 128) -> Dict[str, Any]:
        toks = self.tokenizer([sample["caption"]], padding="max_length",
                              max_length=max_length, truncation=True,
                              add_special_tokens=True, return_tensors="np")
        # reference T5Processor runs the encoder WITHOUT the attention mask
        # (use_attention_mask=False, processors/t5.py:37,56-60); the mask only
        # reaches the transformer as encoder_attention_mask
        embeds = np.asarray(self._t5(self.params["text_encoder"],
                                     jnp.asarray(toks["input_ids"])))
        return {"encoder_hidden_states": embeds,
                "prompt_attention_mask": np.asarray(toks["attention_mask"], np.float32)}

    def prepare_latents(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        if "latents" in sample:
            return {"latents": np.asarray(sample["latents"], np.float32)}
        if self.vae_cfg is not None and "vae" in self.params:
            from ..models.ltx_video.vae import ltx_vae_encode, normalize_latents

            video = jnp.asarray(sample["video"], jnp.float32)[None].astype(self.dtype)
            moments = ltx_vae_encode(self.params["vae"], self.vae_cfg, video)
            mean = moments[..., : self.vae_cfg.latent_channels]
            lat = np.asarray(normalize_latents(self.vae_cfg, mean), np.float32)
            return {"latents": lat.transpose(0, 4, 1, 2, 3)}  # -> [B, C, F, H, W]
        raise NotImplementedError(
            "provide an LTX VAE (params['vae'] + LTXVideoVAEConfig) or "
            "precompute latents (sample['latents'], [B, C, F, H, W], normalized)")


SUPPORTED_MODEL_SPECS[("ltx_video", "sft")] = LTXVideoSpec
SUPPORTED_MODEL_SPECS[("ltx_video", "lora")] = LTXVideoSpec


class FluxSpec:
    """Flux text-to-image spec (reference FluxModelSpecification,
    finetrainers/models/flux/base_specification.py:80-365): CLIP pooled +
    T5 sequence conditions, 2D AutoencoderKL latents with shift/scale
    normalization, flow-matching SFT over packed latents. Images come from
    the sample's first frame, as in the reference latent processor (:64)."""

    family = "flux"

    def __init__(self, transformer_cfg, vae_cfg, text_cfg, params: Dict[str, Any],
                 tokenizer=None, clip_tokenizer=None, clip_text_cfg=None,
                 dtype=jnp.bfloat16):
        from ..models.autoencoder_kl import scale_latents, vae2d_encode

        self.transformer_cfg = transformer_cfg
        self.vae_cfg = vae_cfg
        self.text_cfg = text_cfg          # T5 (text_encoder_2 in the reference)
        self.clip_text_cfg = clip_text_cfg
        self.params = params
        self.tokenizer = tokenizer        # T5 tokenizer
        self.clip_tokenizer = clip_tokenizer
        self.dtype = dtype

        def _enc(p, img):
            moments = vae2d_encode(p, vae_cfg, img)
            mean = moments[..., : vae_cfg.latent_channels]
            return scale_latents(vae_cfg, mean)

        self._vae = jax.jit(_enc)
        self._t5 = jax.jit(lambda p, ids: t5_encode(p, text_cfg, ids))

    def prepare_conditions(self, sample: Dict[str, Any], max_length: int = 512,
                           clip_max_length: int = 77) -> Dict[str, Any]:
        from ..models.text_encoders.clip_text import clip_text_encode

        caption = sample["caption"]
        toks = self.tokenizer([caption], padding="max_length", max_length=max_length,
                              truncation=True, add_special_tokens=True, return_tensors="np")
        embeds = np.asarray(self._t5(self.params["text_encoder_2"],
                                     jnp.asarray(toks["input_ids"])))
        ctoks = (self.clip_tokenizer or self.tokenizer)(
            [caption], padding="max_length", max_length=clip_max_length,
            truncation=True, return_tensors="np")
        _, pooled = clip_text_encode(self.params["text_encoder"], self.clip_text_cfg,
                                     jnp.asarray(ctoks["input_ids"]))
        return {"encoder_hidden_states": embeds,
                "pooled_projections": np.asarray(pooled)}

    def prepare_latents(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        image = sample["image"] if "image" in sample else sample["video"][0]
        img = jnp.asarray(image, jnp.float32)[None].astype(self.dtype)  # [1, H, W, 3]
        return {"latents": np.asarray(self._vae(self.params["vae"], img), np.float32)}


SUPPORTED_MODEL_SPECS[("flux", "sft")] = FluxSpec
SUPPORTED_MODEL_SPECS[("flux", "lora")] = FluxSpec


class WanSpec:
    """Wan2.1 VAP model spec (reference WanModelSpecification,
    finetrainers/models/wan/base_specification.py:426+): UMT5 conditions, CLIP
    image embeds, Wan-VAE latents normalized by per-channel mean/std, 36-ch
    conditioning assembled in the loss."""

    family = "wan"

    def __init__(self, transformer_cfg, vae_cfg, text_cfg, params: Dict[str, Any],
                 tokenizer=None, clip_cfg=None, dtype=jnp.bfloat16):
        from ..models.wan.vae import normalize_latents, wan_vae_encode

        self.transformer_cfg = transformer_cfg
        self.vae_cfg = vae_cfg
        self.text_cfg = text_cfg
        self.clip_cfg = clip_cfg
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype

        def _enc(p, v):
            moments = wan_vae_encode(p, vae_cfg, v)
            mean, _ = jnp.split(moments, 2, axis=-1)
            return normalize_latents(vae_cfg, mean)

        self._vae = jax.jit(_enc)
        self._t5 = jax.jit(lambda p, ids, mask: t5_encode(p, text_cfg, ids, mask)
                           * mask[..., None].astype(jnp.float32))

    def prepare_conditions(self, sample: Dict[str, Any], max_length: int = 512) -> Dict[str, Any]:
        def encode(text: str):
            toks = self.tokenizer([text], padding="max_length", max_length=max_length,
                                  truncation=True, add_special_tokens=True, return_tensors="np")
            return np.asarray(self._t5(self.params["text_encoder"],
                                       jnp.asarray(toks["input_ids"]),
                                       jnp.asarray(toks["attention_mask"])))

        cond = {"encoder_hidden_states": encode(sample["caption"])}
        if sample.get("caption_mot_ref"):
            cond["encoder_hidden_states_mot_ref"] = np.concatenate(
                [encode(c) for c in sample["caption_mot_ref"]], axis=1)
        if self.clip_cfg is not None and "image_encoder" in self.params:
            from ..models.text_encoders.clip_vision import clip_vision_encode
            from ..pipelines.wan_i2v_mot import WanVAPPipeline

            pipe_like = WanVAPPipeline.__new__(WanVAPPipeline)
            pipe_like.clip_cfg = self.clip_cfg
            pipe_like.params = self.params
            pipe_like.dtype = self.dtype
            cond["encoder_hidden_states_image"] = np.asarray(
                pipe_like.encode_image(sample["video"][0]).astype(jnp.float32))
            if sample.get("ref_videos"):
                cond["encoder_hidden_states_image_mot_ref"] = np.concatenate(
                    [np.asarray(pipe_like.encode_image(rv[0]).astype(jnp.float32))
                     for rv in sample["ref_videos"]], axis=1)
        return cond

    def prepare_latents(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        from ..pipelines.wan_i2v_mot import make_i2v_mask

        def enc(video_np: np.ndarray) -> np.ndarray:
            v = jnp.asarray(video_np, jnp.float32)[None].astype(self.dtype)
            return np.asarray(self._vae(self.params["vae"], v), np.float32)

        video = sample["video"]
        num_frames, h, w = video.shape[:3]
        latents = enc(video)
        f_lat, lh, lw = latents.shape[1:4]
        out = {"latents": latents}
        # plain T2V finetune (in_channels == latent channels) carries no
        # mask+first-frame conditioning channels
        i2v = self.transformer_cfg.in_channels > latents.shape[-1]
        if i2v:
            mask = make_i2v_mask(1, num_frames, lh, lw)
            # conditioning latent: first frame + zero padding, VAE-encoded
            vc = np.concatenate([video[:1], np.zeros((num_frames - 1, h, w, 3), np.float32)], axis=0)
            cond_latent = enc(vc)
            out["condition"] = np.concatenate([mask.astype(np.float32), cond_latent], axis=-1)
        if not sample.get("ref_videos"):
            return out  # generic (non-VAP) sample -> plain-trunk loss path
        if not i2v:
            raise ValueError(
                "VAP (MoT) samples need the I2V conditioning channels; the "
                f"transformer config has in_channels={self.transformer_cfg.in_channels}")

        ref_lat, ref_cond = [], []
        for rv in sample["ref_videos"]:
            ref_lat.append(enc(rv))
            rvc = np.concatenate([rv[:1], np.zeros((num_frames - 1, h, w, 3), np.float32)], axis=0)
            cl = enc(rvc)
            ref_cond.append(np.concatenate([mask.astype(np.float32), cl], axis=-1))
        out["latents_mot_ref"] = np.concatenate(ref_lat, axis=1)
        out["condition_mot_ref"] = np.concatenate(ref_cond, axis=1)
        return out


def _wan_validation(spec: "WanSpec", merged_params, sample, **gen_kwargs):
    """Full Wan VAP generation with live weights (reference WanModelSpecification
    .validation, wan/base_specification.py). Returns video [F, H, W, 3]."""
    from ..pipelines.wan_i2v_mot import WanVAPPipeline

    pipe = WanVAPPipeline(
        transformer_cfg=spec.transformer_cfg, vae_cfg=spec.vae_cfg, text_cfg=spec.text_cfg,
        clip_cfg=spec.clip_cfg, params={**spec.params, "transformer": merged_params},
        tokenizer=spec.tokenizer, dtype=spec.dtype,
    )
    defaults = dict(num_inference_steps=50, guidance_scale=5.0,
                    max_sequence_length=spec.transformer_cfg.text_len)
    gen_kwargs.pop("use_dynamic_cfg", None)  # CogVideoX-only knob
    defaults.update(gen_kwargs)
    image = _validation_image(sample, defaults.get("height", 480),
                              defaults.get("width", 832))
    video = pipe(
        image=image, prompt=sample["caption"],
        ref_videos=sample.get("ref_videos"),
        prompt_mot_ref=sample.get("caption_mot_ref"),
        **defaults,
    )
    return video[0]


WanSpec.validation = _wan_validation


SUPPORTED_MODEL_SPECS[("wan", "video_as_prompt_mot")] = WanSpec
SUPPORTED_MODEL_SPECS[("wan", "sft")] = WanSpec
SUPPORTED_MODEL_SPECS[("wan", "lora")] = WanSpec
SUPPORTED_MODEL_SPECS[("wan", "dpo")] = WanSpec


# ---------------------------------------------------------------------------
# Generic-family validation: sample with live training weights through each
# family's pipeline (reference per-spec `validation` — every finetrainers
# spec supports validation-time generation, base_specification `validation`
# methods). Samples come from the trainer's validation JSON entries
# ({"caption": ..., optional height/width/num_frames/num_inference_steps/
# guidance_scale}); returns media in [-1, 1], [H, W, 3] or [F, H, W, 3].
# ---------------------------------------------------------------------------

def _flux_validation(spec: "FluxSpec", merged_params, sample, **gen_kwargs):
    from ..pipelines.flux import FluxPipeline

    pipe = FluxPipeline(
        transformer_cfg=spec.transformer_cfg, vae_cfg=spec.vae_cfg,
        text_cfg=spec.text_cfg, clip_text_cfg=spec.clip_text_cfg,
        params={**spec.params, "transformer": merged_params},
        tokenizer=spec.tokenizer, clip_tokenizer=spec.clip_tokenizer,
        dtype=spec.dtype)
    defaults = dict(num_inference_steps=28, guidance_scale=3.5)
    for k in ("num_frames", "use_dynamic_cfg", "negative_prompt"):
        gen_kwargs.pop(k, None)
    defaults.update(gen_kwargs)
    return pipe(prompt=sample["caption"], **defaults)[0]


FluxSpec.validation = _flux_validation


def _cogview4_validation(spec: "CogView4Spec", merged_params, sample, **gen_kwargs):
    from ..pipelines.cogview4 import CogView4Pipeline

    pipe = CogView4Pipeline(
        transformer_cfg=spec.transformer_cfg, vae_cfg=spec.vae_cfg,
        text_cfg=spec.text_cfg,
        params={**spec.params, "transformer": merged_params},
        tokenizer=spec.tokenizer, dtype=spec.dtype)
    defaults = dict(num_inference_steps=50, guidance_scale=3.5)
    for k in ("num_frames", "use_dynamic_cfg"):
        gen_kwargs.pop(k, None)
    defaults.update(gen_kwargs)
    return pipe(prompt=sample["caption"],
                negative_prompt=sample.get("negative_prompt", ""), **defaults)[0]


CogView4Spec.validation = _cogview4_validation


def _ltx_validation(spec: "LTXVideoSpec", merged_params, sample, **gen_kwargs):
    from ..pipelines.ltx_video import LTXVideoPipeline

    pipe = LTXVideoPipeline(
        transformer_cfg=spec.transformer_cfg, vae_cfg=spec.vae_cfg,
        text_cfg=spec.text_cfg,
        params={**spec.params, "transformer": merged_params},
        tokenizer=spec.tokenizer, dtype=spec.dtype)
    defaults = dict(num_inference_steps=50, guidance_scale=3.0)
    gen_kwargs.pop("use_dynamic_cfg", None)
    defaults.update(gen_kwargs)
    return pipe(prompt=sample["caption"],
                negative_prompt=sample.get("negative_prompt", ""), **defaults)[0]


LTXVideoSpec.validation = _ltx_validation


def _hunyuan_validation(spec: "HunyuanVideoSpec", merged_params, sample, **gen_kwargs):
    from ..pipelines.hunyuan_video import HunyuanVideoPipeline

    pipe = HunyuanVideoPipeline(
        transformer_cfg=spec.transformer_cfg, vae_cfg=spec.vae_cfg,
        text_cfg=spec.text_cfg, clip_text_cfg=spec.clip_text_cfg,
        params={**spec.params, "transformer": merged_params},
        tokenizer=spec.tokenizer, clip_tokenizer=spec.clip_tokenizer,
        dtype=spec.dtype)
    defaults = dict(num_inference_steps=50, guidance_scale=6.0)
    for k in ("use_dynamic_cfg", "negative_prompt"):
        gen_kwargs.pop(k, None)
    defaults.update(gen_kwargs)
    return pipe(prompt=sample["caption"], **defaults)[0]


HunyuanVideoSpec.validation = _hunyuan_validation
