"""Pipeline-level golden parity: the jit-scanned denoise loops must reproduce
the reference torch pipelines' latent trajectories (VERDICT r2 missing #4 —
component parity existed, but CFG batching, dynamic-CFG cosine, latent prep
and frame-selection math were only verified by eyeball).

Same tiny weights on both sides via the parity-tested converters; same fake
tokenizer; the torch VAE posterior is pinned to its mode (the reference
samples it with a torch generator, which has no JAX twin — everything else
runs the reference code verbatim). Reference:
diffusers/pipelines/cogvideo/pipeline_cogvideox_image2video_mot.py:676-1092,
pipeline_wan_i2v_mot.py:527-919.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.cogvideox import CogVideoXMOTConfig
from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig
from vap_tpu.models.text_encoders import T5Config, convert_t5_state_dict

from conftest import REFERENCE_DIFFUSERS  # noqa: F401 (sys.path setup)


class PtBatch(dict):
    def __getattr__(self, k):
        return self[k]


class FakeTokenizer:
    """Deterministic char tokenizer usable by both pipelines (pt + np)."""

    model_max_length = 226

    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 add_special_tokens=True, return_attention_mask=True,
                 return_overflowing_tokens=False, return_length=False,
                 return_tensors="np"):
        if isinstance(texts, str):
            texts = [texts]
        if padding == "longest":
            max_length = max(1, max(len(t) for t in texts))
        ids = np.zeros((len(texts), max_length), np.int64)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 7 + j) % 100 + 1
        mask = (ids > 0).astype(np.int64)
        if return_tensors == "pt":
            import torch

            return PtBatch(input_ids=torch.from_numpy(ids),
                           attention_mask=torch.from_numpy(mask))
        return {"input_ids": ids.astype(np.int32), "attention_mask": mask.astype(np.int32)}

    def batch_decode(self, ids):
        return [""] * len(ids)

    # maybe_convert_prompt (textual inversion) probes these
    added_tokens_encoder = {}

    def tokenize(self, prompt):
        return list(prompt)


def _pin_vae_mode(monkeypatch):
    """Make the torch VAE encode deterministic (posterior mode)."""
    from diffusers.models.autoencoders.vae import DiagonalGaussianDistribution

    monkeypatch.setattr(DiagonalGaussianDistribution, "sample",
                        lambda self, generator=None: self.mode())


def _t5_pair(torch, d_model):
    from transformers import T5Config as HFT5Config, T5EncoderModel

    cfg = T5Config.tiny(vocab_size=128, d_model=d_model)
    torch.manual_seed(7)
    model = T5EncoderModel(HFT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv, d_ff=cfg.d_ff,
        num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False, use_cache=False,
        tie_word_embeddings=False,
    )).eval()
    params = convert_t5_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg)
    return model, params, cfg


def _cog_vae_pair(torch, cfg: CogVideoXVAEConfig):
    from diffusers.models.autoencoders.autoencoder_kl_cogvideox import (
        AutoencoderKLCogVideoX)

    from vap_tpu.models.cogvideox.vae_weights import convert_cogvideox_vae_state_dict

    torch.manual_seed(3)
    m = AutoencoderKLCogVideoX(
        block_out_channels=cfg.block_out_channels, latent_channels=cfg.latent_channels,
        layers_per_block=cfg.layers_per_block, norm_num_groups=cfg.norm_num_groups,
    ).eval()
    params = convert_cogvideox_vae_state_dict(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    return m, params


def _cog_transformer_pair(torch, cfg: CogVideoXMOTConfig):
    from diffusers.models.transformers.cogvideox_transformer_3d_mot import (
        CogVideoXTransformer3DMOTModel)

    from vap_tpu.models.cogvideox import convert_cogvideox_mot_state_dict
    from vap_tpu.models.cogvideox.weights import torch_state_dict_to_numpy

    torch.manual_seed(11)
    m = CogVideoXTransformer3DMOTModel(
        num_attention_heads=cfg.num_attention_heads,
        attention_head_dim=cfg.attention_head_dim,
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        time_embed_dim=cfg.time_embed_dim,
        text_embed_dim=cfg.text_embed_dim,
        num_layers=cfg.num_layers,
        sample_width=cfg.sample_width,
        sample_height=cfg.sample_height,
        sample_frames=cfg.sample_frames,
        patch_size=cfg.patch_size,
        patch_size_t=cfg.patch_size_t,
        max_text_seq_length=cfg.max_text_seq_length,
        use_rotary_positional_embeddings=True,
        block_idx_with_mot_ref=list(cfg.block_idx_with_mot_ref),
    ).eval()
    params = convert_cogvideox_mot_state_dict(torch_state_dict_to_numpy(m), cfg)
    return m, params


def _pil_video(rng, f, h, w):
    import PIL.Image

    arr = rng.integers(0, 256, (f, h, w, 3), dtype=np.uint8)
    return arr, [PIL.Image.fromarray(a) for a in arr]


@pytest.mark.parametrize("use_dynamic_cfg,scheduler", [
    (True, "ddim"), (False, "ddim"), (False, "dpm")])
def test_cogvideox_pipeline_latent_parity(torch_reference, monkeypatch,
                                          use_dynamic_cfg, scheduler):
    torch = torch_reference
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    _pin_vae_mode(monkeypatch)
    from diffusers.pipelines.cogvideo.pipeline_cogvideox_image2video_mot import (
        CogVideoXImageToVideoMOTPipeline)
    from diffusers.schedulers import CogVideoXDDIMScheduler as TorchDDIM

    from vap_tpu.ops.schedulers import CogVideoXDDIMScheduler
    from vap_tpu.pipelines.cogvideox_i2v_mot import CogVideoXVAPPipeline

    if scheduler == "dpm":
        # the SDE-DPM++ step draws per-step noise (torch generator vs jax key
        # have no common stream) — pin BOTH sides to zero noise and compare
        # the deterministic multistep math
        import diffusers.schedulers.scheduling_dpm_cogvideox as sched_mod

        monkeypatch.setattr(
            sched_mod, "randn_tensor",
            lambda shape, generator=None, device=None, dtype=None:
                torch.zeros(shape, device=device, dtype=dtype))
        monkeypatch.setattr(
            jax.random, "normal",
            lambda key, shape, dtype=np.float32: jnp.zeros(shape, dtype))

    t_cfg = CogVideoXMOTConfig.tiny(in_channels=8, out_channels=4)
    vae_cfg = CogVideoXVAEConfig.tiny()
    tok = FakeTokenizer()
    t5_m, t5_p, txt_cfg = _t5_pair(torch, t_cfg.text_embed_dim)
    vae_m, vae_p = _cog_vae_pair(torch, vae_cfg)
    tr_m, tr_p = _cog_transformer_pair(torch, t_cfg)

    # production CogVideoX-5B scheduler config (the torch class default is
    # timestep_spacing="leading"; the shipped checkpoint uses trailing +
    # v-prediction + zero-SNR + snr_shift 3.0, which the repo defaults mirror)
    if scheduler == "dpm":
        from diffusers.schedulers import CogVideoXDPMScheduler as TorchSched

        from vap_tpu.ops.schedulers import CogVideoXDPMScheduler

        jax_sched = CogVideoXDPMScheduler()
    else:
        TorchSched = TorchDDIM
        jax_sched = CogVideoXDDIMScheduler()
    ref_pipe = CogVideoXImageToVideoMOTPipeline(
        tokenizer=tok, text_encoder=t5_m, vae=vae_m, transformer=tr_m,
        scheduler=TorchSched(
            num_train_timesteps=jax_sched.num_train_timesteps,
            beta_start=jax_sched.beta_start, beta_end=jax_sched.beta_end,
            beta_schedule=jax_sched.beta_schedule,
            set_alpha_to_one=jax_sched.set_alpha_to_one,
            prediction_type=jax_sched.prediction_type,
            timestep_spacing=jax_sched.timestep_spacing,
            rescale_betas_zero_snr=jax_sched.rescale_betas_zero_snr,
            snr_shift_scale=jax_sched.snr_shift_scale))

    H = W = 32
    F = 9
    steps = 2
    rng = np.random.default_rng(0)
    img_arr, img_pil = _pil_video(rng, 1, H, W)
    ref_arr, ref_pil = _pil_video(rng, F, H, W)
    lat_f = (F - 1) // vae_cfg.temporal_compression_ratio + 1
    init_latents = rng.standard_normal(
        (1, lat_f, t_cfg.in_channels // 2, H // 8, W // 8)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_pipe(
            image=img_pil[0], prompt="a cat", ref_videos=[ref_pil],
            prompt_mot_ref=["explode it"], height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=6.0,
            use_dynamic_cfg=use_dynamic_cfg,
            latents=torch.from_numpy(init_latents),
            max_sequence_length=t_cfg.max_text_seq_length,
            output_type="latent", frames_selection="first",
        ).frames.numpy()

    pipe = CogVideoXVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg,
        params={"transformer": tr_p, "vae": vae_p, "text_encoder": t5_p},
        tokenizer=tok, scheduler=jax_sched, dtype=jnp.float32,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        got = pipe(
            image=(img_arr[0].astype(np.float32) / 127.5 - 1.0),
            prompt="a cat", ref_videos=[ref_arr.astype(np.float32) / 127.5 - 1.0],
            prompt_mot_ref=["explode it"], height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=6.0,
            use_dynamic_cfg=use_dynamic_cfg,
            latents=jnp.asarray(init_latents),
            max_sequence_length=t_cfg.max_text_seq_length,
            output_type="latent",
        )
    got = np.asarray(got)
    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    np.testing.assert_allclose(got, ref_out, atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# Wan MOT pipeline (reference pipeline_wan_i2v_mot.py:527-919): FlowMatch
# Euler, 36ch conditioning, fixed-t refs, CLIP image embeds; the reference
# runs CFG as two sequential forwards — the repo folds it into the batch,
# which is mathematically identical and verified here.
# ---------------------------------------------------------------------------

def _wan_pairs(torch, clip_image_size):
    from transformers import (
        CLIPVisionConfig as HFCLIPConfig, CLIPVisionModel,
        T5Config as HFT5Config, UMT5EncoderModel)
    from diffusers import AutoencoderKLWan
    from diffusers.models.transformers.transformer_wan_mot import (
        WanTransformer3DMOTModel)

    from vap_tpu.models.text_encoders.clip_vision import (
        CLIPVisionConfig, convert_clip_vision_state_dict)
    from vap_tpu.models.wan import WanMOTConfig, convert_wan_mot_state_dict
    from vap_tpu.models.wan.vae import WanVAEConfig
    from vap_tpu.models.wan.vae_weights import convert_wan_vae_state_dict

    clip_cfg = CLIPVisionConfig.tiny(image_size=clip_image_size, patch_size=16)
    vae_cfg = WanVAEConfig.tiny()
    # I2V channel layout: [noisy(z) | mask(4) | cond-latent(z)]
    t_cfg = WanMOTConfig.tiny(image_dim=clip_cfg.hidden_size, text_len=512,
                              in_channels=2 * vae_cfg.z_dim + 4,
                              out_channels=vae_cfg.z_dim)
    txt_cfg = T5Config.tiny(vocab_size=128, d_model=t_cfg.text_dim,
                            per_layer_relative_bias=True)

    torch.manual_seed(5)
    umt5 = UMT5EncoderModel(HFT5Config(
        vocab_size=txt_cfg.vocab_size, d_model=txt_cfg.d_model, d_kv=txt_cfg.d_kv,
        d_ff=txt_cfg.d_ff, num_layers=txt_cfg.num_layers, num_heads=txt_cfg.num_heads,
        relative_attention_num_buckets=txt_cfg.relative_attention_num_buckets,
        relative_attention_max_distance=txt_cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False, use_cache=False,
        tie_word_embeddings=False)).eval()
    clip = CLIPVisionModel(HFCLIPConfig(
        hidden_size=clip_cfg.hidden_size, intermediate_size=clip_cfg.intermediate_size,
        num_hidden_layers=clip_cfg.num_hidden_layers,
        num_attention_heads=clip_cfg.num_attention_heads,
        image_size=clip_cfg.image_size, patch_size=clip_cfg.patch_size,
        hidden_act=clip_cfg.hidden_act)).eval()
    vae = AutoencoderKLWan(base_dim=vae_cfg.base_dim, z_dim=vae_cfg.z_dim,
                           dim_mult=list(vae_cfg.dim_mult),
                           num_res_blocks=vae_cfg.num_res_blocks,
                           latents_mean=list(vae_cfg.latents_mean),
                           latents_std=list(vae_cfg.latents_std)).eval()
    tr = WanTransformer3DMOTModel(
        patch_size=list(t_cfg.patch_size),
        num_attention_heads=t_cfg.num_attention_heads,
        attention_head_dim=t_cfg.attention_head_dim,
        in_channels=t_cfg.in_channels, out_channels=t_cfg.out_channels,
        text_dim=t_cfg.text_dim, freq_dim=t_cfg.freq_dim, ffn_dim=t_cfg.ffn_dim,
        num_layers=t_cfg.num_layers, cross_attn_norm=t_cfg.cross_attn_norm,
        image_dim=t_cfg.image_dim, added_kv_proj_dim=t_cfg.added_kv_proj_dim,
        rope_max_seq_len=t_cfg.rope_max_seq_len,
        block_idx_with_mot_ref=list(t_cfg.block_idx_with_mot_ref)).eval()

    sd = lambda m: {k: v.numpy() for k, v in m.state_dict().items() if hasattr(v, "numpy")}
    params = {
        "transformer": convert_wan_mot_state_dict(sd(tr), t_cfg),
        "vae": convert_wan_vae_state_dict(sd(vae), vae_cfg),
        "text_encoder": convert_t5_state_dict(sd(umt5), txt_cfg),
        "image_encoder": convert_clip_vision_state_dict(sd(clip), clip_cfg),
    }
    return (umt5, clip, vae, tr), (t_cfg, vae_cfg, txt_cfg, clip_cfg), params


@pytest.mark.parametrize("sched", ["flow_match", "unipc"])
def test_wan_pipeline_latent_parity(torch_reference, monkeypatch, sched):
    torch = torch_reference
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    _pin_vae_mode(monkeypatch)
    from transformers import CLIPImageProcessor
    import diffusers.pipelines.wan.pipeline_wan_i2v_mot as wan_mod
    from diffusers.pipelines.wan.pipeline_wan_i2v_mot import (
        WanImageToVideoMOTPipeline)

    # ftfy is not installed in this image; the cleanup is identity for the
    # ASCII prompts used here (the repo pipeline applies none either)
    monkeypatch.setattr(wan_mod, "basic_clean", lambda t: t.strip())
    from diffusers.schedulers import FlowMatchEulerDiscreteScheduler
    from diffusers.schedulers import UniPCMultistepScheduler

    from vap_tpu.ops.schedulers import FlowMatchEulerScheduler, UniPCScheduler
    from vap_tpu.pipelines.wan_i2v_mot import WanVAPPipeline

    H = W = 32
    F = 9
    # UniPC is the production Wan scheduler (reference checkpoint config;
    # pipeline_wan_i2v_mot.py:146): 4 steps exercise the order-2 predictor,
    # the corrector, and the lower_order_final ramp at both ends.
    steps = 4 if sched == "unipc" else 2
    (umt5, clip, vae, tr), (t_cfg, vae_cfg, txt_cfg, clip_cfg), params = \
        _wan_pairs(torch, clip_image_size=H)
    tok = FakeTokenizer()
    proc = CLIPImageProcessor(
        do_resize=True, size={"shortest_edge": H}, do_center_crop=True,
        crop_size={"height": H, "width": W}, do_rescale=True, do_normalize=True)

    if sched == "unipc":
        ref_sched = UniPCMultistepScheduler(
            solver_order=2, prediction_type="flow_prediction",
            use_flow_sigmas=True, flow_shift=3.0)
        our_sched = UniPCScheduler(shift=3.0)
    else:
        ref_sched = FlowMatchEulerDiscreteScheduler(shift=3.0)
        our_sched = FlowMatchEulerScheduler(shift=3.0)
    ref_pipe = WanImageToVideoMOTPipeline(
        tokenizer=tok, text_encoder=umt5, image_encoder=clip, image_processor=proc,
        transformer=tr, vae=vae, scheduler=ref_sched)

    rng = np.random.default_rng(0)
    img_arr, img_pil = _pil_video(rng, 1, H, W)
    ref_arr, ref_pil = _pil_video(rng, F, H, W)
    zc = vae_cfg.z_dim
    lat_f = (F - 1) // 4 + 1
    init_latents = rng.standard_normal((1, zc, lat_f, H // 8, W // 8)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_pipe(
            image=img_pil[0], prompt="a cat", ref_videos=[ref_pil],
            prompt_mot_ref=["explode it"], height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=5.0,
            latents=torch.from_numpy(init_latents),
            max_sequence_length=512, output_type="latent",
            frames_selection="first",
        ).frames.numpy()

    pipe = WanVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg, clip_cfg=clip_cfg,
        params=params, tokenizer=tok, scheduler=our_sched, dtype=jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        got = pipe(
            image=(img_arr[0].astype(np.float32) / 127.5 - 1.0),
            prompt="a cat", ref_videos=[ref_arr.astype(np.float32) / 127.5 - 1.0],
            prompt_mot_ref=["explode it"], height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=5.0,
            latents=jnp.asarray(init_latents.transpose(0, 2, 3, 4, 1)),
            max_sequence_length=512, output_type="latent",
        )
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)  # [B,F,h,w,C] -> [B,C,F,h,w]
    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    np.testing.assert_allclose(got, ref_out, atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# Flux (reference pipelines/flux/pipeline_flux.py): distilled guidance, packed
# latents, dynamic-shift FlowMatch Euler — single forward per step.
# ---------------------------------------------------------------------------

def test_flux_pipeline_latent_parity(torch_reference, monkeypatch):
    torch = torch_reference
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    _pin_vae_mode(monkeypatch)
    from transformers import (
        CLIPTextConfig as HFCLIPTextConfig, CLIPTextModel,
        T5Config as HFT5Config, T5EncoderModel)
    from diffusers import AutoencoderKL, FluxTransformer2DModel
    from diffusers.pipelines.flux.pipeline_flux import FluxPipeline as TorchFlux
    from diffusers.schedulers import FlowMatchEulerDiscreteScheduler

    from vap_tpu.models.autoencoder_kl import (
        AutoencoderKLConfig, convert_autoencoder_kl_state_dict)
    from vap_tpu.models.flux import FluxConfig, convert_flux_state_dict
    from vap_tpu.models.text_encoders.clip_text import (
        CLIPTextConfig, convert_clip_text_state_dict)
    from vap_tpu.pipelines.flux import FluxPipeline

    vae_cfg = AutoencoderKLConfig.tiny()
    t_cfg = FluxConfig.tiny(in_channels=4 * vae_cfg.latent_channels)
    txt_cfg = T5Config.tiny(vocab_size=128, d_model=t_cfg.joint_attention_dim)
    clip_cfg = CLIPTextConfig.tiny(hidden_size=t_cfg.pooled_projection_dim,
                                   num_attention_heads=4, vocab_size=128,
                                   max_position_embeddings=77)

    torch.manual_seed(21)
    n = len(vae_cfg.block_out_channels)
    vae_m = AutoencoderKL(
        in_channels=vae_cfg.in_channels, out_channels=vae_cfg.out_channels,
        down_block_types=("DownEncoderBlock2D",) * n,
        up_block_types=("UpDecoderBlock2D",) * n,
        block_out_channels=list(vae_cfg.block_out_channels),
        layers_per_block=vae_cfg.layers_per_block,
        latent_channels=vae_cfg.latent_channels,
        norm_num_groups=vae_cfg.norm_num_groups,
        use_quant_conv=vae_cfg.use_quant_conv,
        use_post_quant_conv=vae_cfg.use_post_quant_conv,
        scaling_factor=vae_cfg.scaling_factor,
        shift_factor=vae_cfg.shift_factor,
        mid_block_add_attention=vae_cfg.mid_block_add_attention,
    ).eval()
    tr_m = FluxTransformer2DModel(
        patch_size=t_cfg.patch_size, in_channels=t_cfg.in_channels,
        num_layers=t_cfg.num_layers, num_single_layers=t_cfg.num_single_layers,
        attention_head_dim=t_cfg.attention_head_dim,
        num_attention_heads=t_cfg.num_attention_heads,
        joint_attention_dim=t_cfg.joint_attention_dim,
        pooled_projection_dim=t_cfg.pooled_projection_dim,
        guidance_embeds=t_cfg.guidance_embeds,
        axes_dims_rope=tuple(t_cfg.axes_dims_rope),
    ).eval()
    t5_m = T5EncoderModel(HFT5Config(
        vocab_size=txt_cfg.vocab_size, d_model=txt_cfg.d_model, d_kv=txt_cfg.d_kv,
        d_ff=txt_cfg.d_ff, num_layers=txt_cfg.num_layers, num_heads=txt_cfg.num_heads,
        relative_attention_num_buckets=txt_cfg.relative_attention_num_buckets,
        relative_attention_max_distance=txt_cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False, use_cache=False,
        tie_word_embeddings=False)).eval()
    clip_m = CLIPTextModel(HFCLIPTextConfig(
        hidden_size=clip_cfg.hidden_size, intermediate_size=clip_cfg.intermediate_size,
        num_hidden_layers=clip_cfg.num_hidden_layers,
        num_attention_heads=clip_cfg.num_attention_heads,
        max_position_embeddings=clip_cfg.max_position_embeddings,
        vocab_size=clip_cfg.vocab_size, hidden_act=clip_cfg.hidden_act,
        eos_token_id=clip_cfg.eos_token_id, bos_token_id=clip_cfg.eos_token_id - 1,
        pad_token_id=0)).eval()

    sd = lambda m: {k: v.numpy() for k, v in m.state_dict().items()}
    params = {
        "transformer": convert_flux_state_dict(sd(tr_m), t_cfg),
        "vae": convert_autoencoder_kl_state_dict(sd(vae_m), vae_cfg),
        "text_encoder": convert_clip_text_state_dict(sd(clip_m), clip_cfg),
        "text_encoder_2": convert_t5_state_dict(sd(t5_m), txt_cfg),
    }

    tok = FakeTokenizer()
    tok.model_max_length = 77  # FluxPipeline reads CLIP length from here
    H = W = 32
    steps = 2
    rng = np.random.default_rng(0)
    comp = vae_cfg.spatial_compression  # tiny VAE compresses 2x, not 8x
    seq = (H // (comp * 2)) * (W // (comp * 2))
    init_latents = rng.standard_normal((1, seq, t_cfg.in_channels)).astype(np.float32)

    ref_pipe = TorchFlux(
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True,
                                                  base_shift=0.5, max_shift=1.15),
        vae=vae_m, text_encoder=clip_m, tokenizer=tok,
        text_encoder_2=t5_m, tokenizer_2=tok, transformer=tr_m)
    with torch.no_grad():
        ref_out = ref_pipe(
            prompt="a cat on a mat", height=H, width=W,
            num_inference_steps=steps, guidance_scale=3.5,
            latents=torch.from_numpy(init_latents),
            max_sequence_length=64, output_type="latent",
        ).images.numpy()

    pipe = FluxPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg,
        clip_text_cfg=clip_cfg, params=params, tokenizer=tok,
        clip_tokenizer=tok, dtype=jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        got = np.asarray(pipe(
            prompt="a cat on a mat", height=H, width=W,
            num_inference_steps=steps, guidance_scale=3.5,
            latents=init_latents, max_sequence_length=64,
            output_type="latent"))
    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    np.testing.assert_allclose(got, ref_out, atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# CogView4 (reference pipelines/cogview4/pipeline_cogview4.py): penultimate
# GLM hidden states left-padded to /16, floor(linspace(1000,1,N))/1000 sigma
# base with linear dynamic shift, two sequential CFG forwards.
# ---------------------------------------------------------------------------

def test_cogview4_pipeline_latent_parity(torch_reference, monkeypatch):
    torch = torch_reference
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    _pin_vae_mode(monkeypatch)
    from transformers import GlmConfig as HFGlmConfig, GlmModel
    from diffusers import AutoencoderKL
    from diffusers.models.transformers.transformer_cogview4 import (
        CogView4Transformer2DModel)
    from diffusers.pipelines.cogview4.pipeline_cogview4 import (
        CogView4Pipeline as TorchCogView4)
    from diffusers.schedulers import FlowMatchEulerDiscreteScheduler

    from vap_tpu.models.autoencoder_kl import (
        AutoencoderKLConfig, convert_autoencoder_kl_state_dict)
    from vap_tpu.models.cogview4 import CogView4Config, convert_cogview4_state_dict
    from vap_tpu.models.text_encoders.glm import GlmConfig, convert_glm_state_dict
    from vap_tpu.pipelines.cogview4 import CogView4Pipeline

    vae_cfg = AutoencoderKLConfig.tiny(use_quant_conv=True, use_post_quant_conv=True,
                                       shift_factor=None, scaling_factor=0.5)
    t_cfg = CogView4Config.tiny(in_channels=vae_cfg.latent_channels)
    glm_cfg = GlmConfig.tiny(hidden_size=t_cfg.text_embed_dim, vocab_size=128)

    torch.manual_seed(31)
    n = len(vae_cfg.block_out_channels)
    vae_m = AutoencoderKL(
        in_channels=vae_cfg.in_channels, out_channels=vae_cfg.out_channels,
        down_block_types=("DownEncoderBlock2D",) * n,
        up_block_types=("UpDecoderBlock2D",) * n,
        block_out_channels=list(vae_cfg.block_out_channels),
        layers_per_block=vae_cfg.layers_per_block,
        latent_channels=vae_cfg.latent_channels,
        norm_num_groups=vae_cfg.norm_num_groups,
        use_quant_conv=vae_cfg.use_quant_conv,
        use_post_quant_conv=vae_cfg.use_post_quant_conv,
        scaling_factor=vae_cfg.scaling_factor,
        shift_factor=vae_cfg.shift_factor,
        mid_block_add_attention=vae_cfg.mid_block_add_attention,
    ).eval()
    tr_m = CogView4Transformer2DModel(
        patch_size=t_cfg.patch_size, in_channels=t_cfg.in_channels,
        out_channels=t_cfg.out_channels, num_layers=t_cfg.num_layers,
        attention_head_dim=t_cfg.attention_head_dim,
        num_attention_heads=t_cfg.num_attention_heads,
        text_embed_dim=t_cfg.text_embed_dim, time_embed_dim=t_cfg.time_embed_dim,
        condition_dim=t_cfg.condition_dim, rope_axes_dim=tuple(t_cfg.rope_axes_dim),
    ).eval()
    glm_m = GlmModel(HFGlmConfig(
        vocab_size=glm_cfg.vocab_size, hidden_size=glm_cfg.hidden_size,
        intermediate_size=glm_cfg.intermediate_size,
        num_hidden_layers=glm_cfg.num_hidden_layers,
        num_attention_heads=glm_cfg.num_attention_heads,
        num_key_value_heads=glm_cfg.num_key_value_heads,
        head_dim=glm_cfg.head_dim, partial_rotary_factor=glm_cfg.partial_rotary_factor,
        rms_norm_eps=glm_cfg.rms_norm_eps, rope_theta=glm_cfg.rope_theta,
        pad_token_id=0, attention_bias=True)).eval()

    sd = lambda m: {k: v.numpy() for k, v in m.state_dict().items()}
    params = {
        "transformer": convert_cogview4_state_dict(sd(tr_m), t_cfg),
        "vae": convert_autoencoder_kl_state_dict(sd(vae_m), vae_cfg),
        "text_encoder": convert_glm_state_dict(sd(glm_m), glm_cfg),
    }
    tok = FakeTokenizer()
    tok.pad_token_id = 0

    H = W = 64
    steps = 2
    rng = np.random.default_rng(0)
    comp = vae_cfg.spatial_compression
    init_latents = rng.standard_normal(
        (1, t_cfg.in_channels, H // comp, W // comp)).astype(np.float32)

    ref_pipe = TorchCogView4(
        tokenizer=tok, text_encoder=glm_m, vae=vae_m, transformer=tr_m,
        scheduler=FlowMatchEulerDiscreteScheduler(
            use_dynamic_shifting=True, time_shift_type="linear",
            base_shift=0.25, max_shift=0.75))
    with torch.no_grad():
        ref_out = ref_pipe(
            prompt="a red square", negative_prompt="blurry",
            height=H, width=W, num_inference_steps=steps, guidance_scale=3.5,
            latents=torch.from_numpy(init_latents), output_type="latent",
        ).images.numpy()

    pipe = CogView4Pipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=glm_cfg,
        params=params, tokenizer=tok, dtype=jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        got = np.asarray(pipe(
            prompt="a red square", negative_prompt="blurry",
            height=H, width=W, num_inference_steps=steps, guidance_scale=3.5,
            latents=init_latents, output_type="latent"))
    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    np.testing.assert_allclose(got, ref_out, atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# LTX-Video (reference pipelines/ltx/pipeline_ltx.py): T5-masked conditions,
# packed latents, dynamic-shift FlowMatch Euler, batched CFG.
# ---------------------------------------------------------------------------

def test_ltx_pipeline_latent_parity(torch_reference, monkeypatch):
    torch = torch_reference
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    _pin_vae_mode(monkeypatch)
    from diffusers import AutoencoderKLLTXVideo
    from diffusers.models.transformers.transformer_ltx import (
        LTXVideoTransformer3DModel)
    from diffusers.pipelines.ltx.pipeline_ltx import LTXPipeline as TorchLTX
    from diffusers.schedulers import FlowMatchEulerDiscreteScheduler

    from vap_tpu.models.ltx_video import (
        LTXVideoConfig, convert_ltx_video_state_dict)
    from vap_tpu.models.ltx_video.transformer import pack_ltx_latents
    from vap_tpu.models.ltx_video.vae import LTXVideoVAEConfig, convert_ltx_vae_state_dict
    from vap_tpu.pipelines.ltx_video import LTXVideoPipeline

    vae_cfg = LTXVideoVAEConfig.tiny()
    t_cfg = LTXVideoConfig.tiny(in_channels=vae_cfg.latent_channels,
                                out_channels=vae_cfg.latent_channels)
    txt_cfg = T5Config.tiny(vocab_size=128, d_model=t_cfg.caption_channels)
    t5_m, t5_p, txt_cfg = (lambda m, p, c: (m, p, c))(*_t5_pair(torch, t_cfg.caption_channels))

    torch.manual_seed(41)
    n = len(vae_cfg.block_out_channels)
    vae_m = AutoencoderKLLTXVideo(
        in_channels=vae_cfg.in_channels, out_channels=vae_cfg.out_channels,
        latent_channels=vae_cfg.latent_channels,
        block_out_channels=list(vae_cfg.block_out_channels),
        down_block_types=("LTXVideoDownBlock3D",) * n,
        decoder_block_out_channels=list(vae_cfg.block_out_channels),
        layers_per_block=list(vae_cfg.layers_per_block),
        decoder_layers_per_block=list(vae_cfg.layers_per_block),
        spatio_temporal_scaling=list(vae_cfg.spatio_temporal_scaling),
        decoder_spatio_temporal_scaling=list(vae_cfg.spatio_temporal_scaling),
        patch_size=vae_cfg.patch_size, patch_size_t=vae_cfg.patch_size_t,
        resnet_norm_eps=vae_cfg.resnet_norm_eps,
        encoder_causal=vae_cfg.encoder_causal, decoder_causal=vae_cfg.decoder_causal,
        scaling_factor=vae_cfg.scaling_factor, timestep_conditioning=False,
    ).eval()
    tr_m = LTXVideoTransformer3DModel(
        in_channels=t_cfg.in_channels, out_channels=t_cfg.out_channels,
        patch_size=t_cfg.patch_size, patch_size_t=t_cfg.patch_size_t,
        num_attention_heads=t_cfg.num_attention_heads,
        attention_head_dim=t_cfg.attention_head_dim,
        cross_attention_dim=t_cfg.cross_attention_dim,
        num_layers=t_cfg.num_layers, caption_channels=t_cfg.caption_channels,
    ).eval()

    sd = lambda m: {k: v.numpy() for k, v in m.state_dict().items() if hasattr(v, "numpy")}
    params = {
        "transformer": convert_ltx_video_state_dict(sd(tr_m), t_cfg),
        "vae": convert_ltx_vae_state_dict(sd(vae_m), vae_cfg),
        "text_encoder": t5_p,
    }
    tok = FakeTokenizer()

    H = W = 32
    F = 9
    steps = 2
    tc = 2 ** sum(vae_cfg.spatio_temporal_scaling)  # temporal compression
    sc = tc  # tiny config compresses equally; recompute spatial properly below
    sc = 2 ** sum(1 for _ in vae_cfg.spatio_temporal_scaling)
    lf = (F - 1) // vae_cfg.temporal_compression + 1 if hasattr(vae_cfg, "temporal_compression") else None
    # derive from the torch model's own ratios to avoid config drift
    tcr = vae_m.temporal_compression_ratio
    scr = vae_m.spatial_compression_ratio
    lf = (F - 1) // tcr + 1
    lh, lw = H // scr, W // scr
    rng = np.random.default_rng(0)
    init_unpacked = rng.standard_normal(
        (1, vae_cfg.latent_channels, lf, lh, lw)).astype(np.float32)
    init_packed = np.asarray(pack_ltx_latents(
        jnp.asarray(init_unpacked), t_cfg.patch_size, t_cfg.patch_size_t))

    ref_pipe = TorchLTX(
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True,
                                                  base_shift=0.5, max_shift=1.15),
        vae=vae_m, text_encoder=t5_m, tokenizer=tok, transformer=tr_m)
    with torch.no_grad():
        ref_out = ref_pipe(
            prompt="a cat walks", negative_prompt="blurry",
            height=H, width=W, num_frames=F, frame_rate=25,
            num_inference_steps=steps, guidance_scale=3.0,
            latents=torch.from_numpy(init_packed),
            max_sequence_length=16, output_type="latent",
        ).frames.numpy()

    pipe = LTXVideoPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg,
        params=params, tokenizer=tok, dtype=jnp.float32,
        vae_temporal_compression=tcr, vae_spatial_compression=scr)
    with jax.default_device(jax.devices("cpu")[0]):
        got = np.asarray(pipe(
            prompt="a cat walks", negative_prompt="blurry",
            height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=3.0,
            latents=init_unpacked, max_sequence_length=16,
            output_type="latent"))
    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    np.testing.assert_allclose(got, ref_out, atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# HunyuanVideo (reference pipelines/hunyuan_video/pipeline_hunyuan_video.py):
# llava-template LLaMA conditioning from hidden_states[-3] with crop_start,
# CLIP-L pooled, distilled guidance x1000, static-shift FlowMatch Euler.
# ---------------------------------------------------------------------------

def test_hunyuan_pipeline_latent_parity(torch_reference, monkeypatch):
    torch = torch_reference
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    _pin_vae_mode(monkeypatch)
    from transformers import (
        CLIPTextConfig as HFCLIPTextConfig, CLIPTextModel,
        LlamaConfig as HFLlamaConfig, LlamaModel)
    from diffusers import AutoencoderKLHunyuanVideo
    from diffusers.models.transformers.transformer_hunyuan_video import (
        HunyuanVideoTransformer3DModel)
    from diffusers.pipelines.hunyuan_video.pipeline_hunyuan_video import (
        HunyuanVideoPipeline as TorchHunyuan)
    from diffusers.schedulers import FlowMatchEulerDiscreteScheduler

    from vap_tpu.models.hunyuan_video import (
        HunyuanVideoConfig, convert_hunyuan_video_state_dict)
    from vap_tpu.models.hunyuan_video.vae import (
        HunyuanVideoVAEConfig, convert_hunyuan_vae_state_dict)
    from vap_tpu.models.text_encoders.clip_text import (
        CLIPTextConfig, convert_clip_text_state_dict)
    from vap_tpu.models.text_encoders.llama import LlamaConfig, convert_llama_state_dict
    from vap_tpu.pipelines.hunyuan_video import HunyuanVideoPipeline

    vae_cfg = HunyuanVideoVAEConfig.tiny()
    # 3 layers so hidden_states[-3] is a REAL block output (with 2 layers it
    # degenerates to the embedding lookup and the encoder goes untested)
    llama_cfg = LlamaConfig.tiny(vocab_size=128, num_hidden_layers=3)
    t_cfg = HunyuanVideoConfig.tiny(in_channels=vae_cfg.latent_channels,
                                    out_channels=vae_cfg.latent_channels,
                                    text_embed_dim=llama_cfg.hidden_size)
    clip_cfg = CLIPTextConfig.tiny(hidden_size=t_cfg.pooled_projection_dim,
                                   num_attention_heads=4, vocab_size=128,
                                   max_position_embeddings=77)

    torch.manual_seed(51)
    n = len(vae_cfg.block_out_channels)
    vae_m = AutoencoderKLHunyuanVideo(
        in_channels=vae_cfg.in_channels, out_channels=vae_cfg.out_channels,
        latent_channels=vae_cfg.latent_channels,
        down_block_types=("HunyuanVideoDownBlock3D",) * n,
        up_block_types=("HunyuanVideoUpBlock3D",) * n,
        block_out_channels=list(vae_cfg.block_out_channels),
        layers_per_block=vae_cfg.layers_per_block,
        norm_num_groups=vae_cfg.norm_num_groups,
        scaling_factor=vae_cfg.scaling_factor,
        spatial_compression_ratio=vae_cfg.spatial_compression_ratio,
        temporal_compression_ratio=vae_cfg.temporal_compression_ratio,
        mid_block_add_attention=vae_cfg.mid_block_add_attention,
    ).eval()
    tr_m = HunyuanVideoTransformer3DModel(
        in_channels=t_cfg.in_channels, out_channels=t_cfg.out_channels,
        num_attention_heads=t_cfg.num_attention_heads,
        attention_head_dim=t_cfg.attention_head_dim,
        num_layers=t_cfg.num_layers, num_single_layers=t_cfg.num_single_layers,
        num_refiner_layers=t_cfg.num_refiner_layers,
        patch_size=t_cfg.patch_size, patch_size_t=t_cfg.patch_size_t,
        guidance_embeds=t_cfg.guidance_embeds,
        text_embed_dim=t_cfg.text_embed_dim,
        pooled_projection_dim=t_cfg.pooled_projection_dim,
        rope_theta=t_cfg.rope_theta, rope_axes_dim=tuple(t_cfg.rope_axes_dim),
    ).eval()
    llama_m = LlamaModel(HFLlamaConfig(
        vocab_size=llama_cfg.vocab_size, hidden_size=llama_cfg.hidden_size,
        intermediate_size=llama_cfg.intermediate_size,
        num_hidden_layers=llama_cfg.num_hidden_layers,
        num_attention_heads=llama_cfg.num_attention_heads,
        num_key_value_heads=llama_cfg.num_key_value_heads,
        head_dim=llama_cfg.head_dim, rms_norm_eps=llama_cfg.rms_norm_eps,
        rope_theta=llama_cfg.rope_theta, attention_bias=False,
        pad_token_id=0)).eval()
    clip_m = CLIPTextModel(HFCLIPTextConfig(
        hidden_size=clip_cfg.hidden_size, intermediate_size=clip_cfg.intermediate_size,
        num_hidden_layers=clip_cfg.num_hidden_layers,
        num_attention_heads=clip_cfg.num_attention_heads,
        max_position_embeddings=clip_cfg.max_position_embeddings,
        vocab_size=clip_cfg.vocab_size, hidden_act=clip_cfg.hidden_act,
        eos_token_id=clip_cfg.eos_token_id, bos_token_id=clip_cfg.eos_token_id - 1,
        pad_token_id=0)).eval()

    sd = lambda m: {k: v.numpy() for k, v in m.state_dict().items()}
    params = {
        "transformer": convert_hunyuan_video_state_dict(sd(tr_m), t_cfg),
        "vae": convert_hunyuan_vae_state_dict(sd(vae_m), vae_cfg),
        "text_encoder": convert_llama_state_dict(sd(llama_m), llama_cfg),
        "text_encoder_2": convert_clip_text_state_dict(sd(clip_m), clip_cfg),
    }
    tok = FakeTokenizer()
    tok.model_max_length = 77

    H = W = 32
    F = 9
    steps = 2
    tcr = vae_cfg.temporal_compression_ratio
    scr = vae_cfg.spatial_compression_ratio
    lf, lh, lw = (F - 1) // tcr + 1, H // scr, W // scr
    rng = np.random.default_rng(0)
    init_latents = rng.standard_normal(
        (1, vae_cfg.latent_channels, lf, lh, lw)).astype(np.float32)

    ref_pipe = TorchHunyuan(
        text_encoder=llama_m, tokenizer=tok, transformer=tr_m, vae=vae_m,
        scheduler=FlowMatchEulerDiscreteScheduler(shift=7.0),
        text_encoder_2=clip_m, tokenizer_2=tok)
    with torch.no_grad():
        ref_out = ref_pipe(
            prompt="a cat walks on grass", height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=6.0,
            latents=torch.from_numpy(init_latents),
            max_sequence_length=64, output_type="latent",
        ).frames.numpy()

    pipe = HunyuanVideoPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=llama_cfg,
        clip_text_cfg=clip_cfg, params=params, tokenizer=tok,
        clip_tokenizer=tok, dtype=jnp.float32, flow_shift=7.0)
    with jax.default_device(jax.devices("cpu")[0]):
        got = np.asarray(pipe(
            prompt="a cat walks on grass", height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=6.0,
            latents=init_latents, max_sequence_length=64,
            output_type="latent"))
    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    np.testing.assert_allclose(got, ref_out, atol=1e-3, rtol=1e-3)


def test_cogvideox_15_pipeline_latent_parity(torch_reference, monkeypatch):
    """CogVideoX 1.5 variant: patch_size_t=2 latent-frame padding (leading
    pad discarded before decode, refs padded by repeating the last frame) and
    invert_scale_latents (image-conditioning latents stay RAW while ref-video
    latents and the decode division keep the factor) — reference
    prepare_latents :346-488, __call__ :884-893."""
    torch = torch_reference
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    _pin_vae_mode(monkeypatch)
    from diffusers.pipelines.cogvideo.pipeline_cogvideox_image2video_mot import (
        CogVideoXImageToVideoMOTPipeline)
    from diffusers.schedulers import CogVideoXDDIMScheduler as TorchDDIM

    from vap_tpu.ops.schedulers import CogVideoXDDIMScheduler
    from vap_tpu.pipelines.cogvideox_i2v_mot import CogVideoXVAPPipeline

    t_cfg = CogVideoXMOTConfig.tiny(in_channels=8, out_channels=4, patch_size_t=2)
    vae_cfg = CogVideoXVAEConfig.tiny(invert_scale_latents=True, scaling_factor=0.7)
    tok = FakeTokenizer()
    t5_m, t5_p, txt_cfg = _t5_pair(torch, t_cfg.text_embed_dim)
    vae_m, vae_p = _cog_vae_pair(torch, vae_cfg)

    from diffusers.models.transformers.cogvideox_transformer_3d_mot import (
        CogVideoXTransformer3DMOTModel)

    from vap_tpu.models.cogvideox import convert_cogvideox_mot_state_dict
    from vap_tpu.models.cogvideox.weights import torch_state_dict_to_numpy

    torch.manual_seed(12)
    tr_m = CogVideoXTransformer3DMOTModel(
        num_attention_heads=t_cfg.num_attention_heads,
        attention_head_dim=t_cfg.attention_head_dim,
        in_channels=t_cfg.in_channels, out_channels=t_cfg.out_channels,
        time_embed_dim=t_cfg.time_embed_dim, text_embed_dim=t_cfg.text_embed_dim,
        num_layers=t_cfg.num_layers, sample_width=t_cfg.sample_width,
        sample_height=t_cfg.sample_height, sample_frames=t_cfg.sample_frames,
        patch_size=t_cfg.patch_size, patch_size_t=t_cfg.patch_size_t,
        max_text_seq_length=t_cfg.max_text_seq_length,
        use_rotary_positional_embeddings=True,
        block_idx_with_mot_ref=list(t_cfg.block_idx_with_mot_ref),
    ).eval()
    tr_p = convert_cogvideox_mot_state_dict(torch_state_dict_to_numpy(tr_m), t_cfg)
    # match the reference vae config's invert flag
    vae_m.register_to_config(invert_scale_latents=True, scaling_factor=0.7)

    jax_sched = CogVideoXDDIMScheduler()
    ref_pipe = CogVideoXImageToVideoMOTPipeline(
        tokenizer=tok, text_encoder=t5_m, vae=vae_m, transformer=tr_m,
        scheduler=TorchDDIM(
            num_train_timesteps=jax_sched.num_train_timesteps,
            beta_start=jax_sched.beta_start, beta_end=jax_sched.beta_end,
            beta_schedule=jax_sched.beta_schedule,
            set_alpha_to_one=jax_sched.set_alpha_to_one,
            prediction_type=jax_sched.prediction_type,
            timestep_spacing=jax_sched.timestep_spacing,
            rescale_betas_zero_snr=jax_sched.rescale_betas_zero_snr,
            snr_shift_scale=jax_sched.snr_shift_scale))

    H = W = 32
    F = 9  # latent frames 3 -> padded to 4 (additional_frames = 1)
    steps = 2
    rng = np.random.default_rng(0)
    img_arr, img_pil = _pil_video(rng, 1, H, W)
    ref_arr, ref_pil = _pil_video(rng, F, H, W)
    init_latents = rng.standard_normal(
        (1, 4, t_cfg.in_channels // 2, H // 8, W // 8)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_pipe(
            image=img_pil[0], prompt="a cat", ref_videos=[ref_pil],
            prompt_mot_ref=["explode it"], height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=6.0, use_dynamic_cfg=True,
            latents=torch.from_numpy(init_latents),
            max_sequence_length=t_cfg.max_text_seq_length,
            output_type="latent", frames_selection="first",
        ).frames.numpy()

    pipe = CogVideoXVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg,
        params={"transformer": tr_p, "vae": vae_p, "text_encoder": t5_p},
        tokenizer=tok, scheduler=jax_sched, dtype=jnp.float32,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        got = np.asarray(pipe(
            image=(img_arr[0].astype(np.float32) / 127.5 - 1.0),
            prompt="a cat", ref_videos=[ref_arr.astype(np.float32) / 127.5 - 1.0],
            prompt_mot_ref=["explode it"], height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=6.0, use_dynamic_cfg=True,
            latents=jnp.asarray(init_latents),
            max_sequence_length=t_cfg.max_text_seq_length,
            output_type="latent"))
    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    np.testing.assert_allclose(got, ref_out, atol=1e-3, rtol=1e-3)
