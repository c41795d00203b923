"""Video-As-Prompt SFT training step (CogVideoX family).

Matches the reference training semantics:
  * uniform timestep sampling -> add_noise on target latents
    (finetrainers/utils/diffusion.py:95-125, cogvideox spec :604-607)
  * reference latents stay clean (reference_train_mode=None) or are noised at
    the last `num_ref_diffusion_time_sigmas` bins (reference_independent;
    trainer.py:617-670)
  * conditioning = channel-concat [noisy ‖ image latent] (32ch), analog per ref
  * pred = get_velocity(velocity, noisy, t); target = latents (spec :786-789)
  * loss = mean(1/(1-alpha_t) * (pred-target)^2) + 0.6/N * per-ref losses
    (trainer.py:700-770; utils/diffusion.py:128-141)
  * only MoT-expert params train: "_mot_ref" / effect_embeddings /
    ref_embeddings (trainer.py:146-172), expressed as a pytree mask — the
    frozen base is never differentiated (argument partitioning, not grad
    masking, so XLA drops the dead backward graph)

The step is a single pjit-able pure function; data parallel gradients are
averaged by XLA when params/batch carry shardings from vap_tpu.parallel.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.cogvideox.config import CogVideoXMOTConfig
from ..models.cogvideox.transformer_mot import cogvideox_mot_forward
from ..ops.rope import prepare_cogvideox_rotary_embeddings
from ..ops.schedulers.common import add_noise, get_velocity, make_alphas_cumprod

Array = jnp.ndarray

TRAINABLE_MARKERS = ("_mot_ref", "effect_embeddings", "ref_embeddings")

FLOW_WEIGHTING_SCHEMES = ("none", "logit_normal", "mode", "sigma_sqrt", "cosmap")


def sample_flow_sigmas(
    key: Array,
    batch_size: int,
    *,
    scheme: str = "none",
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
    mode_scale: float = 1.29,
    num_train_timesteps: int = 1000,
    shift: float = 1.0,
) -> Array:
    """Training-sigma sampling for flow-matching families.

    Matches reference prepare_sigmas + compute_density_for_timestep_sampling
    (finetrainers/utils/diffusion.py:49-127): draw a density u per scheme
    (logit_normal = sigmoid(N(mean, std)), SD3 §3.1; mode = Rafie Walker's
    mode-scale curve; otherwise uniform), index the FlowMatchEuler training
    grid sigma[i] = (N - i)/N with i = floor(u * N), then apply the scheduler
    shift sigma -> s*sigma / (1 + (s-1)*sigma).
    """
    if scheme == "logit_normal":
        u = jax.nn.sigmoid(logit_mean + logit_std * jax.random.normal(key, (batch_size,)))
    elif scheme == "mode":
        u = jax.random.uniform(key, (batch_size,))
        u = 1.0 - u - mode_scale * (jnp.cos(jnp.pi * u / 2.0) ** 2 - 1.0 + u)
    elif scheme in ("none", "sigma_sqrt", "cosmap"):
        # sigma_sqrt/cosmap re-weight the loss, not the sampling density
        u = jax.random.uniform(key, (batch_size,))
    else:
        raise ValueError(
            f"unknown flow_weighting_scheme {scheme!r}; valid: {FLOW_WEIGHTING_SCHEMES}")
    idx = jnp.clip((u * num_train_timesteps).astype(jnp.int32), 0, num_train_timesteps - 1)
    sigmas = (num_train_timesteps - idx).astype(jnp.float32) / num_train_timesteps
    if shift != 1.0:
        sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    return sigmas


def flow_loss_weights(sigmas: Array, scheme: str = "none") -> Array:
    """Per-sample loss weights (reference prepare_loss_weights ->
    diffusers compute_loss_weighting_for_sd3): sigma_sqrt = sigma^-2,
    cosmap = 2/(pi*(1 - 2*sigma + 2*sigma^2)), all other schemes = 1."""
    if scheme == "sigma_sqrt":
        return sigmas ** -2.0
    if scheme == "cosmap":
        bot = 1.0 - 2.0 * sigmas + 2.0 * sigmas ** 2
        return 2.0 / (jnp.pi * bot)
    return jnp.ones_like(sigmas)


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    model: CogVideoXMOTConfig
    reference_train_mode: Optional[str] = None   # None | "reference_independent"
    random_refer_noise: bool = False
    num_ref_diffusion_time_sigmas: int = 10
    sample_ref_videos_num: int = 1
    ref_type: str = "continous_negative"
    vae_scaling_factor: float = 1.15258426
    num_train_timesteps: int = 1000
    remat: bool = True
    # ablation: one trunk over [target ‖ refs] with concatenated RoPE, loss on
    # the target slice only (reference base_specification.py:758-784); with
    # baseline_single_condition the refs are dropped entirely
    ablation_single_branch: bool = False
    baseline_single_condition: bool = False


def _compute_dtype(params) -> Any:
    """Model compute dtype = the PARAMS' dtype (first leaf), not the batch's:
    the reference trains bf16 params under torch autocast (MixedPrecisionPolicy
    param=bf16, ptd.py:479-512); keying off the loader's dtype silently ran
    the whole DiT in fp32 whenever embeds arrived as fp32 (4.8 -> measured
    faster in bf16 on the train bench). float8 STORAGE leaves
    (--layerwise_upcasting) are never a compute dtype — skip them."""
    from .lora import _non_storage_dtype

    return _non_storage_dtype(params)


def trainable_mask(params) -> Any:
    """True for MoT-expert leaves (cf. trainer.py:146-172)."""
    def mark(path, leaf):
        names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        return any(any(m in n for m in TRAINABLE_MARKERS) for n in names)
    return jax.tree_util.tree_map_with_path(mark, params)


def partition_params(params, mask):
    train = jax.tree.map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return train, frozen


def merge_params(train, frozen):
    return jax.tree.map(
        lambda t, f: t if f is None else f, train, frozen,
        is_leaf=lambda x: x is None,
    )


def _rope_tables(cfg: CogVideoXMOTConfig, lat_h: int, lat_w: int, lat_f: int, mot_num: int, ref_type: str):
    kw = dict(
        attention_head_dim=cfg.attention_head_dim, patch_size=cfg.patch_size,
        patch_size_t=cfg.patch_size_t, sample_width=cfg.sample_width,
        sample_height=cfg.sample_height,
    )
    rope = prepare_cogvideox_rotary_embeddings(lat_h * 8, lat_w * 8, lat_f, **kw)
    rope_ref = prepare_cogvideox_rotary_embeddings(
        lat_h * 8, lat_w * 8, lat_f, mot_num=mot_num, ref_type=ref_type, **kw)
    return rope, rope_ref


def cogvideox_vap_loss(
    params: Dict[str, Any],
    cfg: TrainStepConfig,
    batch: Dict[str, Array],
    key: Array,
) -> Tuple[Array, Dict[str, Array]]:
    """batch (all latents channel layout [B, F, C, H, W], already VAE-scaled):
      latents, image_latents, latents_mot_ref [B, R*F, C, H, W],
      image_latents_mot_ref, encoder_hidden_states [B, T, Dt],
      encoder_hidden_states_mot_ref [B, R*T, Dt], optional effect_ids [R].
    """
    mcfg = cfg.model
    latents = batch["latents"].astype(jnp.float32)
    b, f_lat, c, lat_h, lat_w = latents.shape

    alphas_cumprod = jnp.asarray(make_alphas_cumprod(rescale_betas_zero_snr=True))

    k_t, k_n, k_rt, k_rn = jax.random.split(key, 4)
    timesteps = jax.random.randint(k_t, (b,), 0, cfg.num_train_timesteps)
    noise = jax.random.normal(k_n, latents.shape, jnp.float32)
    noisy_latents = add_noise(alphas_cumprod, latents, noise, timesteps)

    if "latents_mot_ref" not in batch:
        # plain (non-VAP) finetune on a generic dataset — the reference's
        # crush_smol-style sft/lora recipes train the base CogVideoX trunk
        # (T2V, or I2V when the batch carries first-frame image_latents).
        # Reference: finetrainers/models/cogvideox/base_specification.py
        # forward (no MoT), examples/training/sft/cogvideox/crush_smol_lora.
        hidden = noisy_latents
        if "image_latents" in batch:
            hidden = jnp.concatenate(
                [noisy_latents, batch["image_latents"].astype(jnp.float32)], axis=2)
        rope, _ = _rope_tables(mcfg, lat_h, lat_w, f_lat, 1, cfg.ref_type)
        dtype = _compute_dtype(params)
        velocity, _ = cogvideox_mot_forward(
            params, mcfg,
            hidden_states=hidden.astype(dtype),
            encoder_hidden_states=batch["encoder_hidden_states"],
            timestep=timesteps.astype(jnp.float32),
            image_rotary_emb=rope,
            hidden_states_mot_ref=None, encoder_hidden_states_mot_ref=None,
            image_rotary_emb_mot_ref=None, num_mot_ref=0,
            remat=cfg.remat, single_branch=True,
        )
        pred = get_velocity(alphas_cumprod, velocity.astype(jnp.float32),
                            noisy_latents, timesteps)
        weights = (1.0 / (1.0 - alphas_cumprod[timesteps])).reshape(b, 1, 1, 1, 1)
        loss = jnp.mean(weights * jnp.square(pred - latents))
        return loss, {"loss": loss, "loss_main": loss}

    latents_ref = batch["latents_mot_ref"].astype(jnp.float32)
    num_mot_ref = latents_ref.shape[1] // f_lat

    hidden = jnp.concatenate([noisy_latents, batch["image_latents"].astype(jnp.float32)], axis=2)

    # reference branch input: clean (plug-and-play mode) or noised at the last
    # num_ref_diffusion_time_sigmas timesteps (reference_independent)
    if cfg.reference_train_mode == "reference_independent":
        ref_timesteps = jax.random.randint(k_rt, (b, num_mot_ref), 0, cfg.num_ref_diffusion_time_sigmas)
        ref_noise = jax.random.normal(k_rn, latents_ref.shape, jnp.float32)
        lr_per = latents_ref.reshape(b, num_mot_ref, f_lat, c, lat_h, lat_w)
        rn_per = ref_noise.reshape(lr_per.shape)
        noisy_ref = add_noise(
            alphas_cumprod, lr_per.reshape(b * num_mot_ref, f_lat, c, lat_h, lat_w),
            rn_per.reshape(b * num_mot_ref, f_lat, c, lat_h, lat_w),
            ref_timesteps.reshape(-1),
        ).reshape(b, num_mot_ref * f_lat, c, lat_h, lat_w)
        ref_video_in = noisy_ref
    else:
        ref_timesteps = None
        ref_video_in = latents_ref
    hidden_ref = jnp.concatenate([ref_video_in, batch["image_latents_mot_ref"].astype(jnp.float32)], axis=2)

    rope, rope_ref = _rope_tables(mcfg, lat_h, lat_w, f_lat, num_mot_ref, cfg.ref_type)

    dtype = _compute_dtype(params)
    if cfg.ablation_single_branch:
        hidden_in = hidden
        rope_in = rope
        if not cfg.baseline_single_condition:
            hidden_in = jnp.concatenate([hidden, hidden_ref], axis=1)
            rope_in = (jnp.concatenate([rope[0], rope_ref[0]], axis=0),
                       jnp.concatenate([rope[1], rope_ref[1]], axis=0))
        velocity, velocity_ref = cogvideox_mot_forward(
            params, mcfg,
            hidden_states=hidden_in.astype(dtype),
            encoder_hidden_states=batch["encoder_hidden_states"],
            timestep=timesteps.astype(jnp.float32),
            image_rotary_emb=rope_in,
            hidden_states_mot_ref=hidden_ref.astype(dtype),
            encoder_hidden_states_mot_ref=batch["encoder_hidden_states_mot_ref"],
            image_rotary_emb_mot_ref=rope_ref,
            num_mot_ref=num_mot_ref,
            remat=cfg.remat,
            single_branch=True,
        )
        velocity = velocity[:, :f_lat]
    else:
        velocity, velocity_ref = cogvideox_mot_forward(
            params, mcfg,
            hidden_states=hidden.astype(dtype),
            encoder_hidden_states=batch["encoder_hidden_states"],
            timestep=timesteps.astype(jnp.float32),
            image_rotary_emb=rope,
            hidden_states_mot_ref=hidden_ref.astype(dtype),
            encoder_hidden_states_mot_ref=batch["encoder_hidden_states_mot_ref"],
            image_rotary_emb_mot_ref=rope_ref,
            num_mot_ref=num_mot_ref,
            timestep_mot_ref=(
                ref_timesteps.astype(jnp.float32)
                if (cfg.random_refer_noise and ref_timesteps is not None) else None
            ),
            effect_ids=batch.get("effect_ids"),
            remat=cfg.remat,
        )

    pred = get_velocity(alphas_cumprod, velocity.astype(jnp.float32), noisy_latents, timesteps)
    target = latents
    weights = (1.0 / (1.0 - alphas_cumprod[timesteps])).reshape(b, 1, 1, 1, 1)
    loss_main = jnp.mean(weights * jnp.square(pred - target))

    metrics = {"loss_main": loss_main}
    loss = loss_main
    if cfg.reference_train_mode == "reference_independent":
        vr = velocity_ref.reshape(b * num_mot_ref, f_lat, c, lat_h, lat_w)
        nr = ref_video_in.reshape(b * num_mot_ref, f_lat, c, lat_h, lat_w)
        pred_ref = get_velocity(alphas_cumprod, vr.astype(jnp.float32), nr, ref_timesteps.reshape(-1))
        target_ref = latents_ref.reshape(b * num_mot_ref, f_lat, c, lat_h, lat_w)
        w_ref = (1.0 / (1.0 - alphas_cumprod[ref_timesteps.reshape(-1)])).reshape(-1, 1, 1, 1, 1)
        loss_ref = jnp.mean(w_ref * jnp.square(pred_ref - target_ref)) * 0.6 / cfg.sample_ref_videos_num
        metrics["loss_ref"] = loss_ref
        loss = loss + loss_ref

    metrics["loss"] = loss
    return loss, metrics


def make_grad_and_apply(loss_fn, cfg, optimizer: optax.GradientTransformation,
                        *, partitioned: bool = False):
    """Split train step for gradient accumulation (reference
    trainer.py:712-772, 841-846: per-micro-batch backward of loss/accum, one
    optimizer step per accumulation boundary).

    grad_fn(train_params, frozen_params, batch, key) -> (grads, metrics)
    apply_fn(train_params, opt_state, grads) -> (train_params, opt_state, norm)

    apply_fn expects MEAN-over-micro-batch grads (the trainer divides the
    accumulated sum by accum_steps). Unlike the reference — which clips
    partially-accumulated grads on every micro step — clipping lives in the
    optax chain, so it runs once on the full accumulated gradient.
    """

    def grad_fn(train_params, frozen_params, batch, key):
        def f(tp):
            merged = merge_params(tp, frozen_params) if partitioned else tp
            return loss_fn(merged, cfg, batch, key)

        (_, metrics), grads = jax.value_and_grad(f, has_aux=True)(train_params)
        return grads, metrics

    def apply_fn(train_params, opt_state, grads):
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, train_params)
        return optax.apply_updates(train_params, updates), opt_state, grad_norm

    return grad_fn, apply_fn


def parse_target_modules(spec: str):
    """Map a reference-style --target_modules string (regex over torch module
    names, e.g. '(transformer_blocks|...).*(to_q|to_k|to_v|to_out.0|
    ff.net.0.proj|ff.net.2)') onto this repo's param-tree projection names.
    'none'/'' -> (); 'default' -> all attention+FFN projections."""
    from .lora import DEFAULT_TARGETS

    if spec in (None, "", "none"):
        return ()
    if spec == "default":
        return DEFAULT_TARGETS
    atoms = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v", "to_out": "to_out",
             "ff.net.0.proj": "net_0", "net_0": "net_0",
             "ff.net.2": "net_2", "net_2": "net_2"}
    found = sorted({name for pat, name in atoms.items() if pat in spec})
    if not found:
        raise ValueError(f"no recognized projection names in target_modules {spec!r}")
    return tuple(found)


def make_lora_sft_step(loss_fn, cfg, optimizer: optax.GradientTransformation, *,
                       rank: int = 64, alpha: float = 64.0, targets=None,
                       mot_only: bool = False):
    """LoRA SFT: adapters over the selected projections of a frozen base
    (reference TrainingType.LORA, sft_trainer/trainer.py:143-151, and the
    single-branch-LoRA ablation). Returns (init_fn, grad_fn, apply_fn,
    step_fn) — grad/apply split for gradient accumulation."""
    from .lora import DEFAULT_TARGETS, apply_lora, init_lora

    # None means "use defaults"; an explicit empty tuple (e.g.
    # --target_modules none) is a config error, not a request to silently
    # train every default projection.
    if targets is None:
        targets = DEFAULT_TARGETS
    elif not targets:
        raise ValueError(
            "LoRA training with no target modules: --target_modules 'none' "
            "selects nothing to train; pass 'default' or an explicit regex")

    def init_fn(params, key):
        lora = init_lora(key, params, rank=rank, targets=targets, mot_only=mot_only)
        return lora, params, optimizer.init(lora)

    def grad_fn(lora_params, base_params, batch, key):
        def wrapped(lp):
            merged = apply_lora(base_params, lp, alpha=alpha, rank=rank)
            return loss_fn(merged, cfg, batch, key)

        (loss, metrics), grads = jax.value_and_grad(wrapped, has_aux=True)(lora_params)
        return grads, metrics

    def apply_fn(lora_params, opt_state, grads):
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, lora_params)
        return optax.apply_updates(lora_params, updates), opt_state, grad_norm

    def step_fn(lora_params, base_params, opt_state, batch, key):
        grads, metrics = grad_fn(lora_params, base_params, batch, key)
        lora_params, opt_state, grad_norm = apply_fn(lora_params, opt_state, grads)
        metrics["grad_norm"] = grad_norm
        return lora_params, opt_state, metrics

    return init_fn, grad_fn, apply_fn, step_fn


def _make_sft_step(loss_fn, cfg, optimizer: optax.GradientTransformation,
                   *, partitioned: bool):
    """Shared (init_fn, step_fn) factory. partitioned=True differentiates only
    the MoT-expert leaves (trainable_mask); False is a full finetune."""
    grad_fn, apply_fn = make_grad_and_apply(loss_fn, cfg, optimizer, partitioned=partitioned)

    def init_fn(params):
        if partitioned:
            mask = trainable_mask(params)
            train, frozen = partition_params(params, mask)
        else:
            train, frozen = params, {}
        return train, frozen, optimizer.init(train)

    def step_fn(train_params, frozen_params, opt_state, batch, key):
        grads, metrics = grad_fn(train_params, frozen_params, batch, key)
        train_params, opt_state, grad_norm = apply_fn(train_params, opt_state, grads)
        metrics["grad_norm"] = grad_norm
        return train_params, opt_state, metrics

    return init_fn, step_fn


def make_train_step(cfg: TrainStepConfig, optimizer: optax.GradientTransformation):
    """CogVideoX VAP SFT step: (init_fn, step_fn).

    step_fn(train_params, frozen_params, opt_state, batch, key) ->
        (train_params, opt_state, metrics)
    Differentiates only the MoT-expert partition; wrap in jax.jit (optionally
    with NamedShardings on params/batch for multi-chip).
    """
    return _make_sft_step(cogvideox_vap_loss, cfg, optimizer, partitioned=True)


# ---------------------------------------------------------------------------
# DPO (reference trainer.py:774-825): LoRA policy vs frozen reference model,
# -logsigmoid(-0.5 * beta * (model_diff - ref_diff)) * dpo_weight over
# win/lose latent pairs stacked along batch.
# ---------------------------------------------------------------------------

def _per_sample_weighted_mse(cfg: TrainStepConfig, params, batch, key):
    """Per-sample (non-reduced) weighted v-pred loss, shared by DPO policy and
    reference passes. batch latents: [2B, ...] (win then lose)."""
    mcfg = cfg.model
    latents = batch["latents"].astype(jnp.float32)
    b, f_lat, c, lat_h, lat_w = latents.shape
    latents_ref = batch["latents_mot_ref"].astype(jnp.float32)
    num_mot_ref = latents_ref.shape[1] // f_lat

    alphas_cumprod = jnp.asarray(make_alphas_cumprod(rescale_betas_zero_snr=True))
    k_t, k_n = jax.random.split(key)
    # win/lose pairs share the timestep + noise (batch-doubling hack, spec :742)
    half = b // 2
    t_half = jax.random.randint(k_t, (half,), 0, cfg.num_train_timesteps)
    timesteps = jnp.concatenate([t_half, t_half])
    n_half = jax.random.normal(k_n, (half,) + latents.shape[1:], jnp.float32)
    noise = jnp.concatenate([n_half, n_half])
    noisy_latents = add_noise(alphas_cumprod, latents, noise, timesteps)

    hidden = jnp.concatenate([noisy_latents, batch["image_latents"].astype(jnp.float32)], axis=2)
    hidden_ref = jnp.concatenate(
        [latents_ref, batch["image_latents_mot_ref"].astype(jnp.float32)], axis=2)
    rope, rope_ref = _rope_tables(mcfg, lat_h, lat_w, f_lat, num_mot_ref, cfg.ref_type)

    dtype = _compute_dtype(params)
    velocity, _ = cogvideox_mot_forward(
        params, mcfg,
        hidden_states=hidden.astype(dtype),
        encoder_hidden_states=batch["encoder_hidden_states"],
        timestep=timesteps.astype(jnp.float32),
        image_rotary_emb=rope,
        hidden_states_mot_ref=hidden_ref.astype(dtype),
        encoder_hidden_states_mot_ref=batch["encoder_hidden_states_mot_ref"],
        image_rotary_emb_mot_ref=rope_ref,
        num_mot_ref=num_mot_ref,
        remat=cfg.remat,
    )
    pred = get_velocity(alphas_cumprod, velocity.astype(jnp.float32), noisy_latents, timesteps)
    weights = (1.0 / (1.0 - alphas_cumprod[timesteps])).reshape(b, 1, 1, 1, 1)
    per_sample = jnp.mean(weights * jnp.square(pred - latents), axis=(1, 2, 3, 4))
    return per_sample  # [2B]


def _make_dpo_step_from(per_sample_fn, cfg, optimizer, *, beta: float = 500.0,
                        lora_rank: int = 64, lora_alpha: float = 64.0):
    """DPO over win/lose pairs for any per-sample loss. Policy = frozen base +
    LoRA adapters; the frozen model itself is the DPO reference (no deepcopy
    needed — pure fns).

    step(lora_params, base_params, opt_state, batch, key) ->
        (lora_params, opt_state, metrics)
    batch latents are [2B, ...] win-then-lose; batch["dpo_weight"]: [B]."""
    from .lora import apply_lora

    def init_fn(base_params, key):
        from .lora import init_lora

        lora = init_lora(key, base_params, rank=lora_rank, mot_only=True)
        return lora, optimizer.init(lora)

    def step_fn(lora_params, base_params, opt_state, batch, key):
        ref_losses = per_sample_fn(cfg, base_params, batch, key)
        ref_w, ref_l = jnp.split(ref_losses, 2)
        ref_diff = ref_w - ref_l

        def loss_fn(lp):
            policy = apply_lora(base_params, lp, alpha=lora_alpha, rank=lora_rank)
            losses = per_sample_fn(cfg, policy, batch, key)
            lw, ll = jnp.split(losses, 2)
            model_diff = lw - ll
            inside = -0.5 * beta * (model_diff - jax.lax.stop_gradient(ref_diff))
            dpo_w = batch.get("dpo_weight", jnp.ones_like(model_diff))
            loss = jnp.mean(-jax.nn.log_sigmoid(inside) * dpo_w)
            return loss, {"loss": loss, "model_diff": jnp.mean(model_diff),
                          "ref_diff": jnp.mean(ref_diff)}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora_params)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, lora_params)
        lora_params = optax.apply_updates(lora_params, updates)
        return lora_params, opt_state, metrics

    return init_fn, step_fn


def make_dpo_step(cfg: TrainStepConfig, optimizer, *, beta: float = 500.0,
                  lora_rank: int = 64, lora_alpha: float = 64.0):
    """CogVideoX DPO (v-prediction per-sample loss)."""
    return _make_dpo_step_from(_per_sample_weighted_mse, cfg, optimizer,
                               beta=beta, lora_rank=lora_rank, lora_alpha=lora_alpha)


# ---------------------------------------------------------------------------
# Wan flow-matching VAP loss (reference WanModelSpecification.forward,
# finetrainers/models/wan/base_specification.py:745-925): latents normalized
# per-channel, x_t = (1-sigma) x0 + sigma n, target = n - x0, 36-channel
# conditioning [noisy ‖ mask ‖ cond], references clean at fixed t≈1.
# ---------------------------------------------------------------------------

def wan_vap_loss(
    params: Dict[str, Any],
    cfg,  # WanTrainStepConfig
    batch: Dict[str, Array],
    key: Array,
) -> Tuple[Array, Dict[str, Array]]:
    """batch (channel-last [B, F, H, W, C], latents already mean/std-normalized):
      latents [.,16], condition [.,20] (mask+cond), latents_mot_ref [B,R*F,..16],
      condition_mot_ref [B,R*F,..20], encoder_hidden_states [B,512,Dt],
      encoder_hidden_states_mot_ref [B,R*512,Dt], image embeds analogs."""
    from ..models.wan.transformer_mot import wan_forward, wan_mot_forward

    latents = batch["latents"].astype(jnp.float32)
    b = latents.shape[0]
    f_lat = latents.shape[1]

    k_t, k_n = jax.random.split(key)
    # density-weighted sigma sampling over the FlowMatchEuler train grid
    # (reference trainer.py:617-629 -> utils/diffusion.py prepare_sigmas);
    # the shipped Wan VAP recipe uses --flow_weighting_scheme logit_normal
    # (examples/training/sft/wan/vap_mot/train_single_node.sh:77)
    sigmas = sample_flow_sigmas(
        k_t, b, scheme=cfg.flow_weighting_scheme,
        logit_mean=cfg.flow_logit_mean, logit_std=cfg.flow_logit_std,
        mode_scale=cfg.flow_mode_scale,
        num_train_timesteps=cfg.num_train_timesteps)
    timesteps = sigmas * cfg.num_train_timesteps
    noise = jax.random.normal(k_n, latents.shape, jnp.float32)
    s = sigmas.reshape(b, 1, 1, 1, 1)
    noisy = (1.0 - s) * latents + s * noise        # flow_match_xt
    target = noise - latents                        # flow target
    loss_w = flow_loss_weights(sigmas, cfg.flow_weighting_scheme).reshape(b, 1, 1, 1, 1)

    dtype = _compute_dtype(params)
    if "latents_mot_ref" not in batch:
        # plain (non-VAP) finetune on a generic dataset — the reference's
        # wan crush_smol/3dgs recipes train the base WanTransformer3DModel;
        # T2V has no conditioning channels, I2V concatenates mask+cond
        # (finetrainers/models/wan/base_specification.py forward, no MoT)
        hidden = noisy
        if "condition" in batch:
            hidden = jnp.concatenate(
                [noisy, batch["condition"].astype(jnp.float32)], axis=-1)
        velocity = wan_forward(
            params, cfg.model,
            hidden_states=hidden.astype(dtype),
            timestep=timesteps,
            encoder_hidden_states=batch["encoder_hidden_states"],
            encoder_hidden_states_image=batch.get("encoder_hidden_states_image"),
            remat=cfg.remat,
        )
        loss = jnp.mean(loss_w * jnp.square(velocity.astype(jnp.float32) - target))
        return loss, {"loss": loss, "loss_main": loss}

    latents_ref = batch["latents_mot_ref"].astype(jnp.float32)
    num_mot_ref = latents_ref.shape[1] // f_lat

    hidden = jnp.concatenate([noisy, batch["condition"].astype(jnp.float32)], axis=-1)
    hidden_ref = jnp.concatenate(
        [latents_ref, batch["condition_mot_ref"].astype(jnp.float32)], axis=-1)
    t_ref = jnp.ones((b, num_mot_ref), jnp.float32)  # fixed near-zero timestep
    velocity, _ = wan_mot_forward(
        params, cfg.model,
        hidden_states=hidden.astype(dtype),
        timestep=timesteps,
        encoder_hidden_states=batch["encoder_hidden_states"],
        encoder_hidden_states_image=batch.get("encoder_hidden_states_image"),
        hidden_states_mot_ref=hidden_ref.astype(dtype),
        timestep_mot_ref=t_ref,
        encoder_hidden_states_mot_ref=batch["encoder_hidden_states_mot_ref"],
        encoder_hidden_states_image_mot_ref=batch.get("encoder_hidden_states_image_mot_ref"),
        num_mot_ref=num_mot_ref,
        remat=cfg.remat,
    )
    loss = jnp.mean(loss_w * jnp.square(velocity.astype(jnp.float32) - target))
    return loss, {"loss": loss, "loss_main": loss}


@dataclasses.dataclass(frozen=True)
class WanTrainStepConfig:
    model: Any  # WanMOTConfig
    num_train_timesteps: int = 1000
    flow_weighting_scheme: str = "none"
    flow_logit_mean: float = 0.0
    flow_logit_std: float = 1.0
    flow_mode_scale: float = 1.29
    remat: bool = True


def _wan_per_sample_mse(cfg: "WanTrainStepConfig", params, batch, key):
    """Per-sample (non-reduced) flow-matching loss; win/lose halves share the
    sigma + noise draw (reference DPO batch-doubling, cogvideox spec :742 —
    the Wan analog uses the same pairing)."""
    from ..models.wan.transformer_mot import wan_mot_forward

    latents = batch["latents"].astype(jnp.float32)
    b, f_lat = latents.shape[:2]
    latents_ref = batch["latents_mot_ref"].astype(jnp.float32)
    num_mot_ref = latents_ref.shape[1] // f_lat

    k_t, k_n = jax.random.split(key)
    half = b // 2
    s_half = sample_flow_sigmas(
        k_t, half, scheme=cfg.flow_weighting_scheme,
        logit_mean=cfg.flow_logit_mean, logit_std=cfg.flow_logit_std,
        mode_scale=cfg.flow_mode_scale,
        num_train_timesteps=cfg.num_train_timesteps)
    sigmas = jnp.concatenate([s_half, s_half])
    timesteps = sigmas * cfg.num_train_timesteps
    n_half = jax.random.normal(k_n, (half,) + latents.shape[1:], jnp.float32)
    noise = jnp.concatenate([n_half, n_half])
    s = sigmas.reshape(b, 1, 1, 1, 1)
    noisy = (1.0 - s) * latents + s * noise
    target = noise - latents

    hidden = jnp.concatenate([noisy, batch["condition"].astype(jnp.float32)], axis=-1)
    hidden_ref = jnp.concatenate(
        [latents_ref, batch["condition_mot_ref"].astype(jnp.float32)], axis=-1)
    dtype = _compute_dtype(params)
    t_ref = jnp.ones((b, num_mot_ref), jnp.float32)
    velocity, _ = wan_mot_forward(
        params, cfg.model,
        hidden_states=hidden.astype(dtype),
        timestep=timesteps,
        encoder_hidden_states=batch["encoder_hidden_states"],
        encoder_hidden_states_image=batch.get("encoder_hidden_states_image"),
        hidden_states_mot_ref=hidden_ref.astype(dtype),
        timestep_mot_ref=t_ref,
        encoder_hidden_states_mot_ref=batch["encoder_hidden_states_mot_ref"],
        encoder_hidden_states_image_mot_ref=batch.get("encoder_hidden_states_image_mot_ref"),
        num_mot_ref=num_mot_ref,
        remat=cfg.remat,
    )
    lw = flow_loss_weights(sigmas, cfg.flow_weighting_scheme)
    err = lw.reshape((b,) + (1,) * (latents.ndim - 1)) * jnp.square(
        velocity.astype(jnp.float32) - target)
    return jnp.mean(err, axis=tuple(range(1, err.ndim)))  # [2B]


def make_wan_dpo_step(cfg: "WanTrainStepConfig", optimizer, *, beta: float = 500.0,
                      lora_rank: int = 64, lora_alpha: float = 64.0):
    """Wan DPO (flow-matching per-sample loss)."""
    return _make_dpo_step_from(_wan_per_sample_mse, cfg, optimizer,
                               beta=beta, lora_rank=lora_rank, lora_alpha=lora_alpha)


# ---------------------------------------------------------------------------
# LTX-Video flow-matching SFT loss (reference LTXVideoModelSpecification
# .forward, finetrainers/models/ltx_video/base_specification.py:282-358):
# per-channel-normalized latents, with probability 0.1 the FIRST frame is
# noised at a smaller sigma min(u*sigma, 0.25) (image conditioning, paper
# §2.4); timesteps are broadcast per-token; target = n - x0.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LTXTrainStepConfig:
    model: Any  # LTXVideoConfig
    first_frame_conditioning_p: float = 0.1
    min_first_frame_sigma: float = 0.25
    frame_rate: float = 25.0
    temporal_compression: int = 8
    spatial_compression: int = 32
    flow_weighting_scheme: str = "none"
    flow_logit_mean: float = 0.0
    flow_logit_std: float = 1.0
    flow_mode_scale: float = 1.29
    remat: bool = True


def ltx_loss(params, cfg: "LTXTrainStepConfig", batch, key):
    """batch: latents [B, C, F, H, W] (already normalized),
    encoder_hidden_states [B, S, caption_channels], prompt_attention_mask."""
    from ..models.ltx_video.transformer import ltx_video_forward, pack_ltx_latents

    latents = batch["latents"].astype(jnp.float32)
    b, c, f, h, w = latents.shape
    k_s, k_n, k_p, k_ff = jax.random.split(key, 4)
    sigmas = sample_flow_sigmas(
        k_s, b, scheme=cfg.flow_weighting_scheme,
        logit_mean=cfg.flow_logit_mean, logit_std=cfg.flow_logit_std,
        mode_scale=cfg.flow_mode_scale)
    noise = jax.random.normal(k_n, latents.shape, jnp.float32)

    apply_ff = jax.random.uniform(k_p, ()) < cfg.first_frame_conditioning_p
    ff_sigma = jnp.minimum(jax.random.uniform(k_ff, (b,)) * sigmas,
                           cfg.min_first_frame_sigma)
    sigma_first = jnp.where(apply_ff, ff_sigma, sigmas).reshape(b, 1, 1, 1, 1)
    s = sigmas.reshape(b, 1, 1, 1, 1)
    noisy_first = (1.0 - sigma_first) * latents[:, :, :1] + sigma_first * noise[:, :, :1]
    noisy_rest = (1.0 - s) * latents[:, :, 1:] + s * noise[:, :, 1:]
    noisy = jnp.concatenate([noisy_first, noisy_rest], axis=2)

    pt, p = cfg.model.patch_size_t, cfg.model.patch_size
    packed = pack_ltx_latents(noisy, p, pt)
    seq = packed.shape[1]
    timesteps = jnp.broadcast_to((sigmas * 1000.0)[:, None], (b, seq))

    dtype = _compute_dtype(params)
    rope_scale = (cfg.temporal_compression / cfg.frame_rate,
                  float(cfg.spatial_compression), float(cfg.spatial_compression))
    pred = ltx_video_forward(
        params, cfg.model,
        hidden_states=packed.astype(dtype),
        encoder_hidden_states=batch["encoder_hidden_states"],
        timestep=timesteps,
        num_frames=f // pt, height=h // p, width=w // p,
        rope_interpolation_scale=rope_scale,
        encoder_attention_mask=batch.get("prompt_attention_mask"),
        remat=cfg.remat,
    ).astype(jnp.float32)
    target = pack_ltx_latents(noise - latents, p, pt)
    lw = flow_loss_weights(sigmas, cfg.flow_weighting_scheme).reshape(b, 1, 1)
    loss = jnp.mean(lw * jnp.square(pred - target))
    return loss, {"loss": loss}


def make_ltx_train_step(cfg: LTXTrainStepConfig, optimizer: optax.GradientTransformation):
    """Full-finetune SFT step for LTX-Video."""
    return _make_sft_step(ltx_loss, cfg, optimizer, partitioned=False)


# ---------------------------------------------------------------------------
# HunyuanVideo flow-matching SFT loss (reference HunyuanVideoModel
# Specification.forward, finetrainers/models/hunyuan_video/
# base_specification.py:310-341): scaled latents, x_t = (1-sigma) x0 +
# sigma n, guidance embedding fixed at 1.0*1000 during training,
# target = n - x0.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class HunyuanTrainStepConfig:
    model: Any  # HunyuanVideoConfig
    guidance: float = 1.0
    flow_weighting_scheme: str = "none"
    flow_logit_mean: float = 0.0
    flow_logit_std: float = 1.0
    flow_mode_scale: float = 1.29
    remat: bool = True


def hunyuan_loss(params, cfg: "HunyuanTrainStepConfig", batch, key):
    """batch: latents [B, C, F, H, W] (already scaled), encoder_hidden_states
    [B, S, text_embed_dim] (LLaMA embeds), pooled_projections [B, P],
    prompt_attention_mask [B, S]."""
    from ..models.hunyuan_video.transformer import hunyuan_video_forward

    latents = batch["latents"].astype(jnp.float32)
    b = latents.shape[0]
    k_s, k_n = jax.random.split(key)
    sigmas = sample_flow_sigmas(
        k_s, b, scheme=cfg.flow_weighting_scheme,
        logit_mean=cfg.flow_logit_mean, logit_std=cfg.flow_logit_std,
        mode_scale=cfg.flow_mode_scale)
    noise = jax.random.normal(k_n, latents.shape, jnp.float32)
    s = sigmas.reshape(b, 1, 1, 1, 1)
    noisy = (1.0 - s) * latents + s * noise

    dtype = _compute_dtype(params)
    pred = hunyuan_video_forward(
        params, cfg.model,
        hidden_states=noisy.astype(dtype),
        encoder_hidden_states=batch["encoder_hidden_states"],
        pooled_projections=batch["pooled_projections"],
        timestep=sigmas * 1000.0,
        guidance=jnp.full((b,), cfg.guidance * 1000.0, jnp.float32),
        encoder_attention_mask=batch.get("prompt_attention_mask"),
        remat=cfg.remat,
    ).astype(jnp.float32)
    target = noise - latents
    lw = flow_loss_weights(sigmas, cfg.flow_weighting_scheme).reshape(b, 1, 1, 1, 1)
    loss = jnp.mean(lw * jnp.square(pred - target))
    return loss, {"loss": loss}


def make_hunyuan_train_step(cfg: HunyuanTrainStepConfig,
                            optimizer: optax.GradientTransformation):
    """Full-finetune SFT step for HunyuanVideo."""
    return _make_sft_step(hunyuan_loss, cfg, optimizer, partitioned=False)


# ---------------------------------------------------------------------------
# CogView4 flow-matching SFT loss (reference CogView4ModelSpecification
# .forward, finetrainers/models/cogview4/base_specification.py:289-338):
# resolution-dependent sigma shift mu = sqrt(seq/256)*0.75 + 0.25,
# shifted = mu / (mu + 1/sigma - 1); latents noised at the SHIFTED sigma while
# the timestep embedding receives the UNSHIFTED sigma*1000; SDXL-style size
# conditions; target = n - x0.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CogView4TrainStepConfig:
    model: Any  # CogView4Config
    base_image_sequence_length: int = 256
    base_shift: float = 0.25
    max_shift: float = 0.75
    flow_weighting_scheme: str = "none"
    flow_logit_mean: float = 0.0
    flow_logit_std: float = 1.0
    flow_mode_scale: float = 1.29
    remat: bool = True


def cogview4_loss(params, cfg: "CogView4TrainStepConfig", batch, key):
    """batch: latents [B, C, H, W] (shift/scale-normalized),
    encoder_hidden_states [B, S, text_embed_dim], original_size/target_size/
    crop_coords [B, 2] (optional, derived from latent dims if absent)."""
    from ..models.cogview4.transformer import cogview4_forward

    latents = batch["latents"].astype(jnp.float32)
    b, c, h, w = latents.shape
    k_s, k_n = jax.random.split(key)
    sigmas = sample_flow_sigmas(
        k_s, b, scheme=cfg.flow_weighting_scheme,
        logit_mean=cfg.flow_logit_mean, logit_std=cfg.flow_logit_std,
        mode_scale=cfg.flow_mode_scale)
    noise = jax.random.normal(k_n, latents.shape, jnp.float32)

    seq = (h * w) // (cfg.model.patch_size ** 2)
    mu = (seq / cfg.base_image_sequence_length) ** 0.5 * cfg.max_shift + cfg.base_shift
    shifted = mu / (mu + (1.0 / sigmas - 1.0))
    s = shifted.reshape(b, 1, 1, 1)
    noisy = (1.0 - s) * latents + s * noise

    comp = 8  # SD-family VAE spatial compression
    default_size = jnp.broadcast_to(
        jnp.asarray([[h * comp, w * comp]], jnp.float32), (b, 2))
    dtype = _compute_dtype(params)
    pred = cogview4_forward(
        params, cfg.model,
        hidden_states=noisy.astype(dtype),
        encoder_hidden_states=batch["encoder_hidden_states"],
        timestep=sigmas * 1000.0,
        original_size=batch.get("original_size", default_size),
        target_size=batch.get("target_size", default_size),
        crop_coords=batch.get("crop_coords", jnp.zeros((b, 2), jnp.float32)),
        attention_mask=batch.get("prompt_attention_mask"),
        remat=cfg.remat,
    ).astype(jnp.float32)
    target = noise - latents
    # weights use the SHIFTED sigmas (reference base_specification.py:334-337)
    lw = flow_loss_weights(shifted, cfg.flow_weighting_scheme).reshape(b, 1, 1, 1)
    loss = jnp.mean(lw * jnp.square(pred - target))
    return loss, {"loss": loss}


def make_cogview4_train_step(cfg: CogView4TrainStepConfig,
                             optimizer: optax.GradientTransformation):
    """Full-finetune SFT step for CogView4."""
    return _make_sft_step(cogview4_loss, cfg, optimizer, partitioned=False)


# ---------------------------------------------------------------------------
# Flux flow-matching SFT loss (reference FluxModelSpecification.forward,
# finetrainers/models/flux/base_specification.py:302-365): scaled image
# latents, x_t = (1-sigma) x0 + sigma n packed 2x2, target = n - x0,
# guidance embedding fixed at 1.0 during training.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FluxTrainStepConfig:
    model: Any  # FluxConfig
    flow_weighting_scheme: str = "none"
    flow_logit_mean: float = 0.0
    flow_logit_std: float = 1.0
    flow_mode_scale: float = 1.29
    remat: bool = True


def flux_loss(params, cfg: "FluxTrainStepConfig", batch, key):
    """batch: latents [B, h, w, C] (already shift/scale-normalized),
    encoder_hidden_states [B, S, joint_dim], pooled_projections [B, P]."""
    from ..models.flux.transformer import (
        flux_forward, pack_latents, prepare_latent_image_ids, unpack_latents)

    latents = batch["latents"].astype(jnp.float32)
    b, h, w, c = latents.shape
    k_t, k_n = jax.random.split(key)
    sigmas = sample_flow_sigmas(
        k_t, b, scheme=cfg.flow_weighting_scheme,
        logit_mean=cfg.flow_logit_mean, logit_std=cfg.flow_logit_std,
        mode_scale=cfg.flow_mode_scale)
    noise = jax.random.normal(k_n, latents.shape, jnp.float32)
    s = sigmas.reshape(b, 1, 1, 1)
    noisy = (1.0 - s) * latents + s * noise

    dtype = _compute_dtype(params)
    packed = pack_latents(noisy.transpose(0, 3, 1, 2)).astype(dtype)
    img_ids = prepare_latent_image_ids(h // 2, w // 2)
    pred = flux_forward(
        params, cfg.model,
        hidden_states=packed,
        encoder_hidden_states=batch["encoder_hidden_states"],
        pooled_projections=batch["pooled_projections"],
        timestep=sigmas,
        img_ids=img_ids,
        guidance=jnp.ones((b,), jnp.float32) if cfg.model.guidance_embeds else None,
        remat=cfg.remat,
    )
    pred = unpack_latents(pred.astype(jnp.float32), h, w).transpose(0, 2, 3, 1)
    target = noise - latents
    lw = flow_loss_weights(sigmas, cfg.flow_weighting_scheme).reshape(b, 1, 1, 1)
    loss = jnp.mean(lw * jnp.square(pred - target))
    return loss, {"loss": loss}


def make_flux_train_step(cfg: FluxTrainStepConfig, optimizer: optax.GradientTransformation):
    """Full-finetune SFT step for Flux (reference trains the whole transformer
    or LoRA; LoRA composes via training/lora.py as usual)."""
    return _make_sft_step(flux_loss, cfg, optimizer, partitioned=False)


def make_wan_train_step(cfg: WanTrainStepConfig, optimizer: optax.GradientTransformation):
    """Wan variant of make_train_step (same MoT-only partitioning)."""
    return _make_sft_step(wan_vap_loss, cfg, optimizer, partitioned=True)


# family name -> (loss_fn, partitioned). Used by the trainer for dispatch and
# gradient accumulation (grad/apply split) across all six reference families.
FAMILY_LOSSES = {
    "cogvideox": (cogvideox_vap_loss, True),
    "wan": (wan_vap_loss, True),
    "ltx_video": (ltx_loss, False),
    "hunyuan_video": (hunyuan_loss, False),
    "cogview4": (cogview4_loss, False),
    "flux": (flux_loss, False),
}
