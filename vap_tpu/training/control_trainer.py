"""Control trainer: channel-concatenated control conditioning.

TPU-native counterpart of the reference ControlTrainer
(finetrainers/trainer/control_trainer/trainer.py, 1032 LoC) and the control
model specifications (finetrainers/models/{wan,cogview4}/
control_specification.py): the transformer's input projection is widened to
accept [noisy ‖ control(+mask)] channel-concatenated latents (new rows
zero-initialized so training starts at the unconditioned function), the
control signal (canny edges / copied media / custom columns) is computed
host-side by a dataset wrapper, VAE-encoded next to the target latents, and
frame-conditioning masks select which control frames survive.

Training types (reference config.py TrainingType.CONTROL_{LORA,FULL_FINETUNE}):
  * control_lora — LoRA adapters on attention/FFN projections + the widened
    input layer trained directly at full rank (the reference expresses the
    same thing as a LoRA whose rank equals the layer's out_features,
    trainer.py:148-153), optionally + QK-norm scales (--train_qk_norm);
  * control_full_finetune — every transformer parameter.

Documented deviation: with --frame_conditioning_concatenate_mask the
reference's training path concatenates a full-C-channel mask while its
validation path widens the layer by one channel (trainer.py:104 vs :865-867 —
the mask-slicing statement in data.py:274-277 is dead code, so training would
crash). We implement the evident intent: a SINGLE mask channel, consistent
between training and validation (in_channels = 2C + 1).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.logging import get_logger
from .train_step import (
    _compute_dtype,
    flow_loss_weights,
    merge_params,
    partition_params,
    sample_flow_sigmas,
)

logger = get_logger("vap_tpu.control")

Array = jnp.ndarray

FRAME_CONDITIONING_TYPES = ("index", "prefix", "random", "first_and_last", "full")
CONTROL_TYPES = ("canny", "custom", "none")


# ---------------------------------------------------------------------------
# frame conditioning (reference control_trainer/data.py:213-279) — jit-safe:
# the random draws (prefix length, random frame subset) come from the step key
# instead of host `random`, shapes stay static.
# ---------------------------------------------------------------------------

def apply_frame_conditioning_on_latents(
    control_latents: Array,          # [B, F, H, W, C] channel-last
    key: Array,
    frame_conditioning_type: str = "full",
    frame_conditioning_index: int = 0,
    concatenate_mask: bool = False,
) -> Array:
    """Zero out control frames that are NOT conditioned on; optionally append
    a single 0/1 mask channel marking the kept frames."""
    if frame_conditioning_type not in FRAME_CONDITIONING_TYPES:
        raise ValueError(
            f"unknown frame_conditioning_type {frame_conditioning_type!r}; "
            f"valid: {FRAME_CONDITIONING_TYPES}")
    b, f = control_latents.shape[:2]
    idx = jnp.arange(f)[None, :]  # [1, F]

    if frame_conditioning_type == "index":
        keep = (idx == min(frame_conditioning_index, f - 1))
        keep = jnp.broadcast_to(keep, (b, f))
    elif frame_conditioning_type == "prefix":
        n = jax.random.randint(key, (b, 1), 1, f + 1)
        keep = idx < n
    elif frame_conditioning_type == "random":
        k_n, k_s = jax.random.split(key)
        n = jax.random.randint(k_n, (b, 1), 1, f + 1)
        scores = jax.random.uniform(k_s, (b, f))
        # keep the n smallest scores -> exactly n uniformly-random frames
        ranks = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)
        keep = ranks < n
    elif frame_conditioning_type == "first_and_last":
        keep = (idx == 0) | (idx == f - 1)
        keep = jnp.broadcast_to(keep, (b, f))
    else:  # full
        keep = jnp.ones((b, f), bool)

    m = keep.astype(control_latents.dtype)[:, :, None, None, None]  # [B,F,1,1,1]
    out = control_latents * m
    if concatenate_mask:
        mask_ch = jnp.broadcast_to(m, control_latents.shape[:-1] + (1,))
        out = jnp.concatenate([out, mask_ch], axis=-1)
    return out


def control_in_channels(base_in_channels: int, concatenate_mask: bool = False) -> int:
    """in_channels of the widened input layer (reference trainer.py:104,865)."""
    return 2 * base_in_channels + (1 if concatenate_mask else 0)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class WanControlTrainStepConfig:
    model: Any  # WanMOTConfig with widened in_channels
    frame_conditioning_type: str = "full"
    frame_conditioning_index: int = 0
    frame_conditioning_concatenate_mask: bool = False
    num_train_timesteps: int = 1000
    flow_weighting_scheme: str = "none"
    flow_logit_mean: float = 0.0
    flow_logit_std: float = 1.0
    flow_mode_scale: float = 1.29
    remat: bool = True


def wan_control_loss(params, cfg: WanControlTrainStepConfig, batch, key):
    """Flow-match loss over [noisy ‖ frame-conditioned control] channel concat
    (reference WanControlModelSpecification.forward,
    control_specification.py:254-320). batch (channel-last, normalized):
    latents + control_latents [B, F, H, W, C], encoder_hidden_states."""
    from ..models.wan.transformer_mot import wan_forward

    latents = batch["latents"].astype(jnp.float32)
    b = latents.shape[0]
    k_t, k_n, k_fc = jax.random.split(key, 3)
    sigmas = sample_flow_sigmas(
        k_t, b, scheme=cfg.flow_weighting_scheme,
        logit_mean=cfg.flow_logit_mean, logit_std=cfg.flow_logit_std,
        mode_scale=cfg.flow_mode_scale,
        num_train_timesteps=cfg.num_train_timesteps)
    noise = jax.random.normal(k_n, latents.shape, jnp.float32)
    s = sigmas.reshape(b, 1, 1, 1, 1)
    noisy = (1.0 - s) * latents + s * noise
    target = noise - latents

    control = apply_frame_conditioning_on_latents(
        batch["control_latents"].astype(jnp.float32), k_fc,
        cfg.frame_conditioning_type, cfg.frame_conditioning_index,
        cfg.frame_conditioning_concatenate_mask)
    hidden = jnp.concatenate([noisy, control], axis=-1)

    dtype = _compute_dtype(params)
    pred = wan_forward(
        params, cfg.model,
        hidden_states=hidden.astype(dtype),
        timestep=sigmas * cfg.num_train_timesteps,
        encoder_hidden_states=batch["encoder_hidden_states"],
        remat=cfg.remat,
    ).astype(jnp.float32)
    lw = flow_loss_weights(sigmas, cfg.flow_weighting_scheme).reshape(b, 1, 1, 1, 1)
    loss = jnp.mean(lw * jnp.square(pred - target))
    return loss, {"loss": loss}


@dataclasses.dataclass(frozen=True)
class CogView4ControlTrainStepConfig:
    model: Any  # CogView4Config with widened in_channels
    base_image_sequence_length: int = 256
    base_shift: float = 0.25
    max_shift: float = 0.75
    flow_weighting_scheme: str = "none"
    flow_logit_mean: float = 0.0
    flow_logit_std: float = 1.0
    flow_mode_scale: float = 1.29
    remat: bool = True


def cogview4_control_loss(params, cfg: CogView4ControlTrainStepConfig, batch, key):
    """CogView4 control loss (reference models/cogview4/control_specification
    .py): the image counterpart — shifted-sigma flow matching over
    [noisy ‖ control] channel concat, no frame conditioning.
    batch: latents + control_latents [B, C, H, W]."""
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
    hidden = jnp.concatenate(
        [noisy, batch["control_latents"].astype(jnp.float32)], axis=1)

    comp = 8
    default_size = jnp.broadcast_to(jnp.asarray([[h * comp, w * comp]], jnp.float32), (b, 2))
    dtype = _compute_dtype(params)
    pred = cogview4_forward(
        params, cfg.model,
        hidden_states=hidden.astype(dtype),
        encoder_hidden_states=batch["encoder_hidden_states"],
        timestep=sigmas * 1000.0,
        original_size=batch.get("original_size", default_size),
        target_size=batch.get("target_size", default_size),
        crop_coords=batch.get("crop_coords", jnp.zeros((b, 2), jnp.float32)),
        remat=cfg.remat,
    ).astype(jnp.float32)
    target = noise - latents
    lw = flow_loss_weights(shifted, cfg.flow_weighting_scheme).reshape(b, 1, 1, 1)
    loss = jnp.mean(lw * jnp.square(pred - target))
    return loss, {"loss": loss}


CONTROL_FAMILY_LOSSES = {
    "wan": wan_control_loss,
    "cogview4": cogview4_control_loss,
}

CONTROL_INJECTION_PATH = {
    "wan": ("patch_embedding",),
    "cogview4": ("patch_embed", "proj"),
}

# LoRA target projections (reference config.py target_modules regex:
# (transformer_blocks|single_transformer_blocks).*(to_q|to_k|to_v|to_out.0|
# ff.net.0.proj|ff.net.2))
CONTROL_LORA_TARGETS = ("to_q", "to_k", "to_v", "to_out", "net_0", "net_2")


def _control_direct_mask(params, injection_path: Tuple[str, ...], train_qk_norm: bool):
    """Boolean tree marking directly-trained leaves: the widened injection
    kernel (reference trains it via a full-rank LoRA; the bias stays frozen
    like a torch LoRA leaves it) and, optionally, QK-norm scales."""
    def mark(path, leaf):
        names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        if tuple(names[: len(injection_path)]) == injection_path and names[-1] == "kernel":
            return True
        if train_qk_norm and any(
                n in ("norm_q", "norm_k", "norm_added_k") for n in names):
            return True
        return False

    return jax.tree_util.tree_map_with_path(mark, params)


def make_control_step(
    loss_fn, cfg, optimizer: optax.GradientTransformation, *,
    family: str,
    full_finetune: bool = False,
    lora_rank: int = 64,
    lora_alpha: float = 64.0,
    train_qk_norm: bool = False,
):
    """(init_fn, grad_fn, apply_fn, step_fn) for control training.

    control_lora train params: {"lora": adapter tree, "direct": injection (+QK
    norm) partition}; the frozen tree holds everything else. grad/apply are
    split so the trainer's gradient-accumulation path works unchanged."""
    from .lora import apply_lora, init_lora

    injection_path = CONTROL_INJECTION_PATH[family]

    if full_finetune:
        def init_fn(params, key):
            return params, {}, optimizer.init(params)

        def merged(tp, frozen):
            return tp
    else:
        def init_fn(params, key):
            lora = init_lora(key, params, rank=lora_rank,
                             targets=CONTROL_LORA_TARGETS, mot_only=False)
            mask = _control_direct_mask(params, injection_path, train_qk_norm)
            # The frozen tree MUST be the complement (None at direct
            # positions): merge_params keeps the frozen leaf wherever it is
            # not None, so returning the full tree here silently shadows the
            # trained partition — zero gradients through the widened
            # injection kernel, control conditioning inert.
            direct, rest = partition_params(params, mask)
            train = {"lora": lora, "direct": direct}
            return train, rest, optimizer.init(train)

        def merged(tp, frozen):
            base = merge_params(tp["direct"], frozen)
            return apply_lora(base, tp["lora"], alpha=lora_alpha, rank=lora_rank)

    def grad_fn(train_params, frozen_params, batch, key):
        def wrapped(tp):
            return loss_fn(merged(tp, frozen_params), cfg, batch, key)

        (loss, metrics), grads = jax.value_and_grad(wrapped, has_aux=True)(train_params)
        return grads, metrics

    def apply_fn(train_params, opt_state, grads):
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, train_params)
        return optax.apply_updates(train_params, updates), opt_state, grad_norm

    def step_fn(train_params, frozen_params, opt_state, batch, key):
        grads, metrics = grad_fn(train_params, frozen_params, batch, key)
        train_params, opt_state, grad_norm = apply_fn(train_params, opt_state, grads)
        metrics["grad_norm"] = grad_norm
        return train_params, opt_state, metrics

    return init_fn, grad_fn, apply_fn, step_fn


def merge_control_params(train_params, frozen_params, *, full_finetune: bool,
                         lora_alpha: float, lora_rank: int):
    """Fold trained control params back into a full tree (for validation and
    export)."""
    from .lora import apply_lora

    if full_finetune:
        return train_params
    base = merge_params(train_params["direct"], frozen_params)
    return apply_lora(base, train_params["lora"], alpha=lora_alpha, rank=lora_rank)


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

from .trainer import SFTTrainer


class ControlTrainer(SFTTrainer):
    """Orchestration loop for control training — reuses the SFT loop (data,
    precompute, checkpoints, validation cadence, export scaffolding) with
    control-specific dataset wrapping, step construction and sampling."""

    def _build_step(self, params):
        args = self.args
        if self.family not in CONTROL_FAMILY_LOSSES:
            raise ValueError(
                f"control training supports {sorted(CONTROL_FAMILY_LOSSES)}, "
                f"got {self.family!r} (reference has control specifications "
                "for wan and cogview4 only)")
        self.full_finetune = args.training_type == "control_full_finetune"
        loss_fn = CONTROL_FAMILY_LOSSES[self.family]
        self.step_cfg = _make_control_step_cfg(self.family, args, self.spec.transformer_cfg)
        init_fn, grad_fn, apply_fn, step_fn = make_control_step(
            loss_fn, self.step_cfg, self.optimizer,
            family=self.family,
            full_finetune=self.full_finetune,
            lora_rank=args.rank, lora_alpha=float(args.lora_alpha),
            train_qk_norm=args.train_qk_norm)
        self.train_params, self.frozen_params, self.opt_state = init_fn(
            params, jax.random.PRNGKey(args.seed))
        self._step = jax.jit(step_fn)
        if self.accum_steps > 1:
            self._install_accum(grad_fn, apply_fn)

    def _prepare_dataset(self):
        from ..data.generic import (
            ControlDatasetWrapper,
            DatasetPreprocessingWrapper,
            initialize_dataset,
        )
        from ..data.dataloader import PrefetchingDataLoader

        args = self.args
        shard_index = jax.process_index()
        num_shards = max(jax.process_count(), 1)
        if args.dataset_config:
            from ..data.config import build_datasets_from_config

            dataset = build_datasets_from_config(
                args.dataset_config, args, family=self.family,
                shard_index=shard_index, num_shards=num_shards)
        else:
            dataset_type = "image" if self.family in ("cogview4", "flux") else "video"
            dataset = initialize_dataset(args.data_root, dataset_type, infinite=True)
            if num_shards > 1 and hasattr(dataset, "_items"):
                dataset._items = dataset._items[shard_index::num_shards]
            dataset = DatasetPreprocessingWrapper(
                dataset, id_token=args.id_token,
                remove_common_llm_caption_prefixes=args.remove_common_llm_caption_prefixes)
        dataset = ControlDatasetWrapper(dataset, args.control_type)
        return PrefetchingDataLoader(dataset, prefetch=4)

    def _preprocess(self, sample):
        from ..data.video import resize_to_nearest_bucket, resize_to_nearest_bucket_image

        if "image" in sample and "video" not in sample:
            buckets = sample.get("_image_resolution_buckets",
                                 self.args.image_resolution_buckets)
            sample = dict(sample, image=resize_to_nearest_bucket_image(
                sample["image"], buckets))
            if "control_image" in sample:
                sample["control_image"] = resize_to_nearest_bucket_image(
                    sample["control_image"], buckets)
        else:
            buckets = sample.get("_resolution_buckets",
                                 self.args.video_resolution_buckets)
            fsel = sample.get("_frames_selection", "evenly")
            video, _ = resize_to_nearest_bucket(sample["video"], buckets, fsel)
            sample = dict(sample, video=video)
            if "control_video" in sample:
                cv, _ = resize_to_nearest_bucket(
                    sample["control_video"], buckets, fsel)
                sample["control_video"] = cv
        with self.tracker.timed("timing/prepare_conditions"):
            cond = self.spec.prepare_conditions(sample)
        with self.tracker.timed("timing/prepare_latents"):
            lat = self.spec.prepare_latents(sample)
        return cond, lat

    def _merged_params(self):
        return merge_control_params(
            self.train_params, self.frozen_params,
            full_finetune=self.full_finetune,
            lora_alpha=float(self.args.lora_alpha), lora_rank=self.args.rank)

    def _validate(self, key, num_samples: Optional[int] = None):
        """Control validation: sample with live weights from the
        validation dataset's control columns (reference control trainer
        _validate + control_specification.validation)."""
        args = self.args
        if not args.validation_dataset_file:
            return
        if args.enable_precomputation:
            self._load_encoders()
        merged = self._merged_params()
        import json

        with open(args.validation_dataset_file) as f:
            val = json.load(f)
        data = val.get("data", []) if isinstance(val, dict) else val
        if num_samples is not None:
            data = data[:num_samples]
        out_dir = os.path.join(args.output_dir, "validation", f"{self.train_state.step:06d}")
        os.makedirs(out_dir, exist_ok=True)
        artifacts = {}
        for i, sample in enumerate(data):
            with self._attn_ctx(training=False):
                media = self.spec.validation(
                    merged, sample,
                    num_inference_steps=sample.get("num_inference_steps", 30),
                    seed=args.seed)
            from ..data.video import export_to_video

            if media.ndim == 3:  # image
                media = media[None]
            path = os.path.join(out_dir, f"sample_{i}.mp4")
            export_to_video((np.asarray(media) + 1.0) / 2.0, path, fps=16)
            artifacts[f"validation/sample_{i}"] = path
        self.tracker.log_artifacts(artifacts, step=self.train_state.step)

    def export(self, path=None) -> str:
        """Control export (reference _save_lora_weights, control_
        specification.py:390-427): LoRA adapters in PEFT layout + the
        widened injection layer (and QK norms when trained) as a separate
        norm-layer state dict; full finetunes export the merged tree."""
        from .checkpoint import export_lora_safetensors, export_safetensors

        out_dir = path or os.path.join(
            self.args.output_dir, "model_weights", f"{self.train_state.step:06d}")
        if self.full_finetune:
            return export_safetensors(
                self._merged_params(), self.spec.transformer_cfg,
                os.path.join(out_dir, "model.safetensors"))
        lora_path = export_lora_safetensors(
            self.train_params["lora"], self.spec.transformer_cfg,
            os.path.join(out_dir, "pytorch_lora_weights.safetensors"),
            rank=self.args.rank, alpha=float(self.args.lora_alpha))
        from safetensors.numpy import save_file

        direct_flat = {}
        for p, leaf in jax.tree_util.tree_flatten_with_path(
                self.train_params["direct"])[0]:
            names = [str(getattr(k, "key", getattr(k, "name", k))) for k in p]
            arr = np.asarray(leaf)
            if names[-1] == "kernel":
                arr = arr.T  # torch [out, in]
            direct_flat["transformer." + ".".join(names)] = arr
        save_file(direct_flat, os.path.join(out_dir, "control_injection_layers.safetensors"))
        return lora_path


def _make_control_step_cfg(family: str, args, transformer_cfg):
    flow_kw = dict(
        flow_weighting_scheme=args.flow_weighting_scheme,
        flow_logit_mean=args.flow_logit_mean,
        flow_logit_std=args.flow_logit_std,
    )
    if family == "wan":
        return WanControlTrainStepConfig(
            model=transformer_cfg,
            frame_conditioning_type=args.frame_conditioning_type,
            frame_conditioning_index=args.frame_conditioning_index,
            frame_conditioning_concatenate_mask=args.frame_conditioning_concatenate_mask,
            remat=args.remat_mode(), **flow_kw)
    return CogView4ControlTrainStepConfig(
        model=transformer_cfg, remat=args.remat_mode(), **flow_kw)
