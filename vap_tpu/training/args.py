"""Training flag system.

Dataclass-first equivalent of the reference's argparse monolith + per-training
-type plugins (finetrainers/args.py BaseArgs ~90 flags; VideoAsPromptMOTConfig,
trainer/sft_trainer/config.py:81-280). `parse_args()` builds the same surface
from the command line; JSON config files mirror the reference's
training.json / validation.json / model-structure config_ori.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any, Dict, List, Optional, Tuple


@dataclasses.dataclass
class TrainingArgs:
    # parallel (reference: --pp_degree/dp_degree/dp_shards/cp_degree/tp_degree)
    data_degree: int = 1
    fsdp_degree: int = 1
    seq_degree: int = 1
    tensor_degree: int = 1
    cp_rotate_method: str = "allgather"   # | ppermute (reference alltoall analog)
    #                                       | ulysses (head-scatter; no ref analog)

    # models
    model_name: str = "cogvideox"                 # cogvideox | wan
    pretrained_model_name_or_path: str = ""
    videoasprompt_mot_name_or_path: Optional[str] = None
    model_structure_config: Optional[str] = None  # JSON with block_idx_with_mot_ref etc.
    training_type: str = "video_as_prompt_mot"    # | sft | lora | dpo | control
    transformer_dtype: str = "bfloat16"
    # float8 STORAGE for the frozen base in LoRA training (reference
    # args.py:406-409 + sft_trainer/trainer.py:184-190; training/layerwise.py)
    layerwise_upcasting_modules: str = ""         # "" | "transformer"
    layerwise_upcasting_storage_dtype: str = "float8_e4m3fn"  # | float8_e5m2
    layerwise_upcasting_skip_modules_pattern: str = \
        "patch_embed,pos_embed,x_embedder,context_embedder,time_embed,^proj_in$,^proj_out$,norm"

    # dataset
    dataset_config: Optional[str] = None
    data_root: Optional[str] = None
    meta_df_name: str = "vap_data.csv"
    video_resolution_buckets: Tuple[Tuple[int, int, int], ...] = ((49, 480, 720),)
    image_resolution_buckets: Tuple[Tuple[int, int], ...] = ((512, 512),)
    id_token: Optional[str] = None           # LoRA trigger-word prefix
    remove_common_llm_caption_prefixes: bool = False
    enable_precomputation: bool = False
    precomputation_items: int = 8
    precomputation_dir: Optional[str] = None
    precomputation_once: bool = False

    # VAP MOT flags (sft_trainer/config.py:81-280)
    ref_videos_num: int = 5
    sample_ref_videos_num: int = 1
    mask_ref_ratio: float = 0.0
    mask_caption_ratio: float = 0.02
    reference_train_mode: Optional[str] = None
    random_refer_noise: bool = False
    num_ref_diffusion_time_sigmas: int = 10
    ref_type: str = "continous_negative"
    alignment_score_threshold: float = 5.0
    baseline_single_condition: Optional[str] = None
    dpo: bool = False
    rank: int = 64            # LoRA rank (lora training type)
    lora_alpha: int = 64
    target_modules: str = "default"  # "none" | regex-ish module list (reference style)
    training_dataset_kind: str = "vap_data"

    # paper ablations (reference sft_trainer/config.py:102-108; scripts under
    # examples/training/sft/cogvideox/vap_mot/ablation/)
    ablation_single_branch: bool = False
    ablation_single_encoder: bool = False
    ablation_residual_addition: bool = False
    ablation_scaling_data_num: int = 99999999

    # control training (reference trainer/control_trainer/config.py:45-196)
    control_type: str = "canny"            # canny | custom | none
    frame_conditioning_type: str = "full"  # index | prefix | random | first_and_last | full
    frame_conditioning_index: int = 0
    frame_conditioning_concatenate_mask: bool = False
    train_qk_norm: bool = False

    # training
    seed: int = 42
    batch_size: int = 1
    train_steps: int = 60000
    gradient_accumulation_steps: int = 1
    gradient_checkpointing: bool = True
    # reference utils/activation_checkpoint.py:21-47: full | ops | block_skip
    checkpointing_type: str = "full"
    checkpointing_n_layer: int = 2   # block_skip stride
    flow_weighting_scheme: str = "none"
    flow_logit_mean: float = 0.0
    flow_logit_std: float = 1.0

    # optimizer
    optimizer: str = "adamw"
    lr: float = 1e-5
    lr_scheduler: str = "constant_with_warmup"
    lr_warmup_steps: int = 1000
    beta1: float = 0.9
    beta2: float = 0.99
    weight_decay: float = 1e-4
    epsilon: float = 1e-8
    max_grad_norm: float = 1.0

    # validation / checkpointing / tracking
    validation_dataset_file: Optional[str] = None
    validation_steps: int = 500
    # Optional CLIP scoring of validation samples against their captions —
    # the reference's headline quality metric (reference README.md:73-81,
    # CLIP Score 24.13 via external VBench tooling; here in-framework, see
    # vap_tpu/eval/clip_score.py). Path to a local HF CLIPModel directory
    # (e.g. openai/clip-vit-large-patch14); None disables scoring.
    clip_score_model_path: Optional[str] = None
    # LAION improved-aesthetic-predictor .pth (with clip_score_model_path):
    # also logs validation/aesthetic_quality (vap_tpu/eval/aesthetic.py)
    aesthetic_model_path: Optional[str] = None
    # princeton-vl raft-things.pth (vap_tpu/eval/raft.py): also logs
    # validation/motion_smoothness + validation/dynamic_degree — the
    # remaining flow-based metrics of the reference's five-metric table
    raft_model_path: Optional[str] = None
    checkpointing_steps: int = 500
    checkpointing_limit: Optional[int] = 2
    resume_from_checkpoint: Optional[str] = None  # "latest" or step number
    output_dir: str = "output"
    logging_steps: int = 10
    report_to: Tuple[str, ...] = ("dummy",)
    tracker_name: str = "vap_tpu"

    # deep profiling: write a jax.profiler (XProf/TensorBoard) device trace
    # of steps [profile_start_step, profile_start_step + profile_num_steps)
    # to profile_dir. Beyond the reference, which only has wall-clock timers
    # (SURVEY §5: no torch.profiler integration). Default start skips the
    # first step's compile so the trace shows steady-state device work.
    profile_dir: Optional[str] = None
    profile_start_step: int = 2
    profile_num_steps: int = 3

    # attention ("auto" = VAP_ATTN_PROVIDER env var, else platform default:
    # Pallas flash on TPU, xla elsewhere — ops/attention.py). Accepts a bare
    # provider ("sage") or a per-site spec ("sage joint:flash cross:xla") —
    # the functional analog of the reference's per-module provider selection
    # (--attn_provider_* "module:provider", finetrainers/trainer/base.py:48-101)
    attn_provider_training: str = "auto"
    attn_provider_inference: str = "auto"

    def model_structure(self) -> Dict[str, Any]:
        if self.model_structure_config:
            with open(self.model_structure_config) as f:
                return json.load(f)
        return {}

    def validate(self):
        if self.profile_dir and (self.profile_num_steps < 1 or self.profile_start_step < 1):
            raise ValueError("profile_num_steps and profile_start_step must be >= 1")
        if self.training_type == "control":  # alias for the default control mode
            self.training_type = "control_lora"
        if self.training_type not in ("video_as_prompt_mot", "sft", "lora", "dpo",
                                      "control_lora", "control_full_finetune"):
            raise ValueError(f"unknown training_type {self.training_type}")
        if self.training_type.startswith("control"):
            from .control_trainer import CONTROL_TYPES, FRAME_CONDITIONING_TYPES

            if self.control_type not in CONTROL_TYPES:
                raise ValueError(f"unknown control_type {self.control_type!r}; valid: {CONTROL_TYPES}")
            if self.frame_conditioning_type not in FRAME_CONDITIONING_TYPES:
                raise ValueError(
                    f"unknown frame_conditioning_type {self.frame_conditioning_type!r}; "
                    f"valid: {FRAME_CONDITIONING_TYPES}")
        if self.model_name not in ("cogvideox", "wan", "ltx_video", "hunyuan_video",
                                   "cogview4", "flux"):
            raise ValueError(f"unknown model_name {self.model_name}")
        if self.reference_train_mode not in (None, "reference_independent"):
            raise ValueError(f"unknown reference_train_mode {self.reference_train_mode}")
        from .train_step import FLOW_WEIGHTING_SCHEMES

        if self.flow_weighting_scheme not in FLOW_WEIGHTING_SCHEMES:
            raise ValueError(
                f"unknown flow_weighting_scheme {self.flow_weighting_scheme!r}; "
                f"valid: {FLOW_WEIGHTING_SCHEMES}")
        if self.gradient_accumulation_steps < 1:
            raise ValueError("gradient_accumulation_steps must be >= 1")
        if self.cp_rotate_method not in ("allgather", "ppermute", "ulysses"):
            raise ValueError(
                f"unknown cp_rotate_method {self.cp_rotate_method!r}; "
                "valid: allgather, ppermute, ulysses")
        if self.ablation_scaling_data_num < 1:
            raise ValueError("ablation_scaling_data_num must be a positive integer")
        if self.checkpointing_type not in ("full", "ops", "block_skip"):
            raise ValueError(f"unknown checkpointing_type {self.checkpointing_type!r}; "
                             "valid: full, ops, block_skip")
        if self.checkpointing_n_layer < 1:
            raise ValueError("checkpointing_n_layer must be >= 1")
        for m in filter(None, self.layerwise_upcasting_modules.split(",")):
            if m != "transformer":  # reference args.py:759 (choices=["transformer"])
                raise ValueError(
                    f"unknown layerwise_upcasting module {m!r}; valid: transformer")
        from .layerwise import STORAGE_DTYPES

        if self.layerwise_upcasting_storage_dtype not in STORAGE_DTYPES:
            raise ValueError(
                f"unknown layerwise_upcasting_storage_dtype "
                f"{self.layerwise_upcasting_storage_dtype!r}; "
                f"valid: {tuple(STORAGE_DTYPES)}")
        import re as _re

        for p in filter(None, self.layerwise_upcasting_skip_modules_pattern.split(",")):
            try:
                _re.compile(p)
            except _re.error as e:
                raise ValueError(
                    f"bad regex in layerwise_upcasting_skip_modules_pattern "
                    f"{p!r}: {e}") from None

    def remat_mode(self):
        """Map the checkpointing flags onto the model forwards' remat arg."""
        if not self.gradient_checkpointing:
            return False
        if self.checkpointing_type == "block_skip":
            return f"block_skip:{self.checkpointing_n_layer}"
        return self.checkpointing_type


def parse_args(argv: Optional[List[str]] = None) -> TrainingArgs:
    parser = argparse.ArgumentParser("vap_tpu trainer")
    for f in dataclasses.fields(TrainingArgs):
        name = "--" + f.name
        if f.type in ("bool", bool) or isinstance(f.default, bool):
            # --flag / --no-flag so True defaults stay disable-able
            parser.add_argument(name, action=argparse.BooleanOptionalAction, default=f.default)
        elif f.name in ("video_resolution_buckets", "image_resolution_buckets"):
            parser.add_argument(name, type=str, default=None,
                                help="e.g. 49x480x720,49x480x832 (video) / 512x768 (image)")
        elif f.name == "report_to":
            parser.add_argument(name, type=str, default=",".join(f.default))
        else:
            typ = type(f.default) if f.default is not None else str
            parser.add_argument(name, type=typ, default=f.default)
    ns = parser.parse_args(argv)
    d = vars(ns)
    for bucket_field in ("video_resolution_buckets", "image_resolution_buckets"):
        if d.get(bucket_field):
            d[bucket_field] = tuple(
                tuple(int(x) for x in b.split("x")) for b in d[bucket_field].split(","))
        else:
            d[bucket_field] = getattr(TrainingArgs, bucket_field)
    d["report_to"] = tuple(d["report_to"].split(","))
    args = TrainingArgs(**d)
    args.validate()
    return args
