"""Video-As-Prompt SFT trainer — the training orchestration loop.

TPU-native counterpart of the reference SFTTrainer
(finetrainers/trainer/sft_trainer/trainer.py): mesh setup, MoT-only
trainability, host data pipeline (decode -> bucket -> T5/VAE precompute ->
collate), one pjit-compiled train step, metric tracking, orbax
checkpoint/resume, periodic validation sampling, safetensors export.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataloader import PrefetchingDataLoader
from ..data.dataset import VideoAsPromptDataset, VideoAsPromptValidationDataset
from ..data.video import export_to_video
from ..data.sampler import ResolutionSampler, collate_tensor_dicts
from ..data.video import resize_to_nearest_bucket
import contextlib

from ..ops.attention import attention_provider
from ..parallel import MeshConfig, make_mesh, put_batch, shard_params
from ..utils.logging import get_logger
from ..utils.trackers import initialize_trackers
from .args import TrainingArgs
from .checkpoint import Checkpointer, TrainState, export_safetensors
from .optimizer import get_lr_schedule, get_optimizer
from .train_step import (
    FAMILY_LOSSES,
    TrainStepConfig,
    WanTrainStepConfig,
    make_dpo_step,
    make_grad_and_apply,
    make_train_step,
    make_wan_dpo_step,
    make_wan_train_step,
)

logger = get_logger("vap_tpu.trainer")


def _make_step_config(family: str, args: TrainingArgs, transformer_cfg):
    """Per-family train-step config (reference per-family ModelSpecification
    .forward kwargs). Flow-matching families take the flow_weighting_scheme
    flags; CogVideoX trains under DDIM where the reference supports uniform
    timestep sampling only (utils/diffusion.py:121), so the flags are a no-op
    there — exactly as in the reference."""
    flow_kw = dict(
        flow_weighting_scheme=args.flow_weighting_scheme,
        flow_logit_mean=args.flow_logit_mean,
        flow_logit_std=args.flow_logit_std,
    )
    remat = args.remat_mode()
    if family == "wan":
        return WanTrainStepConfig(model=transformer_cfg, remat=remat, **flow_kw)
    if family == "cogvideox":
        return TrainStepConfig(
            model=transformer_cfg,
            reference_train_mode=args.reference_train_mode,
            random_refer_noise=args.random_refer_noise,
            num_ref_diffusion_time_sigmas=args.num_ref_diffusion_time_sigmas,
            sample_ref_videos_num=args.sample_ref_videos_num,
            ref_type=args.ref_type,
            remat=remat,
            ablation_single_branch=args.ablation_single_branch,
            baseline_single_condition=bool(args.baseline_single_condition),
        )
    from .train_step import (
        CogView4TrainStepConfig,
        FluxTrainStepConfig,
        HunyuanTrainStepConfig,
        LTXTrainStepConfig,
    )

    cfg_cls = {
        "ltx_video": LTXTrainStepConfig,
        "hunyuan_video": HunyuanTrainStepConfig,
        "cogview4": CogView4TrainStepConfig,
        "flux": FluxTrainStepConfig,
    }.get(family)
    if cfg_cls is None:
        raise ValueError(f"unknown model family {family!r}")
    return cfg_cls(model=transformer_cfg, remat=remat, **flow_kw)


def local_batch_size(args: TrainingArgs, process_count: int = 1) -> int:
    """batch_size is PER data-parallel rank, like the reference's per-process
    batch under torchrun: the batch dim shards over (data, fsdp) — FSDP is
    ZeRO-style data parallelism — so each process assembles its share of
    batch_size x (data*fsdp) samples. Recipes pass --batch_size 1 on an
    8-chip mesh; a global batch of 1 cannot shard over 8 devices."""
    batch_shards = max(args.data_degree, 1) * max(args.fsdp_degree, 1)
    return args.batch_size * max(batch_shards // max(process_count, 1), 1)


def _match_template_sharding(tree, template, mesh=None):
    """Re-place restored leaves so a multi-process jit accepts them.

    Orbax restores template-less leaves (optax counters, scalars) COMMITTED
    to local device 0; a jit whose other arguments live on the global mesh
    then fails with "incompatible devices". Fresh-init templates don't hit
    this because their single-device leaves are uncommitted (default-device
    placement), which jit auto-places — so the template's own sharding is
    not a usable target either. Rule: leaves whose template spans the mesh
    keep the template's sharding; single-device/host leaves are rebuilt
    REPLICATED over the mesh (restored values are process-identical, so
    every process can supply its addressable shards from its local copy)."""
    from jax.sharding import NamedSharding, PartitionSpec

    def fix(x, t):
        if not isinstance(t, jax.Array) or not hasattr(t, "sharding"):
            return x
        target = t.sharding
        if mesh is not None and len(target.device_set) == 1:
            target = NamedSharding(mesh, PartitionSpec())
        if isinstance(x, jax.Array) and x.sharding == target:
            return x
        host = np.asarray(x)
        return jax.make_array_from_callback(host.shape, target,
                                            lambda idx: host[idx])

    return jax.tree.map(fix, tree, template)


class SFTTrainer:
    def __init__(self, args: TrainingArgs, model_spec):
        self.args = args
        self.spec = model_spec
        self.tracker = initialize_trackers(args.report_to, args.tracker_name, args.output_dir)

        mesh_cfg = MeshConfig(args.data_degree, args.fsdp_degree, args.seq_degree, args.tensor_degree)
        if mesh_cfg.world_size > 1:
            devices = jax.devices()
            if len(devices) < mesh_cfg.world_size:
                devices = jax.devices("cpu")  # virtual-device testing
            self.mesh = make_mesh(mesh_cfg, devices)
        else:
            self.mesh = None

        family = getattr(model_spec, "family", "cogvideox")
        self.family = family
        self.step_cfg = _make_step_config(family, args, model_spec.transformer_cfg)
        schedule = get_lr_schedule(
            args.lr_scheduler, args.lr, warmup_steps=args.lr_warmup_steps, train_steps=args.train_steps)
        self.optimizer = get_optimizer(
            args.optimizer, schedule, beta1=args.beta1, beta2=args.beta2,
            epsilon=args.epsilon, weight_decay=args.weight_decay, max_grad_norm=args.max_grad_norm)

        self.dpo = bool(args.dpo or args.training_type == "dpo")
        self.accum_steps = max(args.gradient_accumulation_steps, 1)
        if self.dpo and self.accum_steps > 1:
            raise ValueError("gradient accumulation is not supported with DPO "
                             "(reference DPO recipes run with accumulation=1)")
        params = model_spec.params["transformer"]
        if self.mesh is not None:
            params = shard_params(params, self.mesh)
        self._build_step(params)

        self.train_state = TrainState()
        self.checkpointer = Checkpointer(
            os.path.join(args.output_dir, "checkpoints"), args.checkpointing_limit)
        # CLIP scoring of validation samples (--clip_score_model_path); tests
        # may inject a pre-built vap_tpu.eval.CLIPScorer here directly.
        self.clip_scorer = None
        # flow-based metrics of validation samples (--raft_model_path); tests
        # may inject a pre-built vap_tpu.eval.FlowMetrics here directly.
        self.flow_metrics = None

    def _get_clip_scorer(self):
        if self.clip_scorer is None and self.args.clip_score_model_path:
            from ..eval import CLIPScorer

            self.clip_scorer = CLIPScorer.from_pretrained(
                self.args.clip_score_model_path,
                self.args.aesthetic_model_path)
        return self.clip_scorer

    def _get_flow_metrics(self):
        if self.flow_metrics is None and getattr(self.args, "raft_model_path", None):
            from ..eval import FlowMetrics

            self.flow_metrics = FlowMetrics.from_pretrained(
                self.args.raft_model_path)
        return self.flow_metrics

    def _build_step(self, params):
        """Construct (train_params, frozen_params, opt_state, _step) for this
        training type; subclasses (ControlTrainer) override."""
        args = self.args
        family = self.family
        loss_fn, partitioned = FAMILY_LOSSES[family]
        if args.ablation_single_branch:
            # single-trunk ablation: no MoT partition exists; train the full
            # tree (target_modules == "none") or LoRA adapters (reference
            # sft_trainer/trainer.py:140-151)
            partitioned = False
        self.lora_mode = (args.training_type == "lora"
                          or (args.ablation_single_branch and args.target_modules != "none"))
        if self.dpo:
            if family not in ("cogvideox", "wan"):
                raise ValueError(f"DPO is only defined for cogvideox/wan, got {family}")
            # LoRA policy over the frozen base; the base doubles as the DPO
            # reference model (reference trainer.py:774-825)
            dpo_factory = make_wan_dpo_step if family == "wan" else make_dpo_step
            init_fn, step_fn = dpo_factory(
                self.step_cfg, self.optimizer,
                lora_rank=args.rank, lora_alpha=float(args.lora_alpha))
            self.frozen_params = params
            self.train_params, self.opt_state = init_fn(params, jax.random.PRNGKey(args.seed))
            self._step = jax.jit(step_fn)
        elif self.lora_mode:
            from .train_step import make_lora_sft_step, parse_target_modules

            if (args.training_type == "lora"
                    and "transformer" in args.layerwise_upcasting_modules):
                # float8 storage for the frozen base (reference gates this on
                # LORA + "transformer", sft_trainer/trainer.py:184-190);
                # apply_lora upcasts back to compute dtype inside the step
                from .layerwise import cast_layerwise_storage

                params = cast_layerwise_storage(
                    params, args.layerwise_upcasting_storage_dtype,
                    tuple(args.layerwise_upcasting_skip_modules_pattern.split(",")))
            init_fn, grad_fn, apply_fn, step_fn = make_lora_sft_step(
                loss_fn, self.step_cfg, self.optimizer,
                rank=args.rank, alpha=float(args.lora_alpha),
                targets=parse_target_modules(args.target_modules))
            self.train_params, self.frozen_params, self.opt_state = init_fn(
                params, jax.random.PRNGKey(args.seed))
            self._step = jax.jit(step_fn)
            if self.accum_steps > 1:
                self._install_accum(grad_fn, apply_fn)
        else:
            from .train_step import _make_sft_step

            init_fn, step_fn = _make_sft_step(
                loss_fn, self.step_cfg, self.optimizer, partitioned=partitioned)
            self.train_params, self.frozen_params, self.opt_state = init_fn(params)
            self._step = jax.jit(step_fn)
            if self.accum_steps > 1:
                # grad/apply split (reference trainer.py:712-772, 841-846):
                # sum micro-batch grads, apply mean every accum boundary
                grad_fn, apply_fn = make_grad_and_apply(
                    loss_fn, self.step_cfg, self.optimizer, partitioned=partitioned)
                self._install_accum(grad_fn, apply_fn)

    def _install_accum(self, grad_fn, apply_fn):
        self._grad = jax.jit(grad_fn)
        self._apply = jax.jit(apply_fn)
        self._tree_add = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b))
        inv = 1.0 / self.accum_steps
        self._tree_mean = jax.jit(lambda t: jax.tree.map(lambda x: x * inv, t))
        self._accum_grads = None

    def _attn_ctx(self, training: bool):
        """Attention-provider context for the step/validation jit traces
        (reference attention_provider_ctx, sft_trainer/trainer.py:676).

        With --seq_degree > 1 this also installs the attention mesh and makes
        'ring' the default provider, so sequence parallelism runs the real
        sharded kernel end-to-end (reference CP, parallel/ptd.py:515-722) —
        not just XLA's SPMD of the dense path."""
        name = (self.args.attn_provider_training if training
                else self.args.attn_provider_inference)
        stack = contextlib.ExitStack()
        if self.mesh is not None and self.args.seq_degree > 1:
            from ..parallel.ring_attention import attention_mesh

            stack.enter_context(attention_mesh(
                self.mesh, "seq", rotate_method=self.args.cp_rotate_method))
            if name in (None, "", "auto"):
                name = "ring"
        if name not in (None, "", "auto"):
            stack.enter_context(attention_provider(name))
        return stack

    # ------------------------------------------------------------------
    def _prepare_dataset(self):
        args = self.args
        shard_index = jax.process_index()
        num_shards = max(jax.process_count(), 1)
        if args.dataset_config:
            # multi-dataset training.json (reference trainer.py:327-389:
            # initialize_dataset/combine_datasets with per-dataset buckets)
            from ..data.config import build_datasets_from_config

            dataset = build_datasets_from_config(
                args.dataset_config, args, family=self.family,
                shard_index=shard_index, num_shards=num_shards)
            return PrefetchingDataLoader(dataset, prefetch=4)
        vap_shaped = self.family in ("cogvideox", "wan") and (
            self.dpo or self.args.training_type in ("video_as_prompt_mot", "dpo"))
        if not vap_shaped:
            # generic families AND plain (crush_smol-style) sft/lora finetunes
            # of cogvideox/wan: auto-detected local layout (reference
            # initialize_dataset, data/dataset.py:1542-1610; same rule as
            # data/config.py build_dataset_from_entry)
            from ..data.generic import DatasetPreprocessingWrapper, initialize_dataset

            dataset_type = "image" if self.family in ("cogview4", "flux") else "video"
            dataset = initialize_dataset(args.data_root, dataset_type, infinite=True)
            if num_shards > 1 and hasattr(dataset, "_items"):
                dataset._items = dataset._items[shard_index::num_shards]
            dataset = DatasetPreprocessingWrapper(
                dataset, id_token=args.id_token,
                remove_common_llm_caption_prefixes=args.remove_common_llm_caption_prefixes)
            return PrefetchingDataLoader(dataset, prefetch=4)
        ds_cls = VideoAsPromptDataset
        if self.dpo:
            from ..data.dataset import VideoAsPromptDPODataset

            ds_cls = VideoAsPromptDPODataset
        dataset = ds_cls(
            args.data_root,
            meta_df_name=args.meta_df_name,
            infinite=True,
            sample_ref_videos_num=args.sample_ref_videos_num,
            mask_ref_ratio=args.mask_ref_ratio,
            mask_caption_ratio=args.mask_caption_ratio,
            alignment_score_threshold=args.alignment_score_threshold,
            baseline_single_condition=args.baseline_single_condition,
            ablation_scaling_data_num=args.ablation_scaling_data_num,
            shard_index=shard_index,
            num_shards=num_shards,
            seed=args.seed + shard_index,
        )
        return PrefetchingDataLoader(dataset, prefetch=4)

    # ------------------------------------------------------------------
    # precomputation + encoder offload (reference sft_trainer/trainer.py:
    # 1225-1318: load text encoders -> condition pass -> unload; load VAE ->
    # latent pass -> unload; train with only the DiT resident)
    # ------------------------------------------------------------------
    _ENCODER_KEYS = ("text_encoder", "text_encoder_2", "vae", "image_encoder")

    def _offload_encoders(self):
        """Move encoder params to host RAM and drop the device copies so the
        step loop trains with only the transformer in HBM."""
        if getattr(self, "_host_encoders", None) is None:
            self._host_encoders = {}
        for k in self._ENCODER_KEYS:
            if k in self.spec.params and self.spec.params[k] is not None:
                self._host_encoders[k] = jax.tree.map(np.asarray, self.spec.params[k])
                del self.spec.params[k]
        # drop any jitted encoder closures holding device references
        jax.clear_caches()

    def _load_encoders(self):
        for k, host in (getattr(self, "_host_encoders", None) or {}).items():
            self.spec.params[k] = jax.tree.map(jnp.asarray, host)

    def _precomputed_pairs(self, data_iter, epoch_len: Optional[int] = None):
        """Yield (condition, latent) dicts forever, with encoders resident
        only during encode passes."""
        args = self.args

        def _fit(sample):
            # per-dataset bucket/frame-selection annotations (dataset_config)
            # override the global flags, exactly like _preprocess
            if "image" in sample and "video" not in sample:
                from ..data.video import resize_to_nearest_bucket_image

                buckets = sample.get("_image_resolution_buckets",
                                     args.image_resolution_buckets)
                return dict(sample, image=resize_to_nearest_bucket_image(
                    sample["image"], buckets))
            buckets = sample.get("_resolution_buckets", args.video_resolution_buckets)
            fsel = sample.get("_frames_selection", "evenly")
            video, _ = resize_to_nearest_bucket(sample["video"], buckets, fsel)
            refs = [resize_to_nearest_bucket(r, buckets, fsel)[0]
                    for r in sample.get("ref_videos", [])]
            return dict(sample, video=video, ref_videos=refs)

        def prepare_cond(sample):
            return self.spec.prepare_conditions(_fit(sample))

        def prepare_lat(sample):
            return self.spec.prepare_latents(_fit(sample))

        if args.precomputation_dir:
            from ..data.precomputation import PrecomputedPreprocessor

            # signature gates reuse: a cache produced under different data
            # or bucket settings is recomputed, not silently replayed
            signature = {
                "data_root": str(args.data_root),
                "dataset_config": str(args.dataset_config or ""),
                "video_resolution_buckets":
                    [list(b) for b in (args.video_resolution_buckets or [])],
                "precomputation_once": bool(args.precomputation_once),
                "precomputation_items": int(args.precomputation_items),
            }
            pre = PrecomputedPreprocessor(
                args.precomputation_dir, rank=jax.process_index(),
                world_size=jax.process_count(), signature=signature)
            if not pre.is_cached():
                self._load_encoders()
                # precomputation_once = cache one full epoch (the training
                # stream is infinite, so bound the pass by the dataset length)
                max_items = epoch_len if args.precomputation_once else args.precomputation_items
                n = pre.precompute(data_iter, prepare_cond, prepare_lat, max_items=max_items)
                logger.info(f"precomputed {n} items -> {pre.dir}")
            self._offload_encoders()
            while True:
                yield from pre
        else:
            from ..data.precomputation import InMemoryPreprocessor

            pre = InMemoryPreprocessor(data_iter, prepare_cond, prepare_lat,
                                       num_items=args.precomputation_items)
            while True:
                self._load_encoders()
                buf = pre.consume()
                self._offload_encoders()
                yield from buf

    def _preprocess(self, sample: Dict[str, Any]):
        """decode -> bucket-fit -> text/VAE encode (the reference's
        preprocessor.consume('condition'/'latent') passes)."""
        if "image" in sample and "video" not in sample:
            from ..data.video import resize_to_nearest_bucket_image

            buckets = sample.get("_image_resolution_buckets",
                                 self.args.image_resolution_buckets)
            img = resize_to_nearest_bucket_image(sample["image"], buckets)
            sample = dict(sample, image=img)
        else:
            # per-dataset bucket/frame-selection annotations from a
            # --dataset_config training.json override the global flags
            buckets = sample.get("_resolution_buckets",
                                 self.args.video_resolution_buckets)
            fsel = sample.get("_frames_selection", "evenly")
            video, _ = resize_to_nearest_bucket(sample["video"], buckets, fsel)
            refs = [resize_to_nearest_bucket(r, buckets, fsel)[0]
                    for r in sample.get("ref_videos", [])]
            sample = dict(sample, video=video, ref_videos=refs)
        with self.tracker.timed("timing/prepare_conditions"):
            cond = self.spec.prepare_conditions(sample)
        with self.tracker.timed("timing/prepare_latents"):
            lat = self.spec.prepare_latents(sample)
        if self.dpo:
            # the lose video must use the SAME per-dataset buckets and frame
            # selection as the win video: divergent shapes crash the pair
            # concat, and divergent temporal sampling biases the preference
            lose, _ = resize_to_nearest_bucket(sample["video_lose"], buckets, fsel)
            lat_lose = self.spec.prepare_latents(dict(sample, video=lose))
            # only the target latents differ; image/ref conditioning is shared
            lat["latents_lose"] = lat_lose["latents"]
            lat["dpo_weight"] = np.asarray([sample.get("dpo_weight", 1.0)], np.float32)
        return cond, lat

    # ------------------------------------------------------------------
    def run(self):
        args = self.args
        key = jax.random.PRNGKey(args.seed)

        # resume
        dataloader_state = None
        if args.resume_from_checkpoint:
            step = None if args.resume_from_checkpoint == "latest" else int(args.resume_from_checkpoint)
            restored = self.checkpointer.restore(
                step, params_template=self.train_params, opt_state_template=self.opt_state)
            if restored:
                # orbax can land template-less leaves (optax counters and
                # other scalars) on local device 0 only; under a multi-process
                # mesh that poisons the next jit with mixed device sets, so
                # re-place anything whose sharding disagrees with the live
                # template (values are process-identical, making the global
                # rebuild safe)
                self.train_params = _match_template_sharding(
                    restored["params"], self.train_params, self.mesh)
                self.opt_state = _match_template_sharding(
                    restored["opt_state"], self.opt_state, self.mesh)
                self.train_state = restored["train_state"]
                dataloader_state = restored.get("dataloader_state")
                logger.info(f"resumed from step {self.train_state.step}")

        loader = self._prepare_dataset()
        if dataloader_state is not None:
            # exact per-shard sample index + dataset RNG state from the
            # checkpoint: the resumed sample stream is identical to an
            # uninterrupted run (reference StatefulDataLoader semantics)
            loader.load_state_dict({"dataset": dataloader_state})
        batch_shards = max(args.data_degree, 1) * max(args.fsdp_degree, 1)
        sampler = ResolutionSampler(
            local_batch_size(args, jax.process_count()))
        data_iter = iter(loader)
        pre_iter = None
        if args.enable_precomputation:
            if self.dpo:
                raise ValueError("enable_precomputation is not supported with DPO")
            pre_iter = self._precomputed_pairs(
                data_iter, epoch_len=len(loader.dataset) if hasattr(loader.dataset, "__len__") else None)

        steps_this_run = 0  # process-local, unlike the resumable global step
        while self.train_state.step < args.train_steps:
            # fill a resolution bucket
            while not sampler.is_ready:
                if pre_iter is not None:
                    cond, lat = next(pre_iter)
                else:
                    raw = next(data_iter)
                    if self.train_state.step == 0 and not getattr(self, "_dumped_sample", False):
                        self.dump_training_sample(raw)
                        self._dumped_sample = True
                    cond, lat = self._preprocess(raw)
                sampler.consume(cond, lat)
            conds, lats = sampler.get_batch()
            batch = {**collate_tensor_dicts(conds), **collate_tensor_dicts(lats)}
            if self.dpo:
                batch = _assemble_dpo_batch(batch)
            if self.mesh is not None:
                batch = put_batch(self.mesh, batch)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}

            self.train_state.step += 1
            steps_this_run += 1
            if (args.profile_dir and steps_this_run == args.profile_start_step
                    and not getattr(self, "_profiled", False)):
                # device trace of steady-state steps (args.profile_* knobs);
                # the reference has only wall-clock timers here (SURVEY §5).
                # Keyed on the process-local step count, not the resumable
                # global step: a resumed run past profile_start_step still
                # skips its own first (compile) step and then traces.
                jax.profiler.start_trace(args.profile_dir)
                self._profiling = True
                self._profiled = True
            self.train_state.observed_data_samples += args.batch_size * batch_shards
            # step key is a pure function of (seed, step) so resumed runs draw
            # the same noise/timesteps as uninterrupted ones — and do NOT
            # replay steps 1..N the way re-splitting from PRNGKey(seed) would
            skey = jax.random.fold_in(key, self.train_state.step)

            with self.tracker.timed("timing/train_step"), self._attn_ctx(training=True):
                if self.accum_steps == 1:
                    self.train_params, self.opt_state, metrics = self._step(
                        self.train_params, self.frozen_params, self.opt_state, batch, skey)
                else:
                    # train_state.step counts micro-batches; the optimizer
                    # steps once per accumulation boundary (reference
                    # trainer.py:606,841)
                    grads, metrics = self._grad(
                        self.train_params, self.frozen_params, batch, skey)
                    self._accum_grads = (
                        grads if self._accum_grads is None
                        else self._tree_add(self._accum_grads, grads))
                    if self.train_state.step % self.accum_steps == 0:
                        self.train_params, self.opt_state, grad_norm = self._apply(
                            self.train_params, self.opt_state,
                            self._tree_mean(self._accum_grads))
                        metrics["grad_norm"] = grad_norm
                        self._accum_grads = None

            if getattr(self, "_profiling", False) and (
                    steps_this_run >= args.profile_start_step
                    + args.profile_num_steps - 1):
                # materialize a metric first: async dispatch means the traced
                # steps may still be executing (block_until_ready is not
                # reliable on every remote backend)
                if "loss" in metrics:
                    float(metrics["loss"])
                jax.profiler.stop_trace()
                self._profiling = False
                logger.info(f"profiler trace written to {args.profile_dir}")

            if self.train_state.step % args.logging_steps == 0:
                host_metrics = {k: float(v) for k, v in metrics.items()}
                host_metrics["train/observed_data_samples"] = self.train_state.observed_data_samples
                self.tracker.log(host_metrics, step=self.train_state.step)
                logger.info(f"step {self.train_state.step}: loss={host_metrics.get('loss', 0):.4f}")

            if args.validation_dataset_file and self.train_state.step % args.validation_steps == 0:
                with self.tracker.timed("timing/validation"):
                    self._validate(key)

            if self.train_state.step % args.checkpointing_steps == 0:
                with self.tracker.timed("timing/checkpoint"):
                    self.checkpointer.save(
                        self.train_state.step,
                        params=self.train_params,
                        opt_state=self.opt_state,
                        train_state=self.train_state,
                        dataloader_state=loader.state_dict().get("dataset"),
                    )

        if getattr(self, "_profiling", False):  # train_steps ended mid-window
            jax.profiler.stop_trace()
            self._profiling = False
        elif args.profile_dir and not getattr(self, "_profiled", False):
            logger.warning(
                f"--profile_dir set but no trace written: the run did only "
                f"{steps_this_run} step(s), fewer than "
                f"--profile_start_step {args.profile_start_step}")
        self.checkpointer.wait()
        self.tracker.finish()
        return self.train_state

    # ------------------------------------------------------------------
    def _merged_params(self):
        if self.dpo or getattr(self, "lora_mode", False):
            from .lora import apply_lora

            return apply_lora(self.frozen_params, self.train_params,
                              alpha=float(self.args.lora_alpha), rank=self.args.rank)
        if not self.frozen_params:  # full finetune: nothing partitioned out
            return self.train_params
        from .train_step import merge_params

        return merge_params(self.train_params, self.frozen_params)

    def _load_validation_config(self):
        """Resolve --validation_dataset_file: either a JSON config carrying a
        CSV pointer + generation params (the shipped validation.json shape) or
        a bare benchmark CSV. Returns (csv_path, gen_kwargs, num_samples)."""
        import json

        args = self.args
        path = args.validation_dataset_file
        gen: Dict[str, Any] = {}
        num_samples = None
        if path.endswith(".json"):
            with open(path) as f:
                vcfg = json.load(f)
            csv = vcfg.get("csv") or vcfg.get("val_data")
            if isinstance(csv, list):
                csv = csv[0]
            for base in (os.path.dirname(os.path.abspath(path)),
                         args.data_root or "", vcfg.get("root", "")):
                cand = os.path.join(base, csv) if base else csv
                if os.path.exists(cand):
                    csv = cand
                    break
            for k in ("num_frames", "height", "width", "num_inference_steps",
                      "guidance_scale", "use_dynamic_cfg", "step_cache"):
                if k in vcfg:
                    gen[k] = vcfg[k]
            num_samples = vcfg.get("num_samples")
            if "sample_ref_videos_num" in vcfg:
                gen["sample_ref_videos_num"] = vcfg["sample_ref_videos_num"]
            return csv, gen, num_samples
        return path, gen, num_samples

    def _resolve_val_limit(self, num_samples, total: int) -> Optional[int]:
        """Resolve a validation sample cap. `"all"` (or -1) means every row —
        the reference's behavior (it generates each CSV row, sharded across dp
        ranks, sft_trainer/trainer.py:939-1110). An unset cap defaults to ONE
        sample (a full 30-50-step 480p generation per row at every validation
        interval is rarely what a single-chip user meant) but says so loudly:
        silent truncation reads as "covered everything" when it didn't."""
        if num_samples == "all" or num_samples == -1:
            return None
        if num_samples is None:
            if total > 1:
                logger.warning(
                    "validation: no num_samples configured — generating 1 of %d "
                    "rows. Set num_samples in the validation JSON (an integer, "
                    "or \"all\" for every row) to change this.", total)
            return 1
        return int(num_samples)

    def _validate(self, key, num_samples: Optional[int] = None):
        """Full pipeline sampling with live training weights; per-run
        generation params come from the validation JSON (reference
        SFTTrainer._validate, trainer.py:939-1110)."""
        args = self.args
        if args.enable_precomputation:
            self._load_encoders()  # VAE/T5 needed for sampling, reloaded per pass
        merged = self._merged_params()
        if self.family not in ("cogvideox", "wan"):
            return self._validate_generic(merged, num_samples)
        if args.validation_dataset_file.endswith(".json"):
            import json

            with open(args.validation_dataset_file) as f:
                vcfg = json.load(f)
            if isinstance(vcfg, dict) and "data" in vcfg and not (
                    vcfg.get("csv") or vcfg.get("val_data")):
                # generic prompt-driven validation (plain crush_smol-style
                # finetunes of cogvideox/wan) — the VAP CSV machinery does
                # not apply; samples go through the spec's plain pipeline path
                return self._validate_generic(merged, num_samples)
        csv_path, gen, cfg_num_samples = self._load_validation_config()
        num_samples = num_samples if num_samples is not None else cfg_num_samples
        ds = VideoAsPromptValidationDataset(
            csv_path, num_frames=gen.get("num_frames", args.video_resolution_buckets[0][0]),
            shard_index=jax.process_index(), num_shards=max(jax.process_count(), 1))
        num_samples = self._resolve_val_limit(num_samples, len(ds))
        out_dir = os.path.join(args.output_dir, "validation", f"{self.train_state.step:06d}")
        os.makedirs(out_dir, exist_ok=True)
        artifacts = {}
        fb = args.video_resolution_buckets[0]
        gen.pop("sample_ref_videos_num", None)
        gen_kwargs = dict(
            height=gen.get("height", fb[1]), width=gen.get("width", fb[2]),
            num_frames=gen.get("num_frames", fb[0]),
            num_inference_steps=gen.get("num_inference_steps", 50))
        # step_cache: opt-in validation-sampling accelerator from the
        # validation JSON (pipelines/step_cache.py)
        for k in ("guidance_scale", "use_dynamic_cfg", "step_cache"):
            if k in gen:
                gen_kwargs[k] = gen[k]
        scorer = self._get_clip_scorer()
        clip_scores = []
        for i, sample in enumerate(ds):
            if num_samples is not None and i >= num_samples:
                break
            with self._attn_ctx(training=False):
                # per-sample seed: every row gets distinct initial noise
                # (reference validation varies noise across samples)
                video = self.spec.validation(
                    merged, sample, seed=args.seed + i, **gen_kwargs)
            self._write_validation_sample(
                np.asarray(video), sample, out_dir, i, artifacts, scorer, clip_scores)
        self._log_validation(artifacts, clip_scores)

    def _validate_generic(self, merged, num_samples: Optional[int] = None):
        """Prompt-driven validation for the generic families: the validation
        JSON carries {"data": [{"caption": ..., optional height/width/
        num_frames/num_inference_steps/guidance_scale}]} entries sampled
        through the family's own pipeline (reference per-spec validation)."""
        import json

        args = self.args
        with open(args.validation_dataset_file) as f:
            val = json.load(f)
        data = val.get("data", []) if isinstance(val, dict) else val
        if num_samples is None:
            num_samples = val.get("num_samples") if isinstance(val, dict) else None
        num_samples = self._resolve_val_limit(num_samples, len(data))
        out_dir = os.path.join(args.output_dir, "validation", f"{self.train_state.step:06d}")
        os.makedirs(out_dir, exist_ok=True)
        artifacts = {}
        scorer = self._get_clip_scorer()
        clip_scores = []
        image_family = self.family in ("flux", "cogview4")
        fb = args.image_resolution_buckets[0] if image_family \
            else args.video_resolution_buckets[0][1:]
        for i, sample in enumerate(data[:num_samples]):
            gen_kwargs = dict(
                height=sample.get("height", fb[0]),
                width=sample.get("width", fb[1]),
                num_inference_steps=sample.get("num_inference_steps", 30),
                seed=args.seed + i)
            if not image_family:
                gen_kwargs["num_frames"] = sample.get(
                    "num_frames", args.video_resolution_buckets[0][0])
            if "guidance_scale" in sample:
                gen_kwargs["guidance_scale"] = sample["guidance_scale"]
            with self._attn_ctx(training=False):
                media = self.spec.validation(merged, sample, **gen_kwargs)
            media = np.asarray(media)
            if media.ndim == 3:  # image -> 1-frame clip
                media = media[None]
            self._write_validation_sample(
                media, sample, out_dir, i, artifacts, scorer, clip_scores)
        self._log_validation(artifacts, clip_scores)

    def _write_validation_sample(self, media, sample, out_dir, i, artifacts,
                                 scorer, clip_scores):
        """Export one [-1,1] [F,H,W,3] sample as mp4 and, with a CLIP scorer
        configured, score it against its caption (plus aesthetic quality when
        the scorer carries the LAION head)."""
        frames = (media + 1.0) / 2.0
        path = os.path.join(out_dir, f"sample_{i}.mp4")
        export_to_video(frames, path, fps=16)
        artifacts[f"validation/sample_{i}"] = path
        metrics = {}
        if scorer is not None:
            metrics.update(scorer.score_video_metrics(frames, str(sample["caption"])))
        flow = self._get_flow_metrics()
        if flow is not None and frames.shape[0] >= 3:
            dd = flow.dynamic_degree_video(frames, fps=16.0)
            # 100*bool so the mean over samples IS the table's percentage
            metrics["dynamic_degree"] = 100.0 * float(dd["dynamic"])
            metrics["motion_smoothness"] = flow.motion_smoothness_video(frames)
        if metrics:
            clip_scores.append(metrics)
        logger.info(f"validation sample written: {path}")

    def _log_validation(self, artifacts, clip_scores):
        self.tracker.log_artifacts(artifacts, step=self.train_state.step)
        if clip_scores:
            keys = sorted({k for m in clip_scores for k in m})
            means = {f"validation/{k}": float(np.mean(
                         [m[k] for m in clip_scores if k in m]))
                     for k in keys}
            self.tracker.log(means, step=self.train_state.step)

    def dump_training_sample(self, sample: Dict[str, Any], step: int = 0):
        """Step-0 training-sample dump (reference trainer.py:524-580): write the
        decoded target + reference videos and captions for visual QA."""
        out_dir = os.path.join(self.args.output_dir, "training_samples")
        os.makedirs(out_dir, exist_ok=True)
        if "video" not in sample:  # image families: dump a 1-frame clip
            export_to_video((sample["image"][None] + 1.0) / 2.0,
                            os.path.join(out_dir, f"{step}-training_sample.mp4"), fps=1)
            with open(os.path.join(out_dir, f"{step}-caption.txt"), "w") as f:
                f.write(str(sample.get("caption", "")) + "\n")
            return
        export_to_video((sample["video"] + 1.0) / 2.0,
                        os.path.join(out_dir, f"{step}-training_sample.mp4"), fps=16)
        for ri, rv in enumerate(sample.get("ref_videos", [])):
            export_to_video((rv + 1.0) / 2.0,
                            os.path.join(out_dir, f"{step}-ref_{ri}.mp4"), fps=16)
        with open(os.path.join(out_dir, f"{step}-caption.txt"), "w") as f:
            f.write(str(sample.get("caption", "")) + "\n")
            for c in sample.get("caption_mot_ref", []):
                f.write(str(c) + "\n")

    # ------------------------------------------------------------------
    def export(self, path: Optional[str] = None) -> str:
        """Merge trained MoT params back into the full tree and write HF-layout
        safetensors (reference save_model_hook + _save_model_videoasprompt_mot).
        DPO runs additionally write the LoRA adapters in PEFT layout."""
        full = self._merged_params()
        path = path or os.path.join(self.args.output_dir, "model_weights",
                                    f"{self.train_state.step:06d}", "model.safetensors")
        out = export_safetensors(full, self.spec.transformer_cfg, path)
        if self.dpo or getattr(self, "lora_mode", False):
            from .checkpoint import export_lora_safetensors

            export_lora_safetensors(
                self.train_params, self.spec.transformer_cfg,
                os.path.join(os.path.dirname(path), "pytorch_lora_weights.safetensors"),
                rank=self.args.rank, alpha=float(self.args.lora_alpha))
        return out


def _assemble_dpo_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Stack win-then-lose rows: [2B] batch with the first half the win
    latents; everything without a *_lose twin is duplicated (shared
    conditioning). dpo_weight stays [B]."""
    out = {}
    for k, v in batch.items():
        if k.endswith("_lose") or k == "dpo_weight":
            continue
        v = np.asarray(v)
        twin = batch.get(k + "_lose")
        out[k] = np.concatenate([v, np.asarray(twin) if twin is not None else v], axis=0)
    if "dpo_weight" in batch:
        out["dpo_weight"] = np.asarray(batch["dpo_weight"], np.float32).reshape(-1)
    return out
