"""Multi-process trainer driver (invoked as a subprocess by
tests/test_multiprocess.py): runs the real SFTTrainer loop under
jax.distributed with N CPU processes x 2 virtual devices each.

Reference analog: torchrun multi-proc init (finetrainers/parallel/ptd.py:91,
examples/training/sft/cogvideox/vap_mot/train_single_node.sh:128-133).

Modes:
  --nprocs 2 --pid K  : one rank of a 2-process run (data_degree=4 mesh)
  --nprocs 1          : single-process control on the same 4-device mesh; with
                        --emulate_shards the dataset stream interleaves the
                        two shard streams chunk-by-chunk so the GLOBAL batch
                        composition equals the 2-process run's — loss curves
                        must then match exactly.

Writes {out}/rank_{pid}.json: per-step losses, consumed captions, resume info.
"""

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # the axon TPU plugin ignores JAX_PLATFORMS

import numpy as np


class FakeTokenizer:
    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 add_special_tokens=True, return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[:max_length]):
                ids[i, j] = (ord(ch) * 5 + j) % 127 + 1
        return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, default=0)
    p.add_argument("--nprocs", type=int, default=1)
    p.add_argument("--port", type=int, default=29811)
    p.add_argument("--data_root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--emulate_shards", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--output_dir", default=None,
                   help="trainer output dir (default {out}/ckpt); point at a "
                        "prior run's dir to resume from its checkpoints")
    args = p.parse_args()

    if args.nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nprocs, process_id=args.pid)
    assert len(jax.devices()) == 4, jax.devices()

    os.environ.setdefault("VAP_ATTN_PROVIDER", "xla")

    import jax.numpy as jnp

    from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
    from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig, init_cogvideox_vae
    from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
    from vap_tpu.training.args import TrainingArgs
    from vap_tpu.training.specs import CogVideoXSpec
    from vap_tpu.training.trainer import SFTTrainer

    t_cfg = CogVideoXMOTConfig.tiny(in_channels=8, out_channels=4)
    vae_cfg = CogVideoXVAEConfig.tiny()
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_embed_dim)
    key = jax.random.PRNGKey(0)
    params = {
        "transformer": init_cogvideox_mot(key, t_cfg, jnp.float32),
        "vae": init_cogvideox_vae(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
        "text_encoder": init_t5_encoder(jax.random.fold_in(key, 2), txt_cfg, jnp.float32),
    }
    spec = CogVideoXSpec(t_cfg, vae_cfg, txt_cfg, params, FakeTokenizer(), jnp.float32)
    spec.prepare_conditions = (
        lambda s, _o=spec.prepare_conditions: _o(s, max_length=t_cfg.max_text_seq_length))

    targs = TrainingArgs(
        data_root=args.data_root, train_steps=args.steps, batch_size=1,
        logging_steps=1, checkpointing_steps=2,
        output_dir=args.output_dir or os.path.join(args.out, "ckpt"),
        video_resolution_buckets=((9, 32, 32),), lr=1e-3,
        gradient_checkpointing=False, mask_caption_ratio=0.0, mask_ref_ratio=0.0,
        data_degree=4, report_to=("dummy",), seed=7,
        resume_from_checkpoint="latest" if args.resume else None,
    )
    trainer = SFTTrainer(targs, spec)

    consumed = []
    orig_pre = trainer._preprocess

    def rec_preprocess(self, raw):
        consumed.append(raw["caption"])
        return orig_pre(raw)

    trainer._preprocess = types.MethodType(rec_preprocess, trainer)

    if args.emulate_shards:
        # replicate the 2-process global batch composition in ONE process:
        # interleave the two shard streams in local-batch chunks (2 each)
        from vap_tpu.data.dataloader import PrefetchingDataLoader
        from vap_tpu.data.dataset import VideoAsPromptDataset

        shards = [VideoAsPromptDataset(
            targs.data_root, infinite=True,
            sample_ref_videos_num=targs.sample_ref_videos_num,
            mask_ref_ratio=0.0, mask_caption_ratio=0.0,
            alignment_score_threshold=targs.alignment_score_threshold,
            shard_index=i, num_shards=2, seed=targs.seed + i) for i in range(2)]

        class Interleaved:
            def __iter__(self):
                its = [iter(s) for s in shards]
                while True:
                    for it in its:
                        yield next(it)
                        yield next(it)

        trainer._prepare_dataset = types.MethodType(
            lambda self: PrefetchingDataLoader(Interleaved(), prefetch=4), trainer)

    trainer.run()

    losses = [e.get("loss") for e in trainer.tracker.history if "loss" in e]
    report = {
        "pid": args.pid, "nprocs": args.nprocs,
        "losses": losses, "consumed": consumed,
        "final_step": trainer.train_state.step,
        "process_count": jax.process_count(),
    }
    with open(os.path.join(args.out, f"rank_{args.pid}.json"), "w") as f:
        json.dump(report, f)
    print(f"rank {args.pid}: done, losses={losses}", flush=True)


if __name__ == "__main__":
    main()
