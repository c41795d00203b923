"""End-to-end drive of the distributed inference CLI (examples/inference/
inference.py — reference examples/inference/inference.py:154-460): dataset-
driven prompts, dp sharding arithmetic, resume (skip-existing), kind filter,
side-by-side export. A tiny pipeline is injected in place of the real
checkpoint loader; everything else runs the real CLI code."""

import argparse
import importlib.util
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "infer"))

from test_pipeline_cogvideox import FakeTokenizer, _init_vae_params  # noqa: E402

from vap_tpu.data.video import export_to_video  # noqa: E402
from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot  # noqa: E402
from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig  # noqa: E402
from vap_tpu.models.text_encoders import T5Config, init_t5_encoder  # noqa: E402
from vap_tpu.ops.schedulers import CogVideoXDDIMScheduler  # noqa: E402
from vap_tpu.pipelines.cogvideox_i2v_mot import CogVideoXVAPPipeline  # noqa: E402


def _load_cli():
    path = os.path.join(REPO, "examples", "inference", "inference.py")
    spec = importlib.util.spec_from_file_location("vap_inference_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_pipe():
    t_cfg = CogVideoXMOTConfig.tiny(in_channels=8, out_channels=4)
    vae_cfg = CogVideoXVAEConfig.tiny()
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_embed_dim)
    key = jax.random.PRNGKey(0)
    params = {
        "transformer": init_cogvideox_mot(key, t_cfg),
        "vae": _init_vae_params(key, vae_cfg),
        "text_encoder": init_t5_encoder(key, txt_cfg),
    }
    return CogVideoXVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg,
        params=params, tokenizer=FakeTokenizer(),
        scheduler=CogVideoXDDIMScheduler(), dtype=jnp.float32)


def _make_benchmark(tmp_path, n=3):
    import pandas as pd

    rows = []
    for i in range(n):
        fr = (np.random.default_rng(i).uniform(0, 1, (9, 32, 32, 3)) * 255).astype(np.uint8)
        export_to_video(fr, str(tmp_path / f"v{i}.mp4"), fps=16)
        rows.append({
            "video_paths": f"v{i}.mp4",
            "tar_video_caption": f"target {i}",
            "ref_video_paths": json.dumps([f"v{(i + 1) % n}.mp4"]),
            "kind": "explode" if i % 2 == 0 else "melt",
            "split": "test",
            "reference_alignment_score": 100.0,
        })
    csv = tmp_path / "benchmark.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(csv)


def _args(tmp_path, csv, **kw):
    base = dict(
        model_name="cogvideox", model_path="/nonexistent", dataset_file=csv,
        data_root=str(tmp_path), output_dir=str(tmp_path / "out"),
        dp_degree=1, sp_degree=1, attn_provider="xla",
        cp_rotate_method="allgather", num_frames=9, height=32, width=32,
        num_inference_steps=1, guidance_scale=6.0, use_dynamic_cfg=True,
        negative_prompt=None, sample_ref_videos_num=1, kind=None,
        max_samples=None, skip_existing=False, save_side_by_side=False,
        fps=16, seed=0,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def test_inference_cli_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    cli = _load_cli()
    pipe = _tiny_pipe()
    import cog_vap

    monkeypatch.setattr(cog_vap, "build_pipeline",
                        lambda path, dtype_str="bfloat16": pipe)
    csv = _make_benchmark(tmp_path)

    with jax.default_device(jax.devices("cpu")[0]):
        # 1. generate two samples with side-by-side export
        args = _args(tmp_path, csv, max_samples=2, save_side_by_side=True)
        cli.Inference(args).run()
        outs = sorted(os.listdir(tmp_path / "out"))
        assert len(outs) == 2, outs

        # 2. resume: skip-existing leaves the files untouched and completes
        mtimes = {o: os.path.getmtime(tmp_path / "out" / o) for o in outs}
        args = _args(tmp_path, csv, max_samples=2, skip_existing=True,
                     save_side_by_side=True)
        cli.Inference(args).run()
        for o in outs:
            assert os.path.getmtime(tmp_path / "out" / o) == mtimes[o]

        # 3. kind filter only generates matching rows
        args = _args(tmp_path, csv, kind=["melt"],
                     output_dir=str(tmp_path / "out_kind"))
        cli.Inference(args).run()
        outs_kind = os.listdir(tmp_path / "out_kind")
        assert len(outs_kind) == 1, outs_kind
