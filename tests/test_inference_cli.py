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
                        lambda path, dtype_str="bfloat16", **kw: pipe)
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


def test_inference_cli_component_flags_reach_build_pipeline(tmp_path, monkeypatch):
    """The per-component parity flags (reference inference.py:548-583) flow
    from the CLI namespace into build_pipeline."""
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    cli = _load_cli()
    pipe = _tiny_pipe()
    import cog_vap

    seen = {}

    def fake_build(path, dtype_str="bfloat16", **kw):
        seen.update(kw, model_path=path)
        return pipe

    monkeypatch.setattr(cog_vap, "build_pipeline", fake_build)
    csv = _make_benchmark(tmp_path, n=1)
    args = _args(
        tmp_path, csv, max_samples=0,
        revision="r1", variant="fp16", cache_dir="/tmp/hfcache",
        transformer_id="/alt/transformer", vae_id="/alt/vae",
        text_encoder_id="/alt/te", tokenizer_id="/alt/tok",
        transformer_dtype="bf16", vae_dtype="fp32", text_encoder_dtype="bf16",
        lora_path="/alt/lora.safetensors", lora_scale=0.5,
        enable_tiling=True, enable_slicing=True)
    with jax.default_device(jax.devices("cpu")[0]):
        cli.Inference(args).run()
    assert seen["model_path"] == "/nonexistent"
    assert seen["revision"] == "r1" and seen["variant"] == "fp16"
    assert seen["cache_dir"] == "/tmp/hfcache"
    assert seen["transformer_id"] == "/alt/transformer"
    assert seen["vae_id"] == "/alt/vae"
    assert seen["text_encoder_id"] == "/alt/te"
    assert seen["tokenizer_id"] == "/alt/tok"
    assert seen["transformer_dtype"] == "bf16" and seen["vae_dtype"] == "fp32"
    assert seen["lora_path"] == "/alt/lora.safetensors"
    assert seen["lora_scale"] == 0.5
    assert seen["enable_vae_tiling"] is True
    assert seen["enable_vae_slicing"] is True


def test_inference_cli_parses_new_flags(monkeypatch, tmp_path):
    """argparse surface: every parity flag exists and lands in the namespace."""
    cli = _load_cli()
    captured = {}
    monkeypatch.setattr(cli, "Inference",
                        lambda args: captured.update(vars(args)) or
                        argparse.Namespace(run=lambda: None))
    monkeypatch.setattr(sys, "argv", [
        "inference.py", "--model_path", "/m", "--dataset_file", "/d.csv",
        "--transformer_id", "/t", "--transformer_dtype", "fp32",
        "--lora_path", "/l.safetensors", "--lora_scale", "0.25",
        "--enable_tiling", "--enable_slicing", "--variant", "fp16",
        "--raft_model", "/raft.pth"])
    cli.main()
    assert captured["transformer_id"] == "/t"
    assert captured["transformer_dtype"] == "fp32"
    assert captured["lora_path"] == "/l.safetensors"
    assert captured["lora_scale"] == 0.25
    assert captured["enable_tiling"] and captured["enable_slicing"]
    assert captured["variant"] == "fp16"
    assert captured["raft_model"] == "/raft.pth"


def test_pipeline_decode_tiling_and_slicing_match_default():
    """enable_vae_tiling / enable_vae_slicing produce the same pixels as the
    default decode on a latent smaller than one tile."""
    import dataclasses

    pipe = _tiny_pipe()
    z = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 8, 8, pipe.vae_cfg.latent_channels)).astype(np.float32))
    with jax.default_device(jax.devices("cpu")[0]):
        base = np.asarray(pipe._decode(z))
        tiled = np.asarray(dataclasses.replace(pipe, enable_vae_tiling=True)._decode(z))
        sliced = np.asarray(dataclasses.replace(pipe, enable_vae_slicing=True)._decode(z))
    assert base.shape == tiled.shape == sliced.shape
    np.testing.assert_allclose(tiled, base, atol=2e-4)
    np.testing.assert_allclose(sliced, base, atol=2e-4)


@pytest.mark.parametrize("script", ["cog_vap", "wan_vap"])
def test_infer_script_plain_mode(tmp_path, monkeypatch, script):
    """infer/{cog,wan}_vap.py without --ref_video/--ref_image sample a plain
    (non-VAP) finetune: the pipeline receives image=None and ref_videos=None,
    matching the ref-free training path (tests/test_plain_finetune.py)."""
    mod = importlib.import_module(script)
    seen = {}

    class FakePipe:
        def __call__(self, image=None, prompt=None, ref_videos=None,
                     prompt_mot_ref=None, num_frames=9, height=16, width=16, **kw):
            seen.update(image=image, ref_videos=ref_videos,
                        prompt_mot_ref=prompt_mot_ref, prompt=prompt)
            return np.zeros((1, num_frames, height, width, 3), np.float32)

    monkeypatch.setattr(mod, "build_pipeline", lambda path, **kw: FakePipe())
    out = str(tmp_path / "plain.mp4")
    monkeypatch.setattr(sys, "argv", [
        f"{script}.py", "--model_path", "/ckpt", "--prompt", "a cat",
        "--output", out, "--num_frames", "9", "--height", "16", "--width", "16"])
    mod.main()
    assert seen["image"] is None and seen["ref_videos"] is None
    assert seen["prompt_mot_ref"] is None and seen["prompt"] == "a cat"
    assert os.path.exists(out)


@pytest.mark.parametrize("script", ["cog_vap", "wan_vap"])
def test_infer_script_ref_video_requires_prompt_ref(monkeypatch, script):
    """--ref_video without --prompt_ref is rejected at argparse time."""
    mod = importlib.import_module(script)
    monkeypatch.setattr(sys, "argv", [
        f"{script}.py", "--model_path", "/ckpt", "--prompt", "a cat",
        "--ref_video", "r.mp4"])
    with pytest.raises(SystemExit):
        mod.main()
