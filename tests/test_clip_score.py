"""CLIP-score eval module: golden parity vs transformers CLIPModel (tiny,
CPU) for the projection-head embeddings and the pairwise score, plus
preprocessing and video-score behavior."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.eval import (
    CLIPScoreConfig,
    CLIPScorer,
    clip_image_embed,
    clip_score,
    clip_text_embed,
    convert_clip_model_state_dict,
    init_clip_score,
    preprocess_frames,
    video_clip_score,
)


class FakeTokenizer:
    """HF-tokenizer surface used by CLIPScorer; ids stay in the tiny vocab
    with the tiny config's EOS token terminating each caption."""

    def __init__(self, eos_token_id=63, vocab_size=64):
        self.eos, self.vocab = eos_token_id, vocab_size

    def __call__(self, texts, padding=None, max_length=16, truncation=True,
                 return_tensors="np"):
        ids = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t[: max_length - 1]):
                ids[i, j] = (ord(ch) * 5 + j) % (self.vocab - 2) + 1
            ids[i, min(len(t), max_length - 1)] = self.eos
        return {"input_ids": ids}


def tiny_scorer():
    cfg = CLIPScoreConfig.tiny()
    params = init_clip_score(jax.random.PRNGKey(3), cfg)
    return CLIPScorer(params, cfg, FakeTokenizer(cfg.text.eos_token_id,
                                                 cfg.text.vocab_size))


def _hf_model(cfg: CLIPScoreConfig):
    import torch
    from transformers import CLIPConfig, CLIPModel

    hf_cfg = CLIPConfig(
        text_config=dict(
            vocab_size=cfg.text.vocab_size, hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.text.num_hidden_layers,
            num_attention_heads=cfg.text.num_attention_heads,
            max_position_embeddings=cfg.text.max_position_embeddings,
            hidden_act=cfg.text.hidden_act, eos_token_id=cfg.text.eos_token_id,
            bos_token_id=cfg.text.eos_token_id - 1, pad_token_id=0),
        vision_config=dict(
            hidden_size=cfg.vision.hidden_size,
            intermediate_size=cfg.vision.intermediate_size,
            num_hidden_layers=cfg.vision.num_hidden_layers,
            num_attention_heads=cfg.vision.num_attention_heads,
            image_size=cfg.vision.image_size, patch_size=cfg.vision.patch_size,
            hidden_act=cfg.vision.hidden_act),
        projection_dim=cfg.projection_dim,
    )
    torch.manual_seed(0)
    return CLIPModel(hf_cfg).eval()


def test_clip_score_golden_parity(torch_reference):
    import torch

    cfg = CLIPScoreConfig.tiny()
    m = _hf_model(cfg)
    params = convert_clip_model_state_dict(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.text.vocab_size - 1,
                       (3, cfg.text.max_position_embeddings)).astype(np.int32)
    ids[0, 4] = cfg.text.eos_token_id
    ids[1, 7] = cfg.text.eos_token_id
    ids[2, 2] = cfg.text.eos_token_id
    pix = rng.standard_normal(
        (3, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)

    with torch.no_grad():
        te_ref = m.get_text_features(torch.from_numpy(ids.astype(np.int64))).numpy()
        ie_ref = m.get_image_features(
            torch.from_numpy(pix.transpose(0, 3, 1, 2))).numpy()
    te_ref = te_ref / np.linalg.norm(te_ref, axis=-1, keepdims=True)
    ie_ref = ie_ref / np.linalg.norm(ie_ref, axis=-1, keepdims=True)

    with jax.default_device(jax.devices("cpu")[0]):
        te = clip_text_embed(params, cfg, jnp.asarray(ids))
        ie = clip_image_embed(params, cfg, jnp.asarray(pix))
        scores = clip_score(params, cfg, jnp.asarray(pix), jnp.asarray(ids))

    np.testing.assert_allclose(np.asarray(te), te_ref, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ie), ie_ref, atol=1e-5, rtol=1e-4)
    ref_scores = 100.0 * np.maximum((ie_ref * te_ref).sum(-1), 0.0)
    np.testing.assert_allclose(np.asarray(scores), ref_scores, atol=1e-3)


def test_video_clip_score_is_mean_of_frames():
    cfg = CLIPScoreConfig.tiny()
    params = init_clip_score(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.standard_normal(
        (4, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32))
    ids = rng.integers(1, cfg.text.vocab_size - 1,
                       (1, cfg.text.max_position_embeddings)).astype(np.int32)
    ids[0, 3] = cfg.text.eos_token_id
    ids = jnp.asarray(ids)

    with jax.default_device(jax.devices("cpu")[0]):
        vid = float(video_clip_score(params, cfg, frames, ids))
        per_frame = clip_score(params, cfg, frames, jnp.tile(ids, (4, 1)))
    assert np.isclose(vid, float(jnp.mean(per_frame)), atol=1e-4)
    assert 0.0 <= vid <= 100.0


def test_clip_scorer_score_video():
    pytest.importorskip("cv2")
    scorer = tiny_scorer()
    rng = np.random.default_rng(4)
    frames = rng.uniform(0, 1, (3, 40, 48, 3)).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        s = scorer.score_video(frames, "a test caption")
        s8 = scorer.score_video((frames * 255).astype(np.uint8), "a test caption")
        # frame-bucket padding (3 -> FRAME_BUCKET) must not leak into the
        # mean: the unpadded per-frame scores are the ground truth
        ids = scorer.tokenizer(["a test caption"], return_tensors="np")[
            "input_ids"].astype(np.int32)
        pix = preprocess_frames(frames, scorer.cfg.vision.image_size)
        expect = float(video_clip_score(
            scorer.params, scorer.cfg, jnp.asarray(pix), jnp.asarray(ids)))
    assert 0.0 <= s <= 100.0
    assert np.isclose(s, s8, atol=0.2)  # uint8 round-trip ~= float input
    assert np.isclose(s, expect, atol=1e-3)


def test_trainer_validation_logs_clip_score(tmp_path, monkeypatch):
    """--clip_score_model_path wiring: validation sampling scores each
    generated sample against its caption and logs validation/clip_score
    (in-framework stand-in for the reference's external VBench eval,
    reference README.md:73-81)."""
    import contextlib
    import json

    pytest.importorskip("cv2")
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    from vap_tpu.models.autoencoder_kl import AutoencoderKLConfig, init_autoencoder_kl
    from vap_tpu.models.flux import FluxConfig, init_flux
    from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
    from vap_tpu.models.text_encoders.clip_text import CLIPTextConfig, init_clip_text
    from vap_tpu.training.args import TrainingArgs
    from vap_tpu.training.specs import FluxSpec
    from vap_tpu.training.trainer import SFTTrainer

    class SpecTokenizer:  # FluxSpec-side tokenizer (attention_mask needed)
        def __call__(self, texts, padding=None, max_length=8, truncation=True,
                     add_special_tokens=True, return_tensors="np"):
            ids = np.zeros((len(texts), max_length), np.int32)
            for i, t in enumerate(texts):
                for j, ch in enumerate(t[:max_length]):
                    ids[i, j] = (ord(ch) * 5 + j) % 127 + 1
            return {"input_ids": ids, "attention_mask": (ids > 0).astype(np.int32)}

    class RecordingTracker:
        def __init__(self):
            self.metrics = {}

        def log(self, m, step=None):
            self.metrics.update(m)

        def log_artifacts(self, a, step=None):
            pass

        def timed(self, name):
            return contextlib.nullcontext()

    val_path = tmp_path / "validation.json"
    val_path.write_text(json.dumps({"num_samples": 1, "data": [
        {"caption": "a red square", "height": 32, "width": 32,
         "num_inference_steps": 1}]}))

    vae_cfg = AutoencoderKLConfig.tiny()
    t_cfg = FluxConfig.tiny(in_channels=4 * vae_cfg.latent_channels)
    txt_cfg = T5Config.tiny(d_model=t_cfg.joint_attention_dim)
    clip_cfg = CLIPTextConfig.tiny(hidden_size=t_cfg.pooled_projection_dim,
                                   num_attention_heads=4, vocab_size=64,
                                   max_position_embeddings=77)
    key = jax.random.PRNGKey(0)
    params = {
        "transformer": init_flux(key, t_cfg, jnp.float32),
        "vae": init_autoencoder_kl(jax.random.fold_in(key, 1), vae_cfg, jnp.float32),
        "text_encoder": init_clip_text(jax.random.fold_in(key, 2), clip_cfg, jnp.float32),
        "text_encoder_2": init_t5_encoder(jax.random.fold_in(key, 3), txt_cfg, jnp.float32),
    }
    spec = FluxSpec(t_cfg, vae_cfg, txt_cfg, params, SpecTokenizer(),
                    SpecTokenizer(), clip_cfg, jnp.float32)
    spec.prepare_conditions = (
        lambda s, _o=spec.prepare_conditions: _o(s, max_length=8, clip_max_length=8))

    args = TrainingArgs(
        data_root=str(tmp_path), train_steps=1, batch_size=1,
        output_dir=str(tmp_path / "out"), gradient_checkpointing=False,
        mask_caption_ratio=0.0, image_resolution_buckets=((32, 32),),
        validation_dataset_file=str(val_path),
    )
    with jax.default_device(jax.devices("cpu")[0]):
        trainer = SFTTrainer(args, spec)
        trainer.tracker = RecordingTracker()
        trainer.clip_scorer = tiny_scorer()  # injected: no HF weights on disk
        trainer._validate(jax.random.PRNGKey(0))
    score = trainer.tracker.metrics.get("validation/clip_score")
    assert score is not None and 0.0 <= score <= 100.0
    # flow metrics skip gracefully on 1-frame image samples
    assert "validation/motion_smoothness" not in trainer.tracker.metrics

    # --raft_model_path wiring: inject FlowMetrics, score a multi-frame clip
    from vap_tpu.eval.flow_metrics import FlowMetrics
    from vap_tpu.eval.raft import RAFTConfig, init_raft

    rcfg = RAFTConfig.tiny()
    trainer.flow_metrics = FlowMetrics(
        init_raft(jax.random.PRNGKey(9), rcfg), rcfg, iters=2)
    artifacts, scores = {}, []
    media = np.random.default_rng(4).uniform(-1, 1, (5, 32, 32, 3)).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        trainer._write_validation_sample(
            media, {"caption": "a red square"}, str(tmp_path / "out"), 0,
            artifacts, trainer.clip_scorer, scores)
    trainer._log_validation(artifacts, scores)
    m = trainer.tracker.metrics
    assert m["validation/dynamic_degree"] in (0.0, 100.0)
    assert 0.0 <= m["validation/motion_smoothness"] <= 1.0
    assert "validation/clip_score" in m


def test_clip_scorer_from_pretrained_legacy_eos(tmp_path, torch_reference):
    """End-to-end from_pretrained on a saved tiny CLIPModel + real
    CLIPTokenizer replicating the openai/clip-vit-* situation: the hub
    text_config ships legacy eos_token_id=2 while the tokenizer's actual
    <|endoftext|> is the highest vocab id — text pooling must follow the
    legacy argmax branch and match HF's get_text_features."""
    import json as _json

    import torch
    from transformers import CLIPTokenizer

    pytest.importorskip("cv2")  # score_video preprocesses with cv2

    chars = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    vocab = {"<|startoftext|>": 0, "!": 1, "!</w>": 2}
    for ch in chars:
        vocab[ch] = len(vocab)
    for ch in chars:
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(_json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    tok = CLIPTokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))

    cfg = CLIPScoreConfig.tiny(text=CLIPTextConfig_tiny_for(len(vocab)))
    hf = _hf_model(cfg)
    # replicate the hub quirk: config eos (2) != tokenizer eos (vocab max)
    assert hf.config.text_config.eos_token_id == 2
    hf.save_pretrained(tmp_path)
    tok.save_pretrained(tmp_path)

    scorer = CLIPScorer.from_pretrained(str(tmp_path))
    caption = "a cat jumps"
    ids = scorer.tokenizer([caption], padding="max_length", truncation=True,
                           max_length=cfg.text.max_position_embeddings,
                           return_tensors="np")["input_ids"]
    assert ids.max() == len(vocab) - 1  # real <|endoftext|> is in the row
    with torch.no_grad():
        te_ref = hf.get_text_features(torch.from_numpy(ids)).numpy()
    te_ref /= np.linalg.norm(te_ref, axis=-1, keepdims=True)
    with jax.default_device(jax.devices("cpu")[0]):
        te = clip_text_embed(scorer.params, scorer.cfg, jnp.asarray(ids.astype(np.int32)))
        frames = np.random.default_rng(7).uniform(0, 1, (2, 40, 40, 3)).astype(np.float32)
        s = scorer.score_video(frames, caption)
    np.testing.assert_allclose(np.asarray(te), te_ref, atol=1e-5, rtol=1e-4)
    assert 0.0 <= s <= 100.0


def test_clip_score_cli_end_to_end(tmp_path, torch_reference, monkeypatch, capsys):
    """scripts/clip_score.py main() over real tiny saved checkpoints for ALL
    THREE metric models (CLIPModel + tokenizer, LAION aesthetic .pth, RAFT
    .pth) and real tiny mp4s with a ref-video CSV column: ONE command prints
    the reference table's full five metrics (reference README.md:73-81)."""
    import json as _json

    import torch
    from transformers import CLIPTokenizer

    pytest.importorskip("cv2")
    from vap_tpu.data.video import export_to_video

    chars = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    vocab = {"<|startoftext|>": 0, "!": 1, "!</w>": 2}
    for ch in chars:
        vocab[ch] = len(vocab)
    for ch in chars:
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(_json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    tok = CLIPTokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    cfg = CLIPScoreConfig.tiny(text=CLIPTextConfig_tiny_for(len(vocab)))
    _hf_model(cfg).save_pretrained(tmp_path)
    tok.save_pretrained(tmp_path)

    # tiny LAION-style aesthetic head on the tiny projection dim
    torch.manual_seed(1)
    aest = torch.nn.Sequential(torch.nn.Linear(cfg.projection_dim, 8),
                               torch.nn.ReLU(), torch.nn.Linear(8, 1))
    aest_pth = tmp_path / "aesthetic.pth"
    torch.save({f"layers.{k}": v for k, v in aest.state_dict().items()}, aest_pth)

    # tiny princeton-naming RAFT checkpoint (architecture inferred from shapes)
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_raft_ref import TorchRAFT

    from vap_tpu.eval.raft import RAFTConfig

    raft_pth = tmp_path / "raft.pth"
    torch.save(TorchRAFT(RAFTConfig.tiny()).state_dict(), raft_pth)

    rng = np.random.default_rng(9)
    vid, ref = tmp_path / "v.mp4", tmp_path / "ref.mp4"
    export_to_video((rng.uniform(0, 1, (5, 40, 40, 3)) * 255).astype(np.uint8),
                    str(vid), fps=8)
    export_to_video((rng.uniform(0, 1, (4, 40, 40, 3)) * 255).astype(np.uint8),
                    str(ref), fps=8)
    csv_path = tmp_path / "eval.csv"
    csv_path.write_text("video_path,caption,ref_video_path\n"
                        f"{vid},a cat jumps,{ref}\n")
    out_json = tmp_path / "scores.json"

    import importlib.util

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "clip_score_cli", os.path.join(repo_root, "scripts", "clip_score.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    monkeypatch.setattr("sys.argv", [
        "clip_score.py", "--csv", str(csv_path), "--model", str(tmp_path),
        "--aesthetic_model", str(aest_pth), "--raft_model", str(raft_pth),
        "--raft_iters", "2", "--output_json", str(out_json)])
    with jax.default_device(jax.devices("cpu")[0]), torch.no_grad():
        cli.main()
    printed = capsys.readouterr().out
    assert "set-level metrics over 1 videos" in printed
    data = _json.loads(out_json.read_text())
    assert set(data) >= {"clip_score", "aesthetic_quality", "motion_smoothness",
                         "dynamic_degree", "alignment_score", "videos"}
    assert 0.0 <= data["clip_score"] <= 100.0
    assert 0.0 <= data["alignment_score"] <= 100.0
    assert data["dynamic_degree"] in (0.0, 100.0)  # one video
    assert 0.0 <= data["motion_smoothness"] <= 1.0
    assert data["videos"][0]["video_path"] == str(vid)
    for name in ("motion_smoothness", "dynamic_degree", "alignment_score",
                 "clip_score", "aesthetic_quality"):
        assert name in printed


def CLIPTextConfig_tiny_for(vocab_size):
    from vap_tpu.models.text_encoders.clip_text import CLIPTextConfig

    return CLIPTextConfig.tiny(vocab_size=vocab_size, eos_token_id=2,
                               max_position_embeddings=12)


def test_preprocess_frames_shapes_and_range():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (2, 60, 90, 3)).astype(np.uint8)
    out = preprocess_frames(frames, image_size=28)
    assert out.shape == (2, 28, 28, 3)
    assert out.dtype == np.float32
    # normalization: pure-black input maps to -mean/std exactly
    black = preprocess_frames(np.zeros((1, 40, 40, 3), np.uint8), image_size=28)
    from vap_tpu.eval.clip_score import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    np.testing.assert_allclose(black[0, 0, 0], -CLIP_IMAGE_MEAN / CLIP_IMAGE_STD,
                               rtol=1e-5)
