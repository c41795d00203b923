"""Denoise step caching (PAB/AdaCache-family, vap_tpu/pipelines/step_cache.py):
schedule parsing, all-compute == baseline equivalence, and — the point — that
reuse steps actually skip the transformer forward (counted via an ordered
io_callback inside the scanned lax.cond)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig
from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
from vap_tpu.ops.schedulers import CogVideoXDDIMScheduler
from vap_tpu.pipelines.step_cache import parse_step_cache_schedule
from tests.test_pipeline_cogvideox import FakeTokenizer, _init_vae_params


def test_parse_schedule():
    assert parse_step_cache_schedule(None, 10) is None
    assert parse_step_cache_schedule("none", 10) is None
    m = parse_step_cache_schedule("uniform:2", 20)
    assert m.dtype == bool and m.shape == (20,)
    assert m[:5].all() and m[-5:].all()          # warmup/cooldown default 5
    assert m[5] and not m[6] and m[7]            # every 2nd in between
    m = parse_step_cache_schedule("uniform:3:1:0", 8)
    np.testing.assert_array_equal(
        m, [True, True, False, False, True, False, False, True])
    assert parse_step_cache_schedule("uniform:1:1:0", 6).all()
    with pytest.raises(ValueError):
        parse_step_cache_schedule("pyramid:2", 10)
    with pytest.raises(ValueError):
        parse_step_cache_schedule("uniform:0", 10)
    with pytest.raises(ValueError):
        parse_step_cache_schedule("uniform:2:0", 10)  # warmup 0: step 0 uncached


def _tiny_pipe():
    t_cfg = CogVideoXMOTConfig.tiny(in_channels=8, out_channels=4)
    vae_cfg = CogVideoXVAEConfig.tiny()
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_embed_dim)
    key = jax.random.PRNGKey(0)
    return CogVideoXVAPPipeline_built(t_cfg, vae_cfg, txt_cfg, key)


def CogVideoXVAPPipeline_built(t_cfg, vae_cfg, txt_cfg, key):
    from vap_tpu.pipelines.cogvideox_i2v_mot import CogVideoXVAPPipeline

    return CogVideoXVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg,
        params={
            "transformer": init_cogvideox_mot(key, t_cfg),
            "vae": _init_vae_params(key, vae_cfg),
            "text_encoder": init_t5_encoder(key, txt_cfg),
        },
        tokenizer=FakeTokenizer(), scheduler=CogVideoXDDIMScheduler(),
        dtype=jnp.float32,
    )


def _generate(pipe, steps, step_cache, seed=11):
    H = W = 32
    F = 9
    image = np.random.default_rng(2).uniform(-1, 1, (H, W, 3)).astype(np.float32)
    ref_video = np.random.default_rng(3).uniform(-1, 1, (F, H, W, 3)).astype(np.float32)
    return pipe(
        image=image, prompt="a cat", ref_videos=[ref_video],
        prompt_mot_ref=["fx"], height=H, width=W, num_frames=F,
        num_inference_steps=steps, guidance_scale=6.0, use_dynamic_cfg=True,
        max_sequence_length=pipe.transformer_cfg.max_text_seq_length,
        seed=seed, output_type="latent", step_cache=step_cache)


def test_all_compute_schedule_matches_baseline(monkeypatch):
    """uniform:1 computes every step: the cond-wrapped scan must reproduce
    the baseline scan's trajectory."""
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    pipe = _tiny_pipe()
    with jax.default_device(jax.devices("cpu")[0]):
        base = np.asarray(_generate(pipe, 3, None))
        allc = np.asarray(_generate(pipe, 3, "uniform:1:1:0"))
    np.testing.assert_allclose(allc, base, atol=1e-6, rtol=1e-6)


def test_all_compute_matches_baseline_dpm(monkeypatch):
    """Same equivalence under the stateful DPM scheduler (old_x0 carry +
    per-step noise draws must be unaffected by the cond wrapper)."""
    from vap_tpu.ops.schedulers import CogVideoXDPMScheduler

    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    pipe = _tiny_pipe()
    pipe.scheduler = CogVideoXDPMScheduler()
    with jax.default_device(jax.devices("cpu")[0]):
        base = np.asarray(_generate(pipe, 3, None))
        allc = np.asarray(_generate(pipe, 3, "uniform:1:1:0"))
    np.testing.assert_allclose(allc, base, atol=1e-6, rtol=1e-6)


def test_validation_json_forwards_step_cache(tmp_path, monkeypatch):
    """The trainer's validation JSON may carry step_cache; it must survive
    the whole path: _load_validation_config AND _validate's gen-kwarg
    allowlist into spec.validation (a recorder stands in for the pipeline)."""
    import json

    from tests.test_validation_loop import _benchmark_csv, _tiny_trainer

    _benchmark_csv(tmp_path)
    vjson = tmp_path / "validation.json"
    vjson.write_text(json.dumps({
        "csv": "benchmark.csv", "num_inference_steps": 4, "num_frames": 9,
        "height": 32, "width": 32,
        "step_cache": "uniform:2:1:1", "num_samples": 1}))
    trainer = _tiny_trainer(tmp_path, str(vjson))
    _, gen, _ = trainer._load_validation_config()
    assert gen["step_cache"] == "uniform:2:1:1"

    seen = {}

    def fake_validation(merged, sample, **kw):
        seen.update(kw)
        return np.zeros((2, 8, 8, 3), np.float32)

    monkeypatch.setattr(trainer.spec, "validation", fake_validation)
    with jax.default_device(jax.devices("cpu")[0]):
        trainer._validate(jax.random.PRNGKey(0))
    assert seen.get("step_cache") == "uniform:2:1:1"
    assert seen.get("num_inference_steps") == 4


def test_parse_schedule_rejects_zero_steps():
    with pytest.raises(ValueError):
        parse_step_cache_schedule("uniform:2", 0)


def test_wan_step_cache_unipc(monkeypatch):
    """UniPC is the one scheduler threading a multistep corrector
    (m_prev/m_prev2/last_sample) and a coeffs dict through the cond-wrapped
    scan — all-compute must equal baseline, sparse must stay finite."""
    from vap_tpu.models.text_encoders.clip_vision import CLIPVisionConfig, init_clip_vision
    from vap_tpu.models.wan import WanMOTConfig, init_wan_mot
    from vap_tpu.models.wan.vae import WanVAEConfig
    from vap_tpu.ops.schedulers import UniPCScheduler
    from tests.test_pipeline_wan import FakeTokenizer as WanTok, _wan_vae_params
    import vap_tpu.pipelines.wan_i2v_mot as wpl

    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    vae_cfg = WanVAEConfig.tiny()
    t_cfg = WanMOTConfig.tiny(
        in_channels=vae_cfg.z_dim + 4 + vae_cfg.z_dim,
        out_channels=vae_cfg.z_dim, text_len=16)
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_dim, per_layer_relative_bias=True)
    clip_cfg = CLIPVisionConfig.tiny(hidden_size=t_cfg.image_dim)
    key = jax.random.PRNGKey(0)
    pipe = wpl.WanVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg, clip_cfg=clip_cfg,
        params={
            "transformer": init_wan_mot(key, t_cfg),
            "vae": _wan_vae_params(vae_cfg),
            "text_encoder": init_t5_encoder(jax.random.fold_in(key, 1), txt_cfg),
            "image_encoder": init_clip_vision(jax.random.fold_in(key, 2), clip_cfg),
        },
        tokenizer=WanTok(), scheduler=UniPCScheduler(shift=3.0),
        dtype=jnp.float32)

    H = W = 32
    F = 9
    rng = np.random.default_rng(0)
    image = rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
    ref_video = rng.uniform(-1, 1, (F, H, W, 3)).astype(np.float32)

    def gen(sc):
        return np.asarray(pipe(
            image=image, prompt="a dog", ref_videos=[ref_video],
            prompt_mot_ref=["melt it"], height=H, width=W, num_frames=F,
            num_inference_steps=3, guidance_scale=5.0,
            max_sequence_length=t_cfg.text_len, output_type="latent",
            step_cache=sc))

    with jax.default_device(jax.devices("cpu")[0]):
        base = gen(None)
        allc = gen("uniform:1:1:0")
        sparse = gen("uniform:9:1:0")
    np.testing.assert_allclose(allc, base, atol=1e-6, rtol=1e-6)
    assert np.isfinite(sparse).all()
    assert not np.allclose(sparse, base, atol=1e-4)


def test_single_branch_step_cache(monkeypatch):
    """The ablation trunk slices its prediction to the target frames; the
    cached carry must hold the sliced shape and the all-compute schedule
    must still match baseline."""
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    pipe = _tiny_pipe()

    def gen(sc):
        H = W = 32
        F = 9
        image = np.random.default_rng(2).uniform(-1, 1, (H, W, 3)).astype(np.float32)
        ref_video = np.random.default_rng(3).uniform(-1, 1, (F, H, W, 3)).astype(np.float32)
        return np.asarray(pipe(
            image=image, prompt="a cat", ref_videos=[ref_video],
            prompt_mot_ref=["fx"], height=H, width=W, num_frames=F,
            num_inference_steps=2, guidance_scale=6.0,
            max_sequence_length=pipe.transformer_cfg.max_text_seq_length,
            output_type="latent", ablation_single_branch=True, step_cache=sc))

    with jax.default_device(jax.devices("cpu")[0]):
        base = gen(None)
        allc = gen("uniform:1:1:0")
    np.testing.assert_allclose(allc, base, atol=1e-6, rtol=1e-6)


def test_wan_step_cache(monkeypatch):
    """Same mechanics on the Wan pipeline: uniform:1 == baseline; a sparse
    schedule runs the transformer only on compute steps (io_callback count)."""
    import vap_tpu.pipelines.wan_i2v_mot as wpl
    from vap_tpu.models.text_encoders.clip_vision import CLIPVisionConfig, init_clip_vision
    from vap_tpu.models.wan import WanMOTConfig, init_wan_mot
    from vap_tpu.models.wan.vae import WanVAEConfig
    from vap_tpu.ops.schedulers import FlowMatchEulerScheduler
    from tests.test_pipeline_wan import FakeTokenizer as WanTok, _wan_vae_params

    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    calls = []
    real_forward = wpl.wan_mot_forward

    def counting_forward(*a, **kw):
        jax.experimental.io_callback(lambda: calls.append(1), None, ordered=True)
        return real_forward(*a, **kw)

    monkeypatch.setattr(wpl, "wan_mot_forward", counting_forward)

    vae_cfg = WanVAEConfig.tiny()
    t_cfg = WanMOTConfig.tiny(
        in_channels=vae_cfg.z_dim + 4 + vae_cfg.z_dim,
        out_channels=vae_cfg.z_dim, text_len=16)
    txt_cfg = T5Config.tiny(d_model=t_cfg.text_dim, per_layer_relative_bias=True)
    clip_cfg = CLIPVisionConfig.tiny(hidden_size=t_cfg.image_dim)
    key = jax.random.PRNGKey(0)
    pipe = wpl.WanVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg, text_cfg=txt_cfg, clip_cfg=clip_cfg,
        params={
            "transformer": init_wan_mot(key, t_cfg),
            "vae": _wan_vae_params(vae_cfg),
            "text_encoder": init_t5_encoder(jax.random.fold_in(key, 1), txt_cfg),
            "image_encoder": init_clip_vision(jax.random.fold_in(key, 2), clip_cfg),
        },
        tokenizer=WanTok(), scheduler=FlowMatchEulerScheduler(shift=3.0),
        dtype=jnp.float32)

    H = W = 32
    F = 9
    rng = np.random.default_rng(0)
    image = rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
    ref_video = rng.uniform(-1, 1, (F, H, W, 3)).astype(np.float32)

    def gen(steps, sc):
        return np.asarray(pipe(
            image=image, prompt="a dog", ref_videos=[ref_video],
            prompt_mot_ref=["melt it"], height=H, width=W, num_frames=F,
            num_inference_steps=steps, guidance_scale=5.0,
            max_sequence_length=t_cfg.text_len, output_type="latent",
            step_cache=sc))

    with jax.default_device(jax.devices("cpu")[0]):
        base = gen(3, None)
        calls.clear()
        allc = gen(3, "uniform:1:1:0")
        assert len(calls) == 3
        np.testing.assert_allclose(allc, base, atol=1e-6, rtol=1e-6)
        calls.clear()
        sparse = gen(3, "uniform:9:1:0")  # computes only step 0... plus mask[0]
        assert len(calls) == int(parse_step_cache_schedule("uniform:9:1:0", 3).sum())
        assert np.isfinite(sparse).all()
        assert not np.allclose(sparse, base, atol=1e-4)
        # adaptive (TeaCache-family runtime schedule) on the Wan scan too:
        # thresh 0 == uncached; huge thresh computes only the forced steps
        calls.clear()
        ada0 = gen(3, "adaptive:0:1:0")
        assert len(calls) == 3
        np.testing.assert_allclose(ada0, base, atol=1e-6, rtol=1e-6)
        calls.clear()
        ada_hi = gen(3, "adaptive:1e9:1:1")
        assert len(calls) == 2  # warmup step 0 + cooldown last
        assert np.isfinite(ada_hi).all()


def test_reuse_steps_skip_the_forward(monkeypatch):
    """With uniform:3:1:0 over 5 steps, the transformer must run exactly 3
    times (mask T,T,F,F,T) — counted by an ordered io_callback wrapped
    around the forward, which only fires when the lax.cond takes the
    compute branch."""
    import vap_tpu.pipelines.cogvideox_i2v_mot as pl

    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    mask = parse_step_cache_schedule("uniform:3:1:0", 5)
    np.testing.assert_array_equal(mask, [True, True, False, False, True])

    calls = []
    real_forward = pl.cogvideox_mot_forward

    def counting_forward(*a, **kw):
        jax.experimental.io_callback(lambda: calls.append(1), None, ordered=True)
        return real_forward(*a, **kw)

    monkeypatch.setattr(pl, "cogvideox_mot_forward", counting_forward)
    pipe = _tiny_pipe()
    with jax.default_device(jax.devices("cpu")[0]):
        base = np.asarray(_generate(pipe, 5, None))
        n_base = len(calls)
        calls.clear()
        cached = np.asarray(_generate(pipe, 5, "uniform:3:1:0"))
        n_cached = len(calls)
    assert n_base == 5, n_base
    assert n_cached == int(mask.sum()) == 3, n_cached
    assert np.isfinite(cached).all()
    # the approximation must actually differ from the full trajectory
    assert not np.allclose(cached, base, atol=1e-4)


def test_step_cache_quality_harness(monkeypatch):
    """evaluate_schedules (vap_tpu/eval/step_cache_quality.py): the
    quality-gate loop runs full + cached generations and scores them; an
    all-compute schedule has exactly zero CLIP delta (identical trajectory)
    and a skipping schedule reports its computed-step count."""
    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    from test_clip_score import FakeTokenizer as ClipTok

    from vap_tpu.eval import CLIPScoreConfig, CLIPScorer, init_clip_score
    from vap_tpu.eval.step_cache_quality import (
        evaluate_schedules, format_table, passes_gate)

    pipe = _tiny_pipe()
    ccfg = CLIPScoreConfig.tiny()
    scorer = CLIPScorer(init_clip_score(jax.random.PRNGKey(5), ccfg), ccfg,
                        ClipTok(ccfg.text.eos_token_id, ccfg.text.vocab_size))
    H = W = 32
    F = 9
    rng = np.random.default_rng(7)
    samples = [dict(
        image=rng.uniform(-1, 1, (H, W, 3)).astype(np.float32),
        prompt="a cat jumps",
        ref_videos=[rng.uniform(-1, 1, (F, H, W, 3)).astype(np.float32)],
        prompt_mot_ref=["fx"])]

    with jax.default_device(jax.devices("cpu")[0]):
        rows = evaluate_schedules(
            pipe, scorer, samples,
            schedules=["uniform:1:1:0", "uniform:2:1:1"],
            num_inference_steps=4, height=H, width=W, num_frames=F,
            guidance_scale=6.0, use_dynamic_cfg=True, seed=11,
            max_sequence_length=pipe.transformer_cfg.max_text_seq_length)

    assert [r["schedule"] for r in rows] == [None, "uniform:1:1:0", "uniform:2:1:1"]
    full, allc, skip = rows
    assert full["computed_steps"] == 4 and full["clip_delta"] == 0.0
    # all-compute schedule: same trajectory, same score, zero delta
    assert allc["computed_steps"] == 4
    assert abs(allc["clip_delta"]) < 1e-5 and allc["passes_gate"]
    # skipping schedule: computes 3 of 4 (warmup 1, step 2 reused, cooldown 1)
    assert skip["computed_steps"] == 3
    assert np.isfinite(skip["clip_delta"])
    table = format_table(rows)
    assert "full" in table and "uniform:2:1:1" in table

    # the promotion gate: small drops pass, big drops fail, gains always pass
    assert passes_gate(0.0) and passes_gate(-1.0) and passes_gate(0.25)
    assert not passes_gate(0.26)
    assert passes_gate(1.0, max_clip_drop=2.0)


def test_parse_adaptive_spec():
    from vap_tpu.pipelines.step_cache import StepCacheSpec, parse_step_cache

    sc = parse_step_cache("adaptive:0.1:2:1", 6)
    assert isinstance(sc, StepCacheSpec) and sc.kind == "adaptive"
    assert sc.thresh == 0.1
    np.testing.assert_array_equal(sc.mask, [True, True, False, False, False, True])
    # defaults: warmup 5, cooldown 5
    sc = parse_step_cache("adaptive:0.2", 12)
    assert sc.mask.sum() == 10 and not sc.mask[5] and not sc.mask[6]
    # uniform specs round-trip through the same entry point
    un = parse_step_cache("uniform:2:1:0", 5)
    assert un.kind == "uniform"
    np.testing.assert_array_equal(un.mask, parse_step_cache_schedule("uniform:2:1:0", 5))
    assert parse_step_cache(None, 5) is None
    with pytest.raises(ValueError, match="THRESH>=0"):
        parse_step_cache("adaptive:-1", 5)
    with pytest.raises(ValueError, match="THRESH>=0"):
        parse_step_cache("adaptive:0.1:0", 5)  # warmup 0: step 0 uncached
    with pytest.raises(ValueError, match="unknown step_cache spec"):
        parse_step_cache("teacache:0.1", 5)
    # the uniform-only legacy parser refuses runtime schedules loudly
    with pytest.raises(ValueError, match="no static schedule"):
        parse_step_cache_schedule("adaptive:0.1", 5)


def test_adaptive_step_cache(monkeypatch):
    """adaptive:0 recomputes every step (trajectory identical to uncached);
    a huge threshold computes exactly the forced warmup/cooldown steps; the
    computed-step count is monotone in the threshold."""
    import vap_tpu.pipelines.cogvideox_i2v_mot as pl

    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    calls = []
    real_forward = pl.cogvideox_mot_forward

    def counting_forward(*a, **kw):
        jax.experimental.io_callback(lambda: calls.append(1), None, ordered=True)
        return real_forward(*a, **kw)

    monkeypatch.setattr(pl, "cogvideox_mot_forward", counting_forward)
    pipe = _tiny_pipe()

    def run(sc):
        calls.clear()
        out = np.asarray(_generate(pipe, 5, sc))
        return out, len(calls)

    with jax.default_device(jax.devices("cpu")[0]):
        base, n_base = run(None)
        zero, n_zero = run("adaptive:0:1:0")
        forced, n_forced = run("adaptive:1e9:1:1")
        mid, n_mid = run("adaptive:0.05:1:0")
        hi, n_hi = run("adaptive:0.2:1:0")
    assert n_base == n_zero == 5
    np.testing.assert_allclose(zero, base, atol=1e-6, rtol=1e-6)
    assert n_forced == 2  # step 0 (warmup) + last (cooldown)
    assert np.isfinite(forced).all()
    # runtime decisions: between the extremes, monotone in the threshold
    assert 2 <= n_hi <= n_mid <= 5, (n_hi, n_mid)
    assert np.isfinite(mid).all() and np.isfinite(hi).all()
