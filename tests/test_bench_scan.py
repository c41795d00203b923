"""bench.make_denoise_scan: the measured step-cached trajectory must equal a
manual per-step loop (full compute), skip exactly the scheduled steps
(uniform), count runtime decisions (adaptive), and be invariant to the
chunked execution that bounds device-program length (VAP_BENCH_SCAN_CHUNK)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bench import fast_init_transformer, make_denoise_scan
from vap_tpu.models.cogvideox.config import CogVideoXMOTConfig
from vap_tpu.ops.attention import attention_provider
from vap_tpu.ops.rope import prepare_cogvideox_rotary_embeddings
from vap_tpu.ops.schedulers import CogVideoXDDIMScheduler
from vap_tpu.pipelines.step_cache import parse_step_cache

TOTAL = 8


@pytest.fixture(scope="module")
def setup():
    cfg = CogVideoXMOTConfig.tiny(in_channels=8, out_channels=4)
    dtype = jnp.float32
    with jax.default_device(jax.devices("cpu")[0]):
        params = fast_init_transformer(cfg, dtype)
        lat_f, lat_h, lat_w = 2, 8, 8
        C = cfg.in_channels // 2
        T = cfg.max_text_seq_length
        key = jax.random.PRNGKey(0)
        kw = dict(attention_head_dim=cfg.attention_head_dim, patch_size=cfg.patch_size,
                  patch_size_t=cfg.patch_size_t, sample_width=cfg.sample_width,
                  sample_height=cfg.sample_height)
        scheduler = CogVideoXDDIMScheduler()
        a, b, ap = (jnp.asarray(c) for c in scheduler.step_coefficients(TOTAL))
        fixed = dict(
            embeds=jax.random.normal(key, (2, T, cfg.text_embed_dim), dtype),
            embeds_ref=jax.random.normal(jax.random.fold_in(key, 1), (2, T, cfg.text_embed_dim), dtype),
            ref_in=jax.random.normal(jax.random.fold_in(key, 2), (2, lat_f, cfg.in_channels, lat_h, lat_w), dtype),
            image_latents=jax.random.normal(jax.random.fold_in(key, 3), (2, lat_f, C, lat_h, lat_w), dtype),
            rope=prepare_cogvideox_rotary_embeddings(lat_h * 8, lat_w * 8, lat_f, **kw),
            rope_ref=prepare_cogvideox_rotary_embeddings(lat_h * 8, lat_w * 8, lat_f, mot_num=1, **kw),
            dtype=dtype, a=a, b=b, ap=ap)
        lat0 = jax.random.normal(jax.random.fold_in(key, 4), (1, lat_f, C, lat_h, lat_w), jnp.float32)
    return cfg, scheduler, fixed, lat0


def _run(setup, spec_str, chunk):
    cfg, scheduler, fixed, lat0 = setup
    spec = parse_step_cache(spec_str, TOTAL) if spec_str else None
    scan = make_denoise_scan(cfg, scheduler, spec, fixed, TOTAL, chunk_steps=chunk)
    with jax.default_device(jax.devices("cpu")[0]), attention_provider("xla"):
        lat, n = scan(fixed_params(setup), lat0)
        return np.asarray(lat), int(n)


def fixed_params(setup):
    cfg = setup[0]
    with jax.default_device(jax.devices("cpu")[0]):
        return fast_init_transformer(cfg, jnp.float32)


def test_full_compute_counts_and_chunk_invariance(setup):
    lat_a, n_a = _run(setup, None, chunk=TOTAL)
    lat_b, n_b = _run(setup, None, chunk=3)  # 3+3+2 chunks
    assert n_a == n_b == TOTAL
    np.testing.assert_allclose(lat_a, lat_b, atol=1e-5, rtol=1e-5)


def test_uniform_schedule_skips_and_diverges(setup):
    # warmup 2, cooldown 1, every 2nd between -> computed < TOTAL
    lat_full, _ = _run(setup, None, chunk=TOTAL)
    lat_c, n_c = _run(setup, "uniform:2:2:1", chunk=TOTAL)
    expect = parse_step_cache("uniform:2:2:1", TOTAL).mask.sum()
    assert n_c == expect < TOTAL
    assert np.abs(lat_c - lat_full).max() > 0  # approximation, not a no-op
    lat_c2, n_c2 = _run(setup, "uniform:2:2:1", chunk=3)
    assert n_c2 == n_c
    np.testing.assert_allclose(lat_c, lat_c2, atol=1e-5, rtol=1e-5)


def test_adaptive_counts_runtime_decisions(setup):
    # thresh 0 computes every step -> equals full compute
    lat_full, _ = _run(setup, None, chunk=TOTAL)
    lat_a, n_a = _run(setup, "adaptive:0.0:1:0", chunk=3)
    assert n_a == TOTAL
    np.testing.assert_allclose(lat_a, lat_full, atol=1e-5, rtol=1e-5)
    # a huge threshold computes only the forced warmup/cooldown steps
    lat_b, n_b = _run(setup, "adaptive:1e9:2:1", chunk=TOTAL)
    assert n_b == parse_step_cache("adaptive:1e9:2:1", TOTAL).mask.sum()


def test_best_gated_schedule_selection(tmp_path, monkeypatch):
    """bench's 'auto' step-cache default must pick the fastest (fewest
    computed steps) schedule whose recorded gate passes, and fall back to
    uniform:2 when none passes / no record exists."""
    import json
    import bench

    rec = {"step_cache": {"schedules": {
        "uniform:2": {"passes_gate": False, "computed_steps": 30},
        "uniform:2:10:5": {"passes_gate": True, "computed_steps": 32},
        "adaptive:0.12": {"passes_gate": True, "computed_steps": 36},
    }}}
    p = tmp_path / "step_cache_gate.json"
    p.write_text(json.dumps(rec))
    monkeypatch.setattr(bench, "_load_quality_record",
                        lambda: json.loads(p.read_text()))
    assert bench._best_gated_schedule() == "uniform:2:10:5"

    rec["step_cache"]["schedules"]["uniform:2"]["passes_gate"] = True
    p.write_text(json.dumps(rec))
    assert bench._best_gated_schedule() == "uniform:2"

    monkeypatch.setattr(bench, "_load_quality_record", lambda: {})
    assert bench._best_gated_schedule() == "uniform:2"
