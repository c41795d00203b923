"""W8A8 int8 linear (opt-in inference mode) accuracy tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vap_tpu.models.common import (
    init_linear, linear, quantize_linear_int8, quantize_transformer_linears)


def _cos(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_int8_linear_matches_fp():
    key = jax.random.PRNGKey(0)
    p = init_linear(key, 64, 128)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 64), jnp.float32)
    ref = linear(p, x)
    got = linear(quantize_linear_int8(p), x)
    assert _cos(got, ref) > 0.9995
    rel = np.abs(np.asarray(got) - np.asarray(ref)).mean() / np.abs(np.asarray(ref)).mean()
    assert rel < 0.03, rel


def test_int8_linear_stacked_scan_axis():
    """Stacked [L, in, out] kernels quantize per (L, out) channel and slice
    through lax.scan exactly like bf16 kernels."""
    key = jax.random.PRNGKey(2)
    L, D, O = 3, 32, 48
    kern = jax.random.normal(key, (L, D, O), jnp.float32) * 0.05
    p = {"kernel": kern, "bias": jnp.zeros((L, O))}
    q = quantize_linear_int8(p)
    assert q["w_i8"].shape == (L, D, O) and q["s_w"].shape == (L, O)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, D), jnp.float32)
    for i in range(L):
        sl = jax.tree.map(lambda a: a[i], q)
        ref = linear({"kernel": kern[i], "bias": p["bias"][i]}, x)
        assert _cos(linear(sl, x), ref) > 0.9995


def test_quantize_transformer_forward_cos():
    """Tiny MoT forward with quantized projections stays close to bf16."""
    from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
    from vap_tpu.models.cogvideox.transformer_mot import cogvideox_mot_forward
    from vap_tpu.ops.rope import prepare_cogvideox_rotary_embeddings

    cfg = CogVideoXMOTConfig.tiny(in_channels=8, out_channels=4)
    params = init_cogvideox_mot(jax.random.PRNGKey(0), cfg)
    qparams = quantize_transformer_linears(params)

    B, F, C, H, W = 1, 2, cfg.in_channels, 8, 8
    kw = dict(attention_head_dim=cfg.attention_head_dim, patch_size=cfg.patch_size,
              patch_size_t=cfg.patch_size_t, sample_width=cfg.sample_width,
              sample_height=cfg.sample_height)
    rope = prepare_cogvideox_rotary_embeddings(H * 8, W * 8, F, **kw)
    rope_ref = prepare_cogvideox_rotary_embeddings(H * 8, W * 8, F, mot_num=1, **kw)
    key = jax.random.PRNGKey(1)
    args = dict(
        hidden_states=jax.random.normal(key, (B, F, C, H, W), jnp.float32),
        encoder_hidden_states=jax.random.normal(key, (B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32),
        timestep=jnp.array([500.0]), image_rotary_emb=rope,
        hidden_states_mot_ref=jax.random.normal(key, (B, F, C, H, W), jnp.float32),
        encoder_hidden_states_mot_ref=jax.random.normal(key, (B, cfg.max_text_seq_length, cfg.text_embed_dim), jnp.float32),
        image_rotary_emb_mot_ref=rope_ref, num_mot_ref=1,
    )
    ref, _ = cogvideox_mot_forward(params, cfg, **args)
    got, _ = cogvideox_mot_forward(qparams, cfg, **args)
    assert _cos(got, ref) > 0.999


def test_quantize_wan_transformer_forward_cos():
    """W8A8 is family-generic: the Wan MoT transformer uses the same
    projection names (to_q/to_k/to_v/to_out, ffn net_0/net_2), so the same
    quantize traversal covers it — the path that lets the 14B Wan DiT's
    weights drop to int8 on-chip. Tiny forward must stay close to bf16."""
    from vap_tpu.models.wan import WanMOTConfig, init_wan_mot
    from vap_tpu.models.wan.transformer_mot import wan_mot_forward
    from vap_tpu.ops.attention import attention_provider

    cfg = WanMOTConfig.tiny()
    params = init_wan_mot(jax.random.PRNGKey(0), cfg)
    qparams = quantize_transformer_linears(params)
    # the traversal must actually have hit the projections
    flat = jax.tree_util.tree_flatten_with_path(qparams)[0]
    n_q = sum(1 for path, _ in flat
              if any(getattr(k, "key", None) == "w_i8" for k in path))
    assert n_q >= 8, f"only {n_q} quantized projections found"

    key = jax.random.PRNGKey(1)
    B, F, H, W = 1, 2, 8, 8
    kw = dict(
        hidden_states=jax.random.normal(key, (B, F, H, W, cfg.in_channels), jnp.float32),
        timestep=jnp.array([500.0]),
        encoder_hidden_states=jax.random.normal(key, (B, cfg.text_len, cfg.text_dim), jnp.float32),
        encoder_hidden_states_image=jax.random.normal(key, (B, 257, cfg.image_dim), jnp.float32),
        hidden_states_mot_ref=jax.random.normal(key, (B, F, H, W, cfg.in_channels), jnp.float32),
        timestep_mot_ref=jnp.array([[1.0]]),
        encoder_hidden_states_mot_ref=jax.random.normal(key, (B, cfg.text_len, cfg.text_dim), jnp.float32),
        encoder_hidden_states_image_mot_ref=jax.random.normal(key, (B, 257, cfg.image_dim), jnp.float32),
        num_mot_ref=1,
    )
    with jax.default_device(jax.devices("cpu")[0]), attention_provider("xla"):
        ref, _ = wan_mot_forward(params, cfg, **kw)
        got, _ = wan_mot_forward(qparams, cfg, **kw)
    assert _cos(got, ref) > 0.999


def test_bench_int8_fast_init_matches_quantize_traversal():
    """bench.py's quantized fast-init must produce exactly the tree that
    quantizing the bf16 fast-init produces: same structure, shapes, dtypes.
    Both now share models/common.py map_transformer_linears as the match
    rule; this guards the int8 branch the bench runs by default on TPU
    (tests/test_bench_smoke.py pins VAP_BENCH_INT8_LINEAR=0 for speed, so
    without this test the branch would ship untested)."""
    import bench
    from vap_tpu.models.cogvideox.config import CogVideoXMOTConfig

    cfg = CogVideoXMOTConfig.tiny(in_channels=8, out_channels=4)
    p8 = bench.fast_init_transformer(cfg, int8=True)
    pq = quantize_transformer_linears(bench.fast_init_transformer(cfg, int8=False))

    assert jax.tree_util.tree_structure(p8) == jax.tree_util.tree_structure(pq)
    n_q = 0
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(p8)[0],
            jax.tree_util.tree_flatten_with_path(pq)[0]):
        assert a.shape == b.shape and a.dtype == b.dtype, path
        n_q += any(getattr(k, "key", None) == "w_i8" for k in path)
    assert n_q > 0  # the int8 projections actually exist


def test_bench_import_does_not_arm_watchdog():
    """Importing bench (as this module does for fast_init_transformer) must
    NEVER start the backend-init watchdog: it os._exit(17)s the whole host
    process when the event stays unset — armed at import, it killed a full
    pytest run 300 s in. The watchdog belongs to `python bench.py` only."""
    import threading

    import bench  # noqa: F401

    assert not [t for t in threading.enumerate()
                if t.name == "bench-backend-watchdog"]
