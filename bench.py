"""Benchmark: CogVideoX-5B Video-As-Prompt generation throughput on TPU.

Measures the hot path of the flagship config (49 frames @ 480x720, 50 steps,
CFG batch 2, 1 reference video => joint attention over 2x(226+17550) tokens)
and the VAE decode, then prints ONE JSON line:

  {"metric": ..., "value": <sec/video per chip>, "unit": "s", "vs_baseline": ...}

With the default W8A8 projections the FULL 42-block model (~9.5 GB of int8
weights) fits the 16 GB v5e chip, so the step time is MEASURED at real depth
(no extrapolation). With VAP_BENCH_INT8_LINEAR=0 the 10B-param bf16 model
does not fit: depth is scaled down (VAP_BENCH_BLOCKS, default 18 of 42) and
per-step time is extrapolated linearly in depth — per-block compute is
homogeneous (every block carries MoT in the released config), making the
extrapolation exact up to the (measured) non-block overhead.

Baseline: the reference publishes no latency numbers (BASELINE.md). We use a
600 s/video A100 estimate for CogVideoX-5B VAP (50 steps, CFG, MoT doubling
the token stream over the ~5 s/step known CogVideoX-5B 480p step time).
vs_baseline = baseline_sec / our_sec (higher is better; >=2.0 is the north
star on v5p).

Env knobs: VAP_BENCH_BLOCKS, VAP_BENCH_STEPS (timed steps), VAP_BENCH_FRAMES,
VAP_BENCH_HEIGHT/WIDTH, VAP_BENCH_SKIP_VAE, VAP_BENCH_PROFILE_DIR, VAP_BENCH_ATTN (sage|flash|xla|
null — 'null' skips attention math for roofline attribution: measured
step_null = 2.59 s at 18 blocks, i.e. the linears+elementwise cost; the
remaining ~4.5 s matches the 122.9 TFLOP/s sage kernel at 559 TFLOP of
attention, so the step is attention-MXU-bound, not overhead-bound).
"""

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# Fail FAST if the remote-TPU tunnel is wedged: its PJRT client creation
# blocks forever inside the first jax.devices()/backend touch (no exception),
# which would otherwise hang the whole bench run silently. The watchdog is
# disarmed the moment backend init succeeds; normal startup takes seconds.
# Armed ONLY from __main__ — importers of this module (tests reuse
# fast_init_transformer) must never inherit an os._exit timer.
_BACKEND_READY = threading.Event()


def _backend_watchdog(timeout_s: float = float(os.environ.get("VAP_BENCH_INIT_TIMEOUT", 300))):
    if not _BACKEND_READY.wait(timeout_s):
        print(f"bench: jax backend init did not complete within {timeout_s:.0f}s "
              f"— remote TPU service unreachable/wedged; aborting", file=sys.stderr)
        sys.stderr.flush()
        os._exit(17)


def _arm_backend_watchdog():
    threading.Thread(target=_backend_watchdog, daemon=True,
                     name="bench-backend-watchdog").start()

from vap_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np

from vap_tpu.models.cogvideox.config import CogVideoXMOTConfig
from vap_tpu.models.cogvideox.transformer_mot import (
    _init_block,
    cogvideox_mot_forward,
)
from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig, init_cogvideox_vae
from vap_tpu.models.common import init_layer_norm, init_linear, init_timestep_embedding_mlp
from vap_tpu.ops.rope import prepare_cogvideox_rotary_embeddings
from vap_tpu.ops.schedulers import CogVideoXDDIMScheduler

A100_BASELINE_SEC = 600.0  # documented estimate; reference publishes none


def fast_init_transformer(cfg: CogVideoXMOTConfig, dtype=jnp.bfloat16, int8: bool = False):
    """Init stacked block leaves directly at [L, ...] (no per-block stack copy),
    so a near-HBM-sized model can be materialized without a 2x peak.

    With int8=True the block projection kernels are materialized directly in
    their W8A8 quantized form ({'w_i8','s_w'}, per-output-channel scales):
    each stacked kernel is generated+quantized one L-slice at a time under
    `lax.map`, so the bf16 intermediate never exceeds one block's slice and
    the FULL 42-block model (~9.5 GB int8) fits a 16 GB v5e — the bench then
    measures the real depth instead of extrapolating 18->42."""
    import functools

    from vap_tpu.models.common import (
        INT8_LINEAR_NAMES, map_transformer_linears, quantize_linear_int8)

    key = jax.random.PRNGKey(0)

    def make_segment(has_mot: bool, L: int):
        proto = jax.eval_shape(lambda k: _init_block(k, cfg, has_mot, dtype), key)

        if not int8:
            leaves, treedef = jax.tree_util.tree_flatten(proto)
            out_leaves = []
            for i, leaf in enumerate(leaves):
                k = jax.random.fold_in(key, i)
                out_leaves.append(jax.random.normal(k, (L,) + leaf.shape, dtype) * 0.02)
            return jax.tree_util.tree_unflatten(treedef, out_leaves)

        counter = iter(range(1 << 20))

        @functools.partial(jax.jit, static_argnums=(1,))
        def gen(k, shape):
            return jax.random.normal(k, (L,) + shape, dtype) * 0.02

        @functools.partial(jax.jit, static_argnums=(1,))
        def gen_q(k, shape):
            def one(kk):
                w = jax.random.normal(kk, shape, dtype) * 0.02
                q = quantize_linear_int8({"kernel": w})
                return q["w_i8"], q["s_w"]

            w_i8, s_w = jax.lax.map(one, jax.random.split(k, L))
            return {"w_i8": w_i8, "s_w": s_w}

        def gen_leaf(node):
            return gen(jax.random.fold_in(key, next(counter)), tuple(node.shape))

        def quantize_proto(v):
            q = gen_q(jax.random.fold_in(key, next(counter)),
                      tuple(v["kernel"].shape))
            if "bias" in v:
                q = dict(q, bias=gen_leaf(v["bias"]))
            return q

        # map_transformer_linears owns the which-projections-match rule, so
        # this init stays in lockstep with quantize_transformer_linears.
        return map_transformer_linears(
            proto, quantize_proto, INT8_LINEAR_NAMES, leaf_fn=gen_leaf)

    blocks = tuple(make_segment(has_mot, length)
                   for _, length, has_mot in cfg.mot_segments)

    from vap_tpu.models.cogvideox.transformer_mot import _default_pos_embedding

    dim = cfg.inner_dim
    patch_in = cfg.in_channels * cfg.patch_size * cfg.patch_size
    out_dim = cfg.patch_size * cfg.patch_size * cfg.out_channels
    ks = jax.random.split(key, 10)

    def patch_embed(k1, k2):
        p = {
            "proj": init_linear(k1, patch_in, dim, dtype=dtype),
            "text_proj": init_linear(k2, cfg.text_embed_dim, dim, dtype=dtype),
        }
        if cfg.use_learned_positional_embeddings:
            p["pos_embedding"] = jnp.asarray(_default_pos_embedding(cfg), dtype)
        return p

    params = {
        "patch_embed": patch_embed(ks[0], ks[1]),
        "patch_embed_mot_ref": patch_embed(ks[2], ks[3]),
        "time_embedding": init_timestep_embedding_mlp(ks[4], dim, cfg.time_embed_dim, dtype=dtype),
        "time_embedding_mot_ref": init_timestep_embedding_mlp(ks[5], dim, cfg.time_embed_dim, dtype=dtype),
        "norm_final": init_layer_norm(dim, dtype=dtype),
        "norm_out": {
            "linear": init_linear(ks[6], cfg.time_embed_dim, 2 * dim, dtype=dtype),
            "norm": init_layer_norm(dim, dtype=dtype),
        },
        "proj_out": init_linear(ks[7], dim, out_dim, dtype=dtype),
        "blocks": blocks,
    }
    return params


def step_flops(cfg, n_blocks: int, lat_f: int, lat_h: int, lat_w: int) -> dict:
    """Analytic FLOPs of one CFG denoise step (joint MoT attention + linears),
    for MFU/roofline reporting. Counts multiply+add as 2."""
    b = 2  # CFG batch
    d = cfg.inner_dim
    txt = cfg.max_text_seq_length
    vid = lat_f * (lat_h // cfg.patch_size) * (lat_w // cfg.patch_size)
    s_branch = txt + vid
    s_joint = 2 * s_branch           # [target ‖ ref] joint self-attention
    n_tok = b * s_joint              # tokens through every linear (both branches)
    attn = 4.0 * b * cfg.num_attention_heads * s_joint ** 2 * cfg.attention_head_dim
    linear = n_tok * (4 * d * d + 8 * d * d) * 2.0  # qkv+out (4d^2) + ffn (8d^2)
    total = n_blocks * (attn + linear)
    return {"attn": n_blocks * attn, "linear": n_blocks * linear, "total": total}


V5E_BF16_PEAK = 197e12  # per-chip bf16 peak (v5e); int8 is 2x


def main():
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # CPU smoke runs: the remote plugin's get_backend hook ignores the
        # env var and would still initialize (and hang on) the tunnel —
        # the config pin keeps backends() away from it entirely
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    jax.devices()  # first backend touch — hangs here iff the tunnel is wedged
    _BACKEND_READY.set()
    int8_linears = os.environ.get("VAP_BENCH_INT8_LINEAR", "1") == "1"
    # int8-stored projections fit the FULL 42-block model in 16 GB v5e HBM;
    # bf16 does not (10B params) and measures 18 blocks + linear extrapolation
    n_blocks = int(os.environ.get("VAP_BENCH_BLOCKS", "42" if int8_linears else "18"))
    n_steps = int(os.environ.get("VAP_BENCH_STEPS", "3"))
    frames = int(os.environ.get("VAP_BENCH_FRAMES", "49"))
    height = int(os.environ.get("VAP_BENCH_HEIGHT", "480"))
    width = int(os.environ.get("VAP_BENCH_WIDTH", "720"))
    skip_vae = os.environ.get("VAP_BENCH_SKIP_VAE", "0") == "1"
    attn_impl = os.environ.get("VAP_BENCH_ATTN", "sage")  # sage | flash | xla
    full_blocks = 42
    total_steps = 50
    dtype = jnp.bfloat16

    cfg = CogVideoXMOTConfig.cogvideox_5b_i2v_vap(
        num_layers=n_blocks, block_idx_with_mot_ref=tuple(range(n_blocks)))
    lat_f = (frames - 1) // 4 + 1
    lat_h, lat_w = height // 8, width // 8
    latent_channels = cfg.in_channels // 2
    T = cfg.max_text_seq_length

    # W8A8 projections (per-out-channel weights + dynamic per-token
    # activations on the int8 MXU) — DEFAULT ON: the denoise-trajectory
    # accuracy gate (tests/test_int8_gate.py) holds final-latent cosine
    # >= 0.999 and decoded PSNR >= 30 dB over a full multi-step VAP
    # trajectory (measured 1.000 / 77 dB), the standard CLIP-parity
    # proxy. Disable with VAP_BENCH_INT8_LINEAR=0.
    params = fast_init_transformer(cfg, dtype, int8=int8_linears)
    jax.block_until_ready(params)

    kw = dict(attention_head_dim=cfg.attention_head_dim, patch_size=cfg.patch_size,
              patch_size_t=cfg.patch_size_t, sample_width=cfg.sample_width,
              sample_height=cfg.sample_height)
    rope = prepare_cogvideox_rotary_embeddings(height, width, lat_f, **kw)
    rope_ref = prepare_cogvideox_rotary_embeddings(height, width, lat_f, mot_num=1, **kw)

    scheduler = CogVideoXDDIMScheduler()
    a_t, b_t, ap_t = (jnp.asarray(c) for c in scheduler.step_coefficients(total_steps))

    key = jax.random.PRNGKey(0)
    latents = jax.random.normal(key, (1, lat_f, latent_channels, lat_h, lat_w), jnp.float32)
    image_latents = jax.random.normal(key, (2, lat_f, latent_channels, lat_h, lat_w), dtype)
    ref_in = jax.random.normal(key, (2, lat_f, cfg.in_channels, lat_h, lat_w), dtype)
    embeds = jax.random.normal(key, (2, T, cfg.text_embed_dim), dtype)
    embeds_ref = jax.random.normal(key, (2, T, cfg.text_embed_dim), dtype)

    @jax.jit
    def denoise_step(params, latents, t, guidance, a, b, ap):
        latent_in = jnp.concatenate([latents.astype(dtype)] * 2, axis=0)
        latent_in = jnp.concatenate([latent_in, image_latents], axis=2)
        pred, _ = cogvideox_mot_forward(
            params, cfg, hidden_states=latent_in, encoder_hidden_states=embeds,
            timestep=jnp.broadcast_to(t, (2,)), image_rotary_emb=rope,
            hidden_states_mot_ref=ref_in, encoder_hidden_states_mot_ref=embeds_ref,
            image_rotary_emb_mot_ref=rope_ref, num_mot_ref=1,
        )
        pred = pred.astype(jnp.float32)
        uncond, cond = jnp.split(pred, 2, axis=0)
        pred = uncond + guidance * (cond - uncond)
        return scheduler.step(pred, latents, a, b, ap)

    from vap_tpu.ops.attention import attention_provider

    # compile + warmup (the provider contextvar is read at trace time)
    t0 = time.perf_counter()
    with attention_provider(attn_impl):
        latents = denoise_step(params, latents, jnp.float32(999.0), jnp.float32(6.0), a_t[0], b_t[0], ap_t[0])
        float(jnp.mean(latents))  # materialize (axon block_until_ready lies)
        compile_s = time.perf_counter() - t0

        profile_dir = os.environ.get("VAP_BENCH_PROFILE_DIR")
        if profile_dir:
            # steady-state trace for tail attribution (docs/ROOFLINE.md
            # "non-attention floor") — profiled steps are NOT the timed steps
            jax.profiler.start_trace(profile_dir)
            for i in range(2):
                latents = denoise_step(params, latents, jnp.float32(950 - i), jnp.float32(6.0),
                                       a_t[i % total_steps], b_t[i % total_steps], ap_t[i % total_steps])
            float(jnp.mean(latents))
            jax.profiler.stop_trace()

        t0 = time.perf_counter()
        for i in range(n_steps):
            latents = denoise_step(params, latents, jnp.float32(900 - i), jnp.float32(6.0),
                                   a_t[i % total_steps], b_t[i % total_steps], ap_t[i % total_steps])
        float(jnp.mean(latents))
    step_s = (time.perf_counter() - t0) / n_steps

    flops = step_flops(cfg, n_blocks, lat_f, lat_h, lat_w)
    mfu = flops["total"] / step_s / V5E_BF16_PEAK

    # VAE decode: the pipeline's real path — 2 blended W-tiles, each streamed
    # per temporal chunk (vae_decode_wsplit; 1.24x frame area vs the 3x3
    # reference grid's 2.25x). Compiles 4 graphs on first run; the on-disk
    # compilation cache makes subsequent runs warm-start.
    decode_s = 0.0
    if not skip_vae:
        del params  # free transformer HBM before the VAE phase
        from vap_tpu.models.cogvideox.vae import vae_decode_wsplit

        vae_cfg = CogVideoXVAEConfig()
        vae_params = init_cogvideox_vae(jax.random.PRNGKey(1), vae_cfg, dtype)
        z = jax.random.normal(key, (1, lat_f, height // 8, width // 8, vae_cfg.latent_channels), dtype)
        n_splits = 2 if width // 8 >= 80 else 1
        out = vae_decode_wsplit(vae_params, vae_cfg, z, n_splits)
        float(jnp.mean(out.astype(jnp.float32)))  # compile + materialize
        t0 = time.perf_counter()
        out = vae_decode_wsplit(vae_params, vae_cfg, z, n_splits)
        float(jnp.mean(out.astype(jnp.float32)))
        decode_s = time.perf_counter() - t0
        del vae_params, out

    sec_per_video = step_s * (full_blocks / n_blocks) * total_steps + decode_s
    vae_fps = frames / decode_s if decode_s > 0 else 0.0

    # derived, not headline: opt-in step caching (--step_cache uniform:2 on
    # the inference surfaces; pipelines/step_cache.py) skips the transformer
    # on scheduled steps — sec/video scales with the number of computed
    # forwards (the skipped steps' scheduler math is sub-ms). Quality is
    # content-dependent, so the headline stays full-compute.
    from vap_tpu.pipelines.step_cache import parse_step_cache_schedule

    cached_steps = int(parse_step_cache_schedule("uniform:2", total_steps).sum())
    sec_per_video_cached = step_s * (full_blocks / n_blocks) * cached_steps + decode_s

    result = {
        "metric": "sec/video (49f@480p, 50 steps, CogVideoX-5B VAP, 1 chip)",
        "value": round(sec_per_video, 2),
        "unit": "s",
        "vs_baseline": round(A100_BASELINE_SEC / sec_per_video, 3),
        "details": {
            "device": str(jax.devices()[0]),
            "attn_impl": attn_impl,
            "int8_linears": int8_linears,
            "step_s_measured": round(step_s, 3),
            "blocks_measured": n_blocks,
            "blocks_full": full_blocks,
            "vae_decode_s": round(decode_s, 3),
            "vae_decode_fps": round(vae_fps, 2),
            "compile_s": round(compile_s, 1),
            "mfu": round(mfu, 3),
            "step_tflops": round(flops["total"] / 1e12, 1),
            "attn_flop_share": round(flops["attn"] / flops["total"], 3),
            # roofline: at D=64 the attention kernel's cycle-accurate MXU
            # bound is ~151 TFLOP/s (int8 QK at 64-deep contraction + bf16 PV
            # at full depth/width in the transposed layout); the bound-softmax
            # sage kernel measures 122.9 TFLOP/s = ~81% of that bound
            # (scripts/attn_bench.py --impl i8b), so attention is MXU-bound,
            # not softmax/VPU-bound. Linears run at XLA's dense bf16 rate.
            "peak_tflops_bf16": V5E_BF16_PEAK / 1e12,
            "attn_ceiling_tflops": round(
                (151e12 if attn_impl == "sage" else V5E_BF16_PEAK * 2 / 3) / 1e12, 1),
            "attn_kernel_tflops_measured": 122.9 if attn_impl == "sage" else 90.8,
            "baseline": "600s A100 estimate (reference publishes no latency)",
            "step_cache_uniform2_sec_video": round(sec_per_video_cached, 2),
            "step_cache_uniform2_vs_baseline": round(
                A100_BASELINE_SEC / sec_per_video_cached, 3),
            "step_cache_uniform2_computed_steps": cached_steps,
        },
    }
    print(json.dumps(result))


def _supervise() -> int:
    """Process-level retry around a wedged-tunnel abort (rc=17).

    A wedged axon tunnel hangs PJRT client creation *in-process* — once the
    first backend touch blocks, that process can never recover, so the
    watchdog os._exit(17)s it. This supervisor re-execs bench.py as a child
    (stdout/stderr inherited, so the official JSON line passes through
    untouched) and, on rc=17 only, sleeps and retries while a wall-clock
    budget lasts. Any other rc — success or a real failure — propagates
    immediately. Disable with VAP_BENCH_RETRY_BUDGET=0.
    """
    budget_s = float(os.environ.get("VAP_BENCH_RETRY_BUDGET", 2700))
    sleep_s = float(os.environ.get("VAP_BENCH_RETRY_SLEEP", 120))
    deadline = time.time() + budget_s
    env = dict(os.environ, VAP_BENCH_NO_RETRY="1")
    attempt = 0
    while True:
        attempt += 1
        child = subprocess.Popen([sys.executable, os.path.abspath(__file__)], env=env)
        # If the supervisor is killed (driver timeout, Ctrl-C), take the child
        # down too — an orphaned bench would squat on the single TPU and wedge
        # every later client.
        import signal

        def _reap(signum, frame):
            child.kill()
            os._exit(128 + signum)

        old = {s: signal.signal(s, _reap) for s in (signal.SIGTERM, signal.SIGINT)}
        try:
            rc = child.wait()
        finally:
            for s, h in old.items():
                signal.signal(s, h)
        if rc != 17:
            return rc
        remaining = deadline - time.time()
        if remaining <= sleep_s:
            print(f"bench: tunnel still wedged after {attempt} attempt(s); "
                  f"retry budget exhausted", file=sys.stderr)
            return 17
        print(f"bench: attempt {attempt} hit a wedged tunnel (rc=17); "
              f"retrying in {sleep_s:.0f}s ({remaining / 60:.0f} min of budget left)",
              file=sys.stderr)
        time.sleep(sleep_s)


if __name__ == "__main__":
    if os.environ.get("VAP_BENCH_NO_RETRY") or float(
            os.environ.get("VAP_BENCH_RETRY_BUDGET", 2700)) <= 0:
        _arm_backend_watchdog()
        main()
    else:
        sys.exit(_supervise())
