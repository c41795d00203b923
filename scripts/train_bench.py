"""Training-step throughput on one v5e: CogVideoX-5B VAP SFT step at the
flagship shape (49f@480p, joint MoT attention, flash fwd+bwd, remat, adamw).

The DiT depth is scaled down (default 6 of 42 blocks) so params + fp32 adam
moments + remat activations fit 16 GB; per-step time extrapolates linearly in
depth like bench.py. Reports step seconds and achieved TFLOP/s (fwd+bwd ~= 3x
forward FLOPs on the block stack).

Usage: python scripts/train_bench.py [blocks] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vap_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
from vap_tpu.training import TrainStepConfig, get_lr_schedule, get_optimizer, make_train_step


def main():
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    frames, height, width = 49, 480, 720

    cfg = CogVideoXMOTConfig.cogvideox_5b_i2v_vap(
        num_layers=n_blocks, block_idx_with_mot_ref=tuple(range(n_blocks)))
    # VAP_TRAIN_BENCH_REMAT: full (default) | ops (dots_saveable: matmul
    # outputs kept, bwd skips the forward recompute) | block_skip:N
    remat = os.environ.get("VAP_TRAIN_BENCH_REMAT", "full")
    tcfg = TrainStepConfig(model=cfg, remat=remat)
    params = init_cogvideox_mot(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    tx = get_optimizer("adamw", get_lr_schedule("constant_with_warmup", 1e-5, warmup_steps=10))
    init_fn, step_fn = make_train_step(tcfg, tx)
    train_p, frozen_p, opt_state = init_fn(params)
    del params

    lat_f = (frames - 1) // 4 + 1
    lat_h, lat_w = height // 8, width // 8
    C = cfg.in_channels // 2
    T = cfg.max_text_seq_length
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    batch = {
        "latents": mk((1, lat_f, C, lat_h, lat_w)),
        "image_latents": mk((1, lat_f, C, lat_h, lat_w)),
        "latents_mot_ref": mk((1, lat_f, C, lat_h, lat_w)),
        "image_latents_mot_ref": mk((1, lat_f, C, lat_h, lat_w)),
        "encoder_hidden_states": mk((1, T, cfg.text_embed_dim)),
        "encoder_hidden_states_mot_ref": mk((1, T, cfg.text_embed_dim)),
    }

    # forward-only attribution (VAP_TRAIN_BENCH_FWD=1): time the loss alone
    # to split step time into fwd vs bwd+optimizer for roofline work
    if os.environ.get("VAP_TRAIN_BENCH_FWD", "0") == "1":
        from vap_tpu.training.train_step import cogvideox_vap_loss, merge_params

        fwd = jax.jit(lambda tp, fp, b, k: cogvideox_vap_loss(merge_params(tp, fp), tcfg, b, k)[0])
        t0 = time.perf_counter()
        loss = float(fwd(train_p, frozen_p, batch, jax.random.PRNGKey(1)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(n_steps):
            loss = float(fwd(train_p, frozen_p, batch, jax.random.PRNGKey(2 + i)))
        dt = (time.perf_counter() - t0) / n_steps
        print(f"fwd-only: blocks={n_blocks} {dt:.3f}s  compile={compile_s:.1f}s  loss={loss:.4f}")
        return

    step = jax.jit(step_fn, donate_argnums=(0, 2))
    t0 = time.perf_counter()
    train_p, opt_state, metrics = step(train_p, frozen_p, opt_state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])  # materialize (axon block_until_ready lies)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(n_steps):
        train_p, opt_state, metrics = step(train_p, frozen_p, opt_state, batch,
                                           jax.random.PRNGKey(2 + i))
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps

    # fwd FLOPs per block (B=1, no CFG) scaled 3x for fwd+bwd
    d = cfg.inner_dim
    vid = lat_f * (lat_h // cfg.patch_size) * (lat_w // cfg.patch_size)
    s_joint = 2 * (T + vid)
    attn = 4.0 * cfg.num_attention_heads * s_joint ** 2 * cfg.attention_head_dim
    lin = s_joint * 12 * d * d * 2.0
    flops = 3.0 * n_blocks * (attn + lin)
    print(f"train step: blocks={n_blocks} step={dt:.3f}s  {flops/dt/1e12:.1f} TFLOP/s "
          f"(fwd+bwd)  extrap42={dt*42/n_blocks:.2f}s  compile={compile_s:.1f}s  loss={loss:.4f}")

    # record for bench.py's train_step block (VERDICT r4 #8): round-over-round
    # training-step regressions become visible in BENCH_r{N}.json
    out_path = os.environ.get("VAP_TRAIN_BENCH_RECORD", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "train_bench.json"))
    if out_path and out_path != "none":
        import json

        with open(out_path, "w") as f:
            json.dump({
                "date": time.strftime("%Y-%m-%d"),
                "device": str(jax.devices()[0]),
                "shape": f"{frames}f@{height}x{width}, batch 1, remat={remat}",
                "blocks_measured": n_blocks,
                "step_s_measured": round(dt, 3),
                "step_s_extrapolated_42": round(dt * 42 / n_blocks, 2),
                "tflops_fwd_bwd": round(flops / dt / 1e12, 1),
                "steps_per_s_42_blocks": round(n_blocks / (dt * 42), 4),
                "script": "scripts/train_bench.py",
            }, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
