"""VAE decode timing experiments on TPU: tiled vs full-frame.

The reference pipeline's default decode path is FULL-FRAME (spatial tiling is
opt-in via enable_tiling(); pipeline_cogvideox_image2video_mot.py:1078 calls
vae.decode directly). On this 16 GB v5e the full-frame 60x90-latent decode
does NOT fit even streamed per-temporal-chunk at bf16 (measured: XLA asks
21.35 GB of HLO temps — the 480x720x128 stage tensors pad 1.8x under the
(8,128) tiling), so the SHIPPED path — and the default here — is the 2-way
W-split streamed decode bench.py times (1.24x frame area vs the 3x3 grid's
2.25x).

Usage: python scripts/vae_bench.py [wsplit|full|tiled|both]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vap_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from vap_tpu.models.cogvideox.vae import (
    CogVideoXVAEConfig,
    init_cogvideox_vae,
    vae_decode,
    vae_decode_streamed,
    vae_decode_tiled,
)


def mem_gb():
    try:
        s = jax.local_devices()[0].memory_stats()
        return round(s.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        return -1.0


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "wsplit"
    frames = 49
    lat_f = (frames - 1) // 4 + 1  # 13
    dtype = jnp.bfloat16

    cfg = CogVideoXVAEConfig()
    params = init_cogvideox_vae(jax.random.PRNGKey(1), cfg, dtype)
    jax.block_until_ready(params)

    if mode in ("full", "streamed"):
        z = jax.random.normal(jax.random.PRNGKey(0), (1, lat_f, 60, 90, cfg.latent_channels), dtype)
        t0 = time.perf_counter()
        out = vae_decode_streamed(params, cfg, z)
        float(jnp.mean(out.astype(jnp.float32)))  # axon block_until_ready lies
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = vae_decode_streamed(params, cfg, z)
        float(jnp.mean(out.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        print(f"streamed full-frame decode: {dt:.3f}s  fps={frames/dt:.2f}  compile={compile_s:.1f}s  peak_hbm={mem_gb()}GB  out={out.shape}", flush=True)
        del out

    if mode in ("wsplit", "both"):
        from vap_tpu.models.cogvideox.vae import vae_decode_wsplit

        z = jax.random.normal(jax.random.PRNGKey(0), (1, lat_f, 60, 90, cfg.latent_channels), dtype)
        for n in (2, 3):
            try:
                t0 = time.perf_counter()
                out = vae_decode_wsplit(params, cfg, z, n)
                float(jnp.mean(out.astype(jnp.float32)))
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                out = vae_decode_wsplit(params, cfg, z, n)
                float(jnp.mean(out.astype(jnp.float32)))
                dt = time.perf_counter() - t0
                print(f"wsplit n={n}: {dt:.3f}s  fps={frames/dt:.2f}  compile={compile_s:.1f}s  out={out.shape}", flush=True)
                del out
            except Exception as e:
                print(f"wsplit n={n}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)

    if mode in ("tiled", "both"):
        z = jax.random.normal(jax.random.PRNGKey(0), (1, lat_f, 60, 90, cfg.latent_channels), dtype)
        t0 = time.perf_counter()
        out = vae_decode_tiled(params, cfg, z)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = vae_decode_tiled(params, cfg, z)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"tiled decode:      {dt:.3f}s  fps={frames/dt:.2f}  compile={compile_s:.1f}s  peak_hbm={mem_gb()}GB  out={out.shape}")


if __name__ == "__main__":
    main()
