"""3D-conv implementation shootout for the VAE decode path (TPU).

The decoder spends its ~300 TFLOP in 3x3x3 causal convs, measured end-to-end
at ~28% MFU (docs/ROOFLINE.md: 5.4 s, 9.1 fps). This microbench isolates one
conv at representative decoder shapes and compares:

  a) ndhwc  — lax.conv_general_dilated with 3 spatial dims (current path)
  b) sum2d  — exact decomposition into kt 2D convs summed over temporal
              taps: y[:, t] = sum_dt conv2d(x[:, t+dt], k[dt]); each 2D conv
              batches (B*F) frames, which is the layout XLA's TPU conv
              emitter handles best
  c) f32acc — (a) with preferred_element_type=float32 (check whether the
              bf16 accumulation path is what's slow)

Run on TPU: python scripts/conv3d_bench.py [--check]
--check runs tiny shapes on CPU and asserts a == b bit-tolerance only.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vap_tpu.utils.cache import enable_compilation_cache


def conv3d_ndhwc(x, k, preferred=None):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=preferred)


def conv3d_sum2d(x, k, preferred=None):
    """Exact kt-tap decomposition: batches (B*F_out) frames per 2D conv."""
    b, f_in, h, w, cin = x.shape
    kt = k.shape[0]
    f_out = f_in - kt + 1
    y = None
    for dt in range(kt):
        xs = x[:, dt:dt + f_out].reshape(b * f_out, h, w, cin)
        yd = jax.lax.conv_general_dilated(
            xs, k[dt].astype(x.dtype), window_strides=(1, 1),
            padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred)
        y = yd if y is None else y + yd
    return y.reshape(b, f_out, h, w, -1)


IMPLS = {
    "ndhwc": lambda x, k: conv3d_ndhwc(x, k),
    "sum2d": lambda x, k: conv3d_sum2d(x, k),
    "f32acc": lambda x, k: conv3d_ndhwc(x, k, preferred=jnp.float32).astype(x.dtype),
    "sum2d_f32": lambda x, k: conv3d_sum2d(x, k, preferred=jnp.float32).astype(x.dtype),
}

# (label, F_in (incl. 2 causal cache frames), H, W, Cin, Cout) — decoder
# stages of the W-split streamed 480p decode (W ~ 360 + overlap)
SHAPES = [
    ("up3_128ch_480p", 10, 480, 368, 128, 128),
    ("up2_256ch_240p", 6, 240, 184, 256, 256),
    ("up1_256ch_120p", 4, 120, 96, 256, 256),
    ("mid_512ch_60p", 4, 60, 48, 512, 512),
    # shapes the auto rule (_sum2d_wins: cin<=128 and H*W>=64K) also catches
    # but the original shootout did not measure (ADVICE r4):
    ("enc_in_3ch_480p", 11, 480, 720, 3, 128),     # encoder conv_in, full W
    ("enc_128ch_480p", 11, 480, 720, 128, 128),    # encoder stage 0, full W
    ("enc_128ch_240p", 7, 240, 360, 128, 128),     # encoder stage 1
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="CPU equivalence only")
    ap.add_argument("--impls", nargs="*", default=list(IMPLS))
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1, 5, 8, 8, 4)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 6)).astype(np.float32) * 0.1)
        ref = np.asarray(conv3d_ndhwc(x, k))
        for name in ("sum2d", "f32acc", "sum2d_f32"):
            np.testing.assert_allclose(
                np.asarray(IMPLS[name](x, k)), ref, atol=2e-4, rtol=1e-3)
        print("check OK: all impls match ndhwc")
        return

    enable_compilation_cache()
    dtype = jnp.bfloat16
    for label, f, h, w, cin, cout in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, f, h, w, cin), dtype)
        k = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, cin, cout), dtype) * 0.05
        f_out = f - 2
        flops = 2 * f_out * h * w * cin * cout * 27
        for name in args.impls:
            fn = jax.jit(IMPLS[name])
            try:
                out = fn(x, k)
                float(jnp.mean(out.astype(jnp.float32)))  # compile+sync
                # enqueue all reps, sync ONCE: the device queue serializes
                # execution, so one scalar read pays one tunnel RTT (~27 ms)
                # total instead of per rep — per-rep reads drowned the small
                # shapes in RTT (up1/mid measured a constant ~28 ms/rep
                # whatever the impl)
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    out = fn(x, k)
                float(jnp.mean(out.astype(jnp.float32)))
                dt = (time.perf_counter() - t0) / args.reps
                print(f"{label:18s} {name:10s} {dt * 1e3:8.2f} ms  "
                      f"{flops / dt / 1e12:7.1f} TFLOP/s")
            except Exception as e:  # VMEM/compile failures are data too
                print(f"{label:18s} {name:10s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
