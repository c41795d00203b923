"""Microbench of the W8A8 projection path at bench shapes.

Measures, at the flagship joint-attention token count (M=71104, d=3072):
  * bf16 dense matmul (XLA)                      — the 197 TFLOP/s reference
  * int8 dot_general (XLA, current _int8_linear) — what the bench uses today
  * full _int8_linear incl. dynamic activation quant + dequant epilogue
  * (--impl pallas) the fused Pallas W8A8 kernel

Usage: python scripts/linear_bench.py [--n 3072|12288] [--impl all|pallas]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vap_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def timed(fn, *args, reps=5):
    out = fn(*args)
    float(jnp.mean(out.astype(jnp.float32)))  # compile + materialize
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.mean(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=71168)  # 2*2*(226+17550) rounded to 512
    ap.add_argument("--k", type=int, default=3072)
    ap.add_argument("--n", type=int, default=3072)
    ap.add_argument("--impl", default="all")
    args = ap.parse_args()
    M, K, N = args.m, args.k, args.n
    flops = 2.0 * M * K * N

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 1), (K, N), jnp.bfloat16) * 0.02

    from vap_tpu.models.common import _int8_linear, quantize_linear_int8

    q = quantize_linear_int8({"kernel": w})
    w_i8, s_w = q["w_i8"], q["s_w"]
    x_i8 = jnp.round(x.astype(jnp.float32) * 0.3).astype(jnp.int8)

    if args.impl in ("all",):
        t = timed(jax.jit(lambda a, b: a @ b), x, w)
        print(f"bf16 dense        : {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TFLOP/s")

        t = timed(jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)), x_i8, w_i8)
        print(f"int8 dot (XLA)    : {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TFLOP/s")

        t = timed(jax.jit(lambda a, p: _int8_linear(p, a)), x, {"w_i8": w_i8, "s_w": s_w})
        print(f"_int8_linear full : {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TFLOP/s")

    if args.impl in ("all", "pallas"):
        try:
            from vap_tpu.ops.int8_matmul import int8_linear_pallas
        except ImportError:
            return
        t = timed(jax.jit(lambda a, p: int8_linear_pallas(p, a)), x, {"w_i8": w_i8, "s_w": s_w})
        print(f"pallas W8A8 fused : {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TFLOP/s")

    if args.impl == "diag":
        # isolate the MXU rate: pure dot kernels, no quantize/dequant
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def dot_kernel(x_ref, w_ref, o_ref, acc_sc, *, nk, out_dt):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_sc[...] = jnp.zeros_like(acc_sc)

            acc_sc[...] += jax.lax.dot_general(
                x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_sc.dtype)

            @pl.when(k == nk - 1)
            def _():
                o_ref[...] = acc_sc[...].astype(out_dt)

        Mp = (M // 512) * 512

        def run(xv, wv, bm, bn, bk, acc_dt, out_dt, label):
            nm, nn, nk = Mp // bm, N // bn, K // bk
            f = pl.pallas_call(
                functools.partial(dot_kernel, nk=nk, out_dt=out_dt),
                grid=(nm, nn, nk),
                in_specs=[
                    pl.BlockSpec((bm, bk), lambda m, n, k: (m, k)),
                    pl.BlockSpec((bk, bn), lambda m, n, k: (k, n)),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
                out_shape=jax.ShapeDtypeStruct((Mp, N), out_dt),
                scratch_shapes=[pltpu.VMEM((bm, bn), acc_dt)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary")),
            )
            t = timed(jax.jit(f), xv, wv)
            print(f"{label}: {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TFLOP/s")

        xi = x_i8[:Mp]
        xb = x[:Mp]
        for bm, bn, bk in ((512, 1024, 1536), (512, 1024, 3072), (1024, 512, 3072), (512, 512, 3072)):
            if K % bk or N % bn or Mp % bm:
                continue
            run(xi, w_i8, bm, bn, bk, jnp.int32, jnp.int32, f"i8 dot  ({bm},{bn},{bk})")
        run(xb, w, 512, 1024, 1536, jnp.float32, jnp.bfloat16, "bf16 dot(512,1024,1536)")

        # transposed LHS: x^T [K, M], contract dim 0 of both — the layout the
        # flash kernels use to hit 163 TFLOP/s
        def dot_t_kernel(xt_ref, w_ref, o_ref, acc_sc, *, nk, out_dt):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_sc[...] = jnp.zeros_like(acc_sc)

            acc_sc[...] += jax.lax.dot_general(
                xt_ref[...], w_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=acc_sc.dtype)

            @pl.when(k == nk - 1)
            def _():
                o_ref[...] = acc_sc[...].astype(out_dt)

        def run_t(xtv, wv, bm, bn, bk, acc_dt, out_dt, label):
            nm, nn, nk = Mp // bm, N // bn, K // bk
            f = pl.pallas_call(
                functools.partial(dot_t_kernel, nk=nk, out_dt=out_dt),
                grid=(nm, nn, nk),
                in_specs=[
                    pl.BlockSpec((bk, bm), lambda m, n, k: (k, m)),
                    pl.BlockSpec((bk, bn), lambda m, n, k: (k, n)),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n)),
                out_shape=jax.ShapeDtypeStruct((Mp, N), out_dt),
                scratch_shapes=[pltpu.VMEM((bm, bn), acc_dt)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary")),
            )
            t = timed(jax.jit(f), xtv, wv)
            print(f"{label}: {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TFLOP/s")

        xit = xi.T.copy()
        run_t(xit, w_i8, 512, 1024, 1536, jnp.int32, jnp.int32, "i8 dotT (512,1024,1536)")
        run_t(xb.T.copy(), w, 512, 1024, 1536, jnp.float32, jnp.bfloat16, "bf16dotT(512,1024,1536)")

    if args.impl == "nsweep":
        for n in (6144, 12288):
            wn = jax.random.normal(jax.random.fold_in(key, 9), (K, n), jnp.bfloat16) * 0.02
            wn_i8 = jnp.round(wn.astype(jnp.float32) * 50).astype(jnp.int8)
            f2 = 2.0 * M * K * n
            t = timed(jax.jit(lambda a, b: a @ b), x, wn)
            print(f"bf16 dense N={n}: {t*1e3:8.2f} ms  {f2/t/1e12:7.1f} TFLOP/s")
            t = timed(jax.jit(lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)), x_i8, wn_i8)
            print(f"int8 dot  N={n}: {t*1e3:8.2f} ms  {f2/t/1e12:7.1f} TFLOP/s")


if __name__ == "__main__":
    main()
