"""Micro-benchmark: Pallas flash attention block-size sweep at VAP shapes.

Usage: python scripts/attn_bench.py [--quick]
Shapes: [B=2, H=48, S=35552, D=64] (CogVideoX-5B VAP joint stream, CFG batch).
Prints achieved TFLOP/s per (block_q, block_k).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from vap_tpu.ops.flash_attention import flash_attention
from vap_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seq", type=int, default=35552)
    p.add_argument("--heads", type=int, default=48)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--impl", default="row", choices=["row", "t", "i8", "i8b", "bwd",
                                                     "varlen"],
                   help="row = original layout; t = transposed (S^T/O^T) forward; "
                        "i8 = int8-QK SageAttention analog; i8b = i8 with the "
                        "bound-softmax (no running max/rescale) kernel; "
                        "bwd = backward pass (sweep via VAP_ATTN_BWD_BLOCKS); "
                        "varlen = per-sample KV lengths (alternating full / "
                        "--varlen-frac of S)")
    p.add_argument("--varlen-frac", type=float, default=0.4,
                   help="valid-KV fraction for the ragged half of the batch")
    args = p.parse_args()

    B, H, S, D = args.batch, args.heads, args.seq, args.dim
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
    flops = 4.0 * B * H * S * S * D  # QK^T + AV

    configs = [(1024, 512), (2048, 512), (1024, 1024), (2048, 1024), (4096, 512), (2048, 256)]
    if args.impl in ("i8", "i8b"):  # int8 QK halves MXU time; bigger tiles amortize VPU stats
        configs = [(4096, 512), (4096, 1024), (8192, 512), (8192, 1024), (4096, 2048), (2048, 2048)]
    if os.environ.get("VAP_ATTN_CONFIGS"):
        configs = [tuple(map(int, c.split("x"))) for c in os.environ["VAP_ATTN_CONFIGS"].split(",")]
    if args.quick:
        configs = [(256, 512), (1024, 512)]

    if args.impl == "bwd":
        # backward sweep: VAP_ATTN_BWD_BLOCKS drives the block choice inside
        # _flash_attention_backward_t, set per config before (re-)tracing.
        # Everything runs jitted — an eager jax.vjp dispatches each reshape/
        # concat as its own remote compile on the axon service and stalls.
        bwd_flops = 2.5 * flops  # 5 matmuls of the S/P footprint
        bwd_configs = [(2048, 512), (2048, 1024), (4096, 512), (1024, 512),
                       (2048, 256), (4096, 1024), (1024, 1024), (3072, 512)]
        if os.environ.get("VAP_ATTN_CONFIGS"):
            bwd_configs = [tuple(map(int, c.split("x")))
                           for c in os.environ["VAP_ATTN_CONFIGS"].split(",")]

        # k/v MUST be jit arguments, not closure constants — captured arrays
        # are baked into the HLO as literals and blow the remote compile
        # service's request-size limit (HTTP 413)
        def fwd_only(q, k, v):
            return flash_attention(q, k, v)

        fwd = jax.jit(fwd_only)
        float(fwd(q, k, v).mean())
        n = 4
        t0 = time.perf_counter()
        cur = q
        for _ in range(n):
            cur = fwd(cur, k, v)
        float(cur.mean())
        t_fwd = (time.perf_counter() - t0) / n
        print(f"fwd-only baseline: {t_fwd*1e3:8.1f} ms  {flops/t_fwd/1e12:6.1f} TFLOP/s",
              flush=True)

        for bq, bk in bwd_configs:
            os.environ["VAP_ATTN_BWD_BLOCKS"] = f"{bq}x{bk}"
            try:
                def fwdbwd(q, k, v):
                    out, vjp = jax.vjp(fwd_only, q, k, v)
                    return vjp(jnp.ones_like(out))[0]

                fb = jax.jit(fwdbwd)
                float(fb(q, k, v).mean())
                t0 = time.perf_counter()
                cur = q
                for _ in range(n):
                    cur = fb(cur, k, v)  # chain dq -> q to serialize
                float(cur.mean())
                dt = (time.perf_counter() - t0) / n
                t_bwd = dt - t_fwd
                print(f"bq={bq:5d} bk={bk:5d}: fwd+bwd {dt*1e3:8.1f} ms, "
                      f"bwd {t_bwd*1e3:8.1f} ms  {bwd_flops/t_bwd/1e12:6.1f} TFLOP/s (bwd)",
                      flush=True)
            except Exception as e:
                print(f"bq={bq:5d} bk={bk:5d}: FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
            finally:
                # new env value must invalidate the jitted closure
                jax.clear_caches()
        return

    kv_lens = None
    if args.impl == "varlen":
        from vap_tpu.ops.flash_attention import flash_attention_varlen

        lens = [S if i % 2 == 0 else int(S * args.varlen_frac) for i in range(B)]
        kv_lens = jnp.asarray(lens, jnp.int32)
        # useful flops only count valid keys; the kernel still streams the
        # padded blocks (bias-masked), so this measures masking overhead too
        flops = 4.0 * H * S * D * float(sum(lens))
        print(f"kv_lens={lens} (effective flops {flops/1e12:.1f} T)")

    for bq, bk in configs:
        try:
            if args.impl == "varlen":
                fn = jax.jit(lambda q, k, v, bq=bq, bk=bk:
                             flash_attention_varlen(q, k, v, kv_lens, None, bq, bk))
            elif args.impl == "t":
                from vap_tpu.ops.flash_attention import _flash_attention_forward_t

                fn = jax.jit(lambda q, k, v, bq=bq, bk=bk:
                             _flash_attention_forward_t(q, k, v, args.dim ** -0.5, bq, bk)[0])
            elif args.impl in ("i8", "i8b"):
                from vap_tpu.ops.flash_attention import _flash_attention_forward_t_i8

                use_bound = args.impl == "i8b"
                fn = jax.jit(lambda q, k, v, bq=bq, bk=bk, ub=use_bound:
                             _flash_attention_forward_t_i8(q, k, v, args.dim ** -0.5, bq, bk, ub)[0])
            else:
                fn = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(q, k, v, None, bq, bk))
            out = fn(q, k, v)
            float(out.mean())  # axon: block_until_ready does NOT synchronize
            # chained timing: feed the output back as q so iterations serialize
            n = 4
            t0 = time.perf_counter()
            cur = q
            for _ in range(n):
                cur = fn(cur, k, v)
            float(cur.mean())  # materialize to force full completion
            dt = (time.perf_counter() - t0) / n
            print(f"bq={bq:5d} bk={bk:5d}: {dt*1e3:8.1f} ms  {flops/dt/1e12:6.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"bq={bq:5d} bk={bk:5d}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
