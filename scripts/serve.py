"""Resident TPU inference server for VAP / plain finetune checkpoints.

Loads ONE pipeline (CogVideoX or Wan — same builders as infer/cog_vap.py /
infer/wan_vap.py, incl. per-component overrides, LoRA fusion, tiling and
model offload), then serves generation requests over HTTP with a single
device-owner worker: jit graphs compile on the first request per shape and
stay warm for every later one. See vap_tpu/serving/server.py for endpoints.

Usage:
  python scripts/serve.py --family cogvideox \\
      --model_path /ckpts/Video-As-Prompt-CogVideoX-5B \\
      --port 8000 --output_dir /srv/videos \\
      --warmup_request warm.json        # optional: readyz flips when done

  curl -s localhost:8000/readyz
  curl -s -X POST localhost:8000/generate -d '{
        "prompt": "...", "prompt_ref": "...",
        "image_path": "/data/img.jpg", "ref_video_path": "/data/ref.mp4"}'
  curl -s "localhost:8000/jobs/<id>?wait=600"
  curl -s "localhost:8000/metrics?format=prometheus"

Scale-out = one server per chip / dp shard (the batch CLI's --dp_shards
analog); put a plain HTTP load balancer in front.
"""

import argparse
import json
import os
import signal
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("--family", required=True, choices=["cogvideox", "wan"])
    p.add_argument("--model_path", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--output_dir", default="serving_outputs")
    p.add_argument("--max_queue", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--fps", type=int, default=16)
    p.add_argument("--lora_path", default=None)
    p.add_argument("--lora_scale", type=float, default=None)
    p.add_argument("--enable_tiling", action="store_true")
    p.add_argument("--enable_slicing", action="store_true")
    p.add_argument("--enable_model_offload", action="store_true")
    p.add_argument("--offload_blocks_chunk", type=int, default=None,
                   help="stream the transformer block stack through HBM "
                        "this many blocks at a time (sequential-offload "
                        "analog; Wan-14B bf16 on one 16 GB chip)")
    p.add_argument("--flow_shift", type=float, default=3.0,
                   help="wan only: FlowMatch shift")
    p.add_argument("--sp_degree", type=int, default=1,
                   help="shard the denoise over `seq` across this many chips "
                        "(ring attention; same knob as the batch CLI)")
    p.add_argument("--cp_rotate_method", default="allgather",
                   choices=["allgather", "ppermute", "ulysses"])
    p.add_argument("--attn_provider", default=None,
                   help="attention provider spec, e.g. 'flash' or "
                        "'sage joint:flash' (default: env/auto)")
    p.add_argument("--warmup_request", default=None,
                   help="JSON file with one /generate body; the server "
                        "reports ready only after it completes (compiles "
                        "the jit graphs for that shape)")
    p.add_argument("--allow_shutdown", action="store_true",
                   help="enable POST /shutdown")
    args = p.parse_args(argv)

    # validate flag combos BEFORE the (slow) checkpoint load
    if args.sp_degree > 1 and args.attn_provider and \
            args.attn_provider.split()[0] != "ring":
        # only the 'ring' provider consumes the seq mesh — anything else
        # would silently serve unsharded single-chip attention
        p.error("--sp_degree > 1 requires the 'ring' provider "
                f"(got --attn_provider {args.attn_provider!r}); per-site "
                "overrides like 'ring cross:xla' are fine")

    if args.family == "cogvideox":
        from infer.cog_vap import build_pipeline

        pipe = build_pipeline(
            args.model_path, args.dtype, lora_path=args.lora_path,
            lora_scale=args.lora_scale, enable_vae_tiling=args.enable_tiling,
            enable_vae_slicing=args.enable_slicing,
            enable_model_offload=args.enable_model_offload,
            offload_blocks_chunk=args.offload_blocks_chunk)
        defaults = {"width": 720, "guidance_scale": 6.0, "use_dynamic_cfg": True}
    else:
        from infer.wan_vap import build_pipeline

        pipe = build_pipeline(
            args.model_path, args.dtype, flow_shift=args.flow_shift,
            lora_path=args.lora_path, lora_scale=args.lora_scale,
            enable_vae_tiling=args.enable_tiling,
            enable_vae_slicing=args.enable_slicing,
            enable_model_offload=args.enable_model_offload,
            offload_blocks_chunk=args.offload_blocks_chunk)
        defaults = {"width": 832, "guidance_scale": 5.0}

    from vap_tpu.serving import (GenerationServer, make_video_generate_fn,
                                 validate_request)

    # thread-local attention contexts must be entered in the WORKER thread,
    # so they go through context_fn rather than wrapping main()
    context_fn = None
    if args.sp_degree > 1 or args.attn_provider:
        import contextlib

        import jax

        from vap_tpu.ops.attention import attention_provider
        from vap_tpu.parallel import MeshConfig, make_mesh
        from vap_tpu.parallel.ring_attention import attention_mesh

        mesh = None
        provider = args.attn_provider
        if args.sp_degree > 1:
            mesh = make_mesh(MeshConfig(seq=args.sp_degree), jax.devices())
            provider = provider or "ring"  # the combo was validated above

        def context_fn():
            ctx = contextlib.ExitStack()
            if provider:
                ctx.enter_context(attention_provider(provider))
            if mesh is not None:
                ctx.enter_context(attention_mesh(
                    mesh, rotate_method=args.cp_rotate_method))
            return ctx

    warmup = None
    if args.warmup_request:
        with open(args.warmup_request) as f:
            warmup = json.load(f)
        validate_request(warmup)

    server = GenerationServer(
        make_video_generate_fn(pipe, fps=args.fps, defaults=defaults,
                               context_fn=context_fn),
        args.output_dir, max_queue=args.max_queue,
        validate_fn=validate_request, allow_shutdown=args.allow_shutdown)
    port = server.start(args.host, args.port, warmup_request=warmup)
    print(f"vap_tpu serving {args.family} from {args.model_path} "
          f"on {args.host}:{port} -> {args.output_dir}", flush=True)

    stop = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    signal.signal(signal.SIGINT, lambda *_: stop.set())
    try:
        stop.wait()
    finally:
        print("draining and stopping...", flush=True)
        server.stop()


if __name__ == "__main__":
    main()
