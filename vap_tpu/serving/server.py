"""HTTP inference server for vap_tpu pipelines.

The reference ships per-request scripts (infer/cog_vap.py:69-116) and a batch
CLI (examples/inference/inference.py); production serving on a TPU wants a
resident process instead: jit graphs compile once per request shape and stay
warm for every later request, the chip is owned by exactly ONE worker thread
(a video-diffusion step saturates the chip, so cross-request concurrency is a
queue — and on this backend concurrent host threads enqueueing large graphs
make their XLA temp arenas coexist and OOM), and the orchestrator probes
liveness/readiness over HTTP. Scale-out is one server per chip or per
dp shard, exactly like the batch CLI's `--dp_shards`.

Endpoints (all JSON):
  GET  /healthz     liveness: process up + worker thread alive
  GET  /readyz      readiness: pipeline built and warmup (if any) finished;
                    503 while warming
  POST /generate    enqueue a generation job -> 202 {"job_id": ...};
                    400 on invalid request, 429 when the queue is full
  GET  /jobs/<id>   job status/result; `?wait=<seconds>` long-polls until
                    the job finishes or the wait expires
  GET  /jobs        every job, most recent first
  GET  /metrics     counters + latency percentiles; `?format=prometheus`
                    for text exposition
  POST /shutdown    drain and stop (only when allow_shutdown=True)

The server core is pipeline-agnostic: it runs any `generate_fn(request,
output_path) -> dict`. `make_video_generate_fn` adapts a VAP/plain pipeline
(CogVideoX or Wan — their call surfaces match) to the JSON request schema of
the infer scripts' flags.
"""

from __future__ import annotations

import dataclasses
import json
import os
import queue
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, List, Optional
from urllib.parse import parse_qs, urlparse

__all__ = [
    "GenerationServer",
    "Job",
    "QueueFull",
    "make_video_generate_fn",
    "prepare_pipeline_kwargs",
]


class QueueFull(Exception):
    """Raised by submit() when the pending queue is at max_queue."""


@dataclasses.dataclass
class Job:
    job_id: str
    request: Dict[str, Any]
    status: str = "queued"  # queued | running | done | failed
    result: Optional[Dict[str, Any]] = None
    error: Optional[str] = None
    enqueued_at: float = 0.0
    started_at: Optional[float] = None
    finished_at: Optional[float] = None

    def __post_init__(self):
        self._done = threading.Event()

    def to_dict(self, queue_position: Optional[int] = None) -> Dict[str, Any]:
        d = {
            "job_id": self.job_id,
            "status": self.status,
            "request": self.request,
            "result": self.result,
            "error": self.error,
            "enqueued_at": self.enqueued_at,
            "started_at": self.started_at,
            "finished_at": self.finished_at,
        }
        if queue_position is not None:
            d["queue_position"] = queue_position
        return d


def _percentile(sorted_vals: List[float], q: float) -> float:
    if not sorted_vals:
        return 0.0
    idx = min(len(sorted_vals) - 1, max(0, int(round(q * (len(sorted_vals) - 1)))))
    return sorted_vals[idx]


class GenerationServer:
    """Single-worker job-queue server around a `generate_fn`.

    generate_fn(request: dict, output_path: str) -> dict
        runs one generation and returns result fields (e.g. video_path).
        Exceptions mark the job failed; the worker survives them.
    """

    def __init__(self, generate_fn: Callable[[Dict[str, Any], str], Dict[str, Any]],
                 output_dir: str, *, max_queue: int = 16, max_history: int = 1000,
                 validate_fn: Optional[Callable[[Dict[str, Any]], None]] = None,
                 allow_shutdown: bool = False):
        self._generate_fn = generate_fn
        self._validate_fn = validate_fn
        self.output_dir = output_dir
        self.max_queue = max_queue
        self.max_history = max_history  # finished jobs retained (resident server)
        self.allow_shutdown = allow_shutdown
        self._jobs: Dict[str, Job] = {}
        self._order: List[str] = []  # insertion order
        self._pending: "queue.Queue[Optional[Job]]" = queue.Queue()
        self._pending_count = 0  # queued, not yet running (under _lock)
        self._lock = threading.Lock()
        self._worker: Optional[threading.Thread] = None
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._http_thread: Optional[threading.Thread] = None
        self._stopping = False
        self._ready = threading.Event()
        self.warmup_error: Optional[str] = None
        self._started_at = time.time()
        self._durations: List[float] = []  # seconds of the last max_history done jobs
        self._counts = {"submitted": 0, "done": 0, "failed": 0, "rejected": 0}

    # ------------------------------------------------------------- lifecycle
    def start(self, host: str = "127.0.0.1", port: int = 0,
              warmup_request: Optional[Dict[str, Any]] = None) -> int:
        """Start worker + HTTP threads. Returns the bound port (useful with
        port=0). When `warmup_request` is given, readiness waits for it —
        the first job compiles the jit graphs for its shape."""
        os.makedirs(self.output_dir, exist_ok=True)
        self._worker = threading.Thread(target=self._worker_loop,
                                        name="vap-serving-worker", daemon=True)
        self._worker.start()
        if warmup_request is not None:
            warm = self.submit(dict(warmup_request, _warmup=True))

            def _flip_ready():
                warm._done.wait()
                if warm.status == "done":
                    self._ready.set()
                else:
                    # stay unready: the jit graphs never compiled / the
                    # pipeline is broken — the orchestrator must not route
                    # traffic here. Surfaced in /readyz.
                    self.warmup_error = warm.error

            threading.Thread(target=_flip_ready, daemon=True).start()
        else:
            self._ready.set()

        app = self

        class Handler(_Handler):
            server_app = app

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self._http_thread = threading.Thread(target=self._httpd.serve_forever,
                                             name="vap-serving-http", daemon=True)
        self._http_thread.start()
        return self._httpd.server_address[1]

    def stop(self, timeout: float = 30.0):
        """Graceful stop: finish the running job, drop the rest."""
        self._stopping = True
        self._pending.put(None)
        if self._worker is not None:
            self._worker.join(timeout)
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        if self._http_thread is not None:
            self._http_thread.join(timeout)

    @property
    def ready(self) -> bool:
        return (self._ready.is_set() and self._worker is not None
                and self._worker.is_alive() and not self._stopping)

    # ----------------------------------------------------------------- jobs
    def submit(self, request: Dict[str, Any]) -> Job:
        if self._validate_fn is not None:
            self._validate_fn(request)
        with self._lock:
            if self._stopping:
                raise QueueFull("server is shutting down")
            if self._pending_count >= self.max_queue:
                self._counts["rejected"] += 1
                raise QueueFull(
                    f"queue full ({self.max_queue} pending); retry later")
            job = Job(job_id=uuid.uuid4().hex[:12], request=request,
                      enqueued_at=time.time())
            self._jobs[job.job_id] = job
            self._order.append(job.job_id)
            self._pending_count += 1
            self._counts["submitted"] += 1
            self._evict_finished_locked()
        self._pending.put(job)
        return job

    def _evict_finished_locked(self):
        """Drop the oldest finished jobs beyond max_history — a resident
        server must not grow without bound. Queued/running jobs always stay."""
        finished = sum(1 for jid in self._order
                       if self._jobs[jid].status in ("done", "failed"))
        if finished <= self.max_history:
            return
        keep: List[str] = []
        for jid in self._order:
            if (finished > self.max_history
                    and self._jobs[jid].status in ("done", "failed")):
                del self._jobs[jid]
                finished -= 1
            else:
                keep.append(jid)
        self._order = keep

    def get_job(self, job_id: str) -> Optional[Job]:
        return self._jobs.get(job_id)

    def queue_position(self, job: Job) -> Optional[int]:
        """0 = next to run; None once the job left the queue."""
        if job.status != "queued":
            return None
        with self._lock:
            ahead = 0
            for jid in self._order:
                other = self._jobs[jid]
                if other.job_id == job.job_id:
                    return ahead
                if other.status == "queued":
                    ahead += 1
        return None

    def jobs(self) -> List[Job]:
        with self._lock:
            return [self._jobs[jid] for jid in reversed(self._order)]

    def metrics(self) -> Dict[str, Any]:
        with self._lock:
            counts = dict(self._counts)
            pending = self._pending_count
            durs = sorted(self._durations)
            running = sum(1 for j in self._jobs.values() if j.status == "running")
        return {
            "uptime_s": time.time() - self._started_at,
            "ready": self.ready,
            "queue_depth": pending,
            "running": running,
            "jobs_submitted": counts["submitted"],
            "jobs_done": counts["done"],
            "jobs_failed": counts["failed"],
            "jobs_rejected": counts["rejected"],
            "generation_seconds_p50": _percentile(durs, 0.50),
            "generation_seconds_p95": _percentile(durs, 0.95),
            "generation_seconds_max": durs[-1] if durs else 0.0,
        }

    def metrics_prometheus(self) -> str:
        m = self.metrics()
        lines = []
        for key, val in m.items():
            if isinstance(val, bool):
                val = int(val)
            lines.append(f"vap_serving_{key} {val}")
        return "\n".join(lines) + "\n"

    # --------------------------------------------------------------- worker
    def _worker_loop(self):
        while True:
            job = self._pending.get()
            if job is None:
                return
            with self._lock:
                self._pending_count -= 1
            if self._stopping:
                job.status = "failed"
                job.error = "server shut down before the job ran"
                job._done.set()
                continue
            job.status = "running"
            job.started_at = time.time()
            output_path = os.path.join(self.output_dir, f"{job.job_id}.mp4")
            try:
                result = self._generate_fn(job.request, output_path)
                job.result = result
                job.status = "done"
                with self._lock:
                    self._counts["done"] += 1
                    self._durations.append(time.time() - job.started_at)
                    if len(self._durations) > self.max_history:
                        del self._durations[0]
            except Exception as e:  # job fails, worker survives
                job.status = "failed"
                job.error = f"{type(e).__name__}: {e}"
                with self._lock:
                    self._counts["failed"] += 1
            finally:
                job.finished_at = time.time()
                job._done.set()


# --------------------------------------------------------------------- HTTP
class _Handler(BaseHTTPRequestHandler):
    server_app: GenerationServer = None  # bound by GenerationServer.start
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _send(self, code: int, body: Any, content_type: str = "application/json"):
        data = (body if isinstance(body, (bytes, str))
                else json.dumps(body, indent=None))
        if isinstance(data, str):
            data = data.encode()
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        app = self.server_app
        url = urlparse(self.path)
        parts = [p for p in url.path.split("/") if p]
        if url.path == "/healthz":
            alive = app._worker is not None and app._worker.is_alive()
            return self._send(200 if alive else 503,
                              {"status": "ok" if alive else "worker dead"})
        if url.path == "/readyz":
            body = {"ready": app.ready}
            if app.warmup_error:
                body["warmup_error"] = app.warmup_error
            return self._send(200 if app.ready else 503, body)
        if url.path == "/metrics":
            fmt = parse_qs(url.query).get("format", [""])[0]
            if fmt == "prometheus":
                return self._send(200, app.metrics_prometheus(),
                                  content_type="text/plain; version=0.0.4")
            return self._send(200, app.metrics())
        if parts[:1] == ["jobs"] and len(parts) == 1:
            return self._send(200, [j.to_dict() for j in app.jobs()])
        if parts[:1] == ["jobs"] and len(parts) == 2:
            job = app.get_job(parts[1])
            if job is None:
                return self._send(404, {"error": f"no such job {parts[1]!r}"})
            wait = parse_qs(url.query).get("wait", [None])[0]
            if wait is not None:
                try:
                    wait_s = float(wait)
                except ValueError:
                    return self._send(400, {"error": f"invalid wait={wait!r}"})
                job._done.wait(timeout=min(wait_s, 600.0))
            return self._send(200, job.to_dict(app.queue_position(job)))
        return self._send(404, {"error": f"no such endpoint {url.path!r}"})

    def do_POST(self):
        app = self.server_app
        url = urlparse(self.path)
        # ALWAYS drain the body first: on a keep-alive connection
        # (protocol_version HTTP/1.1) unread bytes would be parsed as the
        # next request line
        body = self.rfile.read(int(self.headers.get("Content-Length", 0) or 0))
        if url.path == "/shutdown":
            if not app.allow_shutdown:
                return self._send(403, {"error": "shutdown disabled"})
            self._send(200, {"status": "stopping"})
            threading.Thread(target=app.stop, daemon=True).start()
            return None
        if url.path != "/generate":
            return self._send(404, {"error": f"no such endpoint {url.path!r}"})
        try:
            request = json.loads(body or b"{}")
            if not isinstance(request, dict):
                raise ValueError("request body must be a JSON object")
        except (ValueError, json.JSONDecodeError) as e:
            return self._send(400, {"error": f"invalid JSON body: {e}"})
        try:
            job = app.submit(request)
        except QueueFull as e:
            return self._send(429, {"error": str(e)})
        except (ValueError, FileNotFoundError) as e:
            return self._send(400, {"error": str(e)})
        return self._send(202, {"job_id": job.job_id,
                                "queue_position": app.queue_position(job)})


# ------------------------------------------------------------------ adapter
# JSON request schema == the infer scripts' flag surface (infer/cog_vap.py /
# infer/wan_vap.py main()); both pipelines share this call signature.
_REQUEST_FIELDS = {
    "prompt": str,
    "prompt_ref": str,
    "negative_prompt": str,
    "image_path": str,
    "ref_video_path": str,
    "ref_video_paths": list,
    "prompt_refs": list,
    "height": int,
    "width": int,
    "num_frames": int,
    "num_inference_steps": int,
    "guidance_scale": (int, float),
    "seed": int,
    "step_cache": str,
    "frames_selection": str,
    "pipeline_kwargs": dict,  # family-specific passthrough (use_dynamic_cfg…)
    "_warmup": bool,
}


def validate_request(request: Dict[str, Any]) -> None:
    """Reject unknown keys and wrong types BEFORE the job enters the queue,
    so typos fail the HTTP call (400) instead of the job minutes later."""
    for key, val in request.items():
        if key not in _REQUEST_FIELDS:
            raise ValueError(f"unknown request field {key!r}; "
                             f"valid: {sorted(k for k in _REQUEST_FIELDS if not k.startswith('_'))}")
        if val is not None and not isinstance(val, _REQUEST_FIELDS[key]):
            raise ValueError(f"field {key!r} must be {_REQUEST_FIELDS[key]}")
    if not request.get("prompt"):
        raise ValueError("field 'prompt' is required")
    for key in ("ref_video_paths", "prompt_refs"):
        if any(not isinstance(v, str) for v in request.get(key) or []):
            raise ValueError(f"field {key!r} must be a list of strings")
    refs = request.get("ref_video_paths") or (
        [request["ref_video_path"]] if request.get("ref_video_path") else [])
    prompts_ref = request.get("prompt_refs") or (
        [request["prompt_ref"]] if request.get("prompt_ref") else [])
    if refs and len(prompts_ref) != len(refs):
        raise ValueError("one prompt_ref per ref video is required "
                         f"({len(refs)} refs, {len(prompts_ref)} prompt_refs)")
    for p in list(refs) + ([request["image_path"]] if request.get("image_path") else []):
        if not os.path.isfile(p):
            raise FileNotFoundError(f"no such file: {p}")


def prepare_pipeline_kwargs(request: Dict[str, Any], defaults: Dict[str, Any]):
    """Request JSON -> pipeline kwargs, with the same preprocessing as the
    infer scripts: image -> [-1,1] HxWx3; each ref video -> frames selected
    (`frames_selection`), resized, normalized."""
    import numpy as np

    from ..data.video import load_video, normalize_video, resize_video
    from ..pipelines.cogvideox_i2v_mot import select_frames

    kw = dict(defaults)
    kw.update(request.get("pipeline_kwargs") or {})
    for key in ("prompt", "negative_prompt", "height", "width", "num_frames",
                "num_inference_steps", "guidance_scale", "seed", "step_cache"):
        if request.get(key) is not None:
            kw[key] = request[key]
    height, width = kw["height"], kw["width"]

    image = None
    if request.get("image_path"):
        import cv2

        image = cv2.cvtColor(cv2.imread(request["image_path"]), cv2.COLOR_BGR2RGB)
        image = normalize_video(
            resize_video(image[None].astype(np.float32) / 255.0, height, width))[0]
    kw["image"] = image

    refs = request.get("ref_video_paths") or (
        [request["ref_video_path"]] if request.get("ref_video_path") else [])
    if refs:
        selection = request.get("frames_selection", "evenly")
        ref_videos = []
        for path in refs:
            frames, _ = load_video(path)
            frames = select_frames(list(frames), kw["num_frames"], selection)
            ref_videos.append(normalize_video(resize_video(
                np.stack(frames).astype(np.float32) / 255.0, height, width)))
        kw["ref_videos"] = ref_videos
        kw["prompt_mot_ref"] = (request.get("prompt_refs")
                                or [request["prompt_ref"]])
    return kw


def make_video_generate_fn(pipeline, *, fps: int = 16,
                           defaults: Optional[Dict[str, Any]] = None,
                           context_fn: Optional[Callable[[], Any]] = None):
    """Adapt a VAP/plain video pipeline (CogVideoX or Wan) to the server's
    generate_fn contract. `defaults` fills request fields the caller omits
    (height/width/num_frames/steps/guidance, family extras like
    use_dynamic_cfg). `context_fn`, when given, returns a context manager
    entered around each pipeline call IN THE WORKER THREAD — required for
    thread-local state like `attention_provider` / `attention_mesh`
    (sequence-parallel serving)."""
    import contextlib

    import numpy as np

    base = {"height": 480, "width": 720, "num_frames": 49,
            "num_inference_steps": 50, "guidance_scale": 6.0, "seed": 42}
    base.update(defaults or {})

    def generate(request: Dict[str, Any], output_path: str) -> Dict[str, Any]:
        from ..data.video import export_to_video

        kw = prepare_pipeline_kwargs(request, base)
        with (context_fn() if context_fn is not None else contextlib.nullcontext()):
            video = pipeline(**kw)
        export_to_video((np.asarray(video[0]) + 1.0) / 2.0, output_path, fps=fps)
        return {"video_path": output_path,
                "num_frames": int(video.shape[1]),
                "height": int(video.shape[2]), "width": int(video.shape[3])}

    return generate
