"""HTTP serving subsystem: job queue, endpoints, and a real tiny-pipeline
end-to-end generation through the server (vap_tpu/serving/server.py). The
reference has no server — per-request scripts only (infer/cog_vap.py) — so
the contract under test is this framework's own: single device-owner worker,
FIFO queue, warm readiness, fail-soft jobs."""

import json
import os
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from vap_tpu.serving import (GenerationServer, QueueFull,
                             make_video_generate_fn, validate_request)


def _req(port, path, body=None, method=None):
    """Returns (status, parsed json)."""
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read() or b"null")
    except urllib.error.HTTPError as e:
        payload = e.read()
        return e.code, (json.loads(payload) if payload else None)


@pytest.fixture()
def fake_server(tmp_path):
    """Server over a controllable generate_fn: blocks until released,
    fails on demand."""
    release = threading.Event()
    ran = []

    def generate(request, output_path):
        if not request.get("instant"):
            assert release.wait(timeout=30), "test forgot to release"
        if request.get("boom"):
            raise RuntimeError("kaboom")
        ran.append(request["prompt"])
        with open(output_path, "wb") as f:
            f.write(b"\x00")
        return {"video_path": output_path}

    srv = GenerationServer(generate, str(tmp_path / "out"), max_queue=2,
                           allow_shutdown=True)
    port = srv.start()
    yield srv, port, release, ran
    srv.stop(timeout=5)


def test_health_ready_metrics(fake_server):
    srv, port, release, _ = fake_server
    assert _req(port, "/healthz")[0] == 200
    code, body = _req(port, "/readyz")
    assert code == 200 and body["ready"] is True
    code, m = _req(port, "/metrics")
    assert code == 200 and m["jobs_submitted"] == 0 and m["queue_depth"] == 0
    code, _ = _req(port, "/nope")
    assert code == 404


def test_fifo_order_queue_positions_and_results(fake_server):
    srv, port, release, ran = fake_server
    code, a = _req(port, "/generate", {"prompt": "a"})
    assert code == 202
    code, b = _req(port, "/generate", {"prompt": "b"})
    assert code == 202
    # a is running (or next); b waits behind it
    code, jb = _req(port, f"/jobs/{b['job_id']}")
    assert code == 200 and jb["status"] == "queued"
    release.set()
    code, jb = _req(port, f"/jobs/{b['job_id']}?wait=30")
    assert code == 200 and jb["status"] == "done", jb
    assert os.path.isfile(jb["result"]["video_path"])
    assert ran == ["a", "b"]  # FIFO
    code, all_jobs = _req(port, "/jobs")
    assert code == 200 and [j["request"]["prompt"] for j in all_jobs] == ["b", "a"]


def test_job_failure_keeps_worker_alive(fake_server):
    srv, port, release, _ = fake_server
    release.set()
    code, bad = _req(port, "/generate", {"prompt": "x", "boom": True})
    _, jb = _req(port, f"/jobs/{bad['job_id']}?wait=30")
    assert jb["status"] == "failed" and "kaboom" in jb["error"]
    # worker survived: the next job runs fine
    code, ok = _req(port, "/generate", {"prompt": "y"})
    _, jo = _req(port, f"/jobs/{ok['job_id']}?wait=30")
    assert jo["status"] == "done"
    _, m = _req(port, "/metrics")
    assert m["jobs_failed"] == 1 and m["jobs_done"] == 1
    assert _req(port, "/healthz")[0] == 200


def test_queue_full_rejects_429(fake_server):
    srv, port, release, _ = fake_server
    assert _req(port, "/generate", {"prompt": "p0"})[0] == 202
    deadline = time.time() + 10
    while srv._pending_count > 0 and time.time() < deadline:
        time.sleep(0.01)  # worker picks p0 up; it then blocks on `release`
    assert _req(port, "/generate", {"prompt": "p1"})[0] == 202
    assert _req(port, "/generate", {"prompt": "p2"})[0] == 202
    code, body = _req(port, "/generate", {"prompt": "p3"})  # 2 queued = max
    assert code == 429 and "queue full" in body["error"]
    release.set()
    _, m = _req(port, "/metrics")
    assert m["jobs_rejected"] == 1


def test_unknown_job_404_and_bad_json_400(fake_server):
    srv, port, _, _ = fake_server
    assert _req(port, "/jobs/deadbeef")[0] == 404
    url = f"http://127.0.0.1:{port}/generate"
    req = urllib.request.Request(url, data=b"{not json", method="POST")
    try:
        urllib.request.urlopen(req, timeout=10)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_shutdown_endpoint(tmp_path):
    srv = GenerationServer(lambda r, o: {}, str(tmp_path), allow_shutdown=False)
    port = srv.start()
    assert _req(port, "/shutdown", {}, method="POST")[0] == 403
    srv.allow_shutdown = True
    assert _req(port, "/shutdown", {}, method="POST")[0] == 200
    deadline = time.time() + 10
    while srv._worker.is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not srv._worker.is_alive()


def test_validate_request_rejects_before_enqueue(tmp_path):
    with pytest.raises(ValueError, match="unknown request field"):
        validate_request({"prompt": "x", "promt_ref": "typo"})
    with pytest.raises(ValueError, match="'prompt' is required"):
        validate_request({"seed": 3})
    with pytest.raises(ValueError, match="one prompt_ref per ref video"):
        validate_request({"prompt": "x", "ref_video_paths": ["a.mp4"]})
    with pytest.raises(FileNotFoundError):
        validate_request({"prompt": "x", "image_path": str(tmp_path / "no.png")})
    # and over HTTP it is a 400, not a failed job
    srv = GenerationServer(lambda r, o: {}, str(tmp_path),
                           validate_fn=validate_request)
    port = srv.start()
    try:
        code, body = _req(port, "/generate", {"prompt": "x", "bogus": 1})
        assert code == 400 and "unknown request field" in body["error"]
        _, m = _req(port, "/metrics")
        assert m["jobs_submitted"] == 0
    finally:
        srv.stop(timeout=5)


def test_metrics_prometheus_format(fake_server):
    srv, port, release, _ = fake_server
    release.set()
    _, j = _req(port, "/generate", {"prompt": "m"})
    _req(port, f"/jobs/{j['job_id']}?wait=30")
    url = f"http://127.0.0.1:{port}/metrics?format=prometheus"
    with urllib.request.urlopen(url, timeout=10) as r:
        text = r.read().decode()
        assert r.headers["Content-Type"].startswith("text/plain")
    lines = dict(l.rsplit(" ", 1) for l in text.strip().splitlines())
    assert lines["vap_serving_jobs_done"] == "1"
    assert float(lines["vap_serving_generation_seconds_p50"]) >= 0.0


def test_warmup_gates_readiness(tmp_path):
    gate = threading.Event()

    def generate(request, output_path):
        assert gate.wait(timeout=30)
        return {}

    srv = GenerationServer(generate, str(tmp_path))
    port = srv.start(warmup_request={"prompt": "warm", "_warmup": True})
    try:
        code, body = _req(port, "/readyz")
        assert code == 503 and body["ready"] is False
        gate.set()
        deadline = time.time() + 15
        while time.time() < deadline:
            code, body = _req(port, "/readyz")
            if code == 200:
                break
            time.sleep(0.05)
        assert code == 200 and body["ready"] is True
    finally:
        srv.stop(timeout=5)


def test_warmup_failure_stays_unready(tmp_path):
    def generate(request, output_path):
        raise RuntimeError("no graphs for you")

    srv = GenerationServer(generate, str(tmp_path))
    port = srv.start(warmup_request={"prompt": "warm"})
    try:
        deadline = time.time() + 15
        while srv.warmup_error is None and time.time() < deadline:
            time.sleep(0.05)
        code, body = _req(port, "/readyz")
        assert code == 503 and body["ready"] is False
        assert "no graphs for you" in body["warmup_error"]
    finally:
        srv.stop(timeout=5)


def test_finished_job_history_is_bounded(tmp_path):
    srv = GenerationServer(lambda r, o: {}, str(tmp_path), max_history=3)
    port = srv.start()
    try:
        ids = []
        for i in range(8):
            _, sub = _req(port, "/generate", {"prompt": f"p{i}"})
            _, job = _req(port, f"/jobs/{sub['job_id']}?wait=30")
            assert job["status"] == "done"
            ids.append(sub["job_id"])
        _req(port, "/generate", {"prompt": "trigger-evict"})
        deadline = time.time() + 10
        while len(srv._jobs) > 4 and time.time() < deadline:
            time.sleep(0.02)
        # oldest finished jobs evicted; the registry stays bounded
        assert _req(port, f"/jobs/{ids[0]}")[0] == 404
        assert len(srv._jobs) <= srv.max_history + 1
        _, m = _req(port, "/metrics")
        assert m["jobs_submitted"] == 9  # counters survive eviction
    finally:
        srv.stop(timeout=5)


def test_bad_wait_param_is_400(fake_server):
    srv, port, release, _ = fake_server
    release.set()
    _, sub = _req(port, "/generate", {"prompt": "w"})
    code, body = _req(port, f"/jobs/{sub['job_id']}?wait=abc")
    assert code == 400 and "invalid wait" in body["error"]


def test_validate_rejects_non_string_list_elements():
    with pytest.raises(ValueError, match="list of strings"):
        validate_request({"prompt": "x", "ref_video_paths": [1],
                          "prompt_refs": ["a"]})


def test_submit_library_surface(tmp_path):
    """submit()/QueueFull without HTTP — the library surface stands alone."""
    block = threading.Event()
    srv = GenerationServer(lambda r, o: block.wait(30) and {} or {},
                           str(tmp_path), max_queue=1)
    srv.start()
    try:
        srv.submit({"prompt": "1"})
        time.sleep(0.2)  # let it start running
        srv.submit({"prompt": "2"})
        with pytest.raises(QueueFull):
            srv.submit({"prompt": "3"})
    finally:
        block.set()
        srv.stop(timeout=5)


def test_context_fn_enters_in_worker_thread(tmp_path):
    """Thread-local attention contexts (attention_provider / attention_mesh
    for sp serving) only work if entered by the device-owner worker — the
    adapter must call context_fn there, not on the submitting thread."""
    import contextlib

    seen = {}

    @contextlib.contextmanager
    def record_thread():
        seen["thread"] = threading.current_thread().name
        yield

    fake_pipe = lambda **kw: np.zeros((1, 2, 8, 8, 3), np.float32)  # noqa: E731
    srv = GenerationServer(
        make_video_generate_fn(fake_pipe, defaults={"height": 8, "width": 8,
                                                    "num_frames": 2},
                               context_fn=record_thread),
        str(tmp_path / "out"))
    port = srv.start()
    try:
        _, sub = _req(port, "/generate", {"prompt": "t"})
        _, job = _req(port, f"/jobs/{sub['job_id']}?wait=30")
        assert job["status"] == "done", job
        assert seen["thread"] == "vap-serving-worker"
    finally:
        srv.stop(timeout=5)


# --------------------------------------------------------------------- e2e
def test_e2e_tiny_pipeline_over_http(tmp_path, monkeypatch):
    """Full VAP generation through the HTTP server with a real (tiny)
    CogVideoX pipeline: image + ref video in via paths, mp4 out, second
    request reuses the warm graphs."""
    import cv2
    import jax
    import jax.numpy as jnp

    from tests.test_pipeline_cogvideox import FakeTokenizer, _init_vae_params
    from vap_tpu.data.video import export_to_video
    from vap_tpu.models.cogvideox import CogVideoXMOTConfig, init_cogvideox_mot
    from vap_tpu.models.cogvideox.vae import CogVideoXVAEConfig
    from vap_tpu.models.text_encoders import T5Config, init_t5_encoder
    from vap_tpu.ops.schedulers import CogVideoXDDIMScheduler
    from vap_tpu.pipelines.cogvideox_i2v_mot import CogVideoXVAPPipeline

    monkeypatch.setenv("VAP_ATTN_PROVIDER", "xla")
    t_cfg = CogVideoXMOTConfig.tiny(in_channels=8, out_channels=4)
    vae_cfg = CogVideoXVAEConfig.tiny()
    key = jax.random.PRNGKey(0)
    pipe = CogVideoXVAPPipeline(
        transformer_cfg=t_cfg, vae_cfg=vae_cfg,
        text_cfg=T5Config.tiny(d_model=t_cfg.text_embed_dim),
        params={"transformer": init_cogvideox_mot(key, t_cfg),
                "vae": _init_vae_params(key, vae_cfg),
                "text_encoder": init_t5_encoder(
                    key, T5Config.tiny(d_model=t_cfg.text_embed_dim))},
        tokenizer=FakeTokenizer(), scheduler=CogVideoXDDIMScheduler(),
        dtype=jnp.float32)

    rng = np.random.default_rng(0)
    img_path = str(tmp_path / "target.png")
    cv2.imwrite(img_path, (rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8))
    ref_path = str(tmp_path / "ref.mp4")
    export_to_video(rng.uniform(0, 1, (9, 32, 32, 3)).astype(np.float32),
                    ref_path, fps=16)

    with jax.default_device(jax.devices("cpu")[0]):
        srv = GenerationServer(
            make_video_generate_fn(pipe, defaults={
                "height": 32, "width": 32, "num_frames": 9,
                "num_inference_steps": 2, "guidance_scale": 6.0,
                "use_dynamic_cfg": True}),
            str(tmp_path / "out"), validate_fn=validate_request)
        port = srv.start()
        try:
            body = {"prompt": "a tiny video", "prompt_ref": "the reference",
                    "image_path": img_path, "ref_video_path": ref_path,
                    "seed": 7}
            code, sub = _req(port, "/generate", body)
            assert code == 202
            code, job = _req(port, f"/jobs/{sub['job_id']}?wait=570")
            assert job["status"] == "done", job
            out = job["result"]["video_path"]
            assert os.path.isfile(out) and job["result"]["num_frames"] == 9
            # warm second request (same shape) must be much faster
            code, sub2 = _req(port, "/generate", dict(body, seed=8))
            _, job2 = _req(port, f"/jobs/{sub2['job_id']}?wait=570")
            assert job2["status"] == "done"
            d1 = job["finished_at"] - job["started_at"]
            d2 = job2["finished_at"] - job2["started_at"]
            assert d2 < d1, (d1, d2)
            _, m = _req(port, "/metrics")
            assert m["jobs_done"] == 2 and m["jobs_failed"] == 0
        finally:
            srv.stop(timeout=10)
