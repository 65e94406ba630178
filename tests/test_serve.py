"""HTTP serving endpoint (``magcache_tpu/serve/``): the service half of the
reference's vLLM-inspired engine (``videosys/core/engine.py:13-128``,
``mp_utils.py:60-254``) rebuilt over the single-controller pipeline — one
executor thread owns the device, uuid-tagged jobs, sync + async submission."""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from magcache_tpu.pipelines.flux import FluxPipeline, FluxPipelineConfig
from magcache_tpu.serve import PipelineServer, make_http_server


@pytest.fixture(scope="module")
def served():
    cfg = FluxPipelineConfig(tiny=True, height=64, width=64, txt_len=8,
                             num_inference_steps=4, dtype="float32",
                             use_magcache=True, magcache_thresh=0.3,
                             retention_ratio=0.1)
    pipe = FluxPipeline(cfg)
    pipe.record_skips = True
    server = PipelineServer(pipe, steps=cfg.num_inference_steps)
    httpd = make_http_server(server, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = "http://127.0.0.1:%d" % httpd.server_address[1]
    yield server, base
    httpd.shutdown()
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=600) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, json.loads(r.read())


def test_healthz_and_info(served):
    server, base = served
    code, health = _get(base + "/healthz")
    assert code == 200 and health["ok"] and health["backend"] == "cpu"
    code, info = _get(base + "/info")
    assert code == 200
    assert info["pipeline"] == "FluxPipeline"
    assert info["steps"] == 4
    assert info["config"]["use_magcache"] is True


def test_sync_generate_returns_latents_and_skips(served):
    _, base = served
    code, rec = _post(base + "/generate",
                      {"prompt": "a fox", "seed": 3, "return_latents": True})
    assert code == 200 and rec["status"] == "done"
    res = rec["result"]
    assert res["latents_shape"] == [1, 16, 1 * 16]  # packed 32x32/16 grid
    assert res["skipped_forwards"] > 0
    assert res["total_forwards"] == 4
    assert rec["wall_s"] is not None and rec["queue_wait_s"] is not None
    lat = np.load(io.BytesIO(base64.b64decode(res["latents_b64"])))
    assert lat.shape == tuple(res["latents_shape"])
    assert np.isfinite(lat).all()


def test_sync_generate_deterministic_per_seed(served):
    _, base = served
    recs = [_post(base + "/generate", {"prompt": "a fox", "seed": 7,
                                       "return_latents": True})[1]
            for _ in range(2)]
    a, b = (np.load(io.BytesIO(base64.b64decode(
        r["result"]["latents_b64"]))) for r in recs)
    np.testing.assert_array_equal(a, b)


def test_async_job_lifecycle(served):
    server, base = served
    code, sub = _post(base + "/generate", {"prompt": "a cat", "async": True})
    assert code == 202 and "job_id" in sub
    job = server.get(sub["job_id"])
    assert job is not None
    job.done_event.wait(600)
    code, rec = _get(base + "/jobs/" + sub["job_id"])
    assert code == 200 and rec["status"] == "done"
    assert rec["result"]["latents_shape"][0] == 1


def test_concurrent_posts_serialize_on_one_executor(served):
    server, base = served
    results = []

    def post(seed):
        results.append(_post(base + "/generate",
                             {"prompt": "x", "seed": seed}))

    threads = [threading.Thread(target=post, args=(s,)) for s in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(600)
    assert len(results) == 3
    assert all(code == 200 and rec["status"] == "done"
               for code, rec in results)
    # jobs never overlapped on the executor: run windows are disjoint
    done = sorted((j.started_at, j.finished_at)
                  for j in server._jobs.values() if j.status == "done")
    for (_, fin), (start, _) in zip(done, done[1:]):
        assert start >= fin - 1e-6


def test_bad_requests_rejected(served):
    _, base = served
    for payload in ({}, {"prompt": ""}, {"prompt": "x", "stepz": 3},
                    [1, 2], "nope"):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/generate", payload)
        assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(base + "/jobs/nope")
    assert ei.value.code == 404


def test_pipeline_error_surfaces_as_500(served):
    _, base = served
    # FLUX is CFG-distilled: generate() takes no negative_prompt, and the
    # signature-derived kwarg gate (round 5) now rejects it up front as 400
    # instead of erroring at execution
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/generate", {"prompt": "x", "negative_prompt": "y"})
    assert ei.value.code == 400
    # a value that passes the gate but explodes inside generate() -> 500,
    # and the server survives to serve the next request
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/generate", {"prompt": "x", "seed": "not-an-int"})
    assert ei.value.code == 500
    code, rec = _post(base + "/generate", {"prompt": "still alive"})
    assert code == 200 and rec["status"] == "done"


def test_media_saved_when_save_dir_set(tmp_path):
    cfg = FluxPipelineConfig(tiny=True, height=64, width=64, txt_len=8,
                             num_inference_steps=2, dtype="float32")
    pipe = FluxPipeline(cfg)
    server = PipelineServer(pipe, steps=2, save_dir=str(tmp_path))
    try:
        job = server.submit({"prompt": "a fox"})
        job.done_event.wait(600)
        assert job.status == "done", job.error
        # tiny pipeline has no VAE -> no decoded media, no media_path
        assert "media_path" not in job.result

        class FakeOut:
            latents = np.zeros((1, 4, 4))
            video = None
            image = (np.ones((8, 8, 3)) * 255).astype(np.uint8)
            skips = None
            timings = None

        class FakePipe:
            def generate(self, prompt, **kw):
                return FakeOut()

        server2 = PipelineServer(FakePipe(), save_dir=str(tmp_path))
        try:
            job2 = server2.submit({"prompt": "x"})
            job2.done_event.wait(60)
            assert job2.status == "done", job2.error
            assert job2.result["media_path"].endswith(".png")
            import os
            assert os.path.exists(job2.result["media_path"])
        finally:
            server2.shutdown()
    finally:
        server.shutdown()


def test_serve_cli_parser_has_flags():
    from magcache_tpu.cli.serve import build_serve_parser

    p = build_serve_parser()
    args = p.parse_args(["--task", "flux-dev", "--tiny", "--port", "0",
                         "--warmup"])
    assert args.port == 0 and args.warmup and args.task == "flux-dev"


# --------------------------------------------------------------- batching
def test_micro_batching_pads_and_matches_single_runs():
    """max_batch>1: concurrent batchable requests run as ONE padded
    generate_batch (fixed shape -> one compiled program); per-element seeds
    keep each response identical to its single-request run."""
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig

    cfg = WanPipelineConfig(tiny=True, size=(64, 32), frame_num=9,
                            sample_steps=3, sample_solver="euler",
                            dtype="float32")
    pipe = WanPipeline(cfg)
    server = PipelineServer(pipe, steps=3, max_batch=2, batch_window_s=5.0)
    try:
        jobs = [server.submit({"prompt": p, "seed": s})
                for p, s in (("a cat", 1), ("a dog", 2))]
        for j in jobs:
            j.done_event.wait(600)
        assert all(j.status == "done" for j in jobs), \
            [j.error for j in jobs]
        assert all(j.result["batched"] == 2 for j in jobs)
        # the pair shared one executor pass
        assert jobs[0].started_at == jobs[1].started_at

        # a solo request still works (padded to max_batch internally)
        j3 = server.submit({"prompt": "a fox", "seed": 3})
        j3.done_event.wait(600)
        assert j3.status == "done" and j3.result["batched"] == 1
    finally:
        server.shutdown()

    # per-seed equality with the single-request path
    single = pipe.generate_batch(["a cat", "a dog"], seeds=[1, 2])
    solo = pipe.generate_batch(["a cat", "a cat"], seeds=[1, 1])
    np.testing.assert_array_equal(np.asarray(single.latents)[0],
                                  np.asarray(solo.latents)[0])


def test_non_batchable_request_defers_not_drops():
    """A request carrying negative_prompt can't join a micro-batch; it must
    still execute (solo) after the batch it interrupted."""
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig

    cfg = WanPipelineConfig(tiny=True, size=(64, 32), frame_num=9,
                            sample_steps=2, sample_solver="euler",
                            dtype="float32")
    pipe = WanPipeline(cfg)
    server = PipelineServer(pipe, steps=2, max_batch=2, batch_window_s=5.0)
    try:
        a = server.submit({"prompt": "a", "seed": 0})
        b = server.submit({"prompt": "b", "seed": 0,
                           "negative_prompt": "ugly"})
        c = server.submit({"prompt": "c", "seed": 0})
        for j in (a, b, c):
            j.done_event.wait(600)
        assert all(j.status == "done" for j in (a, b, c)), \
            [j.error for j in (a, b, c)]
        assert "batched" not in b.result     # ran through the solo path
    finally:
        server.shutdown()


def test_max_batch_requires_generate_batch():
    class NoBatch:
        def generate(self, prompt, **kw):
            raise AssertionError("unused")

    with pytest.raises(ValueError):
        PipelineServer(NoBatch(), max_batch=2)


# ----------------------------------------------------- hardening (round 4)
class _SlowPipe:
    """Fake pipeline whose generate() blocks — drives queue/timeout tests."""

    def __init__(self, delay=0.5, fail=None):
        self.delay = delay
        self.fail = fail

    def generate(self, prompt, **kw):
        if self.fail is not None:
            raise self.fail
        import time as _t
        _t.sleep(self.delay)

        class Out:
            latents = np.zeros((1, 2, 2))
            video = None
            image = None
            skips = None
            timings = None
        return Out()


def test_task_fps_shared_helper():
    """The serve CLI and _save_media read ONE fps table (ADVICE r3: latte/
    vchitect were 16 instead of 8, ti2v 16 instead of 24 on the serve path)."""
    from magcache_tpu.utils.misc import task_fps
    assert task_fps("latte") == 8
    assert task_fps("vchitect") == 8
    assert task_fps("cogvideox-2b") == 8
    assert task_fps("ti2v-5B") == 24
    assert task_fps("hunyuan-t2v") == 24
    assert task_fps("open-sora") == 24
    assert task_fps("framepack") == 30
    assert task_fps("t2v-1.3B") == 16


def test_queue_full_returns_503():
    pipe = _SlowPipe(delay=1.0)
    server = PipelineServer(pipe, max_queue=1)
    httpd = make_http_server(server, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = "http://127.0.0.1:%d" % httpd.server_address[1]
    try:
        first = server.submit({"prompt": "occupies the executor"})
        import time as _t
        _t.sleep(0.2)                      # executor picked up `first`
        server.submit({"prompt": "fills the queue"})
        from magcache_tpu.serve import QueueFullError
        with pytest.raises(QueueFullError):
            server.submit({"prompt": "bounces"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/generate", {"prompt": "bounces", "async": True})
        assert ei.value.code == 503
        first.done_event.wait(30)
    finally:
        httpd.shutdown()
        server.shutdown()


def test_cancel_queued_job_and_running_job():
    pipe = _SlowPipe(delay=0.8)
    server = PipelineServer(pipe)
    httpd = make_http_server(server, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = "http://127.0.0.1:%d" % httpd.server_address[1]
    try:
        running = server.submit({"prompt": "runs"})
        queued = server.submit({"prompt": "waits"})
        import time as _t
        _t.sleep(0.2)
        # queued job: cancellable over HTTP
        code, rec = _post(base + f"/jobs/{queued.job_id}/cancel", {})
        assert code == 200 and rec["status"] == "cancelled"
        assert queued.done_event.is_set()
        # running job: 409 (XLA dispatch is not preemptible)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + f"/jobs/{running.job_id}/cancel", {})
        assert ei.value.code == 409
        running.done_event.wait(30)
        assert running.status == "done"
        # the cancelled job never executed
        assert queued.status == "cancelled" and queued.result is None
        # unknown job -> 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/jobs/nope/cancel", {})
        assert ei.value.code == 404
    finally:
        httpd.shutdown()
        server.shutdown()


def test_job_timeout_fails_job_and_server_survives():
    pipe = _SlowPipe(delay=1.5)
    server = PipelineServer(pipe, watchdog_interval_s=0.05)
    try:
        job = server.submit({"prompt": "too slow", "timeout_s": 0.2})
        assert job.done_event.wait(10)
        assert job.status == "timeout"
        assert "run budget" in job.error
        # the executor eventually finishes the stale program and discards it
        nxt = server.submit({"prompt": "still serving"})
        assert nxt.done_event.wait(30)
        assert nxt.status == "done"
    finally:
        server.shutdown()


def test_default_timeout_applies_when_request_has_none():
    pipe = _SlowPipe(delay=1.5)
    server = PipelineServer(pipe, default_timeout_s=0.2,
                            watchdog_interval_s=0.05)
    try:
        job = server.submit({"prompt": "budgeted by server default"})
        assert job.done_event.wait(10)
        assert job.status == "timeout"
    finally:
        server.shutdown()


def test_worker_death_fails_queued_jobs_and_healthz_503():
    """WorkerMonitor semantics (mp_utils.py:111-151): executor death must
    fail pending futures, not strand them."""
    pipe = _SlowPipe(fail=SystemExit("executor killed"))
    server = PipelineServer(pipe, watchdog_interval_s=0.05)
    httpd = make_http_server(server, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = "http://127.0.0.1:%d" % httpd.server_address[1]
    try:
        job = server.submit({"prompt": "kills the worker"})
        assert job.done_event.wait(10)
        import time as _t
        deadline = _t.time() + 10
        while server._worker.is_alive() and _t.time() < deadline:
            _t.sleep(0.05)
        assert not server._worker.is_alive()
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(base + "/healthz")
        assert ei.value.code == 503
        # new submissions bounce instead of queueing behind a corpse
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/generate", {"prompt": "x", "async": True})
        assert ei.value.code == 503
    finally:
        httpd.shutdown()
        server.shutdown()


def test_shutdown_drains_queued_jobs():
    pipe = _SlowPipe(delay=0.6)
    server = PipelineServer(pipe)
    jobs = [server.submit({"prompt": f"j{i}"}) for i in range(3)]
    import time as _t
    _t.sleep(0.1)
    server.shutdown(timeout=5.0)
    for j in jobs:
        assert j.done_event.wait(5), j.job_id
        assert j.status in ("done", "error"), j.status
    assert any(j.status == "error" for j in jobs)  # queued ones were failed


def test_sync_wait_timeout_returns_504_then_pollable():
    pipe = _SlowPipe(delay=1.0)
    server = PipelineServer(pipe, sync_wait_s=0.15)
    httpd = make_http_server(server, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = "http://127.0.0.1:%d" % httpd.server_address[1]
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/generate", {"prompt": "slow"})
        assert ei.value.code == 504
        rec = json.loads(ei.value.read())
        job_id = rec["job_id"]
        import time as _t
        deadline = _t.time() + 30
        while _t.time() < deadline:
            code, rec = _get(base + "/jobs/" + job_id)
            if rec["status"] == "done":
                break
            _t.sleep(0.1)
        assert rec["status"] == "done"
    finally:
        httpd.shutdown()
        server.shutdown()


def test_job_history_eviction_and_latents_release(served):
    """Finished-job memory is bounded (ADVICE r3: _jobs grew without bound,
    retaining ~43MB latents_b64 payloads forever)."""
    pipe = _SlowPipe(delay=0.0)
    server = PipelineServer(pipe, job_history=2)
    try:
        ids = []
        for i in range(3):
            j = server.submit({"prompt": f"p{i}"})
            assert j.done_event.wait(10)
            ids.append(j.job_id)
        assert server.get(ids[0]) is None          # evicted
        assert server.get(ids[1]) is not None
        assert server.get(ids[2]) is not None
    finally:
        server.shutdown()

    # latents_b64 released from the retained record after first delivery
    _, base = served
    code, rec = _post(base + "/generate",
                      {"prompt": "big", "return_latents": True})
    assert code == 200 and "latents_b64" in rec["result"]
    code, rec2 = _get(base + "/jobs/" + rec["job_id"])
    assert code == 200 and "latents_b64" not in rec2["result"]


def test_save_dir_disables_micro_batching(tmp_path):
    """ADVICE r3: with save_dir + max_batch>1, batched jobs silently lost
    media_path. save_dir now makes every job non-batchable so the output
    contract is arrival-pattern independent."""
    class BatchPipe:
        def generate(self, prompt, **kw):
            class Out:
                latents = np.zeros((1, 2, 2))
                video = None
                image = (np.ones((4, 4, 3)) * 255).astype(np.uint8)
                skips = None
                timings = None
            return Out()

        def generate_batch(self, prompts, seeds=None):
            raise AssertionError("must not batch when save_dir is set")

    server = PipelineServer(BatchPipe(), save_dir=str(tmp_path),
                            max_batch=2, batch_window_s=0.3)
    try:
        jobs = [server.submit({"prompt": p}) for p in ("a", "b")]
        for j in jobs:
            assert j.done_event.wait(10)
            assert j.status == "done", j.error
            assert "batched" not in j.result
            assert j.result["media_path"].endswith(".png")
    finally:
        server.shutdown()


# ------------------------------------------- per-request schedule overrides
@pytest.fixture(scope="module")
def wan_served():
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig

    cfg = WanPipelineConfig(model="wan2.1-t2v-1.3B", tiny=True,
                            size=(64, 32), frame_num=9, sample_steps=4,
                            sample_solver="euler", dtype="float32",
                            use_magcache=True)
    pipe = WanPipeline(cfg)
    server = PipelineServer(pipe, steps=4)
    httpd = make_http_server(server, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = "http://127.0.0.1:%d" % httpd.server_address[1]
    yield pipe, server, base
    httpd.shutdown()
    server.shutdown()


def test_override_requests_share_one_program(wan_served):
    """E/K/R per request through ONE compiled executable (the sampler's
    skip_mask_override one-program-many-schedules design)."""
    pipe, server, base = wan_served
    code, info = _get(base + "/info")
    assert info["overrides_supported"] is True
    # aggressive schedule -> skips; full compute -> zero skips
    code, rec_fast = _post(base + "/generate", {
        "prompt": "a fox", "seed": 5, "return_latents": True,
        "magcache_thresh": 0.5, "magcache_K": 4, "retention_ratio": 0.25})
    code, rec_full = _post(base + "/generate", {
        "prompt": "a fox", "seed": 5, "return_latents": True,
        "use_magcache": False})
    assert rec_fast["result"]["skipped_forwards"] > 0
    assert rec_full["result"]["skipped_forwards"] == 0
    assert rec_full["result"]["total_forwards"] == 8   # 4 steps x 2 lanes
    # both rode the SAME jitted program
    assert list(pipe._jit_cache) == [("override",)] or \
        ("override",) in pipe._jit_cache
    n_override_entries = [k for k in pipe._jit_cache if k == ("override",)]
    assert len(n_override_entries) == 1

    # parity: server override result == direct pipeline run with those E/K/R
    mask = pipe.skip_mask_for(thresh=0.5, K=4, retention_ratio=0.25)
    direct = pipe.generate("a fox", seed=5, skip_override=mask)
    served_lat = np.load(io.BytesIO(base64.b64decode(
        rec_fast["result"]["latents_b64"])))
    np.testing.assert_array_equal(served_lat, np.asarray(direct.latents))

    # full-compute override == the uncached config's own result
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig
    import dataclasses as _dc
    cfg_full = _dc.replace(pipe.config, use_magcache=False)
    pipe_full = WanPipeline(cfg_full, params=pipe.params)
    ref = pipe_full.generate("a fox", seed=5)
    full_lat = np.load(io.BytesIO(base64.b64decode(
        rec_full["result"]["latents_b64"])))
    np.testing.assert_allclose(full_lat, np.asarray(ref.latents),
                               rtol=2e-5, atol=2e-5)


def test_override_rejected_for_unsupported_pipeline():
    # a pipeline without skip_mask_for (FluxPipeline gained override support
    # in round 5, so the stub stands in for the remaining families)
    server = PipelineServer(_SlowPipe(delay=0.0), steps=2)
    httpd = make_http_server(server, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = "http://127.0.0.1:%d" % httpd.server_address[1]
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/generate", {"prompt": "x", "magcache_thresh": 0.2})
        assert ei.value.code == 400
        assert "skip_mask_for" in json.loads(ei.value.read())["error"]
    finally:
        httpd.shutdown()
        server.shutdown()


def test_bad_timeout_rejected(served):
    _, base = served
    for bad in (0, -1, "soon"):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/generate", {"prompt": "x", "timeout_s": bad})
        assert ei.value.code == 400
