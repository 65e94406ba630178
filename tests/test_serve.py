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
    # FLUX is CFG-distilled: generate() takes no negative_prompt -> the job
    # errors and the server survives to serve the next request
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/generate", {"prompt": "x", "negative_prompt": "y"})
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
