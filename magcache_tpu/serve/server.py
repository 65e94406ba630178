"""HTTP serving endpoint: one compiled pipeline behind a request queue.

The reference's serving story is ``VideoSysEngine`` — a vLLM-inspired local
worker pool with pickled IPC queues and uuid-tagged futures
(``videosys/core/engine.py:13-128``, ``videosys/core/mp_utils.py:60-254``) —
plus a gradio demo for FramePack. Under JAX's single-controller model the
worker pool collapsed into a thin jitted-pipeline holder
(``core/engine.py``); this module restores the *service* half of that design
for production deployment: a long-lived process that owns ONE warm (compiled)
pipeline and exposes it over HTTP.

Design points (TPU-first):

- **Single executor thread owns the device.** All XLA dispatch is driven by
  one Python controller; interleaving ``generate()`` calls from HTTP threads
  would interleave their host-side logic between device dispatches. Requests
  therefore flow through a FIFO queue into one worker thread — the queue is
  the moral equivalent of the reference's per-worker task queue
  (``mp_utils.py:222-254``), minus the processes.
- **Compile once, serve forever.** The pipeline's jitted program is built on
  the first (or warmup) request; subsequent requests pay only run time.
- **uuid-tagged jobs** with sync and async submission, mirroring the
  reference's ``ResultFuture`` keying (``mp_utils.py:60-88``).

Endpoints (JSON in/out):

  GET  /healthz   liveness + backend + queue depth
  GET  /info      model/task/steps/cache config of the served pipeline
  POST /generate  {"prompt": ..., "seed": 0, "negative_prompt": ...,
                   "async": false, "return_latents": false}
                  sync -> the finished job record; async -> {"job_id": ...}
  GET  /jobs/<id> job record (status queued|running|done|error)
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
import uuid
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

from magcache_tpu.utils.logging import get_logger

logger = get_logger(__name__)

# kwargs a /generate request may forward to pipeline.generate(); everything
# else is rejected up front so typos fail loudly instead of at trace time
_ALLOWED_KWARGS = ("negative_prompt", "seed")
_MAX_LATENT_B64 = 32 * 1024 * 1024


@dataclass
class Job:
    job_id: str
    request: Dict[str, Any]
    status: str = "queued"               # queued | running | done | error
    result: Optional[Dict[str, Any]] = None
    error: Optional[str] = None
    submitted_at: float = field(default_factory=time.time)
    started_at: Optional[float] = None
    finished_at: Optional[float] = None
    done_event: threading.Event = field(default_factory=threading.Event)

    def record(self, include_latents: bool = False) -> Dict[str, Any]:
        rec = {
            "job_id": self.job_id,
            "status": self.status,
            "queue_wait_s": (round(self.started_at - self.submitted_at, 3)
                             if self.started_at else None),
            "wall_s": (round(self.finished_at - self.started_at, 3)
                       if self.finished_at and self.started_at else None),
        }
        if self.result is not None:
            res = dict(self.result)
            if not include_latents:
                res.pop("latents_b64", None)
            rec["result"] = res
        if self.error is not None:
            rec["error"] = self.error
        return rec


class PipelineServer:
    """Owns a pipeline + the executor thread; submit() enqueues jobs."""

    def __init__(self, pipeline, steps: Optional[int] = None,
                 save_dir: Optional[str] = None, fps: int = 16,
                 max_queue: int = 64, max_batch: int = 1,
                 batch_window_s: float = 0.05):
        """``max_batch > 1`` turns on micro-batching: the executor holds the
        first batchable job up to ``batch_window_s`` collecting more, then
        runs ONE ``generate_batch`` with the batch padded to ``max_batch``
        (fixed shape -> one compiled XLA program regardless of arrival
        pattern; batch rides the mesh ``dp`` axis). Per-element ``seeds``
        keep each response bit-identical to its single-request run. Requires
        the pipeline to expose ``generate_batch`` (Wan does)."""
        self.pipeline = pipeline
        self.steps = steps
        self.save_dir = save_dir
        self.fps = fps
        self.max_batch = max_batch
        self.batch_window_s = batch_window_s
        if max_batch > 1 and not hasattr(pipeline, "generate_batch"):
            raise ValueError(f"max_batch={max_batch} needs a pipeline with "
                             "generate_batch; "
                             f"{type(pipeline).__name__} has none")
        self._queue: "queue.Queue[Optional[Job]]" = queue.Queue(max_queue)
        self._jobs: Dict[str, Job] = {}
        self._jobs_lock = threading.Lock()
        self._served = 0
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="magcache-serve-executor")
        self._worker.start()

    # ------------------------------------------------------------------ API
    def warmup(self, prompt: str = "warmup") -> Dict[str, Any]:
        """Compile the pipeline before the first real request."""
        job = self.submit({"prompt": prompt})
        job.done_event.wait()
        return job.record()

    def submit(self, request: Dict[str, Any]) -> Job:
        prompt = request.get("prompt")
        if not isinstance(prompt, str) or not prompt:
            raise ValueError("request must carry a non-empty string 'prompt'")
        bad = [k for k in request
               if k not in _ALLOWED_KWARGS + ("prompt", "async",
                                              "return_latents")]
        if bad:
            raise ValueError(f"unknown request fields {bad}; allowed: "
                             f"{sorted(_ALLOWED_KWARGS)} + prompt/async/"
                             "return_latents")
        job = Job(job_id=uuid.uuid4().hex[:12], request=dict(request))
        with self._jobs_lock:
            self._jobs[job.job_id] = job
        self._queue.put(job)             # blocks (backpressure) when full
        return job

    def get(self, job_id: str) -> Optional[Job]:
        with self._jobs_lock:
            return self._jobs.get(job_id)

    def stats(self) -> Dict[str, Any]:
        import jax
        return {
            "ok": True,
            "backend": jax.default_backend(),
            "pending": self._queue.qsize(),
            "served": self._served,
            "pipeline": type(self.pipeline).__name__,
        }

    def info(self) -> Dict[str, Any]:
        cfg = getattr(self.pipeline, "config", None)
        out = {"pipeline": type(self.pipeline).__name__, "steps": self.steps}
        if cfg is not None:
            import dataclasses
            try:
                d = dataclasses.asdict(cfg)
            except TypeError:
                d = {k: v for k, v in vars(cfg).items()}
            out["config"] = {k: v for k, v in d.items()
                             if isinstance(v, (int, float, str, bool, tuple,
                                               list, type(None)))}
        return out

    def shutdown(self, timeout: float = 30.0) -> None:
        self._stop.set()
        self._queue.put(None)
        self._worker.join(timeout)

    # ------------------------------------------------------------- executor
    def _run(self) -> None:
        held: Optional[Job] = None       # non-batchable job deferred by a batch
        while not self._stop.is_set():
            if held is not None:
                job, held = held, None
            else:
                job = self._queue.get()
            if job is None:
                break
            batch = [job]
            if self.max_batch > 1 and self._batchable(job):
                deadline = time.time() + self.batch_window_s
                while len(batch) < self.max_batch:
                    try:
                        nxt = self._queue.get(
                            timeout=max(0.0, deadline - time.time()))
                    except queue.Empty:
                        break
                    if nxt is None:
                        self._stop.set()
                        break
                    if self._batchable(nxt):
                        batch.append(nxt)
                    else:            # run the batch first, this job next
                        held = nxt
                        break
            now = time.time()
            for j in batch:
                j.status = "running"
                j.started_at = now
            try:
                # any batchable job under micro-batching rides the padded
                # generate_batch program — even solo — so every arrival
                # pattern reuses ONE compiled executable
                if self.max_batch > 1 and self._batchable(job):
                    results = self._execute_batch([j.request for j in batch])
                else:
                    results = [self._execute(job.request)]
                for j, res in zip(batch, results):
                    j.result = res
                    j.status = "done"
            except Exception as exc:  # noqa: BLE001 — survive bad requests
                for j in batch:
                    logger.warning("job %s failed: %r", j.job_id, exc)
                    j.status = "error"
                    j.error = repr(exc)
            now = time.time()
            for j in batch:
                j.finished_at = now
                self._served += 1
                j.done_event.set()

    def _batchable(self, job: Job) -> bool:
        """A request joins a micro-batch when it only carries the fields
        ``generate_batch`` models per-element (prompt/seed) or per-batch
        with identical defaults (negative_prompt omitted -> pipeline
        default)."""
        return ("negative_prompt" not in job.request
                and not job.request.get("return_latents"))

    def _execute_batch(self, requests) -> list:
        prompts = [r["prompt"] for r in requests]
        seeds = [int(r.get("seed", 0)) for r in requests]
        b = len(prompts)
        # pad to max_batch: ONE compiled program for every arrival pattern
        # (XLA would retrace per batch size otherwise); padded lanes replay
        # the last request and are discarded
        while len(prompts) < self.max_batch:
            prompts.append(prompts[-1])
            seeds.append(seeds[-1])
        out = self.pipeline.generate_batch(prompts, seeds=seeds)
        lat = np.asarray(out.latents)
        results = []
        for i in range(b):
            res: Dict[str, Any] = {"latents_shape": [1] + list(lat.shape[1:]),
                                   "batched": b}
            if out.timings:
                res["timings"] = {k: round(float(v), 3)
                                  for k, v in out.timings.items()}
            results.append(res)
        return results

    def _execute(self, request: Dict[str, Any]) -> Dict[str, Any]:
        kwargs = {k: request[k] for k in _ALLOWED_KWARGS if k in request}
        out = self.pipeline.generate(request["prompt"], **kwargs)
        res: Dict[str, Any] = {}
        lat = np.asarray(out.latents)
        res["latents_shape"] = list(lat.shape)
        if out.skips is not None:
            sk = np.asarray(out.skips)
            res["skipped_forwards"] = int(sk.sum())
            res["total_forwards"] = int(sk.size)
        if out.timings:
            res["timings"] = {k: round(float(v), 3)
                              for k, v in out.timings.items()}
        media = out.video if out.video is not None else out.image
        if media is not None and self.save_dir:
            import os

            from magcache_tpu.utils.misc import save_image, save_video
            os.makedirs(self.save_dir, exist_ok=True)
            if out.video is not None:
                path = os.path.join(self.save_dir,
                                    f"{uuid.uuid4().hex[:12]}.mp4")
                save_video(out.video, path, fps=self.fps)
            else:
                path = os.path.join(self.save_dir,
                                    f"{uuid.uuid4().hex[:12]}.png")
                save_image(out.image, path)
            res["media_path"] = path
        if request.get("return_latents"):
            buf = io.BytesIO()
            np.save(buf, lat)
            raw = buf.getvalue()
            if len(raw) > _MAX_LATENT_B64:
                res["latents_note"] = (f"latents ({len(raw)} bytes) exceed "
                                       f"the {_MAX_LATENT_B64}-byte transport "
                                       "cap; fetch via media_path instead")
            else:
                res["latents_b64"] = base64.b64encode(raw).decode("ascii")
        return res


# ------------------------------------------------------------------- HTTP
def make_http_server(server: PipelineServer, host: str = "127.0.0.1",
                     port: int = 0) -> ThreadingHTTPServer:
    """Bind a ThreadingHTTPServer over ``server``. ``port=0`` picks a free
    port (read it back from ``httpd.server_address``). Call
    ``httpd.serve_forever()`` (blocking) or drive it from a thread."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to our logger, not stderr
            logger.debug("http: " + fmt, *args)

        def _send(self, code: int, payload: Dict[str, Any]) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — http.server API
            if self.path == "/healthz":
                self._send(200, server.stats())
            elif self.path == "/info":
                self._send(200, server.info())
            elif self.path.startswith("/jobs/"):
                job = server.get(self.path[len("/jobs/"):])
                if job is None:
                    self._send(404, {"error": "unknown job"})
                else:
                    self._send(200, job.record(
                        include_latents=job.status == "done"))
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/generate":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                request = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(request, dict):
                    raise ValueError("request body must be a JSON object")
                job = server.submit(request)
            except (ValueError, TypeError, json.JSONDecodeError) as exc:
                self._send(400, {"error": str(exc)})
                return
            if request.get("async"):
                self._send(202, {"job_id": job.job_id, "status": job.status})
                return
            job.done_event.wait()
            self._send(200 if job.status == "done" else 500,
                       job.record(include_latents=True))

    return ThreadingHTTPServer((host, port), Handler)
