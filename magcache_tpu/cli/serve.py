"""``python -m magcache_tpu.cli.serve`` — serve one pipeline over HTTP.

Builds the same pipeline ``cli.generate`` would for the given flags (task /
size / steps / cache config / checkpoints), optionally compiles it with a
warmup generation, then serves ``/generate`` forever. See
``magcache_tpu/serve/server.py`` for the endpoint contract and the
single-executor design rationale.

Example (structural, checkpoint-free):

    python -m magcache_tpu.cli.serve --task flux-dev --tiny --cpu \
        --use_magcache --warmup --port 8900
"""

from __future__ import annotations

import sys


def build_serve_parser():
    from magcache_tpu.cli.generate import build_parser

    p = build_parser()
    p.description = "Serve one magcache_tpu pipeline over HTTP."
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8900)
    p.add_argument("--save_dir", default=None,
                   help="write decoded media here and return media_path; "
                        "omit to return latent metadata only")
    p.add_argument("--warmup", action="store_true",
                   help="compile the pipeline before accepting requests")
    p.add_argument("--max_queue", type=int, default=64,
                   help="backpressure bound on queued generations")
    p.add_argument("--max_batch", type=int, default=1,
                   help="micro-batch concurrent requests into one padded "
                        "generate_batch (Wan family; batch rides the dp "
                        "mesh axis)")
    p.add_argument("--batch_window_ms", type=float, default=50.0,
                   help="how long the executor holds a request collecting a "
                        "micro-batch")
    p.add_argument("--job_history", type=int, default=256,
                   help="completed job records retained for GET /jobs/<id> "
                        "(older ones are evicted; bounds server memory)")
    p.add_argument("--job_timeout_s", type=float, default=None,
                   help="default per-job run-time budget; jobs exceeding it "
                        "are failed with status=timeout (requests may set "
                        "their own 'timeout_s')")
    p.add_argument("--sync_wait_s", type=float, default=3600.0,
                   help="max time a synchronous POST /generate blocks before "
                        "returning 504 with the job id (poll /jobs/<id>)")
    return p


def main(argv=None):
    args = build_serve_parser().parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from magcache_tpu.cli.generate import build_pipeline
    from magcache_tpu.serve import PipelineServer, make_http_server
    from magcache_tpu.utils.misc import task_fps

    pipe, _cfg, steps = build_pipeline(args)
    server = PipelineServer(pipe, steps=steps, save_dir=args.save_dir,
                            fps=task_fps(args.task),
                            max_queue=args.max_queue,
                            max_batch=args.max_batch,
                            batch_window_s=args.batch_window_ms / 1000.0,
                            job_history=args.job_history,
                            default_timeout_s=args.job_timeout_s,
                            sync_wait_s=args.sync_wait_s)
    if args.warmup:
        print("warmup: compiling...", flush=True)
        rec = server.warmup(args.prompt or "warmup")
        print(f"warmup: {rec['status']} in {rec['wall_s']}s", flush=True)
    httpd = make_http_server(server, args.host, args.port)
    host, port = httpd.server_address[:2]
    print(f"serving {type(pipe).__name__} ({args.task}) on "
          f"http://{host}:{port}  (POST /generate)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
