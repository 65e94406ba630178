"""Engine: the user-facing orchestrator.

The reference's ``VideoSysEngine`` (``videosys/core/engine.py:13-128``) spawns
``world_size - 1`` worker processes, broadcasts ``generate`` over pickled IPC
queues and NCCL-rendezvouses the ranks (``mp_utils.py``). Under JAX's
single-controller SPMD model that entire machinery collapses: one process
drives every local device through jit/pjit, and multi-host runs use
``jax.distributed.initialize`` + the same code. The Engine is therefore a thin
holder that keeps the ``Config -> engine.generate()`` API surface, adds
compile warmup, seed handling and saving.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput
from magcache_tpu.utils.logging import get_logger
from magcache_tpu.utils.misc import save_image, save_video

logger = get_logger(__name__)


class Engine:
    """Build the pipeline a config names and run generations on it.

    config objects must expose ``pipeline_cls`` or be passed with an explicit
    pipeline class — mirroring the reference's ``config.pipeline_cls``
    indirection (``pipeline_open_sora.py:74``).
    """

    def __init__(self, config, pipeline_cls=None, **pipeline_kwargs):
        if pipeline_cls is None:
            pipeline_cls = getattr(config, "pipeline_cls", None)
        if pipeline_cls is None:
            from magcache_tpu.pipelines.flux import FluxPipeline, FluxPipelineConfig
            from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig
            pipeline_cls = {FluxPipelineConfig: FluxPipeline,
                            WanPipelineConfig: WanPipeline}[type(config)]
        self.config = config
        self.driver_pipeline: BasePipeline = pipeline_cls(config, **pipeline_kwargs)

    def generate(self, prompt: str, **kwargs) -> PipelineOutput:
        return self.driver_pipeline.generate(prompt, **kwargs)

    def warmup(self, prompt: str = "warmup", **kwargs) -> None:
        """Trigger compilation once so timed generations are compile-free."""
        self.generate(prompt, **kwargs)

    def save_video(self, video: np.ndarray, path: str, fps: int = 16) -> str:
        return save_video(video, path, fps=fps)

    def save_image(self, image: np.ndarray, path: str) -> str:
        return save_image(image, path)

    def serve(self, host: str = "127.0.0.1", port: int = 8900,
              warmup: bool = False, **server_kwargs):
        """Expose this engine's pipeline over HTTP (see
        ``magcache_tpu/serve/server.py``). Returns ``(httpd, server)``;
        call ``httpd.serve_forever()`` to block."""
        from magcache_tpu.serve import PipelineServer, make_http_server

        server = PipelineServer(self.driver_pipeline, **server_kwargs)
        if warmup:
            server.warmup()
        httpd = make_http_server(server, host, port)
        return httpd, server

    def shutdown(self) -> None:
        """No worker processes to tear down (single-controller); kept for API
        parity with the reference engine."""
