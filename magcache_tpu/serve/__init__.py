from magcache_tpu.serve.server import (
    Job,
    PipelineServer,
    QueueFullError,
    make_http_server,
)

__all__ = ["Job", "PipelineServer", "QueueFullError", "make_http_server"]
