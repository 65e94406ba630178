from magcache_tpu.serve.server import Job, PipelineServer, make_http_server

__all__ = ["Job", "PipelineServer", "make_http_server"]
