from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput  # noqa: F401
from magcache_tpu.pipelines.flux import FluxPipeline, FluxPipelineConfig  # noqa: F401
from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig  # noqa: F401
