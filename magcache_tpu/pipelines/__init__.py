from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput  # noqa: F401
from magcache_tpu.pipelines.flux import FluxPipeline, FluxPipelineConfig  # noqa: F401
from magcache_tpu.pipelines.framepack import (  # noqa: F401
    FramePackPipeline,
    FramePackPipelineConfig,
)
from magcache_tpu.pipelines.omnigen2 import (  # noqa: F401
    OmniGen2Pipeline,
    OmniGen2PipelineConfig,
)
from magcache_tpu.pipelines.qwen_image import (  # noqa: F401
    QwenImagePipeline,
    QwenImagePipelineConfig,
)
from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig  # noqa: F401
