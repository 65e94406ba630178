"""magcache_tpu — a TPU-native JAX framework for magnitude-aware cached diffusion inference.

A from-scratch rebuild of the capabilities of Zehong-Ma/MagCache (NeurIPS 2025,
arXiv:2506.09045) designed for TPU hardware: jitted DiT denoisers, the MagCache
skip/replay algorithm compiled into `lax.scan` denoising loops, Pallas flash
attention for the hot path, and `jax.sharding` meshes for scale-out.

Public surface (mirrors the reference's two layers):
  - `magcache_tpu.core`      — cache algebra, calibration, engine, samplers
  - `magcache_tpu.models`    — DiT model families (FLUX, Wan2.1/2.2, HunyuanVideo, ...)
  - `magcache_tpu.schedulers`— flow-matching / RFLOW / UniPC samplers
  - `magcache_tpu.pipelines` — Config -> Pipeline.generate() user API
  - `magcache_tpu.parallel`  — mesh + sharding layer (DP / SP / TP / CFG-parallel)
"""

__version__ = "0.1.0"

from magcache_tpu.core.magcache import (  # noqa: F401
    MagCacheConfig,
    MagCacheState,
    compute_skip_schedule,
    nearest_interp,
    prepare_mag_ratios,
)

# Root-level user API, mirroring the reference's package exports
# (``videosys/__init__.py``: Engine + one (Config, Pipeline) pair per family).
# Loaded lazily so ``import magcache_tpu`` stays light.
_LAZY = {
    "Engine": ("magcache_tpu.core.engine", "Engine"),
    "PipelineServer": ("magcache_tpu.serve.server", "PipelineServer"),
    "PABConfig": ("magcache_tpu.core.pab", "PABConfig"),
    "TeaCacheConfig": ("magcache_tpu.core.teacache", "TeaCacheConfig"),
    "TaylorSeerConfig": ("magcache_tpu.core.taylorseer", "TaylorSeerConfig"),
    # videosys/__init__.py parity: per-family PAB config constructors + the
    # distributed bring-up entry point (`initialize` -> jax.distributed)
    "initialize": ("magcache_tpu.parallel.mesh", "init_distributed"),
    "OpenSoraPABConfig": ("magcache_tpu.core.pab", "OpenSoraPABConfig"),
    "LattePABConfig": ("magcache_tpu.core.pab", "LattePABConfig"),
    "CogVideoXPABConfig": ("magcache_tpu.core.pab", "CogVideoXPABConfig"),
    "VchitectPABConfig": ("magcache_tpu.core.pab", "VchitectPABConfig"),
    "OpenSoraPlanV110PABConfig": (
        "magcache_tpu.core.pab", "OpenSoraPlanV110PABConfig"),
    "OpenSoraPlanV120PABConfig": (
        "magcache_tpu.core.pab", "OpenSoraPlanV120PABConfig"),
}
# Reference-spelled aliases (``videosys/__init__.py:1-22``): code written
# against the reference's export names runs verbatim. `VchitectConfig` here is
# the PIPELINE config (as in the reference); the model config keeps its home
# at `magcache_tpu.models.vchitect.VchitectConfig`.
_LAZY.update({
    "VideoSysEngine": ("magcache_tpu.core.engine", "Engine"),
    "OpenSoraConfig": ("magcache_tpu.pipelines.open_sora",
                       "OpenSoraPipelineConfig"),
    "LatteConfig": ("magcache_tpu.pipelines.latte", "LattePipelineConfig"),
    "CogVideoXConfig": ("magcache_tpu.pipelines.cogvideox",
                        "CogVideoXPipelineConfig"),
    "OpenSoraPlanConfig": ("magcache_tpu.pipelines.open_sora_plan",
                           "OpenSoraPlanPipelineConfig"),
    "VchitectConfig": ("magcache_tpu.pipelines.vchitect",
                       "VchitectPipelineConfig"),
    "VchitectXLPipeline": ("magcache_tpu.pipelines.vchitect",
                           "VchitectPipeline"),
})

for _mod, _names in {
    "wan": ("WanPipelineConfig", "WanPipeline"),
    "flux": ("FluxPipelineConfig", "FluxPipeline"),
    "qwen_image": ("QwenImagePipelineConfig", "QwenImagePipeline"),
    "omnigen2": ("OmniGen2PipelineConfig", "OmniGen2Pipeline"),
    "framepack": ("FramePackPipelineConfig", "FramePackPipeline"),
    "open_sora": ("OpenSoraPipelineConfig", "OpenSoraPipeline"),
    "open_sora_plan": ("OpenSoraPlanPipelineConfig", "OpenSoraPlanPipeline"),
    "cogvideox": ("CogVideoXPipelineConfig", "CogVideoXPipeline"),
    "latte": ("LattePipelineConfig", "LattePipeline"),
    "vchitect": ("VchitectPipelineConfig", "VchitectPipeline"),
}.items():
    for _n in _names:
        _LAZY[_n] = (f"magcache_tpu.pipelines.{_mod}", _n)

__all__ = ["MagCacheConfig", "MagCacheState", "compute_skip_schedule",
           "nearest_interp", "prepare_mag_ratios", *sorted(_LAZY)]


def __getattr__(name):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module 'magcache_tpu' has no attribute {name!r}")
    import importlib
    return getattr(importlib.import_module(mod_name), attr)


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
