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
