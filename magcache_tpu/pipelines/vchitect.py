"""Vchitect-XL T2V pipeline (FlowMatch-Euler, SD3-style CFG).

Mirrors ``videosys/pipelines/vchitect/pipeline_vchitect.py``: T5/CLIP text
states + pooled vector, FlowMatchEulerDiscreteScheduler (100 steps, cfg 7.5,
``pipeline_vchitect.py:93-94,223``), joint text-video transformer. CFG runs as
a batched dual lane through one trunk evaluation; MagCache applies with
2 lanes (cond/uncond cached independently, the Wan-style decision algebra).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.magcache import MagCacheConfig
from magcache_tpu.core.sampler import sample_euler
from magcache_tpu.models.text import MockPooledEncoder, MockTextEncoder, TextEncoder
from magcache_tpu.models.vchitect import (
    VchitectConfig,
    init_vchitect_params,
    make_vchitect_core,
)
from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput
from magcache_tpu.schedulers.flow_match import FlowMatchSchedule
from magcache_tpu.utils.misc import set_seed


@dataclasses.dataclass
class VchitectPipelineConfig:
    num_frames: int = 40
    height: int = 480
    width: int = 768
    num_inference_steps: int = 100
    guidance_scale: float = 7.5
    txt_len: int = 77
    sample_shift: float = 1.0            # FlowMatch shift (SD3 default 1.0)
    use_magcache: bool = False
    # full-compute magnitude-stat recording on this pipeline's trajectory
    magcache_calibration: bool = False
    magcache_ratios: Optional[tuple] = None
    magcache_thresh: float = 0.12
    magcache_K: int = 3
    retention_ratio: float = 0.2
    # PAB (reference VchitectPABConfig defaults, pipeline_vchitect.py:32-44;
    # the cross segment rides the joint attention in this factorization)
    enable_pab: bool = False
    pab_spatial_range: int = 2
    pab_temporal_range: int = 4
    pab_threshold: tuple = (100, 800)
    dtype: str = "float32"
    tiny: bool = False
    ckpt_dir: Optional[str] = None       # Vchitect-XL-2B transformer dir

    def model_config(self) -> VchitectConfig:
        if self.tiny:
            return VchitectConfig.tiny(dtype=self.dtype)
        return VchitectConfig(dtype=self.dtype)

    @property
    def pipeline_cls(self):
        return VchitectPipeline


class VchitectPipeline(BasePipeline):
    def __init__(self, config: VchitectPipelineConfig,
                 text_encoder: Optional[TextEncoder] = None,
                 pooled_encoder=None, params=None, vae=None,
                 key: Optional[jax.Array] = None):
        self.config = config
        self.model_cfg = config.model_config()
        c = config
        p = self.model_cfg.patch
        self.latent_shape = (c.num_frames, c.height // 8, c.width // 8,
                             self.model_cfg.in_channels)
        self.grid = (c.num_frames, c.height // 8 // p, c.width // 8 // p)
        self.vae = vae
        pab = None
        ts = None
        if c.enable_pab:
            from magcache_tpu.core.pab import PABConfig
            pab = PABConfig(
                spatial_broadcast=True, spatial_threshold=c.pab_threshold,
                spatial_range=c.pab_spatial_range,
                temporal_broadcast=True, temporal_threshold=c.pab_threshold,
                temporal_range=c.pab_temporal_range)
            ts = FlowMatchSchedule.create(c.num_inference_steps,
                                          shift=c.sample_shift).timesteps
        self.core = make_vchitect_core(self.model_cfg, self.grid, c.txt_len,
                                       pab=pab, timesteps=ts)
        self.text_encoder = text_encoder or MockTextEncoder(
            c.txt_len, self.model_cfg.text_dim, scale=0.5)
        self.pooled_encoder = pooled_encoder or MockPooledEncoder(
            self.model_cfg.vec_dim)
        key = key if key is not None else jax.random.PRNGKey(0)
        if params is None and c.ckpt_dir:
            from magcache_tpu.models.convert import load_vchitect_checkpoint
            params = load_vchitect_checkpoint(c.ckpt_dir, self.model_cfg)
        self.params = params if params is not None else init_vchitect_params(
            key, self.model_cfg)
        self._fn = None

    def _cache_cfg(self) -> Optional[MagCacheConfig]:
        c = self.config
        if not c.use_magcache or c.magcache_calibration:
            return None
        n = c.num_inference_steps * 2
        ratios = c.magcache_ratios
        if ratios is None:
            ratios = tuple(np.ones(n))
        else:
            from magcache_tpu.core.magcache import prepare_mag_ratios
            ratios = tuple(prepare_mag_ratios(np.asarray(ratios), n, lanes=2))
        return MagCacheConfig(
            num_steps=n, mag_ratios=ratios, thresh=c.magcache_thresh,
            max_consecutive_skips=c.magcache_K,
            retention_ratio=c.retention_ratio, lanes=2)

    def _sample_fn(self):
        if self._fn is not None:
            return self._fn
        c = self.config
        sch = FlowMatchSchedule.create(c.num_inference_steps,
                                       shift=c.sample_shift)
        core, g = self.core, c.guidance_scale
        cache_cfg = self._cache_cfg()

        def fn(params, z, cond):
            return sample_euler(core, params, z, cond, timesteps=sch.timesteps,
                                dts=np.diff(sch.sigmas), cache_cfg=cache_cfg,
                                guidance_scale=g,
                                calibrate=c.magcache_calibration)

        self._fn = jax.jit(fn)
        return self._fn

    def generate(self, prompt: str, negative_prompt: str = "", seed: int = 0
                 ) -> PipelineOutput:
        t0 = time.time()
        cond = {
            "txt": self.text_encoder([prompt, negative_prompt]),
            "vec": self.pooled_encoder([prompt, negative_prompt]),
        }
        z = jax.random.normal(set_seed(seed), (1,) + self.latent_shape,
                              jnp.float32)
        out = self._sample_fn()(self.params, z, cond)
        calibration = None
        if self.config.magcache_calibration:
            from magcache_tpu.pipelines.base import calibration_dict
            latents, stats = out
            calibration = calibration_dict(stats)
        else:
            latents = out
        latents.block_until_ready()
        video = None
        if self.vae is not None:
            video = np.asarray(self.vae.decode(latents))
        return PipelineOutput(latents=latents, video=video,
                              calibration=calibration,
                              timings={"total_s": time.time() - t0})
