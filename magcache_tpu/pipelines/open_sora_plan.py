"""Open-Sora-Plan T2V pipeline (v110 and v120 variants).

Mirrors ``videosys/pipelines/open_sora_plan/pipeline_open_sora_plan.py``
(version switch :173-206): v120 = OpenSoraT2V full-3D-attention transformer +
EulerAncestralDiscrete (:302-306; 150 steps / cfg 7.5 defaults, :164-165);
v110 = LatteT2V interleaved spatial/temporal transformer + PNDM (PLMS).
CFG runs as a batched dual lane; MagCache caches each lane independently
(lanes=2).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.magcache import MagCacheConfig
from magcache_tpu.core.sampler import sample_euler, sample_pndm
from magcache_tpu.models.open_sora_plan import (
    OpenSoraPlanConfig,
    init_osp_params,
    make_osp_core,
)
from magcache_tpu.models.text import MockTextEncoder, TextEncoder
from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput
from magcache_tpu.schedulers.euler_ancestral import EulerAncestralSchedule
from magcache_tpu.schedulers.pndm import PNDMSchedule
from magcache_tpu.utils.misc import set_seed


@dataclasses.dataclass
class OpenSoraPlanPipelineConfig:
    version: str = "v120"                 # v110 (LatteT2V+PNDM) | v120 (3D+EA)
    num_frames: int = 29
    height: int = 480
    width: int = 640
    num_inference_steps: int = 150
    guidance_scale: float = 7.5
    caption_len: int = 512
    use_magcache: bool = False
    # full-compute magnitude-stat recording (v120 Euler-Ancestral trajectory;
    # v110's PNDM recorder is not wired)
    magcache_calibration: bool = False
    magcache_ratios: Optional[tuple] = None
    magcache_thresh: float = 0.12
    magcache_K: int = 3
    retention_ratio: float = 0.2
    # PAB (reference OpenSoraPlanV120PABConfig, pipeline_open_sora_plan.py:103:
    # spatial (100,850) range 2 + cross (100,850) range 6; the v110 defaults
    # add temporal range 4 and mlp reuse, :41-101)
    enable_pab: bool = False
    pab_threshold: tuple = (100, 850)
    pab_spatial_range: int = 2
    pab_temporal_range: int = 4
    pab_cross_range: int = 6
    dtype: str = "float32"
    tiny: bool = False
    ckpt_dir: Optional[str] = None   # published transformer checkpoint dir
    # None -> 8 for the full models (published OSP transformers predict
    # eps+variance), tiny default for tiny runs
    out_channels: Optional[int] = None
    # mT5 caption cleaning — the reference generate() defaults it ON
    # (pipeline_open_sora_plan.py:930 clean_caption=True, applied twice
    # via _text_preprocessing :754-760)
    clean_caption: bool = True

    def model_config(self):
        # the sampler consumes the first 4 channels (diffusers
        # chunk(2, dim=1)[0])
        kw = {} if self.out_channels is None else {
            "out_channels": self.out_channels}
        if self.version == "v110":
            from magcache_tpu.models.latte import LatteConfig
            if self.tiny:
                return LatteConfig.tiny(dtype=self.dtype, **kw)
            return LatteConfig(dtype=self.dtype,
                               out_channels=self.out_channels or 8)
        if self.tiny:
            return OpenSoraPlanConfig.tiny(dtype=self.dtype, **kw)
        return OpenSoraPlanConfig(dtype=self.dtype,
                                  out_channels=self.out_channels or 8)

    @property
    def pipeline_cls(self):
        return OpenSoraPlanPipeline


class OpenSoraPlanPipeline(BasePipeline):
    def __init__(self, config: OpenSoraPlanPipelineConfig,
                 text_encoder: Optional[TextEncoder] = None, params=None,
                 vae=None, key: Optional[jax.Array] = None):
        self.config = config
        self.model_cfg = config.model_config()
        c = config
        self.vae = vae
        pab = None
        ts = None
        if c.enable_pab:
            from magcache_tpu.core.pab import OSP_V110_PAB, PABConfig
            if c.version == "v110":
                # the reference v110 preset incl. block-granular MLP anchors
                # (pipeline_open_sora_plan.py:41-101); the window thresholds /
                # strides stay user-overridable
                import dataclasses as _dc
                pab = _dc.replace(
                    OSP_V110_PAB,
                    spatial_threshold=c.pab_threshold,
                    spatial_range=c.pab_spatial_range,
                    temporal_threshold=c.pab_threshold,
                    temporal_range=c.pab_temporal_range,
                    cross_threshold=c.pab_threshold,
                    cross_range=c.pab_cross_range)
            else:
                # v120: spatial+cross only (no temporal blocks / mlp reuse)
                pab = PABConfig(
                    spatial_broadcast=True, spatial_threshold=c.pab_threshold,
                    spatial_range=c.pab_spatial_range,
                    cross_broadcast=True, cross_threshold=c.pab_threshold,
                    cross_range=c.pab_cross_range)
            if c.version == "v110":
                ts = PNDMSchedule.create(c.num_inference_steps).timesteps
            else:
                ts = EulerAncestralSchedule.create(
                    c.num_inference_steps).timesteps
        if c.version == "v110":
            # v1.1 VAE: temporal stride 4, spatial 8; LatteT2V patch 2
            from magcache_tpu.models.latte import init_latte_params, make_latte_core
            p = self.model_cfg.patch
            lf = (c.num_frames - 1) // 4 + 1
            self.latent_shape = (lf, c.height // 8, c.width // 8,
                                 self.model_cfg.in_channels)
            self.grid = (lf, c.height // 8 // p, c.width // 8 // p)
            self.core = make_latte_core(self.model_cfg, self.grid,
                                        c.caption_len, pab=pab, timesteps=ts)
            self._init_params = init_latte_params
        else:
            pt, ph, pw = self.model_cfg.patch
            # OSP v1.2 CausalVAE: temporal stride 4, spatial 8
            lf = (c.num_frames - 1) // 4 + 1
            self.latent_shape = (lf, c.height // 8, c.width // 8,
                                 self.model_cfg.in_channels)
            self.grid = (lf // pt, c.height // 8 // ph, c.width // 8 // pw)
            self.core = make_osp_core(self.model_cfg, self.grid, c.caption_len,
                                      pab=pab, timesteps=ts)
            self._init_params = init_osp_params
        self.text_encoder = text_encoder or MockTextEncoder(
            c.caption_len, self.model_cfg.caption_dim, scale=0.5)
        key = key if key is not None else jax.random.PRNGKey(0)
        if params is None and getattr(c, "ckpt_dir", None):
            from magcache_tpu.models.convert import (
                load_latte_checkpoint, load_osp_checkpoint)
            loader = (load_latte_checkpoint if c.version == "v110"
                      else load_osp_checkpoint)
            params = loader(c.ckpt_dir, self.model_cfg)
        self.params = params if params is not None else self._init_params(
            key, self.model_cfg)
        self._fn = None

    def _cache_cfg(self, scan_steps: Optional[int] = None
                   ) -> Optional[MagCacheConfig]:
        c = self.config
        if not c.use_magcache or c.magcache_calibration:
            return None
        # v110's PLMS runs num_inference_steps+1 model calls (duplicated
        # second timestep); the skip schedule covers every forward
        n = (scan_steps or c.num_inference_steps) * 2
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
        core, g = self.core, c.guidance_scale
        cache_cfg = self._cache_cfg()
        C = self.model_cfg.in_channels

        def combine(chunks):
            # eps+variance head: the scheduler consumes the first C channels
            cond_o = chunks[0][..., :C]
            uncond_o = chunks[1][..., :C]
            return uncond_o + g * (cond_o - uncond_o)

        if c.version == "v110":
            if c.magcache_calibration:
                raise ValueError("magcache_calibration supports the v120 "
                                 "Euler-Ancestral path; v110 PNDM is not "
                                 "wired for recording")
            sch = PNDMSchedule.create(c.num_inference_steps)
            cache_cfg = self._cache_cfg(sch.num_steps)

            def fn(params, z, cond, noise_key):
                return sample_pndm(core, params, z, cond, sch,
                                   cache_cfg=cache_cfg, lanes=2,
                                   combine_fn=combine)
        else:
            sch = EulerAncestralSchedule.create(c.num_inference_steps)

            def fn(params, z, cond, noise_key):
                return sample_euler(
                    core, params, z, cond, timesteps=sch.timesteps,
                    dts=sch.dts, in_scales=sch.in_scales,
                    noise_scales=sch.noise_scales, noise_key=noise_key,
                    cache_cfg=cache_cfg, lanes=2, combine_fn=combine,
                    calibrate=c.magcache_calibration)

        self._fn = jax.jit(fn)
        return self._fn

    def generate(self, prompt: str, negative_prompt: str = "", seed: int = 0
                 ) -> PipelineOutput:
        t0 = time.time()
        if self.config.clean_caption:
            from magcache_tpu.pipelines.open_sora_cond import clean_caption
            prompt = clean_caption(clean_caption(prompt))
            if negative_prompt:
                negative_prompt = clean_caption(clean_caption(negative_prompt))
        cond = {"y": self.text_encoder([prompt, negative_prompt])}
        key = set_seed(seed)
        k_init, k_anc = jax.random.split(key)
        sigma0 = (1.0 if self.config.version == "v110" else
                  EulerAncestralSchedule.create(
                      self.config.num_inference_steps).init_noise_sigma)
        z = jax.random.normal(k_init, (1,) + self.latent_shape,
                              jnp.float32) * sigma0
        out = self._sample_fn()(self.params, z, cond, k_anc)
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
