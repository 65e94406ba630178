"""Open-Sora 1.2 pipeline on STDiT3 + RFLOW, with PAB and MagCache strategies.

Mirrors the reference stack ``VideoSysEngine -> OpenSoraPipeline -> RFLOW ->
STDiT3`` (``videosys/pipelines/open_sora/pipeline_open_sora.py:194-656``,
``scheduling_rflow_open_sora.py:188-253``): CFG runs as a joint batch-of-2
(z_in = [z, z], y = [y, y_null]) so MagCache uses a single cache lane over the
joint batch — exactly the eval harness's configuration
(``eval/magcache/experiments/opensora.py:229-373``, E=0.12 K=3 skip_time=6).
PAB is the alternative cache (``videosys/core/pab_mgr.py``); both compile into
the same scanned loop.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.pab import OPEN_SORA_PAB, PABConfig
from magcache_tpu.core.presets import make_config
from magcache_tpu.core.sampler import sample_euler
from magcache_tpu.models.stdit3 import (
    STDiT3Config,
    init_stdit3_params,
    make_stdit3_core,
)
from magcache_tpu.models.text import MockTextEncoder, TextEncoder
from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput
from magcache_tpu.schedulers.rflow import RFlowSchedule
from magcache_tpu.utils.misc import set_seed


@dataclasses.dataclass
class OpenSoraPipelineConfig:
    num_frames: int = 51
    height: int = 480
    width: int = 848
    num_sampling_steps: int = 30
    cfg_scale: float = 7.0
    caption_len: int = 300
    fps: int = 24
    use_timestep_transform: bool = True
    # acceleration strategies (mutually composable in principle; the reference
    # evaluates them separately)
    use_magcache: bool = False
    magcache_thresh: Optional[float] = None
    magcache_K: Optional[int] = None
    retention_ratio: Optional[float] = None
    enable_pab: bool = False
    pab_config: PABConfig = OPEN_SORA_PAB
    dtype: str = "float32"
    tiny: bool = False
    ckpt_dir: Optional[str] = None   # published transformer checkpoint dir

    def model_config(self) -> STDiT3Config:
        if self.tiny:
            return STDiT3Config.tiny(dtype=self.dtype)
        return STDiT3Config(dtype=self.dtype)

    @property
    def pipeline_cls(self):
        return OpenSoraPipeline


VAE_STRIDE = (17, 8, 8)  # OpenSora: micro-frame 17 -> 5 latents? handled below



class OpenSoraPipeline(BasePipeline):
    def __init__(self, config: OpenSoraPipelineConfig,
                 text_encoder: Optional[TextEncoder] = None, params=None,
                 vae=None, key: Optional[jax.Array] = None):
        self.config = config
        self.model_cfg = config.model_config()
        c = config
        # OpenSora VAE: temporal x4 (micro-frame pipeline), spatial x8
        lat_t = max(1, c.num_frames // 4)
        lat_h, lat_w = c.height // 8, c.width // 8
        self.latent_shape = (lat_t, lat_h, lat_w, self.model_cfg.in_channels)
        pt, ph, pw = self.model_cfg.patch
        self.grid = (lat_t // pt, lat_h // ph, lat_w // pw)
        self.vae = vae

        self.schedule = RFlowSchedule.create(
            c.num_sampling_steps,
            use_timestep_transform=c.use_timestep_transform,
            height=c.height, width=c.width, num_frames=c.num_frames)

        self.core = make_stdit3_core(
            self.model_cfg, self.grid, c.caption_len,
            pab=c.pab_config if c.enable_pab else None,
            timesteps=self.schedule.timesteps)
        self.text_encoder = text_encoder or MockTextEncoder(
            c.caption_len, self.model_cfg.caption_dim, scale=0.5)
        key = key if key is not None else jax.random.PRNGKey(0)
        if params is None and getattr(c, 'ckpt_dir', None):
            from magcache_tpu.models.convert import load_stdit3_checkpoint
            params = load_stdit3_checkpoint(c.ckpt_dir, self.model_cfg)
        self.params = params if params is not None else init_stdit3_params(
            key, self.model_cfg)
        self._fn = None

    def _sample_fn(self):
        if self._fn is not None:
            return self._fn
        c = self.config
        sch = self.schedule
        dts = np.array([sch.dt(i) for i in range(sch.num_steps)], np.float32)
        cache_cfg = None
        if c.use_magcache:
            # single-lane over the joint CFG batch (experiments/opensora.py:420-433)
            cache_cfg = make_config("opensora-v1.2", c.num_sampling_steps,
                                    thresh=c.magcache_thresh, K=c.magcache_K,
                                    retention_ratio=c.retention_ratio)
        core, g = self.core, c.cfg_scale
        C = self.model_cfg.in_channels

        def combine(chunks):
            # model predicts 2C channels; RFLOW takes the first C
            # (scheduling_rflow_open_sora.py:242-247: pred.chunk(2, dim=1)[0])
            cond_o = chunks[0][..., :C]
            uncond_o = chunks[1][..., :C]
            return uncond_o + g * (cond_o - uncond_o)

        def fn(params, z, cond):
            # joint batch of 2 rides the row axis through a single forward
            return sample_euler(core, params, z, cond, timesteps=sch.timesteps,
                                dts=dts, cache_cfg=cache_cfg, lanes=2,
                                combine_fn=combine)

        self._fn = jax.jit(fn)
        return self._fn

    def generate(self, prompt: str, negative_prompt: str = "", seed: int = 0
                 ) -> PipelineOutput:
        t0 = time.time()
        c = self.config
        y = self.text_encoder([prompt, negative_prompt])
        cond = {"y": y, "fps": jnp.full((2,), float(c.fps), jnp.float32)}
        z = jax.random.normal(set_seed(seed), (1,) + self.latent_shape,
                              jnp.float32)
        latents = self._sample_fn()(self.params, z, cond)
        latents.block_until_ready()
        video = None
        if self.vae is not None:
            video = np.asarray(self.vae.decode(latents))
        return PipelineOutput(latents=latents, video=video,
                              timings={"total_s": time.time() - t0})
