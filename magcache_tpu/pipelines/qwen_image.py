"""Qwen-Image / Qwen-Image-Edit pipeline: true CFG, dual-lane MagCache.

Functional replacement for ``MagCache4QwenImage/magcache_generate.py``: unlike
FLUX, Qwen-Image is not guidance-distilled — every scheduler step runs cond
and uncond forwards, so ``num_steps = sample_steps * 2`` and the cache keeps
two lanes (``magcache_generate.py:63-91``). Defaults E=0.06 K=2 R=0.2
(README:12). Edit mode appends reference-image tokens to the image sequence.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.presets import make_config
from magcache_tpu.core.sampler import calibrate_euler, sample_euler
from magcache_tpu.models.qwen_image import (
    QwenImageConfig,
    init_qwen_image_params,
    make_qwen_image_core,
)
from magcache_tpu.models.text import MockTextEncoder, TextEncoder
from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput
from magcache_tpu.schedulers.flow_match import FlowMatchSchedule
from magcache_tpu.utils.misc import set_seed


@dataclasses.dataclass
class QwenImagePipelineConfig:
    model: str = "qwen-image"            # qwen-image | qwen-image-edit
    height: int = 1024
    width: int = 1024
    sample_steps: int = 50
    true_cfg_scale: float = 4.0
    txt_len: int = 256
    use_magcache: bool = False
    magcache_thresh: Optional[float] = None
    magcache_K: Optional[int] = None
    retention_ratio: Optional[float] = None
    magcache_calibration: bool = False
    # recorded norm_ratio list from a calibration run; replaces the published
    # table via the same pad+resample install path
    mag_ratios_override: Optional[tuple] = None
    dtype: str = "float32"
    tiny: bool = False
    ckpt_dir: Optional[str] = None   # published transformer checkpoint dir

    def model_config(self) -> QwenImageConfig:
        if self.tiny:
            return QwenImageConfig.tiny(dtype=self.dtype)
        return QwenImageConfig(dtype=self.dtype)

    @property
    def pipeline_cls(self):
        return QwenImagePipeline



class QwenImagePipeline(BasePipeline):
    def __init__(self, config: QwenImagePipelineConfig,
                 text_encoder: Optional[TextEncoder] = None, params=None,
                 vae=None, key: Optional[jax.Array] = None):
        self.config = config
        self.vae = vae
        self.model_cfg = config.model_config()
        self.grid = (config.height // 16, config.width // 16)
        self.ref_images = 1 if "edit" in config.model else 0
        self.core = make_qwen_image_core(self.model_cfg, config.txt_len,
                                         *self.grid,
                                         ref_images=self.ref_images)
        self.text_encoder = text_encoder or MockTextEncoder(
            config.txt_len, self.model_cfg.text_dim, scale=0.5)
        key = key if key is not None else jax.random.PRNGKey(0)
        if params is None and config.ckpt_dir:
            from magcache_tpu.models.convert import load_qwen_image_checkpoint
            params = load_qwen_image_checkpoint(config.ckpt_dir, self.model_cfg)
        self.params = params if params is not None else init_qwen_image_params(
            key, self.model_cfg)
        self._jit_cache = {}

    def _schedule(self):
        c = self.config
        return FlowMatchSchedule.create(
            c.sample_steps, mu=FlowMatchSchedule.flux_mu(
                self.grid[0] * self.grid[1]), linspace_endpoint=True)

    def _cache_cfg_force(self, thresh=None, K=None, retention=None):
        c = self.config
        return make_config(
            c.model, c.sample_steps,
            thresh=c.magcache_thresh if thresh is None else thresh,
            K=c.magcache_K if K is None else K,
            retention_ratio=(c.retention_ratio if retention is None
                             else retention),
            ratios=c.mag_ratios_override)

    # ---- one-program-many-schedules (serving overrides) -------------------
    def skip_mask_for(self, thresh=None, K=None, retention_ratio=None,
                      use_magcache: bool = True) -> np.ndarray:
        """Host-precompute the ``bool[steps, lanes]`` skip mask for an E/K/R
        triple (true-CFG dual lanes); feed to ``generate(skip_override=)``."""
        return self._skip_mask_from_cfg(
            self._cache_cfg_force(thresh, K, retention_ratio), use_magcache)

    def _sample_fn_override(self):
        if "override" in self._jit_cache:
            return self._jit_cache["override"]
        c = self.config
        sch = self._schedule()
        dts = np.diff(sch.sigmas)
        core, g = self.core, c.true_cfg_scale
        cache_cfg = self._cache_cfg_force()

        def fn(params, x, cond, skips):
            return sample_euler(core, params, x, cond,
                                timesteps=sch.timesteps, dts=dts,
                                cache_cfg=cache_cfg, guidance_scale=g,
                                skip_mask_override=skips)
        self._jit_cache["override"] = jax.jit(fn)
        return self._jit_cache["override"]

    def _sample_fn(self):
        c = self.config
        k = (c.use_magcache, c.magcache_calibration)
        if k in self._jit_cache:
            return self._jit_cache[k]
        sch = self._schedule()
        dts = np.diff(sch.sigmas)
        core, g = self.core, c.true_cfg_scale
        if c.magcache_calibration:
            def fn(params, x, cond):
                return calibrate_euler(core, params, x, cond,
                                       timesteps=sch.timesteps, dts=dts,
                                       lanes=2, guidance_scale=g)
        else:
            cache_cfg = None
            if c.use_magcache:
                cache_cfg = self._cache_cfg_force()

            def fn(params, x, cond):
                return sample_euler(core, params, x, cond,
                                    timesteps=sch.timesteps, dts=dts,
                                    cache_cfg=cache_cfg, guidance_scale=g)
        jitted = jax.jit(fn)
        self._jit_cache[k] = jitted
        return jitted

    # the reference scripts pass negative_prompt=" " (one space — encodes
    # differently from "" under true-CFG; QwenImage magcache_generate.py:285,
    # QwenImageEdit :284)
    def generate(self, prompt: str, negative_prompt: str = " ", seed: int = 0,
                 ref_latents=None,
                 skip_override: Optional[np.ndarray] = None
                 ) -> PipelineOutput:
        """``skip_override``: ``bool[steps, lanes]`` mask from
        `skip_mask_for` — per-request schedule, one compiled program."""
        t0 = time.time()
        gh, gw = self.grid
        cond = {"txt": self.text_encoder([prompt, negative_prompt])}
        if self.ref_images:
            import jax.numpy as _jnp
            if ref_latents is None:
                ref_latents = _jnp.zeros((1, gh * gw, self.model_cfg.in_channels),
                                         _jnp.float32)
            # both CFG lanes see the same reference tokens
            cond["ref"] = _jnp.concatenate([ref_latents, ref_latents], axis=0)
        x0 = jax.random.normal(set_seed(seed),
                               (1, gh * gw, self.model_cfg.in_channels),
                               jnp.float32)
        if skip_override is not None:
            assert not self.config.magcache_calibration, (
                "skip_override is a generation-path surface")
            out = self._sample_fn_override()(
                self.params, x0, cond, jnp.asarray(skip_override, bool))
        else:
            out = self._sample_fn()(self.params, x0, cond)
        calibration = None
        if self.config.magcache_calibration:
            from magcache_tpu.pipelines.base import calibration_dict
            latents, stats = out
            calibration = calibration_dict(stats)
        else:
            latents = out
        latents.block_until_ready()
        return PipelineOutput(latents=latents, calibration=calibration,
                              timings={"total_s": time.time() - t0})
