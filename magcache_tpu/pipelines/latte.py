"""Latte T2V pipeline (eps-prediction DDIM, joint CFG batch).

Mirrors ``videosys/pipelines/latte/pipeline_latte.py``: T5 captions, Latte
transformer, CFG batch-of-2, and the diffusers ``DDIMScheduler`` trajectory
(linear betas 1e-4..0.02, eps prediction, eta=0 — ``pipeline_latte.py:24,
135-137,224-231``).  The deterministic DDIM update is linear in (x, eps),
so it rides ``sample_euler``'s (c_x, c_v) coefficient pair.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.magcache import MagCacheConfig, prepare_mag_ratios
from magcache_tpu.core.sampler import sample_euler
from magcache_tpu.models.latte import LatteConfig, init_latte_params, make_latte_core
from magcache_tpu.models.text import MockTextEncoder, TextEncoder
from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput
from magcache_tpu.schedulers.ddim_eps import DDIMEpsSchedule
from magcache_tpu.utils.misc import set_seed


@dataclasses.dataclass
class LattePipelineConfig:
    num_frames: int = 16
    height: int = 512
    width: int = 512
    num_sampling_steps: int = 50
    guidance_scale: float = 7.5
    caption_len: int = 120
    use_magcache: bool = False
    # full-compute magnitude-stat recording on this pipeline's trajectory
    magcache_calibration: bool = False
    magcache_ratios: Optional[tuple] = None
    magcache_thresh: float = 0.12
    magcache_K: int = 3
    retention_ratio: float = 0.2
    enable_pab: bool = False         # Pyramid Attention Broadcast
    pab_config: Optional[object] = None   # PABConfig; None -> LATTE_PAB
    dtype: str = "float32"
    tiny: bool = False
    ckpt_dir: Optional[str] = None   # published transformer checkpoint dir
    # T5 caption cleaning (pipeline_latte.py:296,342,519-526: the deepfloyd
    # _clean_caption applied TWICE; defaults off like the reference kwarg)
    clean_caption: bool = False
    # None -> 8 for the full model (published Latte-1 predicts eps+variance,
    # learn_sigma), tiny default for tiny runs
    out_channels: Optional[int] = None

    def model_config(self) -> LatteConfig:
        if self.tiny:
            kw = {} if self.out_channels is None else {
                "out_channels": self.out_channels}
            return LatteConfig.tiny(dtype=self.dtype, **kw)
        # the sampler consumes the first 4 channels (diffusers
        # chunk(2, dim=1)[0])
        return LatteConfig(dtype=self.dtype,
                           out_channels=self.out_channels or 8)

    @property
    def pipeline_cls(self):
        return LattePipeline



class LattePipeline(BasePipeline):
    def __init__(self, config: LattePipelineConfig,
                 text_encoder: Optional[TextEncoder] = None, params=None,
                 vae=None, key: Optional[jax.Array] = None):
        self.config = config
        self.model_cfg = config.model_config()
        c = config
        p = self.model_cfg.patch
        self.latent_shape = (c.num_frames, c.height // 8, c.width // 8,
                             self.model_cfg.in_channels)
        self.grid = (c.num_frames, c.height // 8 // p, c.width // 8 // p)
        self.vae = vae
        pab = ts = None
        if c.enable_pab:
            from magcache_tpu.core.pab import LATTE_PAB
            pab = c.pab_config or LATTE_PAB
            ts = DDIMEpsSchedule.create(
                c.num_sampling_steps).timesteps.astype(np.float32)
        self.core = make_latte_core(self.model_cfg, self.grid, c.caption_len,
                                    pab=pab, timesteps=ts)
        self.text_encoder = text_encoder or MockTextEncoder(
            c.caption_len, self.model_cfg.caption_dim, scale=0.5)
        key = key if key is not None else jax.random.PRNGKey(0)
        if params is None and getattr(c, 'ckpt_dir', None):
            from magcache_tpu.models.convert import load_latte_checkpoint
            params = load_latte_checkpoint(c.ckpt_dir, self.model_cfg)
        self.params = params if params is not None else init_latte_params(
            key, self.model_cfg)
        self._fn = None
        self._fn_override = None

    def _cache_cfg_force(self, thresh=None, K=None, retention=None):
        """MagCache config for this pipeline's DDIM trajectory regardless of
        use_magcache. User-fed ratios are the calibration recording's
        norm_ratio list (joint single-lane, steps-1 entries): pad + resample
        to install (the reference's calibrate-then-hardcode flow)."""
        c = self.config
        ratios = c.magcache_ratios or tuple(np.ones(c.num_sampling_steps - 1))
        ratios = prepare_mag_ratios(np.asarray(ratios),
                                    c.num_sampling_steps, lanes=1)
        return MagCacheConfig(
            num_steps=c.num_sampling_steps, mag_ratios=tuple(ratios),
            thresh=c.magcache_thresh if thresh is None else thresh,
            max_consecutive_skips=c.magcache_K if K is None else K,
            retention_ratio=(c.retention_ratio if retention is None
                             else retention),
            lanes=1)

    # ---- one-program-many-schedules (serving overrides) -------------------
    def skip_mask_for(self, thresh=None, K=None, retention_ratio=None,
                      use_magcache: bool = True) -> np.ndarray:
        """Host-precompute the ``bool[steps, 1]`` skip mask for an E/K/R
        triple (single cache lane over the joint CFG batch); feed it to
        ``generate(skip_override=...)``."""
        return self._skip_mask_from_cfg(
            self._cache_cfg_force(thresh, K, retention_ratio), use_magcache)

    def _sample_fn_override(self):
        """Jitted sampler taking the skip mask as a TRACED argument — one
        compiled executable serves every E/K/R triple (and full compute)."""
        if self._fn_override is not None:
            return self._fn_override
        c = self.config
        sch = DDIMEpsSchedule.create(c.num_sampling_steps)
        c_x, c_eps = sch.step_arrays()
        cache_cfg = self._cache_cfg_force()
        core, g = self.core, c.guidance_scale
        C = self.model_cfg.in_channels

        def combine(chunks):
            cond_o = chunks[0][..., :C]
            uncond_o = chunks[1][..., :C]
            return uncond_o + g * (cond_o - uncond_o)

        def fn(params, z, cond, skips):
            return sample_euler(core, params, z, cond,
                                timesteps=sch.timesteps.astype(np.float32),
                                dts=c_eps, x_coeffs=c_x, cache_cfg=cache_cfg,
                                lanes=2, combine_fn=combine,
                                skip_mask_override=skips)

        self._fn_override = jax.jit(fn)
        return self._fn_override

    def _sample_fn(self):
        if self._fn is not None:
            return self._fn
        c = self.config
        sch = DDIMEpsSchedule.create(c.num_sampling_steps)
        c_x, c_eps = sch.step_arrays()
        cache_cfg = None
        if c.use_magcache and not c.magcache_calibration:
            cache_cfg = self._cache_cfg_force()
        core, g = self.core, c.guidance_scale
        C = self.model_cfg.in_channels

        def combine(chunks):
            # eps+variance head: the scheduler consumes the first C channels
            # (diffusers LattePipeline: model_output.chunk(2, dim=1)[0])
            cond_o = chunks[0][..., :C]
            uncond_o = chunks[1][..., :C]
            return uncond_o + g * (cond_o - uncond_o)

        def fn(params, z, cond):
            return sample_euler(core, params, z, cond,
                                timesteps=sch.timesteps.astype(np.float32),
                                dts=c_eps, x_coeffs=c_x, cache_cfg=cache_cfg,
                                lanes=2, combine_fn=combine,
                                calibrate=c.magcache_calibration,
                                calibrate_lanes=1)

        self._fn = jax.jit(fn)
        return self._fn

    def generate(self, prompt: str, negative_prompt: str = "", seed: int = 0,
                 skip_override: Optional[np.ndarray] = None
                 ) -> PipelineOutput:
        """``skip_override``: ``bool[steps, 1]`` mask from `skip_mask_for` —
        per-request cache schedule through one compiled program."""
        t0 = time.time()
        if self.config.clean_caption:
            from magcache_tpu.pipelines.open_sora_cond import clean_caption
            prompt = clean_caption(clean_caption(prompt))
            if negative_prompt:
                negative_prompt = clean_caption(clean_caption(negative_prompt))
        cond = {"y": self.text_encoder([prompt, negative_prompt])}
        z = jax.random.normal(set_seed(seed), (1,) + self.latent_shape,
                              jnp.float32)
        if skip_override is not None:
            assert not self.config.magcache_calibration, (
                "skip_override is a generation-path surface")
            out = self._sample_fn_override()(self.params, z, cond,
                                             jnp.asarray(skip_override, bool))
        else:
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
