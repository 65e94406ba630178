"""CogVideoX pipeline: zero-SNR DDIM (v-pred), joint CFG batch, PAB-compatible.

Mirrors ``videosys/pipelines/cogvideox/pipeline_cogvideox.py``: T5 text
conditioning, joint batch-of-2 CFG, CogVideoXDDIM stepping. The linear DDIM
update rides `sample_euler`'s (c_x, c_v) coefficients.
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
from magcache_tpu.models.cogvideox import (
    CogVideoXConfig,
    init_cogvideox_params,
    make_cogvideox_core,
)
from magcache_tpu.models.text import MockTextEncoder, TextEncoder
from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput
from magcache_tpu.schedulers.ddim_cogvideo import CogVideoDDIMSchedule
from magcache_tpu.utils.misc import set_seed


@dataclasses.dataclass
class CogVideoXPipelineConfig:
    num_frames: int = 49
    height: int = 480
    width: int = 720
    num_inference_steps: int = 50
    guidance_scale: float = 6.0
    # per-step cosine-ramped guidance (pipeline_cogvideox.py:501,706-708:
    # 1 + g*(1-cos(pi*((steps - t)/steps)^5))/2 with t the timestep VALUE —
    # transcribed exactly, quirk included); host-precomputed per step
    use_dynamic_cfg: bool = False
    txt_len: int = 226
    use_magcache: bool = False
    magcache_ratios: Optional[tuple] = None   # calibrate per deployment
    # full-compute run recording per-lane magnitude stats on the pipeline's
    # own DDIM trajectory (feed the norm_ratio list back via magcache_ratios)
    magcache_calibration: bool = False
    magcache_thresh: float = 0.12
    magcache_K: int = 3
    retention_ratio: float = 0.2
    enable_pab: bool = False         # Pyramid Attention Broadcast
    pab_config: Optional[object] = None   # PABConfig; None -> COGVIDEOX_PAB
    dtype: str = "float32"
    tiny: bool = False
    ckpt_dir: Optional[str] = None   # published transformer checkpoint dir

    def model_config(self) -> CogVideoXConfig:
        if self.tiny:
            return CogVideoXConfig.tiny(dtype=self.dtype)
        return CogVideoXConfig(dtype=self.dtype)

    @property
    def pipeline_cls(self):
        return CogVideoXPipeline



class CogVideoXPipeline(BasePipeline):
    def __init__(self, config: CogVideoXPipelineConfig,
                 text_encoder: Optional[TextEncoder] = None, params=None,
                 vae=None, key: Optional[jax.Array] = None):
        self.config = config
        self.model_cfg = config.model_config()
        c = config
        lat_t = (c.num_frames - 1) // 4 + 1
        p = self.model_cfg.patch
        self.latent_shape = (lat_t, c.height // 8, c.width // 8,
                             self.model_cfg.in_channels)
        self.grid = (lat_t, c.height // 8 // p, c.width // 8 // p)
        self.vae = vae
        pab = ts = None
        if c.enable_pab:
            from magcache_tpu.core.pab import COGVIDEOX_PAB
            pab = c.pab_config or COGVIDEOX_PAB
            ts = CogVideoDDIMSchedule.create(
                c.num_inference_steps).timesteps.astype(np.float32)
        self.core = make_cogvideox_core(self.model_cfg, c.txt_len, self.grid,
                                        pab=pab, timesteps=ts)
        self.text_encoder = text_encoder or MockTextEncoder(
            c.txt_len, self.model_cfg.text_dim, scale=0.5)
        key = key if key is not None else jax.random.PRNGKey(0)
        if params is None and getattr(c, 'ckpt_dir', None):
            from magcache_tpu.models.convert import load_cogvideox_checkpoint
            params = load_cogvideox_checkpoint(c.ckpt_dir, self.model_cfg)
        self.params = params if params is not None else init_cogvideox_params(
            key, self.model_cfg)
        self._fn = None
        self._fn_override = None

    def _cache_cfg_force(self, thresh=None, K=None, retention=None):
        """MagCache config regardless of use_magcache. User-fed ratios are
        the calibration recording's norm_ratio list (joint single-lane,
        num_steps-1 entries): pad + resample like the reference install
        path. No published CogVideoX calibration exists in the reference —
        run calibration mode per deployment; a flat near-1 prior otherwise."""
        c = self.config
        ratios = c.magcache_ratios or tuple(
            np.ones(c.num_inference_steps - 1))
        ratios = prepare_mag_ratios(np.asarray(ratios),
                                    c.num_inference_steps, lanes=1)
        return MagCacheConfig(
            num_steps=c.num_inference_steps, mag_ratios=tuple(ratios),
            thresh=c.magcache_thresh if thresh is None else thresh,
            max_consecutive_skips=c.magcache_K if K is None else K,
            retention_ratio=(c.retention_ratio if retention is None
                             else retention),
            lanes=1)

    # ---- one-program-many-schedules (serving overrides) -------------------
    def skip_mask_for(self, thresh=None, K=None, retention_ratio=None,
                      use_magcache: bool = True) -> np.ndarray:
        """Host-precompute the ``bool[steps, 1]`` skip mask (single cache
        lane over the joint CFG batch); feed to ``generate(skip_override=)``."""
        return self._skip_mask_from_cfg(
            self._cache_cfg_force(thresh, K, retention_ratio), use_magcache)

    def _sample_fn_override(self):
        if self._fn_override is not None:
            return self._fn_override
        c = self.config
        sch = CogVideoDDIMSchedule.create(c.num_inference_steps)
        c_x, c_v = sch.step_arrays()
        cache_cfg = self._cache_cfg_force()
        core, g = self.core, c.guidance_scale
        assert not c.use_dynamic_cfg, (
            "per-request overrides cover the static-CFG path")

        def combine(chunks):
            cond_o, uncond_o = chunks
            return uncond_o + g * (cond_o - uncond_o)

        def fn(params, z, cond, skips):
            return sample_euler(core, params, z, cond,
                                timesteps=sch.timesteps.astype(np.float32),
                                dts=c_v, x_coeffs=c_x, cache_cfg=cache_cfg,
                                lanes=2, combine_fn=combine,
                                skip_mask_override=skips)

        self._fn_override = jax.jit(fn)
        return self._fn_override

    def _sample_fn(self):
        if self._fn is not None:
            return self._fn
        c = self.config
        calibrate = c.magcache_calibration
        sch = CogVideoDDIMSchedule.create(c.num_inference_steps)
        c_x, c_v = sch.step_arrays()
        cache_cfg = None
        if c.use_magcache and not calibrate:
            cache_cfg = self._cache_cfg_force()
        core, g = self.core, c.guidance_scale

        if c.use_dynamic_cfg:
            import math
            n = c.num_inference_steps
            gs = np.array(
                [1 + g * (1 - math.cos(
                    math.pi * ((n - float(t)) / n) ** 5.0)) / 2
                 for t in sch.timesteps], np.float32)
            gs_dev = jnp.asarray(gs)

            def combine(chunks, step_idx):
                cond_o, uncond_o = chunks
                return uncond_o + gs_dev[step_idx] * (cond_o - uncond_o)
        else:
            def combine(chunks):
                cond_o, uncond_o = chunks
                return uncond_o + g * (cond_o - uncond_o)

        def fn(params, z, cond):
            return sample_euler(core, params, z, cond,
                                timesteps=sch.timesteps.astype(np.float32),
                                dts=c_v, x_coeffs=c_x, cache_cfg=cache_cfg,
                                lanes=2, combine_fn=combine,
                                calibrate=calibrate, calibrate_lanes=1)

        self._fn = jax.jit(fn)
        return self._fn

    def generate(self, prompt: str, negative_prompt: str = "", seed: int = 42,
                 skip_override: Optional[np.ndarray] = None
                 ) -> PipelineOutput:
        """``skip_override``: ``bool[steps, 1]`` mask from `skip_mask_for` —
        per-request cache schedule through one compiled program."""
        t0 = time.time()
        cond = {"txt": self.text_encoder([prompt, negative_prompt])}
        z = jax.random.normal(set_seed(seed), (1,) + self.latent_shape,
                              jnp.float32)
        if skip_override is not None:
            assert not self.config.magcache_calibration, (
                "skip_override is a generation-path surface")
            out = self._sample_fn_override()(
                self.params, z, cond, jnp.asarray(skip_override, bool))
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
            z = latents
            sf = getattr(getattr(self.vae, "cfg", None), "scaling_factor", None)
            if sf:
                z = z / sf
            dec = getattr(self.vae, "decode_tiled", None) or self.vae.decode
            video = np.asarray(dec(z))
        return PipelineOutput(latents=latents, video=video,
                              calibration=calibration,
                              timings={"total_s": time.time() - t0})
