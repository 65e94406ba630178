"""FLUX t2i / Kontext pipeline, MagCache-enabled.

Functional replacement of ``MagCache4FLUX/magcache_flux.py:446-484``: encode
prompt (T5 states + CLIP pooled) -> seeded packed latents -> jitted cached
denoise (28 steps, dynamic mu shift) -> optional VAE decode. Guidance is
embedded (distilled model, single cache lane).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.presets import make_config
from magcache_tpu.core.sampler import calibrate_euler, sample_euler
from magcache_tpu.models.flux import (
    FluxConfig,
    init_flux_params,
    make_flux_core,
    unpack_latents,
)
from magcache_tpu.models.text import MockPooledEncoder, MockTextEncoder, TextEncoder
from magcache_tpu.parallel.mesh import (
    MeshPlan,
    activation_sharding,
    build_mesh,
    shard_params,
    use_mesh,
)
from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput
from magcache_tpu.schedulers.flow_match import FlowMatchSchedule
from magcache_tpu.utils.misc import set_seed


@dataclasses.dataclass
class FluxPipelineConfig:
    model: str = "flux-dev"              # preset key: flux-dev | flux-kontext-dev
    height: int = 1024
    width: int = 1024
    num_inference_steps: int = 28
    guidance: float = 3.5
    txt_len: int = 512
    use_magcache: bool = False
    magcache_thresh: Optional[float] = None
    magcache_K: Optional[int] = None
    retention_ratio: Optional[float] = None
    magcache_calibration: bool = False
    # recorded norm_ratio list from a calibration run; replaces the published
    # table via the same pad+resample install path (calibrate-then-install,
    # magcache_generate.py:163-193,921-928)
    mag_ratios_override: Optional[tuple] = None
    dtype: str = "bfloat16"
    dp: int = 1
    sp: int = 1
    tp: int = 1
    ckpt_dir: Optional[str] = None
    lora_path: Optional[str] = None
    lora_scale: float = 1.0
    tiny: bool = False

    def model_config(self) -> FluxConfig:
        if self.tiny:
            return FluxConfig.tiny(dtype=self.dtype)
        return FluxConfig(dtype=self.dtype)

    def packed_grid(self) -> Tuple[int, int]:
        # pixels -> vae/8 latents -> 2x2 packed tokens
        return (self.height // 16, self.width // 16)

    @property
    def pipeline_cls(self):
        return FluxPipeline



class FluxPipeline(BasePipeline):
    def __init__(self, config: FluxPipelineConfig,
                 text_encoder: Optional[TextEncoder] = None,
                 pooled_encoder=None, params=None, vae=None,
                 key: Optional[jax.Array] = None):
        self.config = config
        self.model_cfg = config.model_config()
        self.grid = config.packed_grid()
        self.vae = vae
        self.core = make_flux_core(self.model_cfg, config.txt_len, *self.grid)
        self._core_kontext = None   # built lazily on first conditioned call
        self.text_encoder = text_encoder or MockTextEncoder(
            config.txt_len, self.model_cfg.text_dim, scale=0.5)
        self.pooled_encoder = pooled_encoder or MockPooledEncoder(self.model_cfg.vec_dim)
        key = key if key is not None else jax.random.PRNGKey(0)
        if params is not None:
            self.params = params
        elif config.ckpt_dir:
            from magcache_tpu.models.convert import load_flux_checkpoint
            self.params = load_flux_checkpoint(
                config.ckpt_dir, self.model_cfg,
                lora_path=config.lora_path, lora_scale=config.lora_scale)
        else:
            self.params = init_flux_params(key, self.model_cfg)
        self.plan = None
        if config.dp * config.sp * config.tp > 1:
            mesh = build_mesh(config.dp, config.sp, config.tp)
            self.plan = MeshPlan(mesh)
            self.params = shard_params(self.params, mesh)
        self._jit_cache = {}

    def _schedule(self):
        c = self.config
        gh, gw = self.grid
        mu = FlowMatchSchedule.flux_mu(gh * gw)
        return FlowMatchSchedule.create(c.num_inference_steps, mu=mu,
                                        linspace_endpoint=True)

    def _cache_cfg(self, thresh=None, K=None, retention=None):
        c = self.config
        return make_config(
            c.model, c.num_inference_steps,
            thresh=c.magcache_thresh if thresh is None else thresh,
            K=c.magcache_K if K is None else K,
            retention_ratio=(c.retention_ratio if retention is None
                             else retention),
            ratios=c.mag_ratios_override)

    # ---- one-program-many-schedules (serving overrides) -------------------
    def skip_mask_for(self, thresh=None, K=None, retention_ratio=None,
                      use_magcache: bool = True) -> np.ndarray:
        """Host-precompute a ``bool[steps, 1]`` skip mask for an E/K/R triple
        (FLUX is single-lane: embedded guidance, no CFG batch); feed it to
        ``generate(skip_override=...)``."""
        return self._skip_mask_from_cfg(
            self._cache_cfg(thresh, K, retention_ratio), use_magcache)

    def _sample_fn_override(self, kontext: bool = False):
        """Jitted sampler taking the skip mask as a TRACED argument — one
        compiled executable serves every E/K/R triple (and full compute)."""
        k = ("override", kontext)
        if k in self._jit_cache:
            return self._jit_cache[k]
        c = self.config
        sch = self._schedule()
        dts = np.diff(sch.sigmas)
        cache_cfg = self._cache_cfg()   # lane structure; mask is traced
        if kontext:
            if self._core_kontext is None:
                self._core_kontext = make_flux_core(
                    self.model_cfg, c.txt_len, *self.grid, kontext=True)
            core = self._core_kontext
        else:
            core = self.core

        def fn(params, x, cond, skips):
            return sample_euler(core, params, x, cond,
                                timesteps=sch.timesteps, dts=dts,
                                cache_cfg=cache_cfg,
                                skip_mask_override=skips)
        jitted = jax.jit(fn)
        self._jit_cache[k] = jitted
        return jitted

    def _sample_fn(self, calibrate: bool, kontext: bool = False):
        rs = bool(getattr(self, "record_skips", False)) and not calibrate
        k = ("cal" if calibrate else "gen", self.config.use_magcache, kontext,
             rs)
        if k in self._jit_cache:
            return self._jit_cache[k]
        c = self.config
        sch = self._schedule()
        dts = np.diff(sch.sigmas)
        cache_cfg = None
        if c.use_magcache and not calibrate:
            cache_cfg = self._cache_cfg()
        if kontext:
            if self._core_kontext is None:
                self._core_kontext = make_flux_core(
                    self.model_cfg, c.txt_len, *self.grid, kontext=True)
            core = self._core_kontext
        else:
            core = self.core
        if calibrate:
            def fn(params, x, cond):
                return calibrate_euler(core, params, x, cond,
                                       timesteps=sch.timesteps, dts=dts, lanes=1)
        else:
            def fn(params, x, cond):
                return sample_euler(core, params, x, cond,
                                    timesteps=sch.timesteps, dts=dts,
                                    cache_cfg=cache_cfg, return_skips=rs)
        jitted = jax.jit(fn)
        self._jit_cache[k] = jitted
        return jitted

    def generate(self, prompt: str, seed: int = 42,
                 cond_latents: Optional[jnp.ndarray] = None,
                 skip_override: Optional[np.ndarray] = None
                 ) -> PipelineOutput:
        """``skip_override``: ``bool[steps, 1]`` mask from `skip_mask_for` —
        per-request cache schedule through one compiled program."""
        t0 = time.time()
        c = self.config
        gh, gw = self.grid
        cond = {
            "txt": self.text_encoder([prompt]),
            "vec": self.pooled_encoder([prompt]),
            "guidance": jnp.full((1,), c.guidance, jnp.float32),
        }
        x0 = jax.random.normal(set_seed(seed),
                               (1, gh * gw, self.model_cfg.in_channels), jnp.float32)
        if cond_latents is not None:
            # Kontext editing: the conditioning image's packed latents ride
            # the sequence with index-1 rope ids (models/flux.py kontext path)
            cond["kontext"] = jnp.asarray(cond_latents, jnp.float32)
        if self.plan is not None:
            mesh = self.plan.mesh
            x0 = jax.device_put(x0, activation_sharding(mesh, "tokens", 3))
            cond = {k: jax.device_put(v, activation_sharding(
                mesh, "context" if v.ndim == 3 else "latents", v.ndim))
                for k, v in cond.items()}
        if skip_override is not None:
            assert not c.magcache_calibration, (
                "skip_override is a generation-path surface")
            fn = self._sample_fn_override(kontext=cond_latents is not None)
            with use_mesh(self.plan):
                out = fn(self.params, x0, cond,
                         jnp.asarray(skip_override, bool))
        else:
            fn = self._sample_fn(c.magcache_calibration,
                                 kontext=cond_latents is not None)
            with use_mesh(self.plan):
                out = fn(self.params, x0, cond)
        calibration = None
        skips = None
        if skip_override is not None:
            skips = np.asarray(skip_override, bool).reshape(-1)
        elif (getattr(self, "record_skips", False)
                and not c.magcache_calibration):
            out, skips = out
            skips = np.asarray(jax.device_get(skips))
        if c.magcache_calibration:
            from magcache_tpu.pipelines.base import calibration_dict
            latents, stats = out
            calibration = calibration_dict(stats)
        else:
            latents = out
        latents.block_until_ready()
        image = None
        if self.vae is not None:
            lat_img = unpack_latents(latents, gh, gw)
            image = np.asarray(self.vae.decode(lat_img))
        return PipelineOutput(latents=latents, image=image,
                              calibration=calibration, skips=skips,
                              timings={"total_s": time.time() - t0})
