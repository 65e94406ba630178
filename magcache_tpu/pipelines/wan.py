"""Wan 2.1/2.2 generation pipeline (t2v / i2v / ti2v), MagCache-enabled.

The functional replacement for the reference CLI flow
(``MagCache4Wan2.1/magcache_generate.py:790-942``): text encode -> seeded
noise latents -> jitted cached denoise loop -> (optional) VAE decode. The
monkey-patch installation step becomes a `MagCacheConfig` built from presets;
the torchrun/NCCL setup becomes an optional mesh plan.

Wan latent geometry: VAE stride (4, 8, 8), 16 channels; DiT patch (1, 2, 2).
Defaults follow the reference CLI (50 steps, unipc, cfg 6.0, shift 8.0 for
480p / 5.0 for 720p; ``magcache_generate.py:745-788`` argparse defaults).
"""

from __future__ import annotations

import dataclasses
import time
from functools import cached_property
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.magcache import MagCacheConfig
from magcache_tpu.core.presets import make_config
from magcache_tpu.core.sampler import (
    calibrate_euler,
    calibrate_unipc,
    sample_euler,
    sample_unipc,
)
from magcache_tpu.models.text import MockTextEncoder, TextEncoder
from magcache_tpu.models.wan import (
    WAN_14B,
    WAN_1_3B,
    WAN_5B,
    WanConfig,
    init_wan_params,
    make_wan_core,
)
from magcache_tpu.parallel.mesh import (
    MeshPlan,
    activation_sharding,
    build_mesh,
    shard_params,
    use_mesh,
)
from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput
from magcache_tpu.schedulers.flow_match import FlowMatchSchedule
from magcache_tpu.schedulers.unipc import UniPCSchedule
from magcache_tpu.utils.misc import set_seed

# the wan package's config.sample_neg_prompt — the default every reference
# Wan generate uses when no negative prompt is given (wan_teacache.py:121
# `n_prompt = self.sample_neg_prompt`; the string lives in the external
# wan.configs shared base). Transcribed from the public Wan2.1 repo; verify
# against the checkpoint's config on first real-weights contact.
DEFAULT_NEGATIVE = (
    "色调艳丽，过曝，静态，细节模糊不清，字幕，风格，作品，画作，画面，静止，"
    "整体发灰，最差质量，低质量，JPEG压缩残留，丑陋的，残缺的，多余的手指，"
    "画得不好的手部，画得不好的脸部，畸形的，毁容的，形态畸形的肢体，"
    "手指融合，静止不动的画面，杂乱的背景，三条腿，背景人很多，倒着走"
)

VAE_STRIDE = (4, 8, 8)          # Wan2.1 VAE
LATENT_CHANNELS = 16
VAE_STRIDE_22 = (4, 16, 16)     # Wan2.2-VAE (ti2v-5B): 2x2 pixel patchify
LATENT_CHANNELS_22 = 48         # on top of the Wan2.1 backbone strides


def _ti2v_post(cond):
    """Wan2.2 ti2v latent-replacement conditioning: re-impose the encoded
    image as latent frame 0 after every solver update (None when the run
    isn't image-conditioned)."""
    img = cond.get("ti2v_img") if isinstance(cond, dict) else None
    if img is None:
        return None
    return lambda x: jnp.concatenate([img.astype(x.dtype), x[:, 1:]], axis=1)


# Wan2.2 A14B expert-switch boundaries — the external ``wan.configs`` values
# the reference consumes as ``cfg.boundary`` (t2v_A14B 0.875 / i2v_A14B 0.900;
# MagCache4Wan2.2/magcache_generate.py:697,773 computes high_noise_steps from
# them). Applied when the caller doesn't set ``moe_boundary`` explicitly.
MOE_BOUNDARIES = {"wan2.2-t2v-A14B": 0.875, "wan2.2-i2v-A14B": 0.900}


@dataclasses.dataclass
class WanPipelineConfig:
    model: str = "wan2.1-t2v-1.3B"       # preset key; also selects size table
    task: str = "t2v"                    # t2v | i2v | ti2v
    size: Tuple[int, int] = (832, 480)   # (W, H) pixels
    frame_num: int = 81
    sample_steps: int = 50
    sample_shift: float = 8.0
    sample_solver: str = "unipc"         # unipc | dpm++ | euler (reference
                                         # CLI choices are unipc/dpm++,
                                         # magcache_generate.py:728-731)
    # scalar, or a (low_noise, high_noise) pair for the A14B MoE — the
    # reference passes wan.configs' sample_guide_scale tuple straight through
    # (t2v_A14B (3.0, 4.0) / i2v_A14B (3.5, 3.5); magcache_generate.py:715)
    guide_scale: Union[float, Tuple[float, float]] = 6.0
    use_magcache: bool = False
    magcache_thresh: Optional[float] = None
    magcache_K: Optional[int] = None
    retention_ratio: Optional[float] = None
    magcache_calibration: bool = False
    # "adapter" = the release MagCache4Wan2.1 decision rule; "rolling" = the
    # C2 eval-variant rule that produced the published VBench numbers
    # (forward-indexed 20% retention, cache_time=10 ratio table, inclusive K;
    # core/rolling.py, wan_magcache.py:683-817)
    cache_policy: str = "adapter"
    # TeaCache comparator — the reference Wan eval's per-lane (even/odd)
    # activation-gated cache (wan_teacache.py:533-590,899-928); mutually
    # exclusive with use_magcache, unipc solver only
    enable_teacache: bool = False
    teacache_thresh: float = 0.2
    use_ret_steps: bool = False
    dtype: str = "bfloat16"
    # parallel plan (tested on virtual CPU meshes; maps to ICI on real pods)
    dp: int = 1
    sp: int = 1
    tp: int = 1
    ckpt_dir: Optional[str] = None       # safetensors dir; random init if None
    # Wan2.2 MoE: boundary in [0,1]; if set, two experts switched by timestep
    moe_boundary: Optional[float] = None
    # user-calibrated magnitude ratios (unpadded, as saved by calibration
    # mode) — overrides the preset's published array; closes the reference's
    # calibrate -> paste-constants loop without editing code
    mag_ratios_override: Optional[tuple] = None
    clip_ckpt: Optional[str] = None      # CLIP vision tower weights (i2v)
    vace_ref_images: int = 0             # VACE R2V: # reference images
    tiny: bool = False                   # toy-size model for smoke runs
    # explicit WanConfig (e.g. sniffed from an arbitrary checkpoint by
    # tools/validate_checkpoints.py --serve); overrides the preset mapping
    model_cfg_override: Optional[object] = None

    def __post_init__(self):
        if self.moe_boundary is None:
            self.moe_boundary = MOE_BOUNDARIES.get(self.model)

    @property
    def guide_pair(self) -> Tuple[float, float]:
        """(low_noise, high_noise) CFG scales — wan.configs tuple order."""
        g = self.guide_scale
        if isinstance(g, (tuple, list)):
            return float(g[0]), float(g[1])
        return float(g), float(g)

    def model_config(self) -> WanConfig:
        if self.model_cfg_override is not None:
            return self.model_cfg_override
        if self.tiny:
            base = WanConfig.tiny(dtype=self.dtype)
            if self.task in ("i2v", "flf2v"):
                base = dataclasses.replace(base, model_type="i2v",
                                           in_channels=36)
            if self.task == "i2v" and self.model.startswith("wan2.2"):
                # Wan2.2 A14B i2v: y-concat only, no CLIP image branch
                # (reference forward never consumes clip_fea,
                # MagCache4Wan2.2/magcache_generate.py:216-246)
                base = dataclasses.replace(base, clip_tokens=0)
            if self.task == "flf2v":
                # both endpoint frames' CLIP tokens ride the context
                base = dataclasses.replace(base,
                                           clip_tokens=base.clip_tokens * 2)
            if self.task == "vace":
                base = dataclasses.replace(
                    base, vace_layers=tuple(range(0, base.layers, 5)))
            return base
        if "5B" in self.model:
            # ti2v-5B: dense trunk on 48-ch Wan2.2 latents; i2v = frame-0
            # latent replacement, so no CLIP branch / mask channels
            return dataclasses.replace(WAN_5B, dtype=self.dtype)
        base = WAN_14B if "14B" in self.model else WAN_1_3B
        base = dataclasses.replace(
            base,
            model_type="i2v" if self.task in ("i2v", "flf2v") else "t2v",
            in_channels=36 if self.task in ("i2v", "flf2v") else 16,
            dtype=self.dtype,
        )
        if self.task == "i2v" and self.model.startswith("wan2.2"):
            # Wan2.2 A14B i2v drops the CLIP branch (see tiny path note)
            base = dataclasses.replace(base, clip_tokens=0)
        if self.task == "flf2v":
            base = dataclasses.replace(base,
                                       clip_tokens=base.clip_tokens * 2)
        if self.task == "vace":
            # hint blocks every 5th layer (VACE-1.3B: 6 of 30; 14B: 8 of 40)
            base = dataclasses.replace(
                base, vace_layers=tuple(range(0, base.layers, 5)))
        return base

    @property
    def vae_stride(self) -> Tuple[int, int, int]:
        return (VAE_STRIDE_22 if "5B" in self.model and not self.tiny
                else VAE_STRIDE)

    @property
    def latent_channels(self) -> int:
        return (LATENT_CHANNELS_22 if "5B" in self.model and not self.tiny
                else LATENT_CHANNELS)

    def latent_grid(self) -> Tuple[int, int, int]:
        w, h = self.size
        f = (self.frame_num - 1) // self.vae_stride[0] + 1
        if self.task == "vace":
            # R2V reference images ride as prepended latent frames, trimmed
            # after sampling (wan VACE's trim_video_latent convention)
            f += self.vace_ref_images
        return (f, h // self.vae_stride[1], w // self.vae_stride[2])

    @property
    def pipeline_cls(self):
        return WanPipeline



class WanPipeline(BasePipeline):
    """Wan 2.1/2.2 pipeline.

    Wan2.2 A14B MoE: pass ``params_low`` (the low-noise expert) and set
    ``config.moe_boundary``; steps with ``t >= boundary*T`` run the high-noise
    expert (``params``), the rest the low-noise one — the reference's
    two-expert switch (``MagCache4Wan2.2/magcache_generate.py:294-303,697``).
    Because experts share one architecture, both phases reuse a single
    compiled program with different parameter arguments.
    """

    def __init__(self, config: WanPipelineConfig,
                 text_encoder: Optional[TextEncoder] = None,
                 params=None, params_low=None, vae=None,
                 key: Optional[jax.Array] = None):
        self.config = config
        self.model_cfg = config.model_config()
        self.vae = vae
        lf, lh, lw = config.latent_grid()
        pt, ph, pw = self.model_cfg.patch
        self.grid = (lf // pt, lh // ph, lw // pw)
        self.latent_shape = (lf, lh, lw, config.latent_channels)
        self.core = make_wan_core(self.model_cfg, self.grid)
        self.text_encoder = text_encoder or MockTextEncoder(
            self.model_cfg.text_len, self.model_cfg.text_dim, scale=0.5)

        key = key if key is not None else jax.random.PRNGKey(0)
        if params is not None:
            self.params = params
        elif config.ckpt_dir:
            from magcache_tpu.models.convert import load_wan_checkpoint
            self.params = load_wan_checkpoint(config.ckpt_dir, self.model_cfg)
        else:
            self.params = init_wan_params(key, self.model_cfg)

        self.params_low = params_low
        if config.moe_boundary is not None and params_low is None:
            # two-expert MoE requested but only one checkpoint given: derive a
            # second (random) expert for structural runs
            self.params_low = init_wan_params(
                jax.random.fold_in(key, 1), self.model_cfg)

        self.plan = None
        if config.dp * config.sp * config.tp > 1:
            mesh = build_mesh(config.dp, config.sp, config.tp)
            self.plan = MeshPlan(mesh)
            self.params = shard_params(self.params, mesh)
            if self.params_low is not None:
                self.params_low = shard_params(self.params_low, mesh)
        self._jit_cache = {}

    # ---- schedule/cache construction ------------------------------------
    def _schedule(self):
        c = self.config
        if c.sample_solver == "unipc":
            return UniPCSchedule.create(c.sample_steps, shift=c.sample_shift)
        return FlowMatchSchedule.create(c.sample_steps, shift=c.sample_shift)

    def _cache_cfg(self, schedule, *, thresh=None, K=None, retention=None,
                   force: bool = False) -> Optional[MagCacheConfig]:
        """``thresh``/``K``/``retention`` override the config's E/K/R (used by
        the serving path's per-request schedules); ``force`` builds a config
        even when ``use_magcache`` is off (to precompute override masks)."""
        c = self.config
        if not c.use_magcache and not force:
            return None
        thresh = c.magcache_thresh if thresh is None else thresh
        K = c.magcache_K if K is None else K
        retention = c.retention_ratio if retention is None else retention
        if c.cache_policy == "rolling":
            from magcache_tpu.core.rolling import RollingCacheConfig
            assert c.moe_boundary is None, (
                "the rolling policy is the Wan2.1 eval variant "
                "(no MoE split there)")
            return RollingCacheConfig(
                num_steps=c.sample_steps * 2,
                thresh=(0.015 if thresh is None else thresh),
                K=(-1 if K is None else K),
                retention=(0.2 if retention is None else retention))
        assert c.cache_policy == "adapter", c.cache_policy
        split_step = None
        mode = "t2v"
        if c.moe_boundary is not None:
            if c.sample_solver == "unipc":
                base = FlowMatchSchedule(schedule.sigmas, schedule.timesteps)
            else:
                base = schedule
            split_step = base.boundary_step(c.moe_boundary) * 2
            mode = c.task
        if c.mag_ratios_override is not None:
            from magcache_tpu.core.presets import PRESETS
            p = PRESETS[c.model]
            num_steps = c.sample_steps * p.lanes
            from magcache_tpu.core.magcache import prepare_mag_ratios
            ratios = prepare_mag_ratios(np.asarray(c.mag_ratios_override),
                                        num_steps, lanes=p.lanes, pad=p.lanes)
            return MagCacheConfig(
                num_steps=num_steps, mag_ratios=tuple(ratios),
                thresh=thresh if thresh is not None else p.thresh,
                max_consecutive_skips=K if K is not None else p.K,
                retention_ratio=(retention if retention is not None
                                 else p.retention_ratio),
                lanes=p.lanes, split_step=split_step, mode=mode)
        return make_config(
            c.model, c.sample_steps,
            thresh=thresh, K=K,
            retention_ratio=retention,
            split_step=split_step, mode=mode)

    # ---- one-program-many-schedules (serving overrides) -------------------
    def skip_mask_for(self, thresh=None, K=None, retention_ratio=None,
                      use_magcache: bool = True) -> np.ndarray:
        """Host-precompute the ``bool[num_steps, lanes]`` skip mask for an
        E/K/R triple. Feeding it to ``generate(skip_override=...)`` runs the
        schedule through ONE compiled program regardless of the triple (the
        sampler's ``skip_mask_override`` design, ``core/sampler.py:300-302``);
        an all-False mask is the full-compute schedule."""
        from magcache_tpu.core.sampler import _lane_masks
        if self.config.moe_boundary is not None:
            raise ValueError("per-request cache overrides don't cover the "
                             "Wan2.2 MoE two-expert path")
        sch = self._schedule()
        cfg = self._cache_cfg(sch, thresh=thresh, K=K,
                              retention=retention_ratio, force=True)
        if not use_magcache:
            return np.zeros((sch.num_steps, cfg.lanes), bool)
        mask, _ = _lane_masks(cfg, sch.num_steps)
        return mask

    def _sample_fn_override(self):
        """Jitted sampler taking the skip mask as a TRACED argument — one
        compiled executable serves every E/K/R triple (and full compute)."""
        key = ("override",)
        if key in self._jit_cache:
            return self._jit_cache[key]
        if self.config.enable_teacache:
            raise ValueError("per-request overrides and enable_teacache are "
                             "mutually exclusive (TeaCache decides skips from "
                             "activations, not a precomputed mask)")
        sch = self._schedule()
        # cache_cfg supplies the lane structure; its own static mask is
        # replaced by the traced override
        cache_cfg = self._cache_cfg(sch, force=True)
        g = self.config.guide_scale
        if isinstance(g, (tuple, list)):
            g = self.config.guide_pair[1]
        core = self.core
        if self.config.sample_solver == "unipc":
            def fn(params, x, cond, skips):
                return sample_unipc(core, params, x, cond, sch,
                                    cache_cfg=cache_cfg, guidance_scale=g,
                                    skip_mask_override=skips,
                                    post_step=_ti2v_post(cond))
        else:
            dpm = None
            if self.config.sample_solver == "dpm++":
                from magcache_tpu.schedulers.dpm_flow import dpmpp_2m_flow_coeffs
                dpm = dpmpp_2m_flow_coeffs(sch.sigmas)

            def fn(params, x, cond, skips):
                return sample_euler(core, params, x, cond,
                                    timesteps=sch.timesteps,
                                    dts=np.diff(sch.sigmas),
                                    cache_cfg=cache_cfg, guidance_scale=g,
                                    dpm_coeffs=dpm,
                                    skip_mask_override=skips,
                                    post_step=_ti2v_post(cond))
        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    def _sample_fn_moe(self, batch: int = 1):
        """Wan2.2 two-expert path: one compiled scan body, params swapped at
        the boundary step (high-noise expert first)."""
        key = ("moe", self.config.use_magcache, batch)
        if key in self._jit_cache:
            return self._jit_cache[key]
        if self.config.enable_teacache:
            # would otherwise be silently ignored on the MoE path
            self._teacache_lanes()   # raises: no published Wan2.2 coefficients
        from magcache_tpu.core.sampler import unipc_executor

        c = self.config
        sch = self._schedule()
        base = FlowMatchSchedule(sch.sigmas, sch.timesteps)
        boundary = base.boundary_step(c.moe_boundary)
        cache_cfg = self._cache_cfg(sch)
        # per-phase CFG scales: the reference passes wan.configs'
        # sample_guide_scale (low, high) tuple through to generate
        # (magcache_generate.py:715); the high-noise expert runs first
        g_low, g_high = c.guide_pair
        init_carry, step_in, body_hi = unipc_executor(
            self.core, sch, cache_cfg=cache_cfg,
            guidance_scale=g_high, batch=batch)
        if g_low == g_high:
            body_lo = body_hi
        else:
            _, _, body_lo = unipc_executor(
                self.core, sch, cache_cfg=cache_cfg,
                guidance_scale=g_low, batch=batch)

        def make_phase(body):
            return jax.jit(lambda params, cond, carry, seg: jax.lax.scan(
                body(params, cond), carry, seg)[0])

        phase_hi, phase_lo = make_phase(body_hi), make_phase(body_lo)

        def fn(params_high, params_low, x, cond):
            carry = init_carry(params_high, x, cond)
            hi = tuple(a[:boundary] for a in step_in)
            lo = tuple(a[boundary:] for a in step_in)
            if boundary > 0:
                carry = phase_hi(params_high, cond, carry, hi)
            if boundary < sch.num_steps:
                carry = phase_lo(params_low, cond, carry, lo)
            return carry[0]

        self._jit_cache[key] = fn
        return fn

    def _teacache_lanes(self):
        """Build the per-lane TeaCache policy from the published Wan settings
        (coefficients keyed by model/resolution, wan_teacache.py:913-928)."""
        from magcache_tpu.core.teacache import (TeaCacheLanes,
                                                wan_teacache_settings)
        c = self.config
        if c.task not in ("t2v", "i2v") or c.model.startswith("wan2.2"):
            # the published TeaCache coefficient tables cover Wan2.1 t2v
            # 1.3B/14B and i2v 480P/720P only (wan_teacache.py:913-928);
            # driving ti2v/vace/flf2v/Wan2.2 with a foreign polynomial would
            # produce an arbitrary skip schedule
            raise ValueError(
                f"enable_teacache supports Wan2.1 t2v/i2v only (no published "
                f"coefficients for task={c.task!r} model={c.model!r}); use "
                "--use_magcache for this configuration")
        if c.task == "i2v":
            model_key = "i2v-720P" if c.size[1] >= 720 else "i2v-480P"
        else:
            model_key = "t2v-14B" if "14B" in c.model else "t2v-1.3B"
        coeffs, ret, cutoff = wan_teacache_settings(
            model_key, c.sample_steps, c.use_ret_steps)
        # signal: e0 (6-way modulation) with ret steps, else raw time embed e
        # (wan_teacache.py:534: modulated_inp = e0 if use_ref_steps else e)
        # (ti2v per-token-t packs a (t, t=0) pair; row 0 is the step's t —
        # the t=0 row is step-constant and would dilute the rel-L1 signal)
        if c.use_ret_steps:
            signal = lambda p, h, ctx: (ctx["e0"][:, 0]
                                        if ctx["e0"].ndim == 4 else ctx["e0"])
        else:
            signal = lambda p, h, ctx: (ctx["e"][:, 0]
                                        if ctx["e"].ndim == 3 else ctx["e"])
        return TeaCacheLanes(thresh=c.teacache_thresh, coefficients=coeffs,
                             ret_steps=ret, cutoff_steps=cutoff, lanes=2,
                             signal_fn=signal)

    def _sample_fn(self, calibrate: bool):
        rs = bool(getattr(self, "record_skips", False)) and not calibrate
        key = ("cal" if calibrate else "gen", self.config.use_magcache,
               self.config.enable_teacache, rs)
        if key in self._jit_cache:
            return self._jit_cache[key]
        sch = self._schedule()
        cache_cfg = None if calibrate else self._cache_cfg(sch)
        g = self.config.guide_scale
        if isinstance(g, (tuple, list)):
            # dense path only sees a pair on A14B calibration runs (generate
            # routes non-calibrate MoE through _sample_fn_moe); the reference
            # calibrates the high-noise expert (magcache_generate.py:704-708)
            g = self.config.guide_pair[1]
        core = self.core
        if self.config.enable_teacache and not calibrate:
            if self.config.use_magcache:
                raise ValueError("enable_teacache and use_magcache are "
                                 "mutually exclusive")
            if self.config.sample_solver != "unipc":
                raise ValueError("Wan TeaCache rides the UniPC trajectory "
                                 "(reference eval solver); set "
                                 "sample_solver='unipc'")
            tea = self._teacache_lanes()

            def fn(params, x, cond):
                return sample_unipc(core, params, x, cond, sch,
                                    guidance_scale=g, dynamic_skip=tea,
                                    return_skips=rs,
                                    post_step=_ti2v_post(cond))

            jitted = jax.jit(fn)
            self._jit_cache[key] = jitted
            return jitted

        dpm = None
        if self.config.sample_solver == "dpm++":
            # the reference's second Wan solver (fm_solvers' flow DPM++;
            # magcache_generate.py:728-731) — 2M data-prediction multistep
            from magcache_tpu.schedulers.dpm_flow import dpmpp_2m_flow_coeffs
            dpm = dpmpp_2m_flow_coeffs(sch.sigmas)
        if calibrate:
            # Calibration must ride the SAME solver trajectory generation uses
            # (magcache_generate.py:921-928); recording from Euler while
            # generating with UniPC yields systematically-off mag_ratios.
            if self.config.sample_solver == "unipc":
                def fn(params, x, cond):
                    return calibrate_unipc(core, params, x, cond, sch,
                                           lanes=2, guidance_scale=g)
            else:
                def fn(params, x, cond):
                    return calibrate_euler(core, params, x, cond,
                                           timesteps=sch.timesteps,
                                           dts=np.diff(sch.sigmas),
                                           lanes=2, guidance_scale=g,
                                           dpm_coeffs=dpm)
        elif self.config.sample_solver == "unipc":
            def fn(params, x, cond):
                return sample_unipc(core, params, x, cond, sch,
                                    cache_cfg=cache_cfg, guidance_scale=g,
                                    return_skips=rs,
                                    post_step=_ti2v_post(cond))
        else:
            def fn(params, x, cond):
                return sample_euler(core, params, x, cond,
                                    timesteps=sch.timesteps,
                                    dts=np.diff(sch.sigmas),
                                    cache_cfg=cache_cfg, guidance_scale=g,
                                    dpm_coeffs=dpm, return_skips=rs,
                                    post_step=_ti2v_post(cond))

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    # ---- generation -----------------------------------------------------
    # ---- i2v input encoding ----------------------------------------------
    def _i2v_encoders(self):
        """Lazily build the CLIP vision tower + encoding VAE for i2v inputs.

        Matches the reference's encode flow (wan.WanI2V.generate via
        ``magcache_generate.py:989-1018``): CLIP visual penultimate-block
        features + first-frame VAE latents under a zero-padded video."""
        if getattr(self, "_clip", None) is None and not self.model_cfg.has_clip:
            self._clip = None      # Wan2.2 i2v: no CLIP branch to feed
        elif getattr(self, "_clip", None) is None:
            from magcache_tpu.models.clip import (
                CLIPVisionConfig, clip_vision_forward,
                convert_clip_vision_state_dict, init_clip_vision_params)
            dim = self.model_cfg.clip_dim
            if self.config.clip_ckpt:
                ccfg = CLIPVisionConfig(dim=dim)
                from magcache_tpu.models.convert import load_safetensors_dir
                cparams = convert_clip_vision_state_dict(
                    load_safetensors_dir(self.config.clip_ckpt), ccfg)
            else:
                # structural tower (random init) sized to the model's
                # clip_dim, with image_size chosen so the token count matches
                # the DiT's expected clip_tokens (257 -> 224px at patch 14);
                # flf2v expects 2 frames' worth, each half-sized
                per_frame = self.model_cfg.clip_tokens // (
                    2 if self.config.task == "flf2v" else 1)
                side = int(round((per_frame - 1) ** 0.5))
                ccfg = CLIPVisionConfig(
                    dim=dim, layers=2 if self.config.tiny else 32,
                    heads=16 if dim % 16 == 0 else 4,
                    image_size=14 * side)
                cparams = init_clip_vision_params(jax.random.PRNGKey(7), ccfg)
            self._clip = (ccfg, cparams,
                          jax.jit(lambda pr, im: clip_vision_forward(pr, ccfg, im)))
        if getattr(self, "_enc_vae", None) is None:
            vae = self.vae
            if vae is None or not hasattr(vae, "encode"):
                # random-init encoder with the real Wan strides (4, 8, 8) so
                # latent grids line up; swap in a loaded CausalVAE for quality
                from magcache_tpu.models.vae import (
                    CausalVAE, CausalVAEConfig, init_causal_vae_params)
                vcfg = CausalVAEConfig(
                    base=8 if self.config.tiny else 96,
                    ch_mult=(1, 1, 2, 2) if self.config.tiny else (1, 2, 4, 4),
                    blocks_per_level=1 if self.config.tiny else 2,
                    groups=4 if self.config.tiny else 32)
                vae = CausalVAE(vcfg, init_causal_vae_params(
                    jax.random.PRNGKey(11), vcfg))
            self._enc_vae = vae
        return self._clip, self._enc_vae

    def encode_ti2v(self, image) -> jnp.ndarray:
        """Encode the ti2v conditioning image to ONE latent frame
        f32[1, 1, lh, lw, z] of the Wan2.2-VAE space (frame-0 latent
        replacement; no mask channels / CLIP tokens). With a loaded VAE
        (``--vae_ckpt`` Wan2.2-VAE, shape-sniffed) this is a real encode;
        checkpoint-free runs use the documented nearest-resize + fixed
        random-projection mock (structurally aligned latents only)."""
        import numpy as _np
        img = _np.asarray(image)
        if img.dtype == _np.uint8:
            img = img.astype(_np.float32) / 255.0
        w, h = self.config.size
        lf, lh, lw, c = self.latent_shape
        img_r = jax.image.resize(jnp.asarray(img, jnp.float32)[None],
                                 (1, h, w, 3), method="bicubic")
        img_r = jnp.clip(img_r, 0.0, 1.0) * 2.0 - 1.0
        vae = self.vae
        if vae is not None and hasattr(vae, "encode"):
            out = vae.encode(img_r[:, None])
            mean = out[0] if isinstance(out, tuple) else out
        else:
            lat = jax.image.resize(img_r, (1, lh, lw, 3), method="nearest")
            proj = jax.random.normal(jax.random.PRNGKey(13), (3, c),
                                     jnp.float32) / jnp.sqrt(3.0)
            mean = (lat @ proj)[:, None]
        assert mean.shape == (1, 1, lh, lw, c), (mean.shape,
                                                 self.latent_shape)
        return mean

    def encode_image(self, image) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """image: [H, W, 3] uint8 or [0,1] float. Returns (y, clip_fea):

        - ``y`` f32[1, F_lat, lh, lw, 20]: 4 mask channels (first latent frame
          = 1) + 16 VAE latent channels of [image; zero frames] — the
          reference's ``msk``+``y`` concat (wan.WanI2V.generate);
        - ``clip_fea`` f32[1, tokens, clip_dim]: CLIP visual features, or
          None for Wan2.2 A14B i2v (no CLIP branch — the reference forward
          never consumes clip_fea, MagCache4Wan2.2
          magcache_generate.py:216-246).
        """
        import numpy as _np

        img = _np.asarray(image)
        if img.dtype == _np.uint8:
            img = img.astype(_np.float32) / 255.0

        if self.model_cfg.has_clip:
            from magcache_tpu.models.clip import preprocess_clip_image
            (ccfg, cparams, clip_fn), vae = self._i2v_encoders()
            clip_fea = clip_fn(cparams, preprocess_clip_image(img, ccfg))
        else:
            _, vae = self._i2v_encoders()
            clip_fea = None

        w, h = self.config.size
        img_r = jax.image.resize(jnp.asarray(img, jnp.float32)[None],
                                 (1, h, w, 3), method="bicubic")
        img_r = jnp.clip(img_r, 0.0, 1.0) * 2.0 - 1.0      # [-1, 1]
        frames = jnp.concatenate(
            [img_r[:, None],
             jnp.zeros((1, self.config.frame_num - 1, h, w, 3), jnp.float32)],
            axis=1)                                        # [1, F_pix, H, W, 3]
        mean, _ = vae.encode(frames)
        lf, lh, lw, _ = self.latent_shape
        assert mean.shape[1:4] == (lf, lh, lw), (mean.shape, self.latent_shape)
        msk = jnp.zeros((1, lf, lh, lw, 4), jnp.float32).at[:, 0].set(1.0)
        y = jnp.concatenate([msk, mean.astype(jnp.float32)], axis=-1)
        return y, clip_fea

    def encode_flf(self, first_image, last_image):
        """First-last-frame conditioning (the reference CLI's ``flf2v`` task,
        ``magcache_generate.py:1032-1090``; encode flow from the published
        wan.WanFLF2V): VAE latents of [first; zeros; last], mask marking both
        endpoint frames, CLIP tokens of BOTH frames concatenated.

        Mask packing follows the Wan 4x-temporal grouping: the first pixel
        frame is repeat-packed into all 4 mask channels of latent frame 0;
        the last pixel frame lands in channel 3 of the last latent frame
        ((F+3) % 4 position of the final 4-group).
        """
        import numpy as _np

        from magcache_tpu.models.clip import preprocess_clip_image

        (ccfg, cparams, clip_fn), vae = self._i2v_encoders()

        def prep(image):
            img = _np.asarray(image)
            if img.dtype == _np.uint8:
                img = img.astype(_np.float32) / 255.0
            return img

        first, last = prep(first_image), prep(last_image)
        clip_fea = jnp.concatenate(
            [clip_fn(cparams, preprocess_clip_image(first, ccfg)),
             clip_fn(cparams, preprocess_clip_image(last, ccfg))], axis=1)

        w, h = self.config.size
        F = self.config.frame_num

        def pix(img):
            r = jax.image.resize(jnp.asarray(img, jnp.float32)[None],
                                 (1, h, w, 3), method="bicubic")
            return jnp.clip(r, 0.0, 1.0) * 2.0 - 1.0
        frames = jnp.concatenate(
            [pix(first)[:, None],
             jnp.zeros((1, F - 2, h, w, 3), jnp.float32),
             pix(last)[:, None]], axis=1)
        mean, _ = vae.encode(frames)
        lf, lh, lw, _ = self.latent_shape
        assert mean.shape[1:4] == (lf, lh, lw), (mean.shape, self.latent_shape)
        msk = jnp.zeros((1, lf, lh, lw, 4), jnp.float32).at[:, 0].set(1.0)
        # last pixel frame sits at packed slot (F-1)+3 -> channel 3 of the
        # final latent frame (repeat-interleave of frame 0 shifts by +3)
        msk = msk.at[:, lf - 1, :, :, 3].set(1.0)
        y = jnp.concatenate([msk, mean.astype(jnp.float32)], axis=-1)
        return y, clip_fea

    def encode_vace(self, src_video=None, src_mask=None,
                    src_ref_images=None) -> jnp.ndarray:
        """Build the 96-channel VACE conditioning context
        (reference: wan.WanVace.prepare_source + vace_encode_frames/
        vace_latent, driven from ``magcache_generate.py:1091-1155``):
        VAE latents of the *inactive* (mask-erased) and *reactive* (masked)
        video halves (16 + 16 ch) + the 8x8 space-to-depth mask (64 ch).

        src_video: [F, H, W, 3] in [0, 1] (None -> zeros: pure generation);
        src_mask:  [F, H, W] in [0, 1] (None -> ones: edit everywhere);
        src_ref_images: list of [H, W, 3] R2V reference images — each is
        VAE-encoded as a 1-frame clip and PREPENDED on the latent time axis
        (inactive stream; reactive and mask streams get zeros there), and the
        sampled video carries the extra leading frames until the post-sample
        trim (the wan VACE vace_encode_frames/masks + trim convention).
        """
        lf_tot, lh, lw, _ = self.latent_shape
        n_ref = self.config.vace_ref_images
        assert n_ref == len(src_ref_images or []), (
            f"config.vace_ref_images={n_ref} but "
            f"{len(src_ref_images or [])} reference images supplied")
        lf = lf_tot - n_ref
        import numpy as _np

        if src_video is None:
            ctx = jnp.zeros((1, lf, lh, lw, 96), jnp.float32)
        else:
            _, vae = self._i2v_encoders()
            w, h = self.config.size
            vid = jnp.asarray(_np.asarray(src_video, _np.float32))[None]
            vid = jax.image.resize(vid, (1, self.config.frame_num, h, w, 3),
                                   method="bicubic")
            vid = jnp.clip(vid, 0.0, 1.0) * 2.0 - 1.0
            if src_mask is None:
                m = jnp.ones((1, self.config.frame_num, h, w, 1), jnp.float32)
            else:
                m = jnp.asarray(_np.asarray(src_mask, _np.float32))[None, ..., None]
                m = jax.image.resize(m, (1, self.config.frame_num, h, w, 1),
                                     method="nearest")
            inactive, _ = vae.encode(vid * (1.0 - m))
            reactive, _ = vae.encode(vid * m)
            # mask -> latent frames (nearest temporal), 8x8 space-to-depth
            m_lat = jax.image.resize(m[..., 0], (1, lf, lh * 8, lw * 8),
                                     "nearest")
            m_lat = m_lat.reshape(1, lf, lh, 8, lw, 8)
            m_lat = m_lat.transpose(0, 1, 2, 4, 3, 5).reshape(1, lf, lh, lw, 64)
            ctx = jnp.concatenate(
                [inactive.astype(jnp.float32), reactive.astype(jnp.float32),
                 m_lat], axis=-1)
        if n_ref:
            _, vae = self._i2v_encoders()
            w, h = self.config.size
            refs = []
            for img in src_ref_images:
                img = _np.asarray(img)
                if img.dtype == _np.uint8:
                    img = img.astype(_np.float32) / 255.0
                r = jax.image.resize(jnp.asarray(img, jnp.float32)[None],
                                     (1, h, w, 3), method="bicubic")
                r = jnp.clip(r, 0.0, 1.0) * 2.0 - 1.0
                rl, _ = vae.encode(r[:, None])        # 1-frame clip
                refs.append(rl[:, :1].astype(jnp.float32))
            ref_lat = jnp.concatenate(refs, axis=1)   # [1, n_ref, lh, lw, 16]
            ref_ctx = jnp.concatenate(
                [ref_lat, jnp.zeros((1, n_ref, lh, lw, 80), jnp.float32)],
                axis=-1)
            ctx = jnp.concatenate([ref_ctx, ctx], axis=1)
        return ctx

    def generate(self, prompt: str, negative_prompt: str = DEFAULT_NEGATIVE,
                 seed: int = 0, image=None, last_image=None,
                 image_latents: Optional[jnp.ndarray] = None,
                 clip_features: Optional[jnp.ndarray] = None,
                 src_video=None, src_mask=None, src_ref_images=None,
                 vace_context: Optional[jnp.ndarray] = None,
                 skip_override: Optional[np.ndarray] = None) -> PipelineOutput:
        """``skip_override``: a ``bool[num_steps, lanes]`` mask from
        ``skip_mask_for`` — runs the request through the shared
        one-program-many-schedules executable (serving path)."""
        t0 = time.time()
        ctx = self.text_encoder([prompt, negative_prompt])  # [2, L, 4096]
        cond = {"context": ctx}
        if self.config.task == "flf2v":
            if image_latents is None:
                assert image is not None and last_image is not None, \
                    "flf2v needs image= and last_image="
                image_latents, clip_features = self.encode_flf(image,
                                                               last_image)
            cond["y"] = jnp.concatenate([image_latents] * 2, axis=0)
            cond["clip_fea"] = jnp.concatenate([clip_features] * 2, axis=0)
        if self.config.task == "i2v":
            if image_latents is None:
                assert image is not None, "i2v needs image= or image_latents="
                image_latents, clip_features = self.encode_image(image)
            cond["y"] = jnp.concatenate([image_latents] * 2, axis=0)
            if clip_features is not None:     # absent on Wan2.2 A14B i2v
                cond["clip_fea"] = jnp.concatenate([clip_features] * 2,
                                                   axis=0)
        if self.config.task == "vace":
            if vace_context is None:
                vace_context = self.encode_vace(src_video, src_mask,
                                                src_ref_images)
            cond["vace_context"] = jnp.concatenate([vace_context] * 2, axis=0)
        if self.config.task == "ti2v" and (image is not None
                                           or image_latents is not None):
            # Wan2.2 ti2v i2v = latent replacement: the encoded image is
            # latent frame 0, re-imposed after every solver step (no CLIP
            # branch / mask channels; the reference routes img through the
            # external WanTI2V, magcache_generate.py:745-747)
            if image_latents is None:
                image_latents = self.encode_ti2v(image)
            cond["ti2v_img"] = image_latents

        noise_key = set_seed(seed)
        x0 = jax.random.normal(noise_key, (1,) + self.latent_shape, jnp.float32)
        if "ti2v_img" in cond:
            x0 = jnp.concatenate(
                [cond["ti2v_img"].astype(x0.dtype), x0[:, 1:]], axis=1)

        if self.plan is not None:
            mesh = self.plan.mesh
            x0 = jax.device_put(x0, activation_sharding(mesh, "latents", x0.ndim))
            cond = {k: jax.device_put(v, activation_sharding(mesh, "context", v.ndim))
                    for k, v in cond.items()}

        calibrate = self.config.magcache_calibration
        if skip_override is not None:
            assert not calibrate, "skip_override is a generation-path surface"
            if self.config.moe_boundary is not None:
                raise ValueError("per-request cache overrides don't cover "
                                 "the Wan2.2 MoE two-expert path")
            fn = self._sample_fn_override()
            with use_mesh(self.plan):
                out = fn(self.params, x0, cond,
                         jnp.asarray(skip_override, bool))
        elif self.config.moe_boundary is not None and not calibrate:
            assert self.config.sample_solver == "unipc", "MoE path uses UniPC"
            fn = self._sample_fn_moe()
            with use_mesh(self.plan):
                out = fn(self.params, self.params_low, x0, cond)
        else:
            fn = self._sample_fn(calibrate)
            with use_mesh(self.plan):
                out = fn(self.params, x0, cond)
        calibration = None
        skips = None
        if (getattr(self, "record_skips", False) and not calibrate
                and self.config.moe_boundary is None
                and skip_override is None):
            out, skips = out
            skips = np.asarray(jax.device_get(skips))
        elif skip_override is not None:
            # the override mask IS the schedule — report it directly
            skips = np.asarray(skip_override, bool).reshape(-1)
        if calibrate:
            from magcache_tpu.pipelines.base import calibration_dict
            latents, stats = out
            # flattens to the reference's cnt ordering [cond, uncond, ...]
            calibration = calibration_dict(stats)
        else:
            latents = out
        latents.block_until_ready()
        if self.config.task == "vace" and self.config.vace_ref_images:
            # drop the prepended reference frames (wan VACE trim_video_latent)
            latents = latents[:, self.config.vace_ref_images:]
        timings = {"total_s": time.time() - t0}

        video = None
        if self.vae is not None:
            video = np.asarray(self.vae.decode(latents))
        return PipelineOutput(latents=latents, video=video,
                              calibration=calibration, timings=timings,
                              skips=skips)

    # ---- batched generation ----------------------------------------------
    def generate_batch(self, prompts, negative_prompt: str = DEFAULT_NEGATIVE,
                       seed: int = 0, seeds=None) -> PipelineOutput:
        """Generate several prompts in one batched denoise (batch rides the
        `dp` mesh axis when a plan is active — the reference's DP/eval-time
        prompt sharding, `wan_eval.sh` / utils.py:19-34 per-rank seeds).

        ``seeds``: explicit per-element seed list — element ``j``'s noise is
        drawn with ``set_seed(seeds[j])`` exactly (no dp-rank offset), so a
        batched run reproduces the corresponding single ``generate(seed=s)``
        calls; the VBench loop protocol's seed=loop-index needs this."""
        b = len(prompts)
        ctx_c = self.text_encoder(list(prompts))
        ctx_u = self.text_encoder([negative_prompt] * b)
        cond = {"context": jnp.concatenate([ctx_c, ctx_u], axis=0)}
        if seeds is not None:
            assert len(seeds) == b, (len(seeds), b)
            keys = [set_seed(s) for s in seeds]
        else:
            keys = [set_seed(seed, dp_rank=i) for i in range(b)]
        x0 = jnp.concatenate(
            [jax.random.normal(k, (1,) + self.latent_shape, jnp.float32)
             for k in keys], axis=0)
        if self.plan is not None:
            mesh = self.plan.mesh
            x0 = jax.device_put(x0, activation_sharding(mesh, "latents", x0.ndim))
            cond = {k: jax.device_put(v, activation_sharding(mesh, "context", v.ndim))
                    for k, v in cond.items()}
        t0 = time.time()
        if self.config.moe_boundary is not None:
            assert self.config.sample_solver == "unipc", "MoE path uses UniPC"
            fn = self._sample_fn_moe(batch=b)
            with use_mesh(self.plan):
                latents = fn(self.params, self.params_low, x0, cond)
        else:
            fn = self._sample_fn(False)
            with use_mesh(self.plan):
                latents = fn(self.params, x0, cond)
        latents.block_until_ready()
        return PipelineOutput(latents=latents,
                              timings={"total_s": time.time() - t0,
                                       "prompts": b})
