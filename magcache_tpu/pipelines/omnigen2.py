"""OmniGen2 t2i / edit pipeline: N-branch CFG with per-branch MagCache lanes.

The reference's OmniGen2 adapter is its cleanest cache design: one
``MagCacheParams`` object per guidance branch (cond / uncond / ref), swapped
onto the transformer before each of up to 3 ``predict`` calls per step
(``MagCache4OmniGen2/magcache/magcache_utils.py:22-61, 396-546``), with
per-branch calibrated ratio arrays keyed ``t2i_cond`` … ``edit_ref``
(``:14-20``).

Here the same structure is expressed functionally: the three branches are
**batched as cache lanes** (lane = forward index % lanes), their per-branch
ratio arrays interleaved into one `MagCacheConfig`, and the guidance combine is

    pred = uncond + image_scale * (ref - uncond) + text_scale * (cond - ref)

(the OmniGen2 predict combine for edit; t2i degenerates to standard 2-branch
CFG). The denoiser is the true OmniGen2 decoder (`models.omnigen2`): a
Lumina2-lineage single-stream transformer with context/noise/ref refiners,
GQA attention and sandwich-norm tanh-gated modulation. Edit mode matches the
reference's forward set exactly: its uncond predict drops the ref tokens from
the sequence entirely (``magcache_utils.py:489-500``), so here the cond+ref
lanes batch through the with-refs program while the uncond lane runs a second
ref-free program — two compiled trunks, three caches, one scan (this also
banks the uncond lane's shorter-sequence FLOPs like the reference).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.magcache import (MagCacheConfig,
                                        compute_skip_schedule,
                                        prepare_mag_ratios)
from magcache_tpu.core.sampler import (_cached_trunk, _init_cache,
                                       sample_euler)
from magcache_tpu.data import get_calibrated_ratios
from magcache_tpu.models.omnigen2 import (
    OmniGen2Config,
    init_omnigen2_params,
    make_omnigen2_core,
)
from magcache_tpu.models.text import MockTextEncoder, TextEncoder
from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput
from magcache_tpu.schedulers.flow_match import FlowMatchSchedule
from magcache_tpu.utils.misc import set_seed

__all__ = ["OmniGen2PipelineConfig", "OmniGen2Pipeline", "make_omnigen2_cache_config"]

BRANCHES = {"t2i": ("t2i_cond", "t2i_uncond"),
            "edit": ("edit_cond", "edit_uncond", "edit_ref")}


def make_omnigen2_cache_config(
    mode: str, sample_steps: int, *, thresh: float = 0.05, K: int = 3,
    retention_ratio: float = 0.2) -> MagCacheConfig:
    """Interleave the per-branch calibrated arrays into one N-lane config.

    Branch order per step is (cond, uncond[, ref]) — forward index
    ``step * lanes + branch`` (the reference swaps params objects in that call
    order, ``magcache_utils.py:435-492``). Defaults: E~0.05, K=3, R=0.2
    (``magcache_utils.py:69,82-83``).
    """
    keys = BRANCHES[mode]
    lanes = len(keys)
    per_lane = [
        prepare_mag_ratios(get_calibrated_ratios(f"omnigen2-{k}"),
                           sample_steps, lanes=1, pad=1)
        for k in keys
    ]
    interleaved = np.stack(per_lane, axis=1).reshape(-1)
    return MagCacheConfig(
        num_steps=sample_steps * lanes, mag_ratios=tuple(interleaved),
        thresh=thresh, max_consecutive_skips=K,
        retention_ratio=retention_ratio, lanes=lanes)


# the reference CLI's --negative_prompt default (inference.py:115-119)
OMNIGEN2_DEFAULT_NEGATIVE = (
    "(((deformed))), blurry, over saturation, bad anatomy, disfigured, "
    "poorly drawn face, mutation, mutated, (extra_limb), (ugly), "
    "(poorly drawn hands), fused fingers, messy drawing, broken legs censor, "
    "censored, censor_bar")


@dataclasses.dataclass
class OmniGen2PipelineConfig:
    mode: str = "edit"                 # t2i | edit
    height: int = 1024
    width: int = 1024
    num_inference_steps: int = 50
    text_guidance_scale: float = 5.0
    image_guidance_scale: float = 2.0
    cfg_range: tuple = (0.0, 1.0)      # step-fraction window for guidance
    txt_len: int = 128
    use_magcache: bool = False
    magcache_thresh: float = 0.05
    magcache_K: int = 3
    retention_ratio: float = 0.2
    # TaylorSeer comparator — the reference's third, mutually-exclusive switch
    # (inference.py:167-212; magcache_utils.py:424-521)
    enable_taylorseer: bool = False
    taylorseer_interval: int = 4
    taylorseer_order: int = 2
    taylorseer_warmup: int = 3
    # TeaCache comparator — one params object per guidance branch, first/last
    # step forced (magcache_utils.py:431-434, 446-521). The rescale polynomial
    # ships in the external omnigen2 package (teacache_util), not the
    # reference tree — plug the published coefficients via teacache_coeffs;
    # the default is the raw relative-L1 distance.
    enable_teacache: bool = False
    # reference default: inference.py --teacache_rel_l1_thresh 0.05
    teacache_thresh: float = 0.05
    teacache_coeffs: tuple = (1.0, 0.0)
    # reference --scheduler choice (inference.py:41-47): euler (default) or
    # dpmsolver++ (flow-match DPM-Solver++ 2M, schedulers/dpm_flow.py)
    scheduler: str = "euler"
    # full-compute run recording per-branch magnitude stats (the reference's
    # calibration forwards in magcache/magcache_utils.py; branch order
    # cond, uncond[, ref] interleaved into the flat cnt ordering)
    magcache_calibration: bool = False
    dtype: str = "float32"
    tiny: bool = False
    ckpt_dir: Optional[str] = None   # published transformer checkpoint dir
    lora_path: Optional[str] = None  # --transformer_lora_path adapter
    lora_scale: float = 1.0

    ref_images: int = 1                # edit mode: number of reference images

    def validate(self) -> "OmniGen2PipelineConfig":
        if self.enable_taylorseer and self.use_magcache:
            raise ValueError(
                "enable_taylorseer and use_magcache are mutually exclusive "
                "(reference inference.py:208-212)")
        if self.enable_teacache and (self.use_magcache
                                     or self.enable_taylorseer):
            raise ValueError(
                "enable_teacache is mutually exclusive with use_magcache / "
                "enable_taylorseer (the reference resolves the overlap by "
                "if/elif priority, inference.py:208-212 + "
                "magcache_utils.py:446-452; we reject it explicitly)")
        return self

    def model_config(self) -> OmniGen2Config:
        if self.tiny:
            return OmniGen2Config.tiny(dtype=self.dtype)
        return OmniGen2Config(dtype=self.dtype)

    @property
    def pipeline_cls(self):
        return OmniGen2Pipeline



class OmniGen2Pipeline(BasePipeline):
    def __init__(self, config: OmniGen2PipelineConfig,
                 text_encoder: Optional[TextEncoder] = None, params=None,
                 vae=None, key: Optional[jax.Array] = None):
        self.config = config.validate()
        self.vae = vae
        self.model_cfg = config.model_config()
        p = self.model_cfg.patch
        self.grid = (config.height // 8 // p, config.width // 8 // p)
        self.n_refs = config.ref_images if config.mode == "edit" else 0
        self.core = make_omnigen2_core(self.model_cfg, config.txt_len,
                                       self.grid, ref_images=self.n_refs)
        # edit mode: the uncond forward has no ref tokens in its sequence
        # (magcache_utils.py:489-500) — a second, ref-free program
        self.core_noref = (make_omnigen2_core(self.model_cfg, config.txt_len,
                                              self.grid, ref_images=0)
                           if self.n_refs else None)
        self.text_encoder = text_encoder or MockTextEncoder(
            config.txt_len, self.model_cfg.text_dim, scale=0.5)
        key = key if key is not None else jax.random.PRNGKey(0)
        if params is None and config.ckpt_dir:
            from magcache_tpu.models.convert import load_omnigen2_checkpoint
            params, _ = load_omnigen2_checkpoint(
                config.ckpt_dir, self.model_cfg,
                lora_path=config.lora_path, lora_scale=config.lora_scale)
        self.params = params if params is not None else init_omnigen2_params(
            key, self.model_cfg)
        self._jit_cache = {}

    @property
    def lanes(self) -> int:
        return len(BRANCHES[self.config.mode])

    def _combine(self):
        """Step-dependent guidance: scales drop to 1.0 outside cfg_range
        (magcache_utils.py:463-464: i/len(timesteps) in [lo, hi])."""
        import numpy as _np
        import jax.numpy as _jnp
        c = self.config
        n = c.num_inference_steps
        lo, hi = c.cfg_range
        frac = _np.arange(n) / n
        in_rng = (frac >= lo) & (frac <= hi)
        tg_arr = _jnp.asarray(_np.where(in_rng, c.text_guidance_scale, 1.0),
                              _jnp.float32)
        ig_arr = _jnp.asarray(_np.where(in_rng, c.image_guidance_scale, 1.0),
                              _jnp.float32)
        if self.config.mode == "t2i":
            def fn(outs, step_idx):
                cond, uncond = outs
                return uncond + tg_arr[step_idx] * (cond - uncond)
        else:
            def fn(outs, step_idx):
                cond, uncond, ref = outs
                return (uncond + ig_arr[step_idx] * (ref - uncond)
                        + tg_arr[step_idx] * (cond - ref))
        return fn

    def _sample_fn(self):
        k = (self.config.use_magcache, self.config.enable_taylorseer,
             self.config.enable_teacache, self.config.scheduler,
             self.config.magcache_calibration)
        if k in self._jit_cache:
            return self._jit_cache[k]
        c = self.config
        sch = FlowMatchSchedule.create(c.num_inference_steps)
        dpm = None
        if c.scheduler == "dpmsolver++":
            if c.enable_taylorseer or c.enable_teacache:
                print("WARNING: dpmsolver++ is wired for the full-compute and "
                      "MagCache paths; the TaylorSeer/TeaCache comparators "
                      "run their reference euler loop.")
            else:
                from magcache_tpu.schedulers.dpm_flow import (
                    dpmpp_2m_flow_coeffs)
                dpm = dpmpp_2m_flow_coeffs(sch.sigmas)
        cache_cfg = None
        if c.use_magcache:
            cache_cfg = make_omnigen2_cache_config(
                c.mode, c.num_inference_steps, thresh=c.magcache_thresh,
                K=c.magcache_K, retention_ratio=c.retention_ratio)
        core, lanes, combine = self.core, self.lanes, self._combine()

        if c.magcache_calibration:
            fn = self._calibrate_fn(sch, dpm)
        elif c.enable_taylorseer:
            fn = self._taylorseer_fn(sch)
        elif c.enable_teacache:
            fn = self._teacache_fn(sch)
        elif self.config.mode == "edit":
            core_nor = self.core_noref
            n = c.num_inference_steps
            if cache_cfg is not None:
                mask = compute_skip_schedule(cache_cfg).reshape(n, 3)
            else:
                mask = np.zeros((n, 3), bool)
            # lane order (cond, uncond, ref): with-refs program runs rows
            # [cond, ref]; the ref-free program runs [uncond]
            skips_a = jnp.asarray(mask[:, [0, 2]])
            skips_b = jnp.asarray(mask[:, 1:2])
            ts = jnp.asarray(sch.timesteps.astype(np.float32))
            dts = jnp.asarray(np.diff(sch.sigmas).astype(np.float32))
            if dpm is not None:
                dpm_steps = tuple(jnp.asarray(dpm[kk]) for kk in
                                  ("sigma_t", "a", "b", "c_x", "c_d"))
            else:
                dpm_steps = tuple(jnp.zeros(n, jnp.float32)
                                  for _ in range(5))

            def fn(params, x, cond):
                cond_a = {"txt": cond["txt"][jnp.asarray([0, 2])],
                          "ref": jnp.concatenate([cond["ref"]] * 2, axis=0)}
                cond_b = {"txt": cond["txt"][1:2]}
                x2 = jnp.concatenate([x, x], axis=0)
                t0 = ts[:1]
                cache_a = _init_cache(core, params, x2, t0, cond_a)
                cache_b = _init_cache(core_nor, params, x, t0, cond_b)
                rows_a = jnp.asarray([0, 1])
                rows_b = jnp.asarray([0])

                def body(carry, step_in):
                    x, ca, cb, x0p = carry
                    t, dt, sa, sb, idx, dpc = step_in
                    x2 = jnp.concatenate([x, x], axis=0)
                    tv2 = jnp.full((2,), t, jnp.float32)
                    ha, ctxa = core.prepare(params, x2, tv2, cond_a)
                    ha, ca, _ = _cached_trunk(core, params, ha, ctxa, ca,
                                              sa, rows_a, partial_lanes=2)
                    outa = core.head(params, ha, ctxa)
                    tv1 = jnp.full((1,), t, jnp.float32)
                    hb, ctxb = core_nor.prepare(params, x, tv1, cond_b)
                    hb, cb, _ = _cached_trunk(core_nor, params, hb, ctxb, cb,
                                              sb, rows_b)
                    outb = core_nor.head(params, hb, ctxb)
                    e = combine((outa[0:1], outb, outa[1:2]), idx)
                    if dpm is not None:
                        sg, av, bv, cxd, cdd = (v.astype(x.dtype)
                                                for v in dpc)
                        x0 = x - sg * e.astype(x.dtype)
                        x = cxd * x + cdd * (av * x0 + bv * x0p)
                        x0p = x0
                    else:
                        x = x + dt.astype(x.dtype) * e.astype(x.dtype)
                    return (x, ca, cb, x0p), None

                (x_fin, _, _, _), _ = jax.lax.scan(
                    body, (x, cache_a, cache_b, jnp.zeros_like(x)),
                    (ts, dts, skips_a, skips_b, jnp.arange(n), dpm_steps))
                return x_fin
        else:
            def fn(params, x, cond):
                return sample_euler(core, params, x, cond,
                                    timesteps=sch.timesteps,
                                    dts=np.diff(sch.sigmas),
                                    cache_cfg=cache_cfg, lanes=lanes,
                                    combine_fn=combine, dpm_coeffs=dpm)

        jitted = jax.jit(fn)
        self._jit_cache[k] = jitted
        return jitted

    def _calibrate_fn(self, sch, dpm):
        """Full-compute calibration (the reference's magcache_calibration
        forwards): per-branch magnitude/std/cosine stats each step. t2i rides
        the generic N-lane recorder; edit keeps the split-lane program pair
        with lane order (cond, uncond, ref)."""
        from magcache_tpu.core.sampler import (calibrate_euler,
                                               calibration_stats)
        c = self.config
        core, lanes, combine = self.core, self.lanes, self._combine()
        ts = jnp.asarray(sch.timesteps.astype(np.float32))
        dts = jnp.asarray(np.diff(sch.sigmas).astype(np.float32))
        n = c.num_inference_steps
        if c.mode != "edit":
            def fn(params, x, cond):
                return calibrate_euler(core, params, x, cond,
                                       timesteps=sch.timesteps,
                                       dts=np.diff(sch.sigmas),
                                       lanes=lanes, combine_fn=combine,
                                       dpm_coeffs=dpm)
            return fn

        core_nor = self.core_noref
        if dpm is not None:
            dpm_steps = tuple(jnp.asarray(dpm[kk]) for kk in
                              ("sigma_t", "a", "b", "c_x", "c_d"))
        else:
            dpm_steps = tuple(jnp.zeros(n, jnp.float32) for _ in range(5))

        def fn(params, x, cond):
            cond_a = {"txt": cond["txt"][jnp.asarray([0, 2])],
                      "ref": jnp.concatenate([cond["ref"]] * 2, axis=0)}
            cond_b = {"txt": cond["txt"][1:2]}

            def body(carry, step_in):
                x, ra_p, rb_p, x0p = carry
                t, dt, idx, dpc = step_in
                x2 = jnp.concatenate([x, x], axis=0)
                tv2 = jnp.full((2,), t, jnp.float32)
                ha, ctxa = core.prepare(params, x2, tv2, cond_a)
                ha_out = core.trunk(params, ha, ctxa)
                ra = ha_out - ha
                outa = core.head(params, ha_out, ctxa)
                tv1 = jnp.full((1,), t, jnp.float32)
                hb, ctxb = core_nor.prepare(params, x, tv1, cond_b)
                hb_out = core_nor.trunk(params, hb, ctxb)
                rb = hb_out - hb
                outb = core_nor.head(params, hb_out, ctxb)
                # branch order (cond, uncond, ref) = the reference's flat cnt
                stats = jnp.stack([
                    calibration_stats(ra[0:1], ra_p[0:1]),
                    calibration_stats(rb, rb_p),
                    calibration_stats(ra[1:2], ra_p[1:2])])  # [3, 3]
                e = combine((outa[0:1], outb, outa[1:2]), idx)
                if dpm is not None:
                    sg, av, bv, cxd, cdd = (v.astype(x.dtype) for v in dpc)
                    x0 = x - sg * e.astype(x.dtype)
                    x = cxd * x + cdd * (av * x0 + bv * x0p)
                    x0p = x0
                else:
                    x = x + dt.astype(x.dtype) * e.astype(x.dtype)
                return (x, ra, rb, x0p), stats

            t0v = ts[:1]
            x2 = jnp.concatenate([x, x], axis=0)
            ra0 = _init_cache(core, params, x2, t0v, cond_a)
            rb0 = _init_cache(core_nor, params, x, t0v, cond_b)
            (x_fin, _, _, _), stats = jax.lax.scan(
                body, (x, ra0, rb0, jnp.zeros_like(x)),
                (ts, dts, jnp.arange(n), dpm_steps))
            return x_fin, stats[1:]   # step 0 has no previous residual

        return fn

    def _taylorseer_fn(self, sch):
        """TaylorSeer sampling (reference's third switch). t2i rides the
        generic N-lane sampler; edit keeps the split-lane structure (uncond
        runs the ref-free program) with one derivative stack per program —
        the reference's three per-branch cache_dic objects driven by one step
        counter (magcache_utils.py:446-521) collapse onto the two programs'
        stacked lanes, all branches sharing the interval schedule."""
        from magcache_tpu.core.taylorseer import (TaylorSeerConfig,
                                                  sample_euler_taylorseer,
                                                  taylor_forecast,
                                                  taylor_update,
                                                  taylorseer_schedule)
        c = self.config
        n = c.num_inference_steps
        ts_cfg = TaylorSeerConfig(num_steps=n, interval=c.taylorseer_interval,
                                  order=c.taylorseer_order,
                                  warmup=c.taylorseer_warmup)
        core, lanes, combine = self.core, self.lanes, self._combine()
        if c.mode != "edit":
            def fn(params, x, cond):
                return sample_euler_taylorseer(
                    core, params, x, cond, timesteps=sch.timesteps,
                    dts=np.diff(sch.sigmas), ts_cfg=ts_cfg, lanes=lanes,
                    combine_fn=combine)
            return fn

        core_nor = self.core_noref
        order = ts_cfg.order
        fresh, x_fc, upd, hist = taylorseer_schedule(ts_cfg)
        ts = jnp.asarray(sch.timesteps.astype(np.float32))
        dts = jnp.asarray(np.diff(sch.sigmas).astype(np.float32))

        def fn(params, x, cond):
            cond_a = {"txt": cond["txt"][jnp.asarray([0, 2])],
                      "ref": jnp.concatenate([cond["ref"]] * 2, axis=0)}
            cond_b = {"txt": cond["txt"][1:2]}
            x2 = jnp.concatenate([x, x], axis=0)
            t0 = ts[:1]
            ra = _init_cache(core, params, x2, t0, cond_a)
            rb = _init_cache(core_nor, params, x, t0, cond_b)
            da0 = jnp.zeros((order + 1,) + ra.shape, ra.dtype)
            db0 = jnp.zeros((order + 1,) + rb.shape, rb.dtype)

            def body(carry, step_in):
                x, da, db = carry
                t, dt, isf, xf, ud, hs, idx = step_in
                x2 = jnp.concatenate([x, x], axis=0)
                ha, ctxa = core.prepare(params, x2,
                                        jnp.full((2,), t, jnp.float32), cond_a)
                hb, ctxb = core_nor.prepare(params, x,
                                            jnp.full((1,), t, jnp.float32),
                                            cond_b)

                def do_fresh(args):
                    ha, hb, da, db = args
                    ta = core.trunk(params, ha, ctxa)
                    tb = core_nor.trunk(params, hb, ctxb)
                    return (ta, tb, taylor_update(da, ta - ha, ud, hs, order),
                            taylor_update(db, tb - hb, ud, hs, order))

                def do_forecast(args):
                    ha, hb, da, db = args
                    return (ha + taylor_forecast(da, xf, order),
                            hb + taylor_forecast(db, xf, order), da, db)

                ha2, hb2, da, db = jax.lax.cond(isf, do_fresh, do_forecast,
                                                (ha, hb, da, db))
                outa = core.head(params, ha2, ctxa)
                outb = core_nor.head(params, hb2, ctxb)
                e = combine((outa[0:1], outb, outa[1:2]), idx)
                x = x + dt.astype(x.dtype) * e.astype(x.dtype)
                return (x, da, db), None

            (x_fin, _, _), _ = jax.lax.scan(
                body, (x, da0, db0),
                (ts, dts, jnp.asarray(fresh), jnp.asarray(x_fc),
                 jnp.asarray(upd), jnp.asarray(hist), jnp.arange(n)))
            return x_fin

        return fn

    def _teacache_fn(self, sch):
        """TeaCache sampling: one accumulator/cache per guidance branch with
        first/last-step forced compute (the reference swaps a TeaCacheParams
        per branch and sets is_first_or_last_step, magcache_utils.py:446-521).
        t2i rides the generic dual-lane sampler; edit keeps the split-lane
        structure with a 2-lane policy on the with-refs program and a 1-lane
        policy on the ref-free one. Signal = the first main layer's
        LuminaRMSNormZero-modulated input (what the published polynomials
        are fitted to)."""
        from magcache_tpu.core.sampler import _cached_trunk
        from magcache_tpu.core.teacache import TeaCacheLanes
        from magcache_tpu.models.omnigen2 import make_teacache_signal

        c = self.config
        n = c.num_inference_steps
        core, lanes, combine = self.core, self.lanes, self._combine()
        signal = make_teacache_signal(self.model_cfg)

        def policy(L):
            return TeaCacheLanes(
                thresh=c.teacache_thresh, coefficients=c.teacache_coeffs,
                ret_steps=L, cutoff_steps=(n - 1) * L, lanes=L,
                signal_fn=signal)

        if c.mode != "edit":
            tea = policy(lanes)

            def fn(params, x, cond):
                return sample_euler(core, params, x, cond,
                                    timesteps=sch.timesteps,
                                    dts=np.diff(sch.sigmas), lanes=lanes,
                                    combine_fn=combine, dynamic_skip=tea)
            return fn

        core_nor = self.core_noref
        tea_a, tea_b = policy(2), policy(1)
        forced_a = jnp.asarray(tea_a.forced_mask(n))
        forced_b = jnp.asarray(tea_b.forced_mask(n))
        ts = jnp.asarray(sch.timesteps.astype(np.float32))
        dts = jnp.asarray(np.diff(sch.sigmas).astype(np.float32))
        rows_a = jnp.asarray([0, 1], jnp.int32)
        rows_b = jnp.asarray([0], jnp.int32)

        def fn(params, x, cond):
            cond_a = {"txt": cond["txt"][jnp.asarray([0, 2])],
                      "ref": jnp.concatenate([cond["ref"]] * 2, axis=0)}
            cond_b = {"txt": cond["txt"][1:2]}
            x2 = jnp.concatenate([x, x], axis=0)
            t0 = ts[:1]
            ca0 = _init_cache(core, params, x2, t0, cond_a)
            cb0 = _init_cache(core_nor, params, x, t0, cond_b)
            sa0 = (jnp.zeros_like(ca0), jnp.zeros((2,), jnp.float32))
            sb0 = (jnp.zeros_like(cb0), jnp.zeros((1,), jnp.float32))

            def body(carry, step_in):
                x, ca, sa, cb, sb = carry
                t, dt, fa, fb, idx = step_in
                x2 = jnp.concatenate([x, x], axis=0)
                ha, ctxa = core.prepare(params, x2,
                                        jnp.full((2,), t, jnp.float32),
                                        cond_a)
                hb, ctxb = core_nor.prepare(params, x,
                                            jnp.full((1,), t, jnp.float32),
                                            cond_b)
                skip_a, sa = tea_a.decide(params, ha, ctxa, sa, fa)
                skip_b, sb = tea_b.decide(params, hb, ctxb, sb, fb)
                ha2, ca, _ = _cached_trunk(core, params, ha, ctxa, ca,
                                           skip_a, rows_a, partial_lanes=2)
                hb2, cb, _ = _cached_trunk(core_nor, params, hb, ctxb, cb,
                                           skip_b, rows_b)
                outa = core.head(params, ha2, ctxa)
                outb = core_nor.head(params, hb2, ctxb)
                e = combine((outa[0:1], outb, outa[1:2]), idx)
                x = x + dt.astype(x.dtype) * e.astype(x.dtype)
                return (x, ca, sa, cb, sb), None

            (x_fin, _, _, _, _), _ = jax.lax.scan(
                body, (x, ca0, sa0, cb0, sb0),
                (ts, dts, forced_a, forced_b, jnp.arange(n)))
            return x_fin

        return fn

    def generate(self, prompt: str,
                 negative_prompt: str = OMNIGEN2_DEFAULT_NEGATIVE,
                 seed: int = 0, ref_latents=None) -> PipelineOutput:
        t0 = time.time()
        gh, gw = self.grid
        pp = self.model_cfg.patch
        c_in = self.model_cfg.in_channels
        # branch conds: cond = full prompt; uncond = negative; ref = image-only
        prompts = {"t2i": [prompt, negative_prompt],
                   "edit": [prompt, negative_prompt, "<ref-image-only>"]}[self.config.mode]
        cond = {"txt": self.text_encoder(prompts)}
        if self.n_refs:
            if ref_latents is None:
                ref_latents = jnp.zeros(
                    (1, self.n_refs, gh * pp, gw * pp, c_in), jnp.float32)
            # one copy: the split-lane sampler batches it onto the cond and
            # ref rows; the uncond forward carries no ref tokens at all
            cond["ref"] = ref_latents
        x0 = jax.random.normal(set_seed(seed),
                               (1, gh * pp, gw * pp, c_in), jnp.float32)
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
