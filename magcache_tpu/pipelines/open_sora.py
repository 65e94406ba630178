"""Open-Sora 1.2 pipeline on STDiT3 + RFLOW, with PAB and MagCache strategies.

Mirrors the reference stack ``VideoSysEngine -> OpenSoraPipeline -> RFLOW ->
STDiT3`` (``videosys/pipelines/open_sora/pipeline_open_sora.py:194-656``,
``scheduling_rflow_open_sora.py:188-253``): CFG runs as a joint batch-of-2
(z_in = [z, z], y = [y, y_null]) so MagCache uses a single cache lane over the
joint batch — exactly the eval harness's configuration
(``eval/magcache/experiments/opensora.py:229-373``, E=0.12 K=3 skip_time=6).
PAB is the alternative cache (``videosys/core/pab_mgr.py``); both compile into
the same scanned loop.

Conditioning parity (round 3):
- prompt preprocessing: JSON extraction, per-loop ``|0|...`` segments,
  aesthetic/motion/camera score appending, twice-applied T5 caption cleaning
  (``pipeline_open_sora.py:532-605`` — helpers in ``open_sora_cond``);
- multi-resolution info: bucketed (resolution, aspect_ratio) sizes, fps with
  the IMG_FPS single-frame rule, pos-embed scale/base_size normalization
  (``data_process.py:791-807``, ``open_sora_transformer_3d.py:528-533``);
- masked-frame conditioning (i2v/v2v/extend): mask_strategy parsing, reference
  pasting, per-step re-noising + t0-modulation in the sampler
  (``pipeline_open_sora.py:797-871``, ``scheduling_rflow_open_sora.py:215-255``
  — device loop in ``core.sampler.sample_rflow_masked``);
- looped generation with condition-frame hand-off (``append_generated``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.pab import OPEN_SORA_PAB, PABConfig
from magcache_tpu.core.presets import make_config
from magcache_tpu.core.sampler import sample_euler, sample_rflow_masked
from magcache_tpu.models.stdit3 import (
    STDiT3Config,
    init_stdit3_params,
    make_stdit3_core,
)
from magcache_tpu.models.text import MockTextEncoder, TextEncoder
from magcache_tpu.pipelines import open_sora_cond as oc
from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput
from magcache_tpu.schedulers.rflow import RFlowSchedule
from magcache_tpu.utils.misc import set_seed


@dataclasses.dataclass
class OpenSoraPipelineConfig:
    num_frames: int = 51
    height: int = 480
    width: int = 848
    # named bucket selection (reference generate() args); when set these
    # override height/width via the training bucket tables
    resolution: Optional[str] = None          # "480p", "720p", ...
    aspect_ratio: Optional[str] = None        # "9:16", "16:9", ...
    num_sampling_steps: int = 30
    cfg_scale: float = 7.0
    caption_len: int = 300
    fps: int = 24
    use_timestep_transform: bool = True
    # acceleration strategies (mutually composable in principle; the reference
    # evaluates them separately)
    use_magcache: bool = False
    # full-compute magnitude-stat recording on the RFLOW trajectory (the
    # eval calibrations' path); plain t2v loop only (no mask strategy)
    magcache_calibration: bool = False
    magcache_thresh: Optional[float] = None
    magcache_K: Optional[int] = None
    retention_ratio: Optional[float] = None
    # recorded calibration feedback (the calibration output's norm_ratio
    # list, joint single-lane, num_steps-1 entries); None = published table
    magcache_ratios: Optional[tuple] = None
    # "adapter" = the published opensora-v1.2 preset rule; "rolling" = the
    # eval scripts' exact single-lane variant (ratio[t-1], non-abs error,
    # experiments/opensora.py:296-312)
    cache_policy: str = "adapter"
    enable_pab: bool = False
    pab_config: PABConfig = OPEN_SORA_PAB
    dtype: str = "float32"
    tiny: bool = False
    ckpt_dir: Optional[str] = None   # published transformer checkpoint dir

    def __post_init__(self):
        if self.resolution is not None:
            ar = self.aspect_ratio or "9:16"
            self.height, self.width = oc.get_image_size(self.resolution, ar)
        self.num_frames = oc.get_num_frames(self.num_frames)

    def model_config(self) -> STDiT3Config:
        if self.tiny:
            return STDiT3Config.tiny(dtype=self.dtype)
        return STDiT3Config(dtype=self.dtype)

    @property
    def pipeline_cls(self):
        return OpenSoraPipeline


class OpenSoraPipeline(BasePipeline):
    def __init__(self, config: OpenSoraPipelineConfig,
                 text_encoder: Optional[TextEncoder] = None, params=None,
                 vae=None, key: Optional[jax.Array] = None):
        self.config = config
        self.model_cfg = config.model_config()
        c = config
        # OpenSora VAE: spatial x8; temporal x4 PER 17-frame micro chunk
        # (ceil within each chunk — get_latent_size), so 51 frames -> 15
        # latents, matching the composite MicroFrameVAE's round-trip
        lat_t = oc.get_latent_t(c.num_frames)
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
            timesteps=self.schedule.timesteps,
            pixel_size=(c.height, c.width))
        self.text_encoder = text_encoder or MockTextEncoder(
            c.caption_len, self.model_cfg.caption_dim, scale=0.5)
        key = key if key is not None else jax.random.PRNGKey(0)
        if params is None and getattr(c, 'ckpt_dir', None):
            from magcache_tpu.models.convert import load_stdit3_checkpoint
            params = load_stdit3_checkpoint(c.ckpt_dir, self.model_cfg)
        self.params = params if params is not None else init_stdit3_params(
            key, self.model_cfg)
        self._fn = {}         # keyed on record_skips (like flux/wan)
        self._fn_masked = {}

    def _cache_cfg(self):
        c = self.config
        if not c.use_magcache or c.magcache_calibration:
            return None
        if c.cache_policy == "rolling":
            from magcache_tpu.core.rolling import RollingCacheConfig
            st = None
            if c.retention_ratio is not None:
                st = int(c.num_sampling_steps * c.retention_ratio)
            return RollingCacheConfig.opensora(
                c.num_sampling_steps,
                thresh=(0.12 if c.magcache_thresh is None
                        else c.magcache_thresh),
                K=(3 if c.magcache_K is None else c.magcache_K),
                skip_time=st)
        assert c.cache_policy == "adapter", c.cache_policy
        # single-lane over the joint CFG batch (experiments/opensora.py:420-433)
        return make_config("opensora-v1.2", c.num_sampling_steps,
                           thresh=c.magcache_thresh, K=c.magcache_K,
                           retention_ratio=c.retention_ratio,
                           ratios=c.magcache_ratios)

    def _cache_cfg_force(self, thresh=None, K=None, retention=None):
        """Adapter-policy cache config regardless of use_magcache — the lane
        structure for per-request override scheduling."""
        c = self.config
        return make_config(
            "opensora-v1.2", c.num_sampling_steps,
            thresh=c.magcache_thresh if thresh is None else thresh,
            K=c.magcache_K if K is None else K,
            retention_ratio=(c.retention_ratio if retention is None
                             else retention),
            ratios=c.magcache_ratios)

    # ---- one-program-many-schedules (serving overrides) -------------------
    def skip_mask_for(self, thresh=None, K=None, retention_ratio=None,
                      use_magcache: bool = True) -> np.ndarray:
        """Host-precompute the ``bool[steps, 1]`` skip mask for an E/K/R
        triple (single cache lane over the joint CFG batch); feed it to
        ``generate(skip_override=...)``."""
        return self._skip_mask_from_cfg(
            self._cache_cfg_force(thresh, K, retention_ratio), use_magcache)

    def _sample_fn_override(self):
        """Jitted plain-t2v sampler taking the skip mask as a TRACED
        argument — one compiled executable serves every E/K/R triple."""
        if "override" in self._fn:
            return self._fn["override"]
        sch = self.schedule
        dts = np.array([sch.dt(i) for i in range(sch.num_steps)], np.float32)
        cache_cfg = self._cache_cfg_force()
        core, combine = self.core, self._combine()

        def fn(params, z, cond, skips):
            return sample_euler(core, params, z, cond,
                                timesteps=sch.timesteps, dts=dts,
                                cache_cfg=cache_cfg, lanes=2,
                                combine_fn=combine,
                                skip_mask_override=skips)

        self._fn["override"] = jax.jit(fn)
        return self._fn["override"]

    def _combine(self):
        g = self.config.cfg_scale
        C = self.model_cfg.in_channels

        def combine(chunks):
            # model predicts 2C channels; RFLOW takes the first C
            # (scheduling_rflow_open_sora.py:242-247: pred.chunk(2, dim=1)[0])
            cond_o = chunks[0][..., :C]
            uncond_o = chunks[1][..., :C]
            return uncond_o + g * (cond_o - uncond_o)

        return combine

    def _sample_fn(self):
        rs = bool(getattr(self, "record_skips", False))
        if rs in self._fn:
            return self._fn[rs]
        c = self.config
        sch = self.schedule
        dts = np.array([sch.dt(i) for i in range(sch.num_steps)], np.float32)
        cache_cfg = self._cache_cfg()
        core, combine = self.core, self._combine()

        def fn(params, z, cond):
            # joint batch of 2 rides the row axis through a single forward
            return sample_euler(core, params, z, cond, timesteps=sch.timesteps,
                                dts=dts, cache_cfg=cache_cfg, lanes=2,
                                combine_fn=combine, return_skips=rs,
                                calibrate=c.magcache_calibration,
                                calibrate_lanes=1)

        self._fn[rs] = jax.jit(fn)
        return self._fn[rs]

    def _sample_fn_masked(self):
        rs = bool(getattr(self, "record_skips", False))
        if rs in self._fn_masked:
            return self._fn_masked[rs]
        c = self.config
        sch = self.schedule
        dts = np.array([sch.dt(i) for i in range(sch.num_steps)], np.float32)
        cache_cfg = self._cache_cfg()
        core, combine = self.core, self._combine()
        ntt = sch.num_train_timesteps

        def fn(params, z, cond, mask, noise_key):
            return sample_rflow_masked(
                core, params, z, cond, timesteps=sch.timesteps, dts=dts,
                num_train_timesteps=ntt, mask=mask, noise_key=noise_key,
                lanes=2, combine_fn=combine, cache_cfg=cache_cfg,
                return_skips=rs)

        self._fn_masked[rs] = jax.jit(fn)
        return self._fn_masked[rs]

    # ---- reference collection -------------------------------------------
    def _collect_references(self, reference_paths: List[Optional[str]]
                            ) -> List[list]:
        """Per-batch lists of reference latents [T, H, W, C]
        (``pipeline_open_sora.py:736-751``). Accepts ``.npy`` latent files
        directly; image/video files are decoded with PIL and encoded through
        the pipeline VAE (requires ``vae``)."""
        refs_x = []
        for reference_path in reference_paths:
            if not reference_path:
                refs_x.append([])
                continue
            ref = []
            for r_path in reference_path.split(";"):
                if r_path.endswith(".npy"):
                    lat = np.asarray(np.load(r_path), np.float32)
                    assert lat.ndim == 4, "latent refs are [T, H, W, C]"
                else:
                    # image OR video file, reference resize_crop transform
                    # (data_process.py:742-779 via read_from_path)
                    frames = oc.read_from_path(
                        r_path, (self.config.height, self.config.width))
                    assert self.vae is not None, (
                        "image/video references need the pipeline VAE")
                    lat = np.asarray(self.vae.encode(
                        frames[None]))                 # [1, T', H, W, C]
                    lat = lat[0]
                ref.append(lat)
            refs_x.append(ref)
        return refs_x

    # ---- generation ------------------------------------------------------
    def generate(self, prompt: str, negative_prompt: str = "", seed: int = 0,
                 loop: int = 1, ms: str = "", refs: str = "",
                 aes: Optional[float] = 6.5, flow: Optional[float] = None,
                 camera_motion: Optional[str] = None,
                 condition_frame_length: int = 5, align: int = 5,
                 condition_frame_edit: float = 0.0,
                 use_text_preprocessing: bool = True,
                 skip_override: Optional[np.ndarray] = None
                 ) -> PipelineOutput:
        """Full reference surface (``pipeline_open_sora.py:426-656``): score
        appending + caption cleaning, mask-strategy conditioning, looped
        generation with condition-frame hand-off.

        Without ``ms``/``refs``/``loop>1`` this is the plain t2v path (one
        jitted cached scan). With them, the masked sampler re-noises
        conditioning frames per step. Loop hand-off conditions on the previous
        clip's *latents* directly (the reference re-encodes decoded video —
        equivalent up to a VAE round-trip, and one less decode/encode pair)."""
        t0 = time.time()
        c = self.config
        rs = bool(getattr(self, "record_skips", False))

        batch_prompts, refs_l, ms_l = oc.extract_json_from_prompts(
            [prompt], [refs], [ms])
        refs_x = self._collect_references(refs_l)

        # prompt segments -> scores -> T5 cleaning -> merged loop prompt
        seg_lists, loop_idxs = [], []
        for p in batch_prompts:
            segs, idxs = oc.split_prompt(p)
            segs = oc.append_score_to_prompts(segs, aes=aes, flow=flow,
                                              camera_motion=camera_motion)
            segs = [oc.text_preprocessing(s, use_text_preprocessing)
                    for s in segs]
            seg_lists.append(segs)
            loop_idxs.append(idxs)
        batch_prompts = [oc.merge_prompt(s, i)
                         for s, i in zip(seg_lists, loop_idxs)]

        key = set_seed(seed)
        clips: List[np.ndarray] = []
        all_skips: List[np.ndarray] = []
        for loop_i in range(loop):
            prompts_loop = oc.extract_prompts_loop(batch_prompts, loop_i)
            if loop_i > 0:
                refs_x, ms_l = oc.append_generated(
                    None, [clips[-1][0]], refs_x, ms_l, loop_i,
                    condition_frame_length, condition_frame_edit)

            y = self.text_encoder([prompts_loop[0], negative_prompt])
            fps = float(c.fps if self.latent_shape[0] > 1 else oc.IMG_FPS)
            cond = {"y": y, "fps": jnp.full((2,), fps, jnp.float32)}

            key, zkey, nkey = jax.random.split(key, 3)
            z = np.array(jax.random.normal(
                zkey, (1,) + self.latent_shape, jnp.float32))  # writable copy
            masks = oc.apply_mask_strategy(z, refs_x, ms_l, loop_i,
                                           align=align)
            if masks is not None and (masks >= 1.0).all():
                # all-ones mask is exactly the plain CFG loop: the reference
                # pre-marks mask==1 frames as noise_added (never re-noised,
                # never reverted, x_mask all-True == regular modulation) and
                # denoises whatever apply_mask_strategy pasted into z as the
                # current sample — which the static scan does too, on the
                # same (already-pasted) z. Routing there keeps the cheaper
                # compiled program; edit_ratio=1.0 pastes stay honored.
                masks = None
            assert not (self.config.magcache_calibration
                        and masks is not None), (
                "calibration records the plain t2v trajectory; drop the "
                "mask strategy / loop conditioning")
            if skip_override is not None:
                assert masks is None and not c.magcache_calibration, (
                    "skip_override covers the plain t2v path (no mask "
                    "strategy / calibration)")
                out = self._sample_fn_override()(
                    self.params, jnp.asarray(z), cond,
                    jnp.asarray(skip_override, bool))
            elif masks is None:
                out = self._sample_fn()(self.params, jnp.asarray(z), cond)
            else:
                out = self._sample_fn_masked()(
                    self.params, jnp.asarray(z), cond,
                    jnp.asarray(masks, jnp.float32), nkey)
            if self.config.magcache_calibration:
                out, cal_stats = out
            elif skip_override is not None:
                if rs:
                    all_skips.append(
                        np.asarray(skip_override, bool).reshape(-1))
            elif rs:
                out, sk = out
                all_skips.append(np.asarray(jax.device_get(sk)))
            out.block_until_ready()
            clips.append(np.asarray(out))

        # trim each follow-on clip's conditioning frames, then concat in time
        # (:640-642; the reference trims decoded video via dframe_to_frame
        # [latent//5*17 frames] — trimming in latent space before one joint
        # decode is the equivalent here)
        for i in range(1, loop):
            clips[i] = clips[i][:, condition_frame_length:]
        latents = jnp.asarray(np.concatenate(clips, axis=1))

        video = None
        if self.vae is not None:
            video = np.asarray(self.vae.decode(latents))
        calibration = None
        if self.config.magcache_calibration:
            from magcache_tpu.pipelines.base import calibration_dict
            calibration = calibration_dict(cal_stats)
        return PipelineOutput(latents=latents, video=video,
                              calibration=calibration,
                              skips=(np.stack(all_skips) if rs else None),
                              timings={"total_s": time.time() - t0})
