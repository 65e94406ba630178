"""FramePack streaming long-video pipeline: sectioned autoregressive sampling
with per-section MagCache reset.

Behavioral contract from ``MagCache4FramePack/magcache_demo_gradio.py``:

- video is produced in fixed-window sections (``latent_window_size`` latents
  ≈ window*4 frames each), autoregressively conditioned on history
  (``worker`` :413-635, section schedule :497-505);
- MagCache is (re-)installed per section with ``num_steps = steps`` and its
  state resets whenever ``cnt == 0`` (:252-256) — residuals never leak across
  sections;
- the per-section skip rule is the FramePack variant: err<=E, K, plus the
  ``|1 - ratio[cnt]| <= 0.06`` guard (:265), E=0.1 K=3 R=0.2 defaults;
- sections decode incrementally (streaming preview, :591-623).

TPU design: the **outer section loop stays in Python on the host** (section
count is small and data-dependent in the UI; each section's sampler is the
same jitted program, so there is exactly one compile), and the cache is a
fresh scan carry per section — the reset semantics fall out of the functional
design instead of needing the reference's cnt-wraparound bookkeeping.

The denoiser is the HunyuanVideo MMDiT (FramePack's transformer is the
HY variant); history conditioning enters as extra context tokens
(`history_tokens` in cond) — the packed clean-latent pyramid of the reference
maps onto this hook when real weights are ingested.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.presets import make_config
from magcache_tpu.core.sampler import sample_euler
from magcache_tpu.models.hunyuan import (
    HunyuanConfig,
    init_hunyuan_params,
    make_hunyuan_core,
)
from magcache_tpu.models.text import MockPooledEncoder, MockTextEncoder, TextEncoder
from magcache_tpu.pipelines.base import BasePipeline, PipelineOutput
from magcache_tpu.schedulers.flow_match import FlowMatchSchedule
from magcache_tpu.utils.misc import set_seed


@dataclasses.dataclass
class FramePackPipelineConfig:
    model: str = "framepack"              # framepack | framepack-f1
    height: int = 512
    width: int = 512
    latent_window_size: int = 9           # latents per section
    history_frames: int = 2               # flat-history mode conditioning
    pyramid: bool = True                  # clean-latent pyramid (reference)
    total_sections: int = 5
    steps: int = 25
    guidance: float = 10.0                # embedded (distilled) cfg scale
    flow_shift: float = 7.0               # hyvideo --flow-shift default
    txt_len: int = 64
    use_magcache: bool = False
    magcache_thresh: Optional[float] = None
    magcache_K: Optional[int] = None
    retention_ratio: Optional[float] = None
    # TeaCache toggle (mutually exclusive with use_magcache, the gradio UI's
    # checkbox pair, magcache_demo_gradio.py:30-52); resets per section like
    # MagCache (fresh policy state each section scan)
    use_teacache: bool = False
    teacache_thresh: Optional[float] = None   # None -> FramePack default 0.15
    # full-compute run recording per-step magnitude stats, per section (the
    # reference patches `magcache_calibration` into the same forward:
    # magcache_sample_video.py:349 comment / magcache_demo_gradio.py)
    magcache_calibration: bool = False
    dtype: str = "float32"
    tiny: bool = False
    ckpt_dir: Optional[str] = None   # published transformer checkpoint dir

    def model_config(self) -> HunyuanConfig:
        if self.tiny:
            return HunyuanConfig.tiny(dtype=self.dtype,
                                      framepack=self.pyramid)
        return HunyuanConfig(dtype=self.dtype, framepack=self.pyramid)

    @property
    def pipeline_cls(self):
        return FramePackPipeline



class FramePackPipeline(BasePipeline):
    def __init__(self, config: FramePackPipelineConfig,
                 text_encoder: Optional[TextEncoder] = None,
                 pooled_encoder=None, params=None,
                 vae=None, key: Optional[jax.Array] = None):
        self.config = config
        self.vae = vae
        self.model_cfg = config.model_config()
        c = config
        self.grid = (c.latent_window_size, c.height // 16, c.width // 16)
        self.lat_shape = (c.latent_window_size,
                          (c.height // 16) * 2, (c.width // 16) * 2,
                          self.model_cfg.in_channels)
        if not c.pyramid:
            self.core = make_hunyuan_core(self.model_cfg, c.txt_len, self.grid,
                                          history_frames=c.history_frames)
        else:
            assert c.height % 64 == 0 and c.width % 64 == 0, (
                "pyramid mode needs height/width divisible by 64 (the 4x "
                "clean-latent level patchifies (4, 8, 8) over the latent grid)")
            self.core = None  # built per distinct section padding
        self.text_encoder = text_encoder or MockTextEncoder(
            c.txt_len, self.model_cfg.text_dim, scale=0.5)
        self.pooled_encoder = pooled_encoder or MockPooledEncoder(
            self.model_cfg.vec_dim)
        key = key if key is not None else jax.random.PRNGKey(0)
        if params is None and getattr(c, 'ckpt_dir', None):
            from magcache_tpu.models.convert import load_hunyuan_checkpoint
            params = load_hunyuan_checkpoint(c.ckpt_dir, self.model_cfg)
        self.params = params if params is not None else init_hunyuan_params(
            key, self.model_cfg)
        self._section_fn = None

    def _sample_section(self, pad: Optional[int] = None,
                        with_prev: bool = False):
        """One jitted per-section sampler; reused across sections with the
        same timeline padding (fresh cache carry each call == the reference's
        per-section reset). In pyramid mode each distinct ``pad`` value gets
        its own compiled program (the padding schedule uses at most 4).
        ``with_prev``: calibration-mode variant taking the previous section's
        final residual as a fourth argument."""
        rs = (bool(getattr(self, "record_skips", False))
              and not self.config.magcache_calibration)
        if self._section_fn is None:
            self._section_fn = {}
        if (pad, rs, with_prev) in self._section_fn:
            return self._section_fn[(pad, rs, with_prev)]
        c = self.config
        sch = FlowMatchSchedule.create(c.steps, shift=c.flow_shift)
        dts = np.diff(sch.sigmas)
        cache_cfg = None
        tea = None
        if c.use_magcache and c.use_teacache:
            raise ValueError("use_magcache and use_teacache are mutually "
                             "exclusive (magcache_demo_gradio.py:30-52)")
        if c.use_magcache:
            cache_cfg = make_config(c.model, c.steps,
                                    thresh=c.magcache_thresh, K=c.magcache_K,
                                    retention_ratio=c.retention_ratio)
        elif c.use_teacache:
            from magcache_tpu.core.teacache import (FRAMEPACK_TEA_COEFFS,
                                                    FRAMEPACK_TEA_THRESH,
                                                    TeaCacheLanes)
            from magcache_tpu.models.flux import first_block_modulated
            # single lane; forced compute on the first and last step (the
            # packed-transformer teacache rule); signal = the first double
            # block's AdaLN-modulated input, which the published FramePack
            # coefficients were fitted to
            tea = TeaCacheLanes(
                thresh=(c.teacache_thresh if c.teacache_thresh is not None
                        else FRAMEPACK_TEA_THRESH),
                coefficients=FRAMEPACK_TEA_COEFFS,
                ret_steps=1, cutoff_steps=c.steps - 1, lanes=1,
                signal_fn=first_block_modulated)
        if pad is None:
            core = self.core
        else:
            core = make_hunyuan_core(
                self.model_cfg, c.txt_len, self.grid, framepack_pad=pad,
                framepack_order="f1" if c.model.endswith("f1") else "padded")

        if c.magcache_calibration:
            from magcache_tpu.core.sampler import calibrate_euler

            if with_prev:
                # sections after the first carry the previous section's final
                # residual in, so the cross-section boundary ratio is recorded
                # (the reference's class-level lists run one continuous cnt
                # across the whole sampling call)
                def fn(params, x, cond, prev):
                    return calibrate_euler(core, params, x, cond,
                                           timesteps=sch.timesteps, dts=dts,
                                           lanes=1, prev_residual=prev,
                                           return_residual=True)
            else:
                def fn(params, x, cond):
                    return calibrate_euler(core, params, x, cond,
                                           timesteps=sch.timesteps, dts=dts,
                                           lanes=1, return_residual=True)
        else:
            def fn(params, x, cond):
                return sample_euler(core, params, x, cond,
                                    timesteps=sch.timesteps, dts=dts,
                                    cache_cfg=cache_cfg, dynamic_skip=tea,
                                    return_skips=rs)

        self._section_fn[(pad, rs, with_prev)] = jax.jit(fn)
        return self._section_fn[(pad, rs, with_prev)]

    def generate(self, prompt: str, seed: int = 31337, on_section=None,
                 start_latent=None) -> PipelineOutput:
        """Run the section loop; ``on_section(i, latents)`` streams each
        finished section (the reference's incremental preview callback).

        Each section conditions on the last ``history_frames`` clean latents
        (FramePack's clean-latent inputs); ``start_latent`` seeds the first
        section's history (i2v)."""
        t0 = time.time()
        c = self.config
        base_cond = {
            "txt": self.text_encoder([prompt]),
            "vec": self.pooled_encoder([prompt]),
            "guidance": jnp.full((1,), c.guidance, jnp.float32),
        }
        history: List[np.ndarray] = []
        rs = (bool(getattr(self, "record_skips", False))
              and not c.magcache_calibration)
        sec_skips: List[np.ndarray] = []

        sec_stats: List[np.ndarray] = []
        prev_resid: List = [None]   # residual carry across sections

        def _run(pad, x0, cond):
            if c.magcache_calibration:
                # sections after the first record the cross-section boundary
                # ratio via the residual carry (one continuous cnt, the
                # reference's class-level calibration lists)
                wp = prev_resid[0] is not None
                fn = self._sample_section(pad, with_prev=wp)
                if wp:
                    out, stats, resid = fn(self.params, x0, cond,
                                           prev_resid[0])
                else:
                    out, stats, resid = fn(self.params, x0, cond)
                prev_resid[0] = resid
                sec_stats.append(np.asarray(jax.device_get(stats)))
            else:
                out = self._sample_section(pad)(self.params, x0, cond)
                if rs:
                    out, sk = out
                    sec_skips.append(np.asarray(jax.device_get(sk)))
            out.block_until_ready()
            return out

        key = set_seed(seed)
        hw = self.lat_shape[1:]
        if c.pyramid and c.model.endswith("f1"):
            # FramePack-F1 (magcache_demo_gradio_f1.py:493-547): forward
            # generation; history = [zeros(16+2+1); start; ...generated],
            # each section conditions on the TAIL [4x(16); 2x(2); 1x(1)] and
            # appends. One layout -> one compiled program.
            start = (start_latent[:, None] if start_latent is not None
                     else jnp.zeros((1, 1) + hw, jnp.float32))
            hbuf = jnp.concatenate(
                [jnp.zeros((1, 16 + 2 + 1) + hw, jnp.float32), start], axis=1)
            for s in range(c.total_sections):
                key, sub = jax.random.split(key)
                x0 = jax.random.normal(sub, (1,) + self.lat_shape, jnp.float32)
                tail = hbuf[:, -19:]
                c4x, c2x, c1x = tail[:, :16], tail[:, 16:18], tail[:, 18:19]
                cond = dict(base_cond)
                cond["clean"] = jnp.concatenate([start, c1x], axis=1)
                cond["clean_2x"] = c2x
                cond["clean_4x"] = c4x
                lat = _run(0, x0, cond)
                hbuf = jnp.concatenate([hbuf, lat], axis=1)
                sec = np.asarray(lat)
                history.append(sec)
                if on_section is not None:
                    on_section(s, sec)
        elif c.pyramid:
            # reference buffer + padding schedule (magcache_demo_gradio.py:
            # 493-522): history = [post(1); 2x(2); 4x(16); ...generated],
            # sections run back-to-front with paddings reversed(range(n))
            # (or the >4-section repetition trick).
            n = c.total_sections
            paddings = (list(reversed(range(n))) if n <= 4
                        else [3] + [2] * (n - 3) + [1, 0])
            start = (start_latent[:, None] if start_latent is not None
                     else jnp.zeros((1, 1) + hw, jnp.float32))
            hbuf = jnp.zeros((1, 1 + 2 + 16) + hw, jnp.float32)
            for s, pad in enumerate(paddings):
                key, sub = jax.random.split(key)
                x0 = jax.random.normal(sub, (1,) + self.lat_shape, jnp.float32)
                post, c2x, c4x = hbuf[:, :1], hbuf[:, 1:3], hbuf[:, 3:19]
                cond = dict(base_cond)
                cond["clean"] = jnp.concatenate([start, post], axis=1)
                cond["clean_2x"] = c2x
                cond["clean_4x"] = c4x
                lat = _run(pad, x0, cond)
                if pad == 0:  # last section: prepend the start latent
                    lat = jnp.concatenate([start, lat], axis=1)
                hbuf = jnp.concatenate([lat, hbuf], axis=1)
                sec = np.asarray(lat)
                history.insert(0, sec)   # sections generate back-to-front
                if on_section is not None:
                    on_section(s, sec)
        else:
            hf = c.history_frames
            hist_shape = (1, hf) + hw
            if start_latent is not None:
                hbuf = jnp.broadcast_to(start_latent[:, None], hist_shape)
            else:
                hbuf = jnp.zeros(hist_shape, jnp.float32)
            for s in range(c.total_sections):
                key, sub = jax.random.split(key)
                x0 = jax.random.normal(sub, (1,) + self.lat_shape, jnp.float32)
                cond = dict(base_cond)
                if hf:
                    cond["history"] = hbuf
                lat = _run(None, x0, cond)
                if hf:
                    hbuf = lat[:, -hf:]
                sec = np.asarray(lat)
                history.append(sec)
                if on_section is not None:
                    on_section(s, sec)
        full = jnp.asarray(np.concatenate(history, axis=1))
        calibration = None
        if c.magcache_calibration:
            from magcache_tpu.pipelines.base import calibration_dict
            # sections run the same patched forward back to back; the
            # reference's class-level lists accumulate across sections
            calibration = calibration_dict(np.concatenate(sec_stats, axis=0))
        return PipelineOutput(latents=full, calibration=calibration,
                              timings={"total_s": time.time() - t0,
                                       "sections": c.total_sections},
                              skips=(np.stack(sec_skips) if rs else None))
