"""Adapter-family pipelines: Qwen-Image, OmniGen2 (3-branch), FramePack."""

import jax
import numpy as np
import pytest

from magcache_tpu.core.magcache import compute_skip_schedule
from magcache_tpu.pipelines.framepack import FramePackPipeline, FramePackPipelineConfig
from magcache_tpu.pipelines.omnigen2 import (
    OmniGen2Pipeline,
    OmniGen2PipelineConfig,
    make_omnigen2_cache_config,
)
from magcache_tpu.pipelines.qwen_image import QwenImagePipeline, QwenImagePipelineConfig


def test_qwen_image_pipeline_magcache():
    cfg = QwenImagePipelineConfig(tiny=True, height=64, width=64, txt_len=8,
                                  sample_steps=6, use_magcache=True,
                                  dtype="float32")
    pipe = QwenImagePipeline(cfg)
    out = pipe.generate("a castle", seed=0)
    assert out.latents.shape == (1, 16, 16)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_qwen_image_calibration():
    cfg = QwenImagePipelineConfig(tiny=True, height=64, width=64, txt_len=8,
                                  sample_steps=4, magcache_calibration=True,
                                  dtype="float32")
    out = QwenImagePipeline(cfg).generate("a castle")
    assert len(out.calibration["norm_ratio"]) == 3 * 2  # (steps-1)*lanes


def test_omnigen2_cache_config_interleave():
    cfg = make_omnigen2_cache_config("edit", 10)
    assert cfg.lanes == 3 and cfg.num_steps == 30
    sched = compute_skip_schedule(cfg)
    assert len(sched) == 30
    # branch arrays differ, so lanes may diverge; schedule must respect K per lane
    for lane in range(3):
        run = 0
        for s in sched[lane::3]:
            run = run + 1 if s else 0
            assert run <= cfg.max_consecutive_skips


def test_omnigen2_pipeline_3branch():
    cfg = OmniGen2PipelineConfig(mode="edit", tiny=True, height=64, width=64,
                                 txt_len=8, num_inference_steps=6,
                                 use_magcache=True, dtype="float32")
    pipe = OmniGen2Pipeline(cfg)
    out = pipe.generate("make the cat orange", seed=0)
    # true decoder emits the latent image [B, H/8, W/8, C] (FLUX-VAE layout)
    assert out.latents.shape == (1, 8, 8, 16)
    assert np.isfinite(np.asarray(out.latents)).all()

    # a reference image must influence the edit output through the ref branch
    import jax.numpy as jnp
    ref = jnp.ones((1, 1, 8, 8, 16), jnp.float32) * 0.3
    out_ref = pipe.generate("make the cat orange", seed=0, ref_latents=ref)
    assert np.abs(np.asarray(out_ref.latents)
                  - np.asarray(out.latents)).max() > 1e-6


def test_omnigen2_t2i_two_lane():
    cfg = OmniGen2PipelineConfig(mode="t2i", tiny=True, height=64, width=64,
                                 txt_len=8, num_inference_steps=4,
                                 use_magcache=True, dtype="float32")
    out = OmniGen2Pipeline(cfg).generate("a fox")
    assert np.isfinite(np.asarray(out.latents)).all()


def test_framepack_sections_and_streaming():
    cfg = FramePackPipelineConfig(tiny=True, height=32, width=32,
                                  latent_window_size=2, total_sections=3,
                                  steps=4, txt_len=8, use_magcache=True,
                                  pyramid=False, dtype="float32")
    pipe = FramePackPipeline(cfg)
    seen = []
    out = pipe.generate("a river", seed=0, on_section=lambda i, lat: seen.append(i))
    assert seen == [0, 1, 2]
    # 3 sections x window 2 latents
    assert out.latents.shape[1] == 6
    assert np.isfinite(np.asarray(out.latents)).all()
    assert out.timings["sections"] == 3


def test_framepack_magcache_schedule_has_guard():
    from magcache_tpu.core.presets import make_config
    cfg = make_config("framepack", 25)
    assert cfg.max_ratio_deviation == 0.06
    assert compute_skip_schedule(cfg).sum() > 0


def test_framepack_pyramid_sections():
    """Pyramid mode: reference buffer layout [post(1); 2x(2); 4x(16)],
    back-to-front sections with the reversed padding schedule, start latent
    prepended on the final section (magcache_demo_gradio.py:493-522)."""
    cfg = FramePackPipelineConfig(tiny=True, height=64, width=64,
                                  latent_window_size=2, total_sections=3,
                                  steps=2, txt_len=8, use_magcache=True,
                                  dtype="float32")
    pipe = FramePackPipeline(cfg)
    import jax.numpy as jnp
    start = jnp.ones((1,) + pipe.lat_shape[1:], jnp.float32) * 0.2
    seen = []
    out = pipe.generate("a river", seed=0, start_latent=start,
                        on_section=lambda i, lat: seen.append(lat.shape[1]))
    assert seen == [2, 2, 3]            # last section prepends start latent
    assert out.latents.shape[1] == 2 + 2 + 3
    assert np.isfinite(np.asarray(out.latents)).all()

    # start latent must influence the output through the clean branch
    out2 = pipe.generate("a river", seed=0, start_latent=start * 5.0)
    assert np.abs(np.asarray(out2.latents) - np.asarray(out.latents)).max() > 1e-6


def test_framepack_history_conditions_output():
    """Changing the clean-latent history must change the section output
    (proves the conditioning tokens reach attention)."""
    import jax.numpy as jnp
    cfg = FramePackPipelineConfig(tiny=True, height=32, width=32,
                                  latent_window_size=2, history_frames=2,
                                  total_sections=1, steps=2, txt_len=8,
                                  pyramid=False, dtype="float32")
    pipe = FramePackPipeline(cfg)
    a = pipe.generate("a river", seed=0)
    start = jnp.ones((1,) + pipe.lat_shape[1:], jnp.float32) * 3.0
    b = pipe.generate("a river", seed=0, start_latent=start)
    assert np.abs(np.asarray(a.latents) - np.asarray(b.latents)).max() > 1e-4


def test_qwen_image_edit_ref_tokens():
    """Edit mode: reference-image tokens condition the output."""
    import jax.numpy as jnp
    cfg = QwenImagePipelineConfig(model="qwen-image-edit", tiny=True,
                                  height=64, width=64, txt_len=8,
                                  sample_steps=4, use_magcache=True,
                                  dtype="float32")
    pipe = QwenImagePipeline(cfg)
    a = pipe.generate("remove the hat", seed=0)
    ref = jnp.ones((1, 16, pipe.model_cfg.in_channels), jnp.float32)
    b = pipe.generate("remove the hat", seed=0, ref_latents=ref)
    assert a.latents.shape == (1, 16, pipe.model_cfg.in_channels)
    assert np.abs(np.asarray(a.latents) - np.asarray(b.latents)).max() > 1e-4


def test_framepack_f1_forward_sections():
    """F1 variant: forward generation, tail-conditioned [4x;2x;1x] buffer,
    start latent in the clean pair (magcache_demo_gradio_f1.py:493-547)."""
    import jax.numpy as jnp
    cfg = FramePackPipelineConfig(model="framepack-f1", tiny=True, height=64,
                                  width=64, latent_window_size=2,
                                  total_sections=3, steps=2, txt_len=8,
                                  use_magcache=True, dtype="float32")
    pipe = FramePackPipeline(cfg)
    start = jnp.ones((1,) + pipe.lat_shape[1:], jnp.float32) * 0.1
    seen = []
    out = pipe.generate("waves", seed=0, start_latent=start,
                        on_section=lambda i, lat: seen.append(lat.shape[1]))
    assert seen == [2, 2, 2]
    assert out.latents.shape[1] == 6
    assert np.isfinite(np.asarray(out.latents)).all()
