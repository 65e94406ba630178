"""Pipeline + Engine API tests at tiny sizes (checkpoint-free)."""

import numpy as np
import pytest

from magcache_tpu.core.engine import Engine
from magcache_tpu.pipelines.flux import FluxPipeline, FluxPipelineConfig
from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig


def _wan_cfg(**kw):
    base = dict(tiny=True, size=(64, 32), frame_num=9, sample_steps=4,
                sample_solver="euler", dtype="float32")
    base.update(kw)
    return WanPipelineConfig(**base)


def test_wan_pipeline_generate():
    pipe = WanPipeline(_wan_cfg())
    out = pipe.generate("a cat", seed=0)
    assert out.latents.shape == (1, 3, 4, 8, 16)
    assert np.isfinite(np.asarray(out.latents)).all()
    assert out.timings["total_s"] > 0


def test_wan_pipeline_magcache_and_determinism():
    pipe = WanPipeline(_wan_cfg(use_magcache=True))
    a = pipe.generate("a cat", seed=3)
    b = pipe.generate("a cat", seed=3)
    np.testing.assert_array_equal(np.asarray(a.latents), np.asarray(b.latents))
    c = pipe.generate("a cat", seed=4)
    assert np.abs(np.asarray(a.latents) - np.asarray(c.latents)).max() > 1e-3


def test_wan_pipeline_unipc_solver():
    pipe = WanPipeline(_wan_cfg(sample_solver="unipc", use_magcache=True))
    out = pipe.generate("a dog", seed=0)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_wan_calibration_pipeline():
    pipe = WanPipeline(_wan_cfg(magcache_calibration=True))
    out = pipe.generate("a cat", seed=0)
    assert out.calibration is not None
    # (steps-1) * 2 lanes entries in reference cnt ordering
    assert len(out.calibration["norm_ratio"]) == (4 - 1) * 2
    assert all(v > 0 for v in out.calibration["norm_ratio"])


def test_flux_pipeline_generate():
    cfg = FluxPipelineConfig(tiny=True, height=64, width=64, txt_len=8,
                             num_inference_steps=4, dtype="float32",
                             use_magcache=True)
    pipe = FluxPipeline(cfg)
    out = pipe.generate("a fox", seed=42)
    assert out.latents.shape == (1, 16, 16)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_engine_api():
    eng = Engine(_wan_cfg())
    out = eng.generate("hello world")
    assert out.latents is not None
    eng.shutdown()


def test_engine_infers_pipeline_cls():
    cfg = FluxPipelineConfig(tiny=True, height=64, width=64, txt_len=8,
                             num_inference_steps=2, dtype="float32")
    eng = Engine(cfg)
    assert isinstance(eng.driver_pipeline, FluxPipeline)


def test_cogvideox_pipeline():
    from magcache_tpu.pipelines.cogvideox import (
        CogVideoXPipeline,
        CogVideoXPipelineConfig,
    )
    cfg = CogVideoXPipelineConfig(tiny=True, num_frames=5, height=32, width=32,
                                  num_inference_steps=4, txt_len=6,
                                  dtype="float32", use_magcache=True,
                                  magcache_ratios=tuple([1.0, 0.99, 0.995, 0.99]))
    pipe = CogVideoXPipeline(cfg)
    out = pipe.generate("a train", seed=0)
    assert out.latents.shape == (1, 2, 4, 4, 16)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_latte_pipeline():
    from magcache_tpu.pipelines.latte import LattePipeline, LattePipelineConfig
    cfg = LattePipelineConfig(tiny=True, num_frames=2, height=32, width=32,
                              num_sampling_steps=4, caption_len=6,
                              dtype="float32")
    pipe = LattePipeline(cfg)
    out = pipe.generate("a garden", seed=0)
    assert out.latents.shape == (1, 2, 4, 4, 4)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_wan_generate_batch_moe():
    """Wan2.2 two-expert batched generation (the eval scripts shard prompts
    across workers; MoE must ride the same dp-batched path)."""
    cfg = _wan_cfg(use_magcache=True)
    import dataclasses
    cfg = dataclasses.replace(cfg, moe_boundary=0.5, sample_solver="unipc")
    pipe = WanPipeline(cfg)
    out = pipe.generate_batch(["a cat", "a dog"], seed=5)
    assert out.latents.shape[0] == 2
    lat = np.asarray(out.latents)
    assert np.isfinite(lat).all()
    assert np.abs(lat[0] - lat[1]).max() > 1e-3
    single = pipe.generate("a cat", seed=5)
    np.testing.assert_allclose(lat[0], np.asarray(single.latents)[0],
                               rtol=2e-4, atol=2e-4)


def test_wan_generate_batch():
    pipe = WanPipeline(_wan_cfg(use_magcache=True))
    out = pipe.generate_batch(["a cat", "a dog", "a fox"], seed=5)
    assert out.latents.shape[0] == 3
    lat = np.asarray(out.latents)
    # per-prompt seeds differ -> outputs differ
    assert np.abs(lat[0] - lat[1]).max() > 1e-3
    # batched result matches the single-prompt path sample-for-sample
    single = pipe.generate("a cat", seed=5)
    np.testing.assert_allclose(lat[0], np.asarray(single.latents)[0],
                               rtol=2e-4, atol=2e-4)


def test_reference_export_names_resolve():
    """The reference package exports (``videosys/__init__.py:1-22``) resolve
    at our root under the same names, so reference-written user code runs
    verbatim (the MIGRATION.md contract)."""
    import magcache_tpu as m

    assert m.VideoSysEngine is m.Engine
    pairs = [
        (m.OpenSoraConfig, m.OpenSoraPipeline),
        (m.LatteConfig, m.LattePipeline),
        (m.CogVideoXConfig, m.CogVideoXPipeline),
        (m.OpenSoraPlanConfig, m.OpenSoraPlanPipeline),
        (m.VchitectConfig, m.VchitectXLPipeline),
    ]
    for cfg_cls, pipe_cls in pairs:
        assert cfg_cls().pipeline_cls is pipe_cls
    assert callable(m.initialize)
    for name in ("OpenSoraPABConfig", "LattePABConfig", "CogVideoXPABConfig",
                 "VchitectPABConfig", "OpenSoraPlanV110PABConfig",
                 "OpenSoraPlanV120PABConfig"):
        assert callable(getattr(m, name))
