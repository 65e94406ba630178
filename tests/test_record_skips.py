"""Realized-skip recording (`return_skips` / `pipe.record_skips`).

The evaluator's anti-vacuity gate depends on the samplers emitting the skip
bits they actually executed (static schedule bits, or the in-graph TeaCache
decisions). These tests pin:
  - static-path emission == the host-precomputed schedule
    (``compute_skip_schedule``), so the scan emits what it consumed;
  - dynamic-path (TeaCache) emission produces >0 skips under a
    force-skip threshold and 0 under a force-compute threshold;
  - pipeline plumbing surfaces the bits as ``PipelineOutput.skips``.
"""

import numpy as np
import pytest

from magcache_tpu.core.magcache import compute_skip_schedule
from magcache_tpu.core.presets import make_config


def test_flux_static_skips_match_schedule():
    from magcache_tpu.pipelines.flux import FluxPipeline, FluxPipelineConfig

    cfg = FluxPipelineConfig(tiny=True, height=64, width=64, txt_len=16,
                             num_inference_steps=8, dtype="float32",
                             use_magcache=True, magcache_thresh=0.3,
                             retention_ratio=0.1)
    pipe = FluxPipeline(cfg)
    pipe.record_skips = True
    out = pipe.generate("x", seed=0)
    assert out.skips is not None
    sched = np.asarray(compute_skip_schedule(make_config(
        "flux-dev", 8, thresh=0.3, retention_ratio=0.1))).astype(bool)
    got = np.asarray(out.skips).astype(bool).reshape(sched.shape)
    np.testing.assert_array_equal(got, sched)
    assert got.sum() > 0


def test_flux_no_record_keeps_plain_output():
    from magcache_tpu.pipelines.flux import FluxPipeline, FluxPipelineConfig

    cfg = FluxPipelineConfig(tiny=True, height=64, width=64, txt_len=16,
                             num_inference_steps=4, dtype="float32")
    pipe = FluxPipeline(cfg)
    out = pipe.generate("x", seed=0)
    assert out.skips is None and out.latents is not None


@pytest.mark.parametrize("thresh,expect_skips", [(1e9, True), (-1.0, False)])
def test_wan_teacache_dynamic_skips(thresh, expect_skips):
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig

    cfg = WanPipelineConfig(task="t2v", tiny=True, size=(64, 64), frame_num=5,
                            sample_steps=6, sample_solver="unipc",
                            dtype="float32", enable_teacache=True,
                            teacache_thresh=thresh)
    pipe = WanPipeline(cfg)
    pipe.record_skips = True
    out = pipe.generate("x", seed=0)
    assert out.skips is not None
    n = int(np.asarray(out.skips).astype(bool).sum())
    assert (n > 0) == expect_skips


def test_framepack_per_section_skips():
    from magcache_tpu.pipelines.framepack import (FramePackPipeline,
                                                  FramePackPipelineConfig)

    cfg = FramePackPipelineConfig(tiny=True, pyramid=False, height=64,
                                  width=64, txt_len=8, latent_window_size=2,
                                  total_sections=2, steps=5,
                                  use_teacache=True, teacache_thresh=1e9)
    pipe = FramePackPipeline(cfg)
    pipe.record_skips = True
    out = pipe.generate("x", seed=0)
    assert out.skips is not None
    a = np.asarray(out.skips).astype(bool)
    assert a.shape[0] == 2                      # one row per section
    # per-section reset: the forced first step never skips in either section
    assert not a[:, 0].any()
    assert a.sum() > 0


def test_open_sora_record_skips_toggle_after_first_generate():
    """The jit memo must be keyed on record_skips: generating once plain and
    then toggling pipe.record_skips used to reuse the no-skips program and
    crash unpacking (and vice versa)."""
    from magcache_tpu.pipelines.open_sora import (OpenSoraPipeline,
                                                  OpenSoraPipelineConfig)

    cfg = OpenSoraPipelineConfig(tiny=True, num_sampling_steps=4,
                                 use_magcache=True, magcache_thresh=1e9,
                                 retention_ratio=0.25)
    pipe = OpenSoraPipeline(cfg)
    out = pipe.generate("x", seed=0)
    assert out.skips is None
    pipe.record_skips = True
    out2 = pipe.generate("x", seed=0)
    assert out2.skips is not None and np.asarray(out2.skips).sum() > 0
    pipe.record_skips = False
    out3 = pipe.generate("x", seed=0)
    assert out3.skips is None
    np.testing.assert_allclose(np.asarray(out.latents),
                               np.asarray(out3.latents))
