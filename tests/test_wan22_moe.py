"""Wan2.2 two-expert MoE pipeline tests."""

import jax
import numpy as np
import pytest

from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig


def _cfg(**kw):
    base = dict(model="wan2.2-t2v-A14B", tiny=True, size=(64, 32), frame_num=9,
                sample_steps=6, sample_solver="unipc", sample_shift=5.0,
                dtype="float32", moe_boundary=0.9)
    base.update(kw)
    return WanPipelineConfig(**base)


def test_moe_two_experts_run():
    pipe = WanPipeline(_cfg())
    out = pipe.generate("a bird", seed=0)
    assert out.latents.shape == (1, 3, 4, 8, 16)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_moe_expert_actually_switches():
    """Changing only the low-noise expert's params must change the output
    (proves the second phase runs the second expert)."""
    pipe = WanPipeline(_cfg())
    a = pipe.generate("a bird", seed=0)
    from magcache_tpu.models.wan import init_wan_params
    pipe2 = WanPipeline(_cfg(), params=pipe.params,
                        params_low=init_wan_params(jax.random.PRNGKey(99),
                                                   pipe.model_cfg))
    b = pipe2.generate("a bird", seed=0)
    assert np.abs(np.asarray(a.latents) - np.asarray(b.latents)).max() > 1e-4
    # and changing only the HIGH expert also changes it
    pipe3 = WanPipeline(_cfg(), params=init_wan_params(jax.random.PRNGKey(98),
                                                       pipe.model_cfg),
                        params_low=pipe2.params_low)
    c = pipe3.generate("a bird", seed=0)
    assert np.abs(np.asarray(b.latents) - np.asarray(c.latents)).max() > 1e-4


def test_moe_with_magcache_split_gating():
    pipe = WanPipeline(_cfg(use_magcache=True))
    out = pipe.generate("a bird", seed=1)
    assert np.isfinite(np.asarray(out.latents)).all()
