"""Latte T2V model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.core.sampler import sample_euler
from magcache_tpu.models.latte import LatteConfig, init_latte_params, make_latte_core
from magcache_tpu.schedulers.rflow import RFlowSchedule

CFG = LatteConfig.tiny()
GRID = (2, 4, 4)


@pytest.fixture(scope="module")
def model():
    params = init_latte_params(jax.random.PRNGKey(0), CFG)
    return make_latte_core(CFG, GRID, 6), params


def test_forward_shapes(model):
    core, params = model
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 2, 8, 8, CFG.in_channels)), jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(2, 6, CFG.caption_dim)), jnp.float32)}
    t = jnp.full((2,), 400.0, jnp.float32)
    hidden, ctx = core.prepare(params, x, t, cond)
    assert hidden.shape == (2, 32, CFG.hidden)
    out = core.head(params, core.trunk(params, hidden, ctx), ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_latte_sampling(model):
    core, params = model
    sch = RFlowSchedule.create(4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 8, CFG.in_channels)), jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(2, 6, CFG.caption_dim)), jnp.float32)}
    dts = np.array([sch.dt(i) for i in range(4)], np.float32)
    out = sample_euler(core, params, x, cond, timesteps=sch.timesteps, dts=dts,
                       guidance_scale=7.0)
    assert np.isfinite(np.asarray(out)).all()


def test_latte_pab_refresh_step_matches_plain():
    from magcache_tpu.core.pab import PABConfig
    params = init_latte_params(jax.random.PRNGKey(0), CFG)
    ts = RFlowSchedule.create(4).timesteps
    pab = PABConfig(spatial_broadcast=True, spatial_threshold=(450, 930),
                    spatial_range=2, temporal_broadcast=True,
                    temporal_threshold=(450, 930), temporal_range=2)
    core_p = make_latte_core(CFG, GRID, 6, pab=pab, timesteps=ts)
    core_n = make_latte_core(CFG, GRID, 6)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 8, CFG.in_channels)), jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(1, 6, CFG.caption_dim)), jnp.float32)}
    t = jnp.full((1,), float(ts[0]), jnp.float32)
    hidden, ctx = core_p.prepare(params, x, t, cond)
    state = core_p.init_state(params, jax.eval_shape(lambda: hidden),
                              jax.eval_shape(lambda: ctx))
    h_p, state2 = core_p.trunk(params, hidden, ctx, state, jnp.asarray(0))
    h_n = core_n.trunk(params, hidden, ctx)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_n), atol=1e-5)
    assert float(jnp.abs(state2["tp_attn"]).max()) > 0


def test_latte_pab_in_pipeline_sampler():
    from magcache_tpu.core.pab import PABConfig
    from magcache_tpu.core.sampler import sample_euler
    params = init_latte_params(jax.random.PRNGKey(1), CFG)
    sch = RFlowSchedule.create(4)
    pab = PABConfig(spatial_broadcast=True, spatial_threshold=(200, 990),
                    spatial_range=2)
    core = make_latte_core(CFG, GRID, 6, pab=pab, timesteps=sch.timesteps)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 8, CFG.in_channels)), jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(2, 6, CFG.caption_dim)), jnp.float32)}
    dts = np.array([sch.dt(i) for i in range(4)], np.float32)
    out = sample_euler(core, params, x, cond, timesteps=sch.timesteps,
                       dts=dts, guidance_scale=7.0)
    assert np.isfinite(np.asarray(out)).all()


def test_latte_pipeline_enable_pab():
    """Config-level PAB (the reference's LattePABConfig surface): generation
    runs, and reuse actually changes the trajectory vs pab-off."""
    from magcache_tpu.pipelines.latte import LattePipeline, LattePipelineConfig

    base = dict(num_frames=4, height=32, width=32, num_sampling_steps=6,
                caption_len=6, tiny=True)
    off = LattePipeline(LattePipelineConfig(**base))
    on = LattePipeline(LattePipelineConfig(enable_pab=True, **base),
                       params=off.params)
    a = np.asarray(off.generate("a cat", seed=3).latents)
    b = np.asarray(on.generate("a cat", seed=3).latents)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-6      # broadcast steps reused outputs


def test_pab_preset_factories():
    import magcache_tpu
    from magcache_tpu.core.pab import LATTE_PAB

    cfg = magcache_tpu.LattePABConfig()
    assert cfg == LATTE_PAB
    cfg2 = magcache_tpu.LattePABConfig(spatial_range=3)
    assert cfg2.spatial_range == 3 and cfg2.cross_range == LATTE_PAB.cross_range
    assert magcache_tpu.CogVideoXPABConfig().spatial_threshold == (100, 850)
    assert not magcache_tpu.CogVideoXPABConfig().temporal_broadcast
    assert magcache_tpu.OpenSoraPlanV120PABConfig().cross_broadcast


def test_latte_pipeline_eps_variance_head():
    """Published Latte-1 predicts eps+variance (8 channels, learn_sigma);
    the pipeline's combine must slice the first C channels before the CFG
    blend so a real checkpoint is usable end-to-end (the full-size config
    defaults to out_channels=8)."""
    from magcache_tpu.pipelines.latte import LattePipeline, LattePipelineConfig

    cfg = LattePipelineConfig(tiny=True, num_frames=4, height=64, width=64,
                              caption_len=6, num_sampling_steps=3,
                              out_channels=8)
    assert cfg.model_config().c_out == 8
    out = LattePipeline(cfg).generate("x")
    assert out.latents.shape[-1] == 4
    assert LattePipelineConfig().model_config().c_out == 8


def test_osp_pipeline_eps_variance_head():
    from magcache_tpu.pipelines.open_sora_plan import (
        OpenSoraPlanPipeline, OpenSoraPlanPipelineConfig)

    for version in ("v110", "v120"):
        cfg = OpenSoraPlanPipelineConfig(
            tiny=True, version=version, num_frames=5, height=32, width=32,
            caption_len=6, num_inference_steps=3, out_channels=8)
        assert cfg.model_config().c_out == 8
        out = OpenSoraPlanPipeline(cfg).generate("x")
        assert out.latents.shape[-1] == 4
    assert OpenSoraPlanPipelineConfig().model_config().c_out == 8
    assert OpenSoraPlanPipelineConfig(
        version="v110").model_config().c_out == 8
