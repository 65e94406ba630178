"""Vchitect + Open-Sora-Plan model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.core.sampler import sample_euler
from magcache_tpu.models.open_sora_plan import (
    OpenSoraPlanConfig,
    init_osp_params,
    make_osp_core,
)
from magcache_tpu.models.vchitect import (
    VchitectConfig,
    init_vchitect_params,
    make_vchitect_core,
)
from magcache_tpu.schedulers.flow_match import FlowMatchSchedule


def test_vchitect_forward_and_sampling():
    cfg = VchitectConfig.tiny()
    params = init_vchitect_params(jax.random.PRNGKey(0), cfg)
    core = make_vchitect_core(cfg, (2, 4, 4), txt_len=6)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 8, cfg.in_channels)), jnp.float32)
    cond = {"txt": jnp.asarray(rng.normal(size=(2, 6, cfg.text_dim)), jnp.float32),
            "vec": jnp.asarray(rng.normal(size=(2, cfg.vec_dim)), jnp.float32)}
    t = jnp.full((2,), 500.0, jnp.float32)
    hidden, ctx = core.prepare(params, jnp.concatenate([x, x]), t, cond)
    assert hidden.shape == (2, 32, cfg.hidden)
    out = core.head(params, core.trunk(params, hidden, ctx), ctx)
    assert out.shape == (2, 2, 8, 8, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()

    sch = FlowMatchSchedule.create(3, shift=3.0)
    s = sample_euler(core, params, x, cond, timesteps=sch.timesteps,
                     dts=np.diff(sch.sigmas), guidance_scale=7.0)
    assert np.isfinite(np.asarray(s)).all()


def test_osp_forward_and_sampling():
    cfg = OpenSoraPlanConfig.tiny()
    params = init_osp_params(jax.random.PRNGKey(0), cfg)
    core = make_osp_core(cfg, (2, 4, 4), caption_len=6)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 8, cfg.in_channels)), jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(2, 6, cfg.caption_dim)), jnp.float32)}
    t = jnp.full((2,), 400.0, jnp.float32)
    hidden, ctx = core.prepare(params, jnp.concatenate([x, x]), t, cond)
    assert hidden.shape == (2, 32, cfg.hidden)
    out = core.head(params, core.trunk(params, hidden, ctx), ctx)
    assert out.shape == (2, 2, 8, 8, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()

    sch = FlowMatchSchedule.create(3)
    s = sample_euler(core, params, x, cond, timesteps=sch.timesteps,
                     dts=np.diff(sch.sigmas), guidance_scale=5.0)
    assert np.isfinite(np.asarray(s)).all()
