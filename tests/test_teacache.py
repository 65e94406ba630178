"""TeaCache tests: parity vs an eager transcription of the reference loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.core.teacache import (
    TeaCacheConfig,
    sample_euler_teacache,
)
from magcache_tpu.schedulers.flow_match import FlowMatchSchedule
from tests.test_sampler import DIM, make_toy


def eager_teacache_loop(core, params, x, cond, timesteps, dts, cfg, signal_fn):
    """Direct transcription of opensora.py:88-140 semantics (single lane)."""
    coeffs = np.asarray(cfg.coefficients)
    prev_mod, acc, cache = None, 0.0, None
    n = len(timesteps)
    skips = []
    for i, (t, dt) in enumerate(zip(timesteps, dts)):
        tvec = jnp.full((x.shape[0],), t, jnp.float32)
        hidden, ctx = core.prepare(params, x, tvec, cond)
        mod = signal_fn(params, hidden, ctx)
        if i == 0 or i == n - 1:
            should_calc, acc = True, 0.0
        else:
            rel = float(jnp.mean(jnp.abs(mod - prev_mod)) / jnp.mean(jnp.abs(prev_mod)))
            acc += float(np.polyval(coeffs, rel))
            if acc < cfg.rel_l1_thresh:
                should_calc = False
            else:
                should_calc, acc = True, 0.0
        prev_mod = mod
        if should_calc:
            h = core.trunk(params, hidden, ctx)
            cache = h - hidden
        else:
            h = hidden + cache
        skips.append(not should_calc)
        out = core.head(params, h, ctx)
        x = x + dt * out
    return x, skips


def test_teacache_matches_eager_reference():
    core, params = make_toy(0)
    steps = 12
    sch = FlowMatchSchedule.create(steps, shift=2.0)
    dts = np.diff(sch.sigmas)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, DIM)), jnp.float32)
    cond = jnp.zeros((1, 4), jnp.float32)
    cfg = TeaCacheConfig(rel_l1_thresh=50.0)  # generous -> some skips on toy
    signal = lambda p, h, ctx: h

    ref, skips = eager_teacache_loop(core, params, x, cond, sch.timesteps,
                                     dts, cfg, signal)
    assert any(skips), "threshold should cause at least one skip"
    assert not skips[0] and not skips[-1]
    out = sample_euler_teacache(core, params, x, cond, timesteps=sch.timesteps,
                                dts=dts, tea_cfg=cfg, signal_fn=signal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_teacache_tight_threshold_equals_full():
    core, params = make_toy(1)
    steps = 8
    sch = FlowMatchSchedule.create(steps)
    dts = np.diff(sch.sigmas)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, DIM)), jnp.float32)
    cond = jnp.zeros((1, 4), jnp.float32)
    # threshold 0 -> never skip -> equals plain sampler
    from magcache_tpu.core.sampler import sample_euler
    cfg = TeaCacheConfig(rel_l1_thresh=0.0)
    a = sample_euler_teacache(core, params, x, cond, timesteps=sch.timesteps,
                              dts=dts, tea_cfg=cfg, signal_fn=lambda p, h, c: h)
    b = sample_euler(core, params, x, cond, timesteps=sch.timesteps, dts=dts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_teacache_jittable():
    core, params = make_toy(2)
    steps = 6
    sch = FlowMatchSchedule.create(steps)
    dts = np.diff(sch.sigmas)
    cfg = TeaCacheConfig(rel_l1_thresh=10.0)

    @jax.jit
    def run(params, x, cond):
        return sample_euler_teacache(core, params, x, cond,
                                     timesteps=sch.timesteps, dts=dts,
                                     tea_cfg=cfg, signal_fn=lambda p, h, c: h)

    out = run(params, jnp.ones((1, DIM)), jnp.zeros((1, 4)))
    assert np.isfinite(np.asarray(out)).all()
