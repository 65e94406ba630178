"""TaylorSeer tests: schedule statics, eager-transcription parity, linear
exactness, full-compute degeneration, and OmniGen2 pipeline wiring.

Reference surface: the OmniGen2 adapter's mutually-exclusive switch
(``MagCache4OmniGen2/inference.py:167-212``, ``magcache_utils.py:424-521``);
the algorithm itself is the published TaylorSeer scheme (external package in
the reference), reimplemented in ``core/taylorseer.py``.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.core.sampler import DiTCore, sample_euler
from magcache_tpu.core.taylorseer import (
    TaylorSeerConfig,
    sample_euler_taylorseer,
    taylorseer_schedule,
)
from magcache_tpu.schedulers.flow_match import FlowMatchSchedule
from tests.test_sampler import DIM, make_toy


def test_schedule_statics():
    cfg = TaylorSeerConfig(num_steps=12, interval=4, order=2, warmup=3)
    fresh, x_fc, upd, hist = taylorseer_schedule(cfg)
    # warmup 0,1,2 fresh; then published interval sampling i % 4 == 0: 4, 8
    assert list(np.where(fresh)[0]) == [0, 1, 2, 4, 8]
    # forecast distances count from the last fresh step
    assert x_fc[3] == 1.0 and x_fc[5] == 1.0 and x_fc[6] == 2.0
    assert x_fc[7] == 3.0 and x_fc[9] == 1.0 and x_fc[11] == 3.0
    # update spans: consecutive warmup steps are 1 apart, then 2 / 4
    assert upd[1] == 1.0 and upd[2] == 1.0 and upd[4] == 2.0
    assert upd[8] == 4.0
    # history depth strictly-before semantics
    assert hist[0] == 0 and hist[1] == 1 and hist[4] == 3 and hist[8] == 4
    # fresh steps at forecast positions carry zero distance
    assert x_fc[0] == 0.0 and x_fc[8] == 0.0


def eager_taylorseer(core, params, x, cond, timesteps, dts, cfg):
    """Plain-Python transcription of the published update/forecast loop."""
    derivs, last, seen = None, None, 0
    order = cfg.order
    for i, (t, dt) in enumerate(zip(timesteps, dts)):
        fresh = i < cfg.warmup or i % cfg.interval == 0
        tvec = jnp.full((x.shape[0],), t, jnp.float32)
        hidden, ctx = core.prepare(params, x, tvec, cond)
        if fresh:
            h = core.trunk(params, hidden, ctx)
            y = np.asarray(h - hidden)
            dist = float(i - last) if last is not None else 1.0
            new = [y]
            for k in range(1, order + 1):
                if seen >= k:
                    new.append((new[k - 1] - derivs[k - 1]) / dist)
                else:
                    new.append(np.zeros_like(y))
            derivs, last, seen = new, i, seen + 1
        else:
            xq = float(i - last)
            y = derivs[0].copy()
            for k in range(1, order + 1):
                y = y + derivs[k] * xq ** k / math.factorial(k)
            h = hidden + jnp.asarray(y)
        out = core.head(params, h, ctx)
        x = x + dt * out
    return x


@pytest.mark.parametrize("order", [1, 2])
def test_matches_eager_transcription(order):
    core, params = make_toy(0)
    steps = 14
    sch = FlowMatchSchedule.create(steps, shift=2.0)
    dts = np.diff(sch.sigmas)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, DIM)), jnp.float32)
    cond = jnp.zeros((1, 4), jnp.float32)
    cfg = TaylorSeerConfig(num_steps=steps, interval=3, order=order, warmup=2)

    ref = eager_taylorseer(core, params, x, cond, sch.timesteps, dts, cfg)
    out = sample_euler_taylorseer(core, params, x, cond,
                                  timesteps=sch.timesteps, dts=dts, ts_cfg=cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_interval_one_equals_full_compute():
    core, params = make_toy(1)
    steps = 8
    sch = FlowMatchSchedule.create(steps)
    dts = np.diff(sch.sigmas)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, DIM)), jnp.float32)
    cond = jnp.zeros((1, 4), jnp.float32)
    cfg = TaylorSeerConfig(num_steps=steps, interval=1, order=2, warmup=1)
    a = sample_euler_taylorseer(core, params, x, cond,
                                timesteps=sch.timesteps, dts=dts, ts_cfg=cfg)
    b = sample_euler(core, params, x, cond, timesteps=sch.timesteps, dts=dts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bf16_trunk_runs():
    """Regression: a bf16 trunk hidden crashed the fresh/forecast lax.cond
    on dtype mismatch (the derivative stack and forecast are f32) — the
    production OmniGen2 dtype; caught by the round-5 CLI policy sweep."""
    base, params = make_toy(1)

    def _prep(p, x, t, c):
        h, ctx = base.prepare(p, x, t, c)
        return h.astype(jnp.bfloat16), ctx

    core = DiTCore(
        prepare=_prep,
        trunk=lambda p, h, ctx: base.trunk(
            p, h.astype(jnp.float32), ctx).astype(jnp.bfloat16),
        head=base.head)
    steps = 8
    sch = FlowMatchSchedule.create(steps)
    dts = np.diff(sch.sigmas)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, DIM)),
                    jnp.float32)
    cond = jnp.zeros((1, 4), jnp.float32)
    cfg = TaylorSeerConfig(num_steps=steps, interval=3, order=2, warmup=1)
    out = sample_euler_taylorseer(core, params, x, cond,
                                  timesteps=sch.timesteps, dts=dts,
                                  ts_cfg=cfg)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_linear_residual_forecast_is_exact():
    """A trunk whose residual is linear in t forecasts exactly at order>=1
    (backward finite differences reproduce degree-1 polynomials)."""
    a = jnp.asarray(np.random.default_rng(2).normal(size=(DIM,)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(3).normal(size=(DIM,)), jnp.float32)

    def prepare(p, x, t, cond):
        return x, t

    def trunk(p, h, t):
        return h + a[None, :] + t[:, None] * b[None, :]

    def head(p, h, t):
        return 0.05 * h

    core = DiTCore(prepare, trunk, head)
    steps = 12
    # evenly spaced timesteps -> residual linear in the step index
    timesteps = np.linspace(1.0, 0.0, steps, endpoint=False).astype(np.float32)
    dts = np.full(steps, -1.0 / steps, np.float32)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, DIM)), jnp.float32)
    cfg = TaylorSeerConfig(num_steps=steps, interval=4, order=1, warmup=2)
    cached = sample_euler_taylorseer(core, None, x, None,
                                     timesteps=timesteps, dts=dts, ts_cfg=cfg)
    full = sample_euler(core, None, x, None, timesteps=timesteps, dts=dts)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


def test_lanes_with_combine_fn():
    """Dual-lane CFG through the taylorseer sampler equals eager per-lane."""
    core, params = make_toy(2)
    steps = 10
    sch = FlowMatchSchedule.create(steps)
    dts = np.diff(sch.sigmas)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(1, DIM)), jnp.float32)
    cond = jnp.asarray(np.random.default_rng(6).normal(size=(2, 4)), jnp.float32)
    cfg = TaylorSeerConfig(num_steps=steps, interval=3, order=2, warmup=2)
    g = 4.5
    out = sample_euler_taylorseer(core, params, x, cond,
                                  timesteps=sch.timesteps, dts=dts,
                                  ts_cfg=cfg, guidance_scale=g)

    # eager: both lanes stacked, same schedule — reuse the transcription with
    # a 2-row batch and a manual CFG combine
    derivs, last, seen = None, None, 0
    xs = x
    for i, (t, dt) in enumerate(zip(sch.timesteps, dts)):
        fresh = i < cfg.warmup or i % cfg.interval == 0
        x2 = jnp.concatenate([xs, xs], axis=0)
        tvec = jnp.full((2,), t, jnp.float32)
        hidden, ctx = core.prepare(params, x2, tvec, cond)
        if fresh:
            h = core.trunk(params, hidden, ctx)
            y = np.asarray(h - hidden)
            dist = float(i - last) if last is not None else 1.0
            new = [y]
            for k in range(1, cfg.order + 1):
                new.append((new[k - 1] - derivs[k - 1]) / dist
                           if seen >= k else np.zeros_like(y))
            derivs, last, seen = new, i, seen + 1
        else:
            xq = float(i - last)
            y = derivs[0].copy()
            for k in range(1, cfg.order + 1):
                y = y + derivs[k] * xq ** k / math.factorial(k)
            h = hidden + jnp.asarray(y)
        o = core.head(params, h, ctx)
        v = o[1:2] + g * (o[0:1] - o[1:2])
        xs = xs + dt * v
    np.testing.assert_allclose(np.asarray(out), np.asarray(xs),
                               rtol=1e-4, atol=1e-5)


def test_omnigen2_pipeline_taylorseer_wiring():
    from magcache_tpu.pipelines.omnigen2 import (OmniGen2Pipeline,
                                                 OmniGen2PipelineConfig)
    cfg = OmniGen2PipelineConfig(mode="t2i", height=32, width=32,
                                 num_inference_steps=6, txt_len=8,
                                 enable_taylorseer=True,
                                 taylorseer_interval=2, tiny=True)
    pipe = OmniGen2Pipeline(cfg)
    out = pipe.generate("a cat", seed=0)
    assert np.isfinite(np.asarray(out.latents)).all()

    with pytest.raises(ValueError):
        OmniGen2PipelineConfig(mode="t2i", num_inference_steps=4, tiny=True,
                               enable_taylorseer=True,
                               use_magcache=True).validate()


def test_omnigen2_pipeline_taylorseer_edit_mode():
    from magcache_tpu.pipelines.omnigen2 import (OmniGen2Pipeline,
                                                 OmniGen2PipelineConfig)
    cfg = OmniGen2PipelineConfig(mode="edit", height=32, width=32,
                                 num_inference_steps=6, txt_len=8,
                                 enable_taylorseer=True,
                                 taylorseer_interval=2, tiny=True)
    pipe = OmniGen2Pipeline(cfg)
    out = pipe.generate("make it blue", seed=0)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_omnigen2_teacache_t2i_and_edit():
    """The third OmniGen2 switch: per-branch TeaCache accumulators
    (magcache_utils.py:431-521)."""
    from magcache_tpu.pipelines.omnigen2 import (OmniGen2Pipeline,
                                                 OmniGen2PipelineConfig)
    for mode in ("t2i", "edit"):
        cfg = OmniGen2PipelineConfig(mode=mode, height=32, width=32,
                                     num_inference_steps=6, txt_len=8,
                                     enable_teacache=True,
                                     teacache_thresh=0.5, tiny=True)
        pipe = OmniGen2Pipeline(cfg)
        out = pipe.generate("a cat", seed=0)
        assert np.isfinite(np.asarray(out.latents)).all(), mode

    with pytest.raises(ValueError):
        OmniGen2PipelineConfig(mode="t2i", tiny=True, enable_teacache=True,
                               enable_taylorseer=True).validate()
    with pytest.raises(ValueError):
        OmniGen2PipelineConfig(mode="t2i", tiny=True, enable_teacache=True,
                               use_magcache=True).validate()


def test_omnigen2_teacache_tight_threshold_equals_full():
    """thresh=0 -> accumulator always >= threshold -> full compute."""
    from magcache_tpu.pipelines.omnigen2 import (OmniGen2Pipeline,
                                                 OmniGen2PipelineConfig)
    base = dict(mode="t2i", height=32, width=32, num_inference_steps=5,
                txt_len=8, tiny=True)
    key = jax.random.PRNGKey(3)
    a = OmniGen2Pipeline(OmniGen2PipelineConfig(**base, enable_teacache=True,
                                                teacache_thresh=0.0), key=key)
    b = OmniGen2Pipeline(OmniGen2PipelineConfig(**base), params=a.params)
    la = a.generate("x", seed=1).latents
    lb = b.generate("x", seed=1).latents
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)
