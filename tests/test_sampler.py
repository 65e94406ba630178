"""Cached-sampler tests: the batched scan sampler must reproduce, lane for
lane, an eager transcription of the reference's sequential monkey-patched loop
(MagCache4Wan2.1/magcache_generate.py:279-311)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.core.magcache import MagCacheConfig, compute_skip_schedule
from magcache_tpu.core.sampler import (
    DiTCore,
    calibrate_euler,
    sample_euler,
    sample_unipc,
)
from magcache_tpu.schedulers.flow_match import FlowMatchSchedule
from magcache_tpu.schedulers.unipc import UniPCSchedule


# --- a tiny but nonlinear "DiT": embed -> 2-layer MLP trunk -> project ----

DIM, HID = 8, 32


def make_toy(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    params = {
        "emb": jax.random.normal(ks[0], (DIM, HID)) * 0.3,
        "t_emb": jax.random.normal(ks[1], (1, HID)) * 0.1,
        "cond": jax.random.normal(ks[2], (4, HID)) * 0.3,
        "w1": jax.random.normal(ks[3], (HID, HID)) * 0.3,
        "w2": jax.random.normal(ks[4], (HID, HID)) * 0.3,
        "out": jax.random.normal(ks[5], (HID, DIM)) * 0.3,
    }

    def prepare(p, x, t, cond):
        h = x @ p["emb"] + t[:, None] * p["t_emb"] + cond @ p["cond"]
        return h, (t, cond)

    def trunk(p, h, ctx):
        h = h + jnp.tanh(h @ p["w1"])
        h = h + jnp.tanh(h @ p["w2"])
        return h

    def head(p, h, ctx):
        return h @ p["out"]

    return DiTCore(prepare, trunk, head), params


def make_cfg(num_steps, lanes, ratios=None, **kw):
    n = num_steps * lanes
    if ratios is None:
        rng = np.random.default_rng(7)
        ratios = 1.0 - np.abs(rng.normal(0, 0.02, n))
    return MagCacheConfig(num_steps=n, mag_ratios=tuple(ratios), lanes=lanes, **kw)


def reference_sequential_loop(core, params, x, cond_lanes, timesteps, dts, cfg,
                              guidance):
    """Eager per-lane sequential loop with reference cache semantics."""
    sched = compute_skip_schedule(cfg)
    cache = {l: None for l in range(cfg.lanes)}
    for i, (t, dt) in enumerate(zip(timesteps, dts)):
        tvec = jnp.full((x.shape[0],), t, jnp.float32)
        outs = []
        for lane in range(cfg.lanes):
            cnt = i * cfg.lanes + lane
            hidden, ctx = core.prepare(params, x, tvec, cond_lanes[lane])
            if cache[lane] is None:
                cache[lane] = jnp.zeros_like(hidden)
            if sched[cnt]:
                resid = cache[lane]
                h = hidden + resid
            else:
                h = core.trunk(params, hidden, ctx)
                resid = h - hidden
            cache[lane] = resid
            outs.append(core.head(params, h, ctx))
        if guidance is None:
            v = outs[0]
        else:
            v = outs[1] + guidance * (outs[0] - outs[1])
        x = x + dt * v
    return x


@pytest.mark.parametrize("with_cache", [False, True])
def test_batched_matches_sequential_reference_dual_lane(with_cache):
    core, params = make_toy()
    steps = 12
    sch = FlowMatchSchedule.create(steps, shift=3.0)
    dts = np.diff(sch.sigmas)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, DIM)), jnp.float32)
    cond_c = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    cond_u = jnp.zeros_like(cond_c)
    cfg = make_cfg(steps, lanes=2, thresh=0.05, max_consecutive_skips=3) if with_cache else None

    ref = reference_sequential_loop(
        core, params, x, [cond_c, cond_u], sch.timesteps, dts,
        cfg or make_cfg(steps, 2, ratios=np.full(steps * 2, 100.0)),  # no skips
        guidance=5.0)
    out = sample_euler(
        core, params, x, jnp.concatenate([cond_c, cond_u]),
        timesteps=sch.timesteps, dts=dts, cache_cfg=cfg, guidance_scale=5.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_lane_divergent_schedule_parity():
    """Force the lanes to disagree (one skips, the other computes) and check
    the batched per-lane select still matches the sequential reference."""
    steps = 10
    # hand-built ratios: cond lane drifts fast (rarely skips), uncond slow
    ratios = np.ones(steps * 2)
    ratios[0::2] = 0.90   # cond: big deviation -> err crosses E quickly
    ratios[1::2] = 0.995  # uncond: tiny deviation -> skips a lot
    cfg = make_cfg(steps, lanes=2, ratios=ratios, thresh=0.05,
                   max_consecutive_skips=4)
    sched = compute_skip_schedule(cfg).reshape(steps, 2)
    assert any(a != b for a, b in sched), "lanes should diverge somewhere"

    core, params = make_toy(3)
    sch = FlowMatchSchedule.create(steps, shift=3.0)
    dts = np.diff(sch.sigmas)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, DIM)), jnp.float32)
    cond_c = jnp.asarray(rng.normal(size=(1, 4)), jnp.float32)
    cond_u = jnp.zeros_like(cond_c)

    ref = reference_sequential_loop(core, params, x, [cond_c, cond_u],
                                    sch.timesteps, dts, cfg, guidance=6.0)
    out = sample_euler(core, params, x, jnp.concatenate([cond_c, cond_u]),
                       timesteps=sch.timesteps, dts=dts, cache_cfg=cfg,
                       guidance_scale=6.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_single_lane_cache():
    core, params = make_toy(1)
    steps = 14
    sch = FlowMatchSchedule.create(steps)
    dts = np.diff(sch.sigmas)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, DIM)), jnp.float32)
    cond = jnp.zeros((1, 4), jnp.float32)
    cfg = make_cfg(steps, lanes=1, thresh=0.1, max_consecutive_skips=3)
    ref = reference_sequential_loop(core, params, x, [cond], sch.timesteps,
                                    dts, cfg, guidance=None)
    out = sample_euler(core, params, x, cond, timesteps=sch.timesteps, dts=dts,
                       cache_cfg=cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_cache_off_equals_none():
    """A schedule with no skips must equal running without cache at all."""
    core, params = make_toy(4)
    steps = 8
    sch = FlowMatchSchedule.create(steps)
    dts = np.diff(sch.sigmas)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, DIM)), jnp.float32)
    cond = jnp.zeros((1, 4), jnp.float32)
    cfg = make_cfg(steps, lanes=1, ratios=np.full(steps, 50.0))  # never skips
    assert compute_skip_schedule(cfg).sum() == 0
    a = sample_euler(core, params, x, cond, timesteps=sch.timesteps, dts=dts,
                     cache_cfg=cfg)
    b = sample_euler(core, params, x, cond, timesteps=sch.timesteps, dts=dts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_cached_output_close_to_full():
    """MagCache at a modest threshold should stay near full compute — the
    reference's de-facto correctness criterion (PSNR-style closeness)."""
    core, params = make_toy(6)
    steps = 24
    sch = FlowMatchSchedule.create(steps, shift=2.0)
    dts = np.diff(sch.sigmas)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(1, DIM)), jnp.float32)
    cond = jnp.zeros((1, 4), jnp.float32)
    full = sample_euler(core, params, x, cond, timesteps=sch.timesteps, dts=dts)
    cfg = make_cfg(steps, lanes=1, thresh=0.08, max_consecutive_skips=2,
                   ratios=1.0 - np.abs(np.random.default_rng(9).normal(0, 0.01, steps)))
    assert 0 < compute_skip_schedule(cfg).sum() < steps
    cached = sample_euler(core, params, x, cond, timesteps=sch.timesteps,
                          dts=dts, cache_cfg=cfg)
    rel = float(jnp.linalg.norm(cached - full) / jnp.linalg.norm(full))
    assert rel < 0.15, rel


def test_calibration_stats_shape_and_seed_consistency():
    core, params = make_toy(0)
    steps = 6
    sch = FlowMatchSchedule.create(steps)
    dts = np.diff(sch.sigmas)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, DIM)), jnp.float32)
    cond_c = jnp.asarray(rng.normal(size=(1, 4)), jnp.float32)
    cond = jnp.concatenate([cond_c, jnp.zeros_like(cond_c)])
    xf, stats = calibrate_euler(core, params, x, cond, timesteps=sch.timesteps,
                                dts=dts, lanes=2, guidance_scale=5.0)
    assert stats.shape == (steps - 1, 2, 3)
    assert np.isfinite(np.asarray(stats)).all()
    # full-compute trajectory must equal the uncached sampler's
    out = sample_euler(core, params, x, cond, timesteps=sch.timesteps,
                       dts=dts, guidance_scale=5.0)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(out), rtol=1e-4, atol=1e-4)


def test_unipc_with_cache_runs_and_is_close():
    core, params = make_toy(2)
    steps = 16
    sch = UniPCSchedule.create(steps, shift=3.0)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, DIM)), jnp.float32)
    cond = jnp.zeros((1, 4), jnp.float32)
    full = sample_unipc(core, params, x, cond, sch)
    cfg = make_cfg(steps, lanes=1, thresh=0.05, max_consecutive_skips=2,
                   ratios=1.0 - np.abs(np.random.default_rng(4).normal(0, 0.008, steps)))
    assert compute_skip_schedule(cfg).sum() > 0
    cached = sample_unipc(core, params, x, cond, sch, cache_cfg=cfg)
    rel = float(jnp.linalg.norm(cached - full) / jnp.linalg.norm(full))
    assert rel < 0.2, rel
    assert np.isfinite(np.asarray(cached)).all()


def test_sampler_is_jittable():
    core, params = make_toy(0)
    steps = 6
    sch = FlowMatchSchedule.create(steps)
    dts = np.diff(sch.sigmas)
    cfg = make_cfg(steps, lanes=1, thresh=0.1, max_consecutive_skips=2)

    @jax.jit
    def run(params, x, cond):
        return sample_euler(core, params, x, cond, timesteps=sch.timesteps,
                            dts=dts, cache_cfg=cfg)

    x = jnp.ones((1, DIM), jnp.float32)
    cond = jnp.zeros((1, 4), jnp.float32)
    out = run(params, x, cond)
    assert out.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(sample_euler(core, params, x, cond, timesteps=sch.timesteps,
                                dts=dts, cache_cfg=cfg)),
        rtol=1e-5, atol=1e-5)


def test_partial_lane_skip_runs_reduced_trunk():
    """A lane-asymmetric step must dispatch the trunk on HALF the rows (the
    non-skipping lane only), not the full batch + select — the per-forward
    skip economics of the reference (magcache_generate.py:294-298)."""
    steps = 10
    ratios = np.ones(steps * 2)
    ratios[0::2] = 0.90
    ratios[1::2] = 0.995
    cfg = make_cfg(steps, lanes=2, ratios=ratios, thresh=0.05,
                   max_consecutive_skips=4)
    sched = compute_skip_schedule(cfg).reshape(steps, 2)
    assert any(a != b for a, b in sched)

    core, params = make_toy(3)
    seen_rows = []
    orig_trunk = core.trunk

    def spy_trunk(p, h, ctx):
        seen_rows.append(h.shape[0])
        return orig_trunk(p, h, ctx)

    import dataclasses as dc
    spy_core = dc.replace(core, trunk=spy_trunk)
    sch = FlowMatchSchedule.create(steps, shift=3.0)
    x = jnp.zeros((2, DIM), jnp.float32)
    cond = jnp.zeros((4, 4), jnp.float32)
    jax.eval_shape(
        lambda p, x, c: sample_euler(
            spy_core, p, x, c, timesteps=sch.timesteps,
            dts=np.diff(sch.sigmas), cache_cfg=cfg, guidance_scale=6.0),
        params, x, cond)
    # full trunk (4 rows = 2 lanes x batch 2) AND reduced trunk (2 rows)
    assert 4 in seen_rows and 2 in seen_rows, seen_rows


def test_dpmpp_2m_flow_matches_eager_oracle():
    # sample_euler(dpm_coeffs=...) == an eager transcription of the
    # DPM-Solver++(2M) data-prediction update driven through the same core
    from magcache_tpu.schedulers.dpm_flow import dpmpp_2m_flow_coeffs

    core, params = make_toy(3)
    n = 8
    sigmas = np.linspace(1.0, 0.0, n + 1)
    timesteps = (sigmas[:-1] * 1000.0).astype(np.float32)
    co = dpmpp_2m_flow_coeffs(sigmas)
    x0_in = jax.random.normal(jax.random.PRNGKey(1), (2, DIM))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 4))

    got = sample_euler(core, params, x0_in, cond, timesteps=timesteps,
                       dts=np.zeros(n), dpm_coeffs=co)

    x = np.asarray(x0_in)
    x0_prev = np.zeros_like(x)
    for i in range(n):
        tvec = jnp.full((2,), timesteps[i], jnp.float32)
        h, ctx = core.prepare(params, jnp.asarray(x), tvec, cond)
        v = np.asarray(core.head(params, core.trunk(params, h, ctx), ctx))
        x0 = x - co["sigma_t"][i] * v
        d = co["a"][i] * x0 + co["b"][i] * x0_prev
        x = co["c_x"][i] * x + co["c_d"][i] * d
        x0_prev = x0
    rel = np.max(np.abs(np.asarray(got) - x)) / (np.max(np.abs(x)) + 1e-8)
    assert rel < 1e-5, rel  # f32 reassociation only


def test_dpmpp_final_step_returns_data_prediction():
    # with sigma_end = 0 the last update must be exactly x0 = x - sigma*v
    from magcache_tpu.schedulers.dpm_flow import dpmpp_2m_flow_coeffs

    co = dpmpp_2m_flow_coeffs(np.array([1.0, 0.5, 0.0]))
    assert co["c_x"][-1] == 0.0
    assert abs(co["c_d"][-1] - 1.0) < 1e-7
    assert co["a"][-1] == 1.0 and co["b"][-1] == 0.0
