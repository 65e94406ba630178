"""CogVideoX model + zero-SNR DDIM scheduler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.core.magcache import MagCacheConfig, compute_skip_schedule
from magcache_tpu.core.sampler import sample_euler
from magcache_tpu.models.cogvideox import (
    CogVideoXConfig,
    init_cogvideox_params,
    make_cogvideox_core,
)
from magcache_tpu.schedulers.ddim_cogvideo import CogVideoDDIMSchedule

CFG = CogVideoXConfig.tiny()
GRID = (2, 4, 4)
TXT = 6


@pytest.fixture(scope="module")
def model():
    params = init_cogvideox_params(jax.random.PRNGKey(0), CFG)
    return make_cogvideox_core(CFG, TXT, GRID), params


def _cond(b=1, seed=0):
    rng = np.random.default_rng(seed)
    return {"txt": jnp.asarray(rng.normal(size=(b, TXT, CFG.text_dim)), jnp.float32)}


def _x(b=1, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, 2, 8, 8, CFG.in_channels)), jnp.float32)


def test_forward_shapes(model):
    core, params = model
    x = _x(2)
    t = jnp.full((2,), 500.0, jnp.float32)
    hidden, ctx = core.prepare(params, x, t, _cond(2))
    assert hidden.shape == (2, 32, CFG.hidden)  # video tokens only
    out = core.head(params, core.trunk(params, hidden, ctx), ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_schedule_zero_terminal_snr():
    sch = CogVideoDDIMSchedule.create(50)
    assert sch.alphas_cumprod[-1] < 1e-10  # terminal SNR == 0
    assert abs(sch.timesteps[0] - 980) <= 20 and sch.timesteps[-1] == 0
    c_x, c_v = sch.step_arrays()
    assert np.isfinite(c_x).all() and np.isfinite(c_v).all()


def test_ddim_exact_on_consistent_v():
    """If v is the true velocity of (x0, eps), DDIM lands exactly on the
    trajectory point at each following timestep."""
    sch = CogVideoDDIMSchedule.create(10)
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4,))
    eps = rng.normal(size=(4,))
    acp = sch.alphas_cumprod
    t0 = int(sch.timesteps[0])
    x = np.sqrt(acp[t0]) * x0 + np.sqrt(1 - acp[t0]) * eps
    c_x, c_v = sch.step_arrays()
    for i in range(sch.num_steps):
        t = int(sch.timesteps[i])
        a = acp[t]
        v = np.sqrt(a) * eps - np.sqrt(1 - a) * x0  # true v at this point
        x = c_x[i] * x + c_v[i] * v
        if i + 1 < sch.num_steps:
            tn = int(sch.timesteps[i + 1])
            expected = np.sqrt(acp[tn]) * x0 + np.sqrt(1 - acp[tn]) * eps
            np.testing.assert_allclose(x, expected, atol=1e-10)
    np.testing.assert_allclose(x, x0, atol=1e-8)  # terminal alpha=1 -> x0


def test_cogvideo_sampling_with_cache(model):
    core, params = model
    steps = 8
    sch = CogVideoDDIMSchedule.create(steps)
    c_x, c_v = sch.step_arrays()
    rng = np.random.default_rng(7)
    ratios = tuple(1.0 - np.abs(rng.normal(0, 0.01, steps)))
    cache_cfg = MagCacheConfig(num_steps=steps, mag_ratios=ratios, thresh=0.06,
                               max_consecutive_skips=2, lanes=1)
    assert compute_skip_schedule(cache_cfg).sum() > 0
    out = sample_euler(core, params, _x(), _cond(),
                       timesteps=sch.timesteps.astype(np.float32),
                       dts=c_v, x_coeffs=c_x, cache_cfg=cache_cfg)
    assert out.shape == (1, 2, 8, 8, CFG.in_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_dpm_exact_on_consistent_v():
    """With the true v of a fixed (x0, eps), DPM++ 2M must land exactly on
    the trajectory (D == x0 when data prediction is constant)."""
    from magcache_tpu.schedulers.ddim_cogvideo import CogVideoDPMSchedule
    sch = CogVideoDPMSchedule.create(10)
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4,))
    eps = rng.normal(size=(4,))
    acp = sch.alphas_cumprod
    c_x, c_m0, c_m1, sa, sb = sch.step_arrays()
    t0 = int(sch.timesteps[0])
    x = np.sqrt(acp[t0]) * x0 + np.sqrt(1 - acp[t0]) * eps
    m_prev = np.zeros(4)
    for i in range(sch.num_steps):
        t = int(sch.timesteps[i])
        a = acp[t]
        v = np.sqrt(a) * eps - np.sqrt(1 - a) * x0
        m = sa[i] * x - sb[i] * v
        np.testing.assert_allclose(m, x0, atol=1e-6)  # sa/sb are f32
        x = c_x[i] * x + c_m0[i] * m + c_m1[i] * m_prev
        m_prev = m
        if i + 1 < sch.num_steps:
            tn = int(sch.timesteps[i + 1])
            expected = np.sqrt(acp[tn]) * x0 + np.sqrt(1 - acp[tn]) * eps
            np.testing.assert_allclose(x, expected, atol=1e-6)
    np.testing.assert_allclose(x, x0, atol=1e-4)


def test_dpm_sampling_runs(model):
    from magcache_tpu.core.sampler import sample_dpm_cogvideo
    from magcache_tpu.schedulers.ddim_cogvideo import CogVideoDPMSchedule
    core, params = model
    sch = CogVideoDPMSchedule.create(6)
    rng = np.random.default_rng(3)
    ratios = tuple(1.0 - np.abs(rng.normal(0, 0.01, 6)))
    cache_cfg = MagCacheConfig(num_steps=6, mag_ratios=ratios, thresh=0.05,
                               max_consecutive_skips=2, lanes=1)
    out = sample_dpm_cogvideo(core, params, _x(), _cond(), sch,
                              cache_cfg=cache_cfg)
    assert out.shape == (1, 2, 8, 8, CFG.in_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_cogvideo_pab_refresh_matches_plain():
    from magcache_tpu.core.pab import PABConfig
    from magcache_tpu.schedulers.rflow import RFlowSchedule
    params = init_cogvideox_params(jax.random.PRNGKey(0), CFG)
    ts = RFlowSchedule.create(4).timesteps
    pab = PABConfig(spatial_broadcast=True, spatial_threshold=(450, 930),
                    spatial_range=2, mlp_broadcast=True,
                    mlp_threshold=(450, 930), mlp_range=2)
    core_p = make_cogvideox_core(CFG, TXT, GRID, pab=pab, timesteps=ts)
    core_n = make_cogvideox_core(CFG, TXT, GRID)
    x, cond = _x(), _cond()
    t = jnp.full((1,), float(ts[0]), jnp.float32)
    hidden, ctx = core_p.prepare(params, x, t, cond)
    state = core_p.init_state(params, jax.eval_shape(lambda: hidden),
                              jax.eval_shape(lambda: ctx))
    h_p, st2 = core_p.trunk(params, hidden, ctx, state, jnp.asarray(0))
    h_n = core_n.trunk(params, hidden, ctx)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_n), atol=1e-5)
    assert float(jnp.abs(st2["attn"]).max()) > 0


def test_cogvideo_pab_sampler_runs():
    from magcache_tpu.core.pab import PABConfig
    from magcache_tpu.schedulers.ddim_cogvideo import CogVideoDDIMSchedule
    params = init_cogvideox_params(jax.random.PRNGKey(1), CFG)
    sch = CogVideoDDIMSchedule.create(4)
    pab = PABConfig(spatial_broadcast=True, spatial_threshold=(100, 999),
                    spatial_range=2)
    core = make_cogvideox_core(CFG, TXT, GRID, pab=pab,
                               timesteps=sch.timesteps)
    c_x, c_v = sch.step_arrays()
    out = sample_euler(core, params, _x(), _cond(),
                       timesteps=sch.timesteps.astype(np.float32),
                       dts=c_v, x_coeffs=c_x)
    assert np.isfinite(np.asarray(out)).all()


def test_cogvideox_pipeline_enable_pab():
    from magcache_tpu.core.pab import CogVideoXPABConfig
    from magcache_tpu.pipelines.cogvideox import (CogVideoXPipeline,
                                                  CogVideoXPipelineConfig)

    base = dict(num_frames=5, height=32, width=32, num_inference_steps=6,
                txt_len=6, tiny=True)
    off = CogVideoXPipeline(CogVideoXPipelineConfig(**base))
    on = CogVideoXPipeline(CogVideoXPipelineConfig(
        enable_pab=True, pab_config=CogVideoXPABConfig(spatial_threshold=(0, 1000)),
        **base), params=off.params)
    a = np.asarray(off.generate("a dog", seed=3).latents)
    b = np.asarray(on.generate("a dog", seed=3).latents)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-6
