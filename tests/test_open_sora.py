"""Open-Sora stack tests: STDiT3, PAB broadcast masks and state, RFLOW pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.core.pab import OPEN_SORA_PAB, PABConfig, broadcast_masks
from magcache_tpu.models.stdit3 import (
    STDiT3Config,
    init_stdit3_params,
    make_stdit3_core,
)
from magcache_tpu.pipelines.open_sora import OpenSoraPipeline, OpenSoraPipelineConfig
from magcache_tpu.schedulers.rflow import RFlowSchedule

CFG = STDiT3Config.tiny()
GRID = (3, 4, 4)
LAT = (3, 8, 8)
CAP = 6


def _cond(rows=2, seed=0):
    rng = np.random.default_rng(seed)
    return {"y": jnp.asarray(rng.normal(size=(rows, CAP, CFG.caption_dim)), jnp.float32),
            "fps": jnp.full((rows,), 24.0, jnp.float32)}


def _x(rows=2, seed=1):
    rng = np.random.default_rng(seed)
    f, h, w = LAT
    return jnp.asarray(rng.normal(size=(rows, f, h, w, CFG.in_channels)), jnp.float32)


def test_pab_mask_semantics():
    """count % range != 0 inside the window (pab_mgr.py:54-91)."""
    ts = RFlowSchedule.create(30).timesteps
    masks = broadcast_masks(OPEN_SORA_PAB, ts)
    for i, t in enumerate(ts):
        expected = (i % 2 != 0) and (450 < int(t) < 930)
        assert masks["spatial"][i] == expected, (i, t)
    assert not masks["mlp"].any()  # mlp broadcast off by default


def test_stdit3_forward_shapes():
    params = init_stdit3_params(jax.random.PRNGKey(0), CFG)
    core = make_stdit3_core(CFG, GRID, CAP)
    x, cond = _x(), _cond()
    t = jnp.full((2,), 500.0, jnp.float32)
    hidden, ctx = core.prepare(params, x, t, cond)
    assert hidden.shape == (2, 48, CFG.hidden)
    out = core.head(params, core.trunk(params, hidden, ctx), ctx)
    assert out.shape == (2, 3, 8, 8, CFG.in_channels * 2)
    assert np.isfinite(np.asarray(out)).all()


def test_pab_state_reuse_changes_nothing_on_refresh_steps():
    """On a step whose masks are all False, the PAB trunk must equal the plain
    trunk (it computes everything and just records the outputs)."""
    params = init_stdit3_params(jax.random.PRNGKey(0), CFG)
    ts = RFlowSchedule.create(4).timesteps
    pab = PABConfig(spatial_broadcast=True, spatial_threshold=(450, 930),
                    spatial_range=2)
    core_p = make_stdit3_core(CFG, GRID, CAP, pab=pab, timesteps=ts)
    core_n = make_stdit3_core(CFG, GRID, CAP)
    x, cond = _x(), _cond()
    t = jnp.full((2,), float(ts[0]), jnp.float32)
    hidden, ctx = core_p.prepare(params, x, t, cond)
    state = core_p.init_state(
        params, jax.eval_shape(lambda: hidden), jax.eval_shape(lambda: ctx))
    h_p, state2 = core_p.trunk(params, hidden, ctx, state, jnp.asarray(0))
    h_n = core_n.trunk(params, hidden, ctx)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_n), atol=1e-5)
    # caches must now hold real outputs (non-zero)
    assert float(jnp.abs(state2["sp_attn"]).max()) > 0


def test_open_sora_pipeline_pab():
    cfg = OpenSoraPipelineConfig(tiny=True, num_frames=8, height=32, width=32,
                                 num_sampling_steps=4, caption_len=6,
                                 enable_pab=True, dtype="float32")
    pipe = OpenSoraPipeline(cfg)
    out = pipe.generate("a boat", seed=0)
    assert out.latents.shape == (1, 2, 4, 4, CFG.in_channels)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_open_sora_pipeline_magcache():
    cfg = OpenSoraPipelineConfig(tiny=True, num_frames=8, height=32, width=32,
                                 num_sampling_steps=6, caption_len=6,
                                 use_magcache=True, dtype="float32")
    pipe = OpenSoraPipeline(cfg)
    out = pipe.generate("a boat", seed=0)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_pab_actually_skips_compute():
    """On broadcast steps the cached value must be used: feed a poisoned cache
    and verify the output differs from the fresh-compute result."""
    params = init_stdit3_params(jax.random.PRNGKey(0), CFG)
    ts = np.array([600.0, 590.0])  # both inside window; step 1 broadcasts
    pab = PABConfig(spatial_broadcast=True, spatial_threshold=(450, 930),
                    spatial_range=2)
    core = make_stdit3_core(CFG, GRID, CAP, pab=pab, timesteps=ts)
    x, cond = _x(), _cond()
    t = jnp.full((2,), 590.0, jnp.float32)
    hidden, ctx = core.prepare(params, x, t, cond)
    state = core.init_state(params, jax.eval_shape(lambda: hidden),
                            jax.eval_shape(lambda: ctx))
    poisoned = {k: (v + 7.0 if k == "sp_attn" else v) for k, v in state.items()}
    h_fresh, _ = core.trunk(params, hidden, ctx, state, jnp.asarray(1))
    h_poison, _ = core.trunk(params, hidden, ctx, poisoned, jnp.asarray(1))
    assert np.abs(np.asarray(h_fresh) - np.asarray(h_poison)).max() > 1e-3


def test_x_mask_conditioning():
    """Frames flagged by x_mask ride the t=0 modulation: with all frames
    masked, the output equals running at t=0; with none masked, t path."""
    params = init_stdit3_params(jax.random.PRNGKey(0), CFG)
    core = make_stdit3_core(CFG, GRID, CAP)
    x, cond = _x(1), _cond(1)
    t = jnp.full((1,), 700.0, jnp.float32)
    t0 = jnp.zeros((1,), jnp.float32)

    def full(tv, extra=None):
        c = dict(cond)
        if extra is not None:
            c["x_mask"] = extra
        hidden, ctx = core.prepare(params, x, tv, c)
        return core.head(params, core.trunk(params, hidden, ctx), ctx)

    ref_t = np.asarray(full(t))
    ref_0 = np.asarray(full(t0))
    all_masked = np.asarray(full(t, jnp.zeros((1, GRID[0]), bool)))
    none_masked = np.asarray(full(t, jnp.ones((1, GRID[0]), bool)))
    np.testing.assert_allclose(none_masked, ref_t, atol=1e-5)
    np.testing.assert_allclose(all_masked, ref_0, atol=1e-5)
    # mixed mask differs from both
    mixed = np.asarray(full(t, jnp.asarray([[True] + [False] * (GRID[0] - 1)])))
    assert np.abs(mixed - ref_t).max() > 1e-4
    assert np.abs(mixed - ref_0).max() > 1e-4
