"""Wan DiT tests (tiny config): shapes, dual-lane CFG MagCache, i2v branch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.core.magcache import compute_skip_schedule
from magcache_tpu.core.presets import make_config
from magcache_tpu.core.sampler import calibrate_euler, sample_euler, sample_unipc
from magcache_tpu.models.wan import (
    WanConfig,
    init_wan_params,
    make_wan_core,
    patchify,
    unpatchify,
    wan_rope_tables,
)
from magcache_tpu.schedulers.flow_match import FlowMatchSchedule
from magcache_tpu.schedulers.unipc import UniPCSchedule

CFG = WanConfig.tiny()
GRID = (3, 4, 4)  # patch grid (F, H, W)
LAT = (3, 8, 8)   # latent shape (pt,ph,pw = 1,2,2)


@pytest.fixture(scope="module")
def model():
    params = init_wan_params(jax.random.PRNGKey(0), CFG)
    return make_wan_core(CFG, GRID), params


def _cond(batch=1, lanes=1, seed=0):
    rng = np.random.default_rng(seed)
    ctx = rng.normal(size=(batch * lanes, CFG.text_len, CFG.text_dim))
    return {"context": jnp.asarray(ctx, jnp.float32)}


def _x(batch=1, seed=1):
    rng = np.random.default_rng(seed)
    f, h, w = LAT
    return jnp.asarray(rng.normal(size=(batch, f, h, w, CFG.in_channels)), jnp.float32)


def test_patchify_roundtrip():
    lat = _x(2)
    p = patchify(CFG, lat)
    assert p.shape == (2, 3 * 4 * 4, CFG.in_channels * 4)
    cfg_out = WanConfig.tiny(out_channels=CFG.in_channels)
    np.testing.assert_array_equal(np.asarray(unpatchify(cfg_out, p, GRID)),
                                  np.asarray(lat))


def test_forward_shapes(model):
    core, params = model
    x = _x(2)
    t = jnp.full((2,), 500.0, jnp.float32)
    hidden, ctx = core.prepare(params, x, t, _cond(2))
    assert hidden.shape == (2, 48, CFG.dim)
    out = core.head(params, core.trunk(params, hidden, ctx), ctx)
    assert out.shape == (2, 3, 8, 8, CFG.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_dual_lane_magcache_unipc(model):
    """The flagship path: Wan preset, dual-lane CFG, UniPC solver."""
    core, params = model
    steps = 10
    sch = UniPCSchedule.create(steps, shift=3.0)
    cache_cfg = make_config("wan2.1-t2v-1.3B", steps)
    assert compute_skip_schedule(cache_cfg).sum() > 0
    x = _x()
    cond = _cond(1, lanes=2)
    full = sample_unipc(core, params, x, cond, sch, guidance_scale=5.0)
    cached = sample_unipc(core, params, x, cond, sch, cache_cfg=cache_cfg,
                          guidance_scale=5.0)
    assert cached.shape == full.shape
    assert np.isfinite(np.asarray(cached)).all()


def test_wan22_expert_switch_schedule(model):
    """Wan2.2 A14B: high-noise expert for t >= boundary, low-noise after;
    MagCache applied only to the high-noise phase with split-step gating."""
    steps = 8
    sch = FlowMatchSchedule.create(steps, shift=5.0)
    boundary = sch.boundary_step(0.9)
    assert 0 < boundary < steps
    cfg22 = make_config("wan2.2-t2v-A14B", steps, split_step=boundary * 2,
                        mode="t2v")
    sched = compute_skip_schedule(cfg22)
    assert len(sched) == steps * 2


def test_i2v_variant():
    cfg = WanConfig.tiny(model_type="i2v", in_channels=36, clip_dim=20,
                         clip_tokens=5)
    params = init_wan_params(jax.random.PRNGKey(1), cfg)
    core = make_wan_core(cfg, GRID)
    rng = np.random.default_rng(0)
    f, h, w = LAT
    x = jnp.asarray(rng.normal(size=(1, f, h, w, 16)), jnp.float32)
    cond = {
        "context": jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)), jnp.float32),
        "clip_fea": jnp.asarray(rng.normal(size=(1, 5, 20)), jnp.float32),
        "y": jnp.asarray(rng.normal(size=(1, f, h, w, 20)), jnp.float32),
    }
    t = jnp.full((1,), 500.0, jnp.float32)
    hidden, ctx = core.prepare(params, x, t, cond)
    assert ctx["context"].shape == (1, 5 + cfg.text_len, cfg.dim)
    out = core.head(params, core.trunk(params, hidden, ctx), ctx)
    assert out.shape == (1, f, h, w, cfg.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_calibration_on_wan(model):
    core, params = model
    steps = 5
    sch = FlowMatchSchedule.create(steps, shift=3.0)
    xf, stats = calibrate_euler(
        core, params, _x(), _cond(1, lanes=2), timesteps=sch.timesteps,
        dts=np.diff(sch.sigmas), lanes=2, guidance_scale=5.0)
    assert stats.shape == (steps - 1, 2, 3)
    s = np.asarray(stats)
    assert np.isfinite(s).all()
    assert (s[:, :, 0] > 0).all()  # norm ratios positive


def test_rope_split_dims():
    cos, sin = wan_rope_tables(CFG, GRID)
    assert cos.shape == (48, CFG.head_dim // 2)
    assert np.isfinite(cos).all()


def test_vace_variant():
    """VACE: conditioning-video hints must reach the trunk (A1 vace forward,
    magcache_generate.py:439-560)."""
    cfg = WanConfig.tiny(vace_layers=(0,), vace_in_channels=8)
    params = init_wan_params(jax.random.PRNGKey(2), cfg)
    core = make_wan_core(cfg, GRID)
    rng = np.random.default_rng(0)
    f, h, w = LAT
    x = jnp.asarray(rng.normal(size=(1, f, h, w, cfg.in_channels)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(1, f, h, w, 8)), jnp.float32)
    cond = {"context": jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)), jnp.float32),
            "vace_context": vc}
    t = jnp.full((1,), 500.0, jnp.float32)
    hidden, ctx = core.prepare(params, x, t, cond)
    out = core.head(params, core.trunk(params, hidden, ctx), ctx)
    assert out.shape == (1, f, h, w, cfg.out_channels)
    assert np.isfinite(np.asarray(out)).all()
    # different vace context -> different output
    cond2 = dict(cond); cond2["vace_context"] = vc * 2.0
    hidden2, ctx2 = core.prepare(params, x, t, cond2)
    out2 = core.head(params, core.trunk(params, hidden2, ctx2), ctx2)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-4
    # vace_scale=0 silences the hints -> equals plain trunk of a no-vace model
    cond3 = dict(cond); cond3["vace_scale"] = 0.0
    hidden3, ctx3 = core.prepare(params, x, t, cond3)
    out3 = core.head(params, core.trunk(params, hidden3, ctx3), ctx3)
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-4


def test_vace_pipeline_generate_with_src_video():
    """task=vace: the pipeline packs [inactive; reactive; 8x8 mask] into the
    96-channel vace_context (wan.WanVace.prepare_source semantics) and the
    hints change the output."""
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig

    cfg = WanPipelineConfig(task="vace", tiny=True, size=(64, 32), frame_num=9,
                            sample_steps=2, sample_solver="euler",
                            dtype="float32")
    pipe = WanPipeline(cfg)
    rng = np.random.default_rng(0)
    vid = rng.random((9, 24, 40, 3)).astype(np.float32)
    mask = (rng.random((9, 24, 40)) > 0.5).astype(np.float32)

    vc = pipe.encode_vace(vid, mask)
    lf, lh, lw, _ = pipe.latent_shape
    assert vc.shape == (1, lf, lh, lw, 96)

    out1 = np.asarray(pipe.generate("edit the sky", seed=0, src_video=vid,
                                    src_mask=mask).latents)
    out2 = np.asarray(pipe.generate("edit the sky", seed=0).latents)  # zeros ctx
    assert np.isfinite(out1).all()
    assert np.abs(out1 - out2).max() > 1e-6


def test_vace_r2v_reference_images():
    """VACE R2V (--src_ref_images, magcache_generate.py:1096): reference
    images become prepended latent frames (inactive stream; zero reactive +
    mask), the sampled grid grows by n_ref, and the output is trimmed back
    to the requested frame count."""
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig

    cfg = WanPipelineConfig(task="vace", tiny=True, size=(64, 32), frame_num=9,
                            sample_steps=2, sample_solver="euler",
                            dtype="float32", vace_ref_images=2)
    pipe = WanPipeline(cfg)
    rng = np.random.default_rng(1)
    refs = [rng.random((20, 30, 3)).astype(np.float32) for _ in range(2)]
    vid = rng.random((9, 24, 40, 3)).astype(np.float32)

    vc = pipe.encode_vace(vid, None, refs)
    lf, lh, lw, _ = pipe.latent_shape          # includes the 2 ref frames
    assert vc.shape == (1, lf, lh, lw, 96)
    # ref rows: zeros in reactive(16:32) and mask(32:) channels
    assert np.asarray(vc[:, :2, :, :, 16:]).max() == 0.0
    assert np.abs(np.asarray(vc[:, :2, :, :, :16])).max() > 0.0

    out = pipe.generate("restyle like the refs", seed=0, src_video=vid,
                        src_ref_images=refs)
    lat = np.asarray(out.latents)
    assert lat.shape[1] == lf - 2              # trimmed
    assert np.isfinite(lat).all()

    with pytest.raises(AssertionError):
        pipe.encode_vace(vid, None, None)      # count mismatch vs config
