"""Block-granular PAB MLP gating (``pab_mgr.py:108-139``): per-(step, block,
branch) anchor/skip lists, transcribed to static reuse/save masks. Oracle:
a faithful transcription of the reference's ``if_skip_mlp`` decision."""

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.pab import (
    LATTE_PAB,
    OSP_V110_PAB,
    PABConfig,
    mlp_skip_masks,
)


# --- reference-oracle transcription (pab_mgr.py:94-139), decision bits only
def _ref_is_t_in_skip_config(all_timesteps, timestep, config):
    for key in config:
        if key not in all_timesteps:
            continue
        index = all_timesteps.index(key)
        skip_range = all_timesteps[index:index + 1 + int(config[key]["skip_count"])]
        if timestep in skip_range:
            return True, [all_timesteps[index],
                          all_timesteps[index + int(config[key]["skip_count"])]]
    return False, None


def _ref_if_skip_mlp(timestep, block_idx, all_timesteps, config):
    """(reuse_flag, save_flag) from the reference decision structure
    (``flag``/``next_flag`` of ``if_skip_mlp``)."""
    in_skip, skip_range = _ref_is_t_in_skip_config(all_timesteps, timestep,
                                                   config)
    if timestep in config and block_idx in config[timestep]["block"]:
        return False, True          # anchor: compute, save (next_flag)
    if in_skip and block_idx in config[skip_range[0]]["block"]:
        return True, False           # inside the span: reuse
    return False, False


def _as_dict(conf):
    return {int(t): {"block": list(b), "skip_count": int(s)}
            for t, b, s in conf}


def _ddim50_ts():
    from magcache_tpu.schedulers.ddim_eps import DDIMEpsSchedule
    return [int(t) for t in DDIMEpsSchedule.create(50).timesteps]


def test_masks_match_reference_oracle_latte():
    ts = _ddim50_ts()
    conf = _as_dict(LATTE_PAB.mlp_spatial_config)
    masks = mlp_skip_masks(LATTE_PAB, ts, num_blocks=28, temporal=False)
    for i, t in enumerate(ts):
        for b in range(28):
            reuse, save = _ref_if_skip_mlp(t, b, ts, conf)
            assert masks["reuse"][i, b] == reuse, (t, b)
            assert masks["save"][i, b] == save, (t, b)
    # the schedule is non-trivial: 5 anchors x 5 blocks save; 2 skips each
    assert masks["save"].sum() == 5 * 5
    assert masks["reuse"].sum() == 5 * 5 * 2
    # blocks >= 5 never gate
    assert not masks["reuse"][:, 5:].any() and not masks["save"][:, 5:].any()


def test_masks_match_reference_oracle_osp_v110():
    from magcache_tpu.schedulers.pndm import PNDMSchedule
    ts = [int(t) for t in PNDMSchedule.create(150).timesteps]
    conf = _as_dict(OSP_V110_PAB.mlp_temporal_config)
    masks = mlp_skip_masks(OSP_V110_PAB, ts, num_blocks=16, temporal=True)
    for i, t in enumerate(ts):
        for b in range(16):
            reuse, save = _ref_if_skip_mlp(t, b, ts, conf)
            assert masks["reuse"][i, b] == reuse, (t, b)
            assert masks["save"][i, b] == save, (t, b)
    assert masks["save"].any() and masks["reuse"].any()


def test_presets_transcribe_reference_lists():
    """pipeline_latte.py:47-61 and pipeline_open_sora_plan.py:54-85."""
    sp = _as_dict(LATTE_PAB.mlp_spatial_config)
    assert sorted(sp) == [400, 480, 560, 640, 720]
    assert all(v["block"] == [0, 1, 2, 3, 4] and v["skip_count"] == 2
               for v in sp.values())
    assert LATTE_PAB.mlp_temporal_config == LATTE_PAB.mlp_spatial_config
    assert LATTE_PAB.mlp_broadcast

    osp = _as_dict(OSP_V110_PAB.mlp_spatial_config)
    assert sorted(osp) == list(range(426, 739, 24))
    assert len(osp) == 14
    assert all(v["block"] == [0, 1, 2, 3, 4, 5, 6] and v["skip_count"] == 2
               for v in osp.values())
    assert OSP_V110_PAB.mlp_broadcast


def test_window_stride_fallback_masks():
    """Without a block config, mlp gating stays the all-blocks window+stride
    rule (pre-existing behavior)."""
    cfg = PABConfig(mlp_broadcast=True, mlp_threshold=(100, 900), mlp_range=2)
    ts = [950, 800, 700, 600, 50]
    m = mlp_skip_masks(cfg, ts, num_blocks=3)
    # count%2 != 0 and 100 < t < 900 -> steps 1 and 3
    expect = np.array([False, True, False, True, False])
    assert (m["reuse"] == expect[:, None]).all()
    assert (m["save"] == ~expect[:, None]).all()

    off = mlp_skip_masks(PABConfig(), ts, num_blocks=3)
    assert not off["reuse"].any() and not off["save"].any()


def test_latte_block_granular_state_semantics():
    """Anchor saves, span reuses the anchor's output, unlisted blocks never
    touch the cache."""
    from magcache_tpu.models.latte import (
        LatteConfig,
        init_latte_params,
        make_latte_core,
    )

    cfg = LatteConfig.tiny()
    grid = (2, 4, 4)
    ts = [900.0, 800.0, 700.0, 600.0]
    pab = PABConfig(
        mlp_broadcast=True,
        mlp_spatial_config=((800, (0,), 2),),
        mlp_temporal_config=((800, (0,), 2),),
    )
    params = init_latte_params(jax.random.PRNGKey(0), cfg)
    core = make_latte_core(cfg, grid, 6, pab=pab, timesteps=ts)
    core_plain = make_latte_core(cfg, grid, 6)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 8, cfg.in_channels)),
                    jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(1, 6, cfg.caption_dim)),
                             jnp.float32)}

    hs = []
    state = None
    h_in = None
    for i, t in enumerate(ts):
        hidden, ctx = core.prepare(params, x, jnp.full((1,), t, jnp.float32),
                                   cond)
        if state is None:
            state = core.init_state(params, jax.eval_shape(lambda: hidden),
                                    jax.eval_shape(lambda: ctx))
            h_in, ctx0 = hidden, ctx
        h, state = core.trunk(params, hidden, ctx, state, jnp.asarray(i))
        hs.append((np.asarray(h), jax.tree.map(np.asarray, state), ctx))

    # step 0 (t=900, outside every span): pure compute, cache untouched
    assert np.abs(hs[0][1]["sp_mlp"]).max() == 0
    h_plain = core_plain.trunk(params, h_in,  hs[0][2])
    np.testing.assert_allclose(hs[0][0], np.asarray(h_plain), atol=1e-5)

    # step 1 (anchor t=800): block 0 saved, others untouched
    assert np.abs(hs[1][1]["sp_mlp"][0]).max() > 0
    assert np.abs(hs[1][1]["sp_mlp"][1:]).max() == 0
    assert np.abs(hs[1][1]["tp_mlp"][0]).max() > 0

    # steps 2-3 (span): cache bit-identical to the anchor's save
    np.testing.assert_array_equal(hs[2][1]["sp_mlp"], hs[1][1]["sp_mlp"])
    np.testing.assert_array_equal(hs[3][1]["sp_mlp"], hs[1][1]["sp_mlp"])
    np.testing.assert_array_equal(hs[3][1]["tp_mlp"], hs[1][1]["tp_mlp"])

    # reuse actually alters the trajectory vs plain compute at span steps
    for i in (2, 3):
        hidden, ctx = core.prepare(
            params, x, jnp.full((1,), ts[i], jnp.float32), cond)
        h_plain = np.asarray(core_plain.trunk(params, hidden, ctx))
        assert np.abs(hs[i][0] - h_plain).max() > 1e-6


def test_latte_pipeline_block_granular_end_to_end():
    """The LATTE_PAB preset (mlp on, block anchors) drives the pipeline; the
    anchors only fire on the real DDIM timesteps, so a tiny 50-step run must
    hit them and stay finite."""
    from magcache_tpu.pipelines.latte import LattePipeline, LattePipelineConfig

    base = dict(num_frames=4, height=32, width=32, num_sampling_steps=50,
                caption_len=6, tiny=True)
    off = LattePipeline(LattePipelineConfig(**base))
    on = LattePipeline(LattePipelineConfig(enable_pab=True, **base),
                       params=off.params)
    a = np.asarray(off.generate("a cat", seed=3).latents)
    b = np.asarray(on.generate("a cat", seed=3).latents)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-6
