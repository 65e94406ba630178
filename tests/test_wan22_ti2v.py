"""Wan2.2 TI2V-5B: dense trunk on Wan2.2-VAE latents; i2v = frame-0 latent
replacement re-imposed after every solver step (the reference routes img
through the external WanTI2V, MagCache4Wan2.2/magcache_generate.py:719-747).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig


def _cfg(**kw):
    base = dict(model="wan2.2-ti2v-5B-t2v", task="ti2v", tiny=True,
                size=(64, 32), frame_num=9, sample_steps=6,
                sample_solver="unipc", sample_shift=5.0, dtype="float32")
    base.update(kw)
    return WanPipelineConfig(**base)


def _image():
    rng = np.random.default_rng(0)
    return (rng.random((48, 96, 3)) * 255).astype(np.uint8)


def test_ti2v_text_only_runs():
    """Without an image the ti2v task is plain t2v (post_step is None)."""
    pipe = WanPipeline(_cfg())
    out = pipe.generate("a cat", seed=0)
    assert out.latents.shape == (1,) + pipe.latent_shape
    assert np.isfinite(np.asarray(out.latents)).all()


@pytest.mark.parametrize("solver", ["unipc", "euler"])
def test_ti2v_latent_replacement_clamps_frame0(solver):
    """The encoded image must survive sampling exactly as latent frame 0
    (latent replacement applied after every solver update)."""
    pipe = WanPipeline(_cfg(sample_solver=solver))
    img_lat = pipe.encode_ti2v(_image())
    assert img_lat.shape == (1, 1) + pipe.latent_shape[1:3] + (
        pipe.latent_shape[3],)
    out = pipe.generate("a cat", seed=0, image=_image())
    lat = np.asarray(out.latents)
    np.testing.assert_array_equal(lat[:, 0], np.asarray(img_lat)[:, 0])
    assert np.isfinite(lat).all()
    # and the conditioning actually changes the rest of the video
    free = np.asarray(pipe.generate("a cat", seed=0).latents)
    assert np.abs(lat[:, 1:] - free[:, 1:]).max() > 1e-5


def test_ti2v_magcache_keeps_clamp():
    pipe = WanPipeline(_cfg(use_magcache=True, magcache_thresh=0.5,
                            magcache_K=4, retention_ratio=0.2))
    img_lat = pipe.encode_ti2v(_image())
    out = pipe.generate("a cat", seed=1, image=_image())
    lat = np.asarray(out.latents)
    np.testing.assert_array_equal(lat[:, 0], np.asarray(img_lat)[:, 0])
    assert np.isfinite(lat).all()


def test_ti2v_full_config_geometry():
    """Non-tiny 5B preset: 48-ch Wan2.2 latent space at 16x16x4 stride,
    dense 3072-dim trunk with no CLIP branch."""
    cfg = WanPipelineConfig(model="wan2.2-ti2v-5B-t2v", task="ti2v",
                            size=(1280, 704), frame_num=121,
                            sample_steps=50, sample_solver="unipc",
                            sample_shift=5.0)
    assert cfg.latent_channels == 48
    assert cfg.vae_stride == (4, 16, 16)
    assert cfg.latent_grid() == (31, 44, 80)
    mc = cfg.model_config()
    assert (mc.dim, mc.layers, mc.heads) == (3072, 30, 24)
    assert mc.in_channels == 48 and mc.out_channels == 48
    assert mc.model_type == "t2v"           # no CLIP/mask i2v branch


def test_ti2v_per_token_t_zero_equivalence():
    """With t=0 the per-token-timestep pair degenerates to the uniform path:
    segmented forward must be exactly the unsegmented forward."""
    import jax
    from magcache_tpu.models.wan import (WanConfig, init_wan_params,
                                         make_wan_core)
    cfg = WanConfig.tiny()
    grid = (3, 2, 4)
    core = make_wan_core(cfg, grid)
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 3, 4, 8, cfg.in_channels)), jnp.float32)
    ctxt = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)),
                       jnp.float32)
    img = jnp.zeros((1, 1, 4, 8, cfg.in_channels), jnp.float32)

    def fwd(cond, t):
        hidden, ctx = core.prepare(params, x, t, cond)
        return np.asarray(core.head(params, core.trunk(params, hidden, ctx),
                                    ctx))

    t0 = jnp.zeros((1,), jnp.float32)
    np.testing.assert_allclose(
        fwd({"context": ctxt, "ti2v_img": img}, t0),
        fwd({"context": ctxt}, t0), rtol=1e-5, atol=1e-5)
    # at t != 0 the conditioned-frame modulation runs at t=0 -> outputs differ
    t5 = jnp.full((1,), 500.0, jnp.float32)
    a = fwd({"context": ctxt}, t5)
    b = fwd({"context": ctxt, "ti2v_img": img}, t5)
    assert np.abs(a - b).max() > 1e-4


def test_ti2v_head_prefix_uses_t0_row():
    """Order check on the segmented head (per-token, no attention mixing):
    frame-0 rows must equal the t=0 head, later frames the t=t head."""
    import jax
    from magcache_tpu.models.wan import (WanConfig, init_wan_params,
                                         make_wan_core)
    cfg = WanConfig.tiny()
    grid = (3, 2, 4)
    core = make_wan_core(cfg, grid)
    params = init_wan_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 3, 4, 8, cfg.in_channels)), jnp.float32)
    ctxt = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)),
                       jnp.float32)
    img = jnp.zeros((1, 1, 4, 8, cfg.in_channels), jnp.float32)
    h = jnp.asarray(rng.normal(size=(1, 3 * 2 * 4, cfg.dim)), jnp.float32)

    t5 = jnp.full((1,), 500.0, jnp.float32)
    t0 = jnp.zeros((1,), jnp.float32)
    _, ctx_seg = core.prepare(params, x, t5, {"context": ctxt,
                                              "ti2v_img": img})
    _, ctx_t5 = core.prepare(params, x, t5, {"context": ctxt})
    _, ctx_t0 = core.prepare(params, x, t0, {"context": ctxt})
    out_seg = np.asarray(core.head(params, h, ctx_seg))
    out_t5 = np.asarray(core.head(params, h, ctx_t5))
    out_t0 = np.asarray(core.head(params, h, ctx_t0))
    np.testing.assert_allclose(out_seg[:, 0], out_t0[:, 0],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out_seg[:, 1:], out_t5[:, 1:],
                               rtol=1e-6, atol=1e-6)


def test_wan22_i2v_no_clip_branch():
    """Wan2.2 A14B i2v: y-concat only — no CLIP params, no clip_fea in cond
    (the reference forward never consumes clip_fea,
    MagCache4Wan2.2/magcache_generate.py:216-246)."""
    cfg = WanPipelineConfig(model="wan2.2-i2v-A14B", task="i2v", tiny=True,
                            size=(64, 32), frame_num=9, sample_steps=4,
                            sample_solver="unipc", sample_shift=5.0,
                            dtype="float32")
    assert not cfg.model_config().has_clip
    pipe = WanPipeline(cfg)
    assert "img_emb" not in pipe.params
    assert "cross_k_img" not in pipe.params["blocks"]
    out = pipe.generate("a cat", seed=0, image=_image())
    assert np.isfinite(np.asarray(out.latents)).all()
    # full config keeps the 36-ch y-concat input without the branch
    full = WanPipelineConfig(model="wan2.2-i2v-A14B", task="i2v",
                             size=(832, 480), frame_num=81, sample_steps=40,
                             sample_solver="unipc", sample_shift=5.0)
    mc = full.model_config()
    assert mc.in_channels == 36 and not mc.has_clip
    # Wan2.1 i2v keeps its CLIP branch
    w21 = WanPipelineConfig(model="wan2.1-i2v-480p", task="i2v",
                            size=(832, 480), frame_num=81, sample_steps=40,
                            sample_solver="unipc", sample_shift=3.0)
    assert w21.model_config().has_clip
