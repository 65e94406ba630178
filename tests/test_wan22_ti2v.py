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
