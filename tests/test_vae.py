"""VAE tests: shapes, exact streaming (chunked == full), causality, tiling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.models.vae import (
    CausalVAE,
    CausalVAEConfig,
    ImageVAE,
    ImageVAEConfig,
    init_causal_vae_params,
    init_image_vae_params,
)


@pytest.fixture(scope="module")
def video_vae():
    cfg = CausalVAEConfig.tiny()
    params = init_causal_vae_params(jax.random.PRNGKey(0), cfg)
    return CausalVAE(cfg, params)


@pytest.fixture(scope="module")
def image_vae():
    cfg = ImageVAEConfig.tiny()
    params = init_image_vae_params(jax.random.PRNGKey(0), cfg)
    return ImageVAE(cfg, params)


def test_video_encode_decode_shapes(video_vae):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 16, 16, 3)),
                    jnp.float32)
    mean, logvar = video_vae.encode(x)
    # one temporal downsample (x2), one spatial (x2) in the tiny config
    assert mean.shape == (1, 3, 8, 8, video_vae.cfg.z_channels)
    y = video_vae.decode(mean)
    assert y.shape[0] == 1 and y.shape[2] == 16 and y.shape[3] == 16
    assert y.shape[1] == 1 + (mean.shape[1] - 1) * 2  # causal time upsample
    assert np.isfinite(np.asarray(y)).all()


def test_chunked_decode_equals_full(video_vae):
    """The streaming decode with carried causal caches must reproduce the
    full-clip decode exactly — the property the reference's feat-cache
    machinery is for."""
    z = jnp.asarray(np.random.default_rng(1).normal(size=(1, 6, 8, 8, 4)),
                    jnp.float32)
    full = np.asarray(video_vae.decode(z))
    for chunk in (1, 2, 3):
        stream = np.asarray(video_vae.decode_chunked(z, chunk=chunk))
        np.testing.assert_allclose(stream, full, atol=1e-4, rtol=1e-4,
                                   err_msg=f"chunk={chunk}")


def test_decoder_is_causal(video_vae):
    """Earlier output frames must not depend on later latent frames."""
    rng = np.random.default_rng(2)
    z1 = jnp.asarray(rng.normal(size=(1, 6, 8, 8, 4)), jnp.float32)
    z2 = z1.at[:, 4:].set(jnp.asarray(rng.normal(size=(1, 2, 8, 8, 4))))
    y1 = np.asarray(video_vae.decode(z1))
    y2 = np.asarray(video_vae.decode(z2))
    # frames from the first 3 latents (= 1 + 2*2 = 5 pixel frames) identical
    np.testing.assert_allclose(y1[:, :5], y2[:, :5], atol=1e-5)


def test_image_vae_roundtrip_shapes(image_vae):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    mean, logvar = image_vae.encode(x)
    assert mean.shape == (2, 16, 16, 4)
    y = image_vae.decode(mean)
    assert y.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_image_tiled_decode_close(image_vae):
    z = jnp.asarray(np.random.default_rng(3).normal(size=(1, 24, 24, 4)),
                    jnp.float32)
    full = np.asarray(image_vae.decode(z))
    tiled = np.asarray(image_vae.decode_tiled(z, tile=16, overlap=4))
    assert tiled.shape == full.shape
    # tiling is an approximation (conv receptive fields cross tile borders —
    # same as the reference's tiled decode); with random weights boundary
    # effects are large, so assert the outputs are strongly correlated
    corr = np.corrcoef(tiled.ravel(), full.ravel())[0, 1]
    assert corr > 0.97, corr
    assert np.median(np.abs(tiled - full)) < 0.15


def test_micro_frame_vae_roundtrip_shapes(video_vae, image_vae):
    from magcache_tpu.models.vae import MicroFrameVAE
    import dataclasses
    # temporal VAE over the spatial VAE's latent channels
    from magcache_tpu.models.vae import CausalVAE, CausalVAEConfig, init_causal_vae_params
    tcfg = CausalVAEConfig.tiny(in_channels=image_vae.cfg.z_channels)
    tvae = CausalVAE(tcfg, init_causal_vae_params(jax.random.PRNGKey(3), tcfg))
    vae = MicroFrameVAE(image_vae, tvae, micro_frame_size=5)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 10, 16, 16, 3)),
                    jnp.float32)
    z = vae.encode(x)
    # two chunks of 5 frames -> each 1+(5-1)/2 = 3 latents; spatial /2 twice
    # (the 2-D VAE and the temporal VAE each halve space in the tiny configs)
    assert z.shape == (1, 6, 4, 4, tcfg.z_channels)
    y = vae.decode(z)
    assert y.shape[0] == 1 and y.shape[2:] == (16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_micro_frame_chunks_independent(video_vae, image_vae):
    """Micro-frame chunks decode independently: changing a later chunk's
    latents must not change the earlier chunk's frames."""
    from magcache_tpu.models.vae import CausalVAE, CausalVAEConfig, init_causal_vae_params, MicroFrameVAE
    tcfg = CausalVAEConfig.tiny(in_channels=image_vae.cfg.z_channels)
    tvae = CausalVAE(tcfg, init_causal_vae_params(jax.random.PRNGKey(3), tcfg))
    vae = MicroFrameVAE(image_vae, tvae, micro_frame_size=5)
    z = jnp.asarray(np.random.default_rng(1).normal(size=(1, 6, 4, 4, tcfg.z_channels)),
                    jnp.float32)
    y1 = np.asarray(vae.decode(z))
    z2 = z.at[:, 3:].add(5.0)
    y2 = np.asarray(vae.decode(z2))
    first_chunk_frames = 1 + (3 - 1) * 2  # 3 latents -> 5 frames
    np.testing.assert_array_equal(y1[:, :first_chunk_frames],
                                  y2[:, :first_chunk_frames])
    assert np.abs(y1[:, first_chunk_frames:] - y2[:, first_chunk_frames:]).max() > 1e-3
