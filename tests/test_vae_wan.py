"""Wan2.1 VAE (weight-mappable variant) tests: geometry, converter layout.

See models/vae_wan.py's provenance note: architecture transcribed from the
public Wan2.1 VAE; converter validated against synthetic state dicts.
"""

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.models.vae_wan import (
    WanVAE,
    WanVAEConfig,
    convert_wan_vae_state_dict,
    init_wan_vae_params,
)


def test_shapes_tiny():
    cfg = WanVAEConfig.tiny()
    vae = WanVAE(cfg, init_wan_vae_params(jax.random.PRNGKey(0), cfg))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 16, 16, 3)),
                    jnp.float32)
    mean, logvar = vae.encode(x)
    # one 3-D transition in tiny: temporal (5-1)/2+1 = 3, spatial /2
    assert mean.shape == (1, 3, 8, 8, cfg.z_channels)
    y = vae.decode(mean)
    assert y.shape == (1, 5, 16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_full_geometry_stride():
    """Full config reproduces the Wan latent geometry: stride (4, 8, 8),
    16 channels (pipelines/wan.py VAE_STRIDE)."""
    cfg = WanVAEConfig(base=8, num_res_blocks=1)   # full mults, small width
    vae = WanVAE(cfg, init_wan_vae_params(jax.random.PRNGKey(0), cfg))
    x = jnp.zeros((1, 9, 32, 32, 3), jnp.float32)
    mean, _ = vae.encode(x)
    assert mean.shape == (1, 3, 4, 4, 16)
    y = vae.decode(mean)
    assert y.shape == (1, 9, 32, 32, 3)


def make_wan_vae_sd(cfg, seed=1):
    """Synthetic reference-layout state dict for ``cfg`` (the torch key
    naming of Wan2.1_VAE.pth, as consumed by the converter)."""
    dims = [cfg.base * m for m in cfg.dim_mult]
    rng = np.random.default_rng(seed)
    sd = {}

    def c3(name, cin, cout, k=(3, 3, 3)):
        sd[f"{name}.weight"] = rng.normal(0, .05, (cout, cin) + k).astype(np.float32)
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def c2(name, cin, cout, k=3):
        sd[f"{name}.weight"] = rng.normal(0, .05, (cout, cin, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def res(prefix, cin, cout):
        sd[f"{prefix}.residual.0.gamma"] = np.ones((cin, 1, 1), np.float32)
        c3(f"{prefix}.residual.2", cin, cout)
        sd[f"{prefix}.residual.3.gamma"] = np.ones((cout, 1, 1), np.float32)
        c3(f"{prefix}.residual.6", cout, cout)
        if cin != cout:
            c3(f"{prefix}.shortcut", cin, cout, k=(1, 1, 1))

    def attn(prefix, c):
        sd[f"{prefix}.norm.gamma"] = np.ones((c, 1, 1), np.float32)
        c2(f"{prefix}.to_qkv", c, 3 * c, k=1)
        c2(f"{prefix}.proj", c, c, k=1)

    # encoder: flat downsamples sequence
    c3("encoder.conv1", cfg.pixel_channels, dims[0])
    k = 0
    cin = dims[0]
    for i, cout in enumerate(dims):
        for j in range(cfg.num_res_blocks):
            res(f"encoder.downsamples.{k}", cin if j == 0 else cout, cout)
            k += 1
        if i < len(dims) - 1:
            c2(f"encoder.downsamples.{k}.resample.1", cout, cout)
            if cfg.temporal_down[i]:
                c3(f"encoder.downsamples.{k}.time_conv", cout, cout, k=(3, 1, 1))
            k += 1
            cin = cout
    res("encoder.middle.0", dims[-1], dims[-1])
    attn("encoder.middle.1", dims[-1])
    res("encoder.middle.2", dims[-1], dims[-1])
    sd["encoder.head.0.gamma"] = np.ones((dims[-1], 1, 1), np.float32)
    c3("encoder.head.2", dims[-1], 2 * cfg.z_channels)

    rdims = list(reversed(dims))
    tups = list(reversed(cfg.temporal_down))
    c3("decoder.conv1", cfg.z_channels, rdims[0])
    res("decoder.middle.0", rdims[0], rdims[0])
    attn("decoder.middle.1", rdims[0])
    res("decoder.middle.2", rdims[0], rdims[0])
    k = 0
    cin = rdims[0]
    for i, cout in enumerate(rdims):
        for j in range(cfg.num_res_blocks + 1):
            res(f"decoder.upsamples.{k}", cin if j == 0 else cout, cout)
            k += 1
        if i < len(rdims) - 1:
            c2(f"decoder.upsamples.{k}.resample.1", cout, cout // 2)
            if tups[i]:
                c3(f"decoder.upsamples.{k}.time_conv", cout, 2 * cout, k=(3, 1, 1))
            k += 1
            cin = cout // 2
    sd["decoder.head.0.gamma"] = np.ones((rdims[-1], 1, 1), np.float32)
    c3("decoder.head.2", rdims[-1], cfg.pixel_channels)
    c3("conv1", 2 * cfg.z_channels, 2 * cfg.z_channels, k=(1, 1, 1))
    c3("conv2", cfg.z_channels, cfg.z_channels, k=(1, 1, 1))
    return sd


def test_converter_key_layout():
    cfg = WanVAEConfig.tiny()
    sd = make_wan_vae_sd(cfg)
    params = convert_wan_vae_state_dict(sd, cfg)
    ref = init_wan_vae_params(jax.random.PRNGKey(0), cfg)
    jax.tree.map(lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
        AssertionError((a.shape, b.shape))), params, ref)

    vae = WanVAE(cfg, params)
    x = jnp.ones((1, 3, 8, 8, 3), jnp.float32) * 0.2
    mean, _ = vae.encode(x)
    y = vae.decode(mean)
    assert np.isfinite(np.asarray(y)).all()


def test_streamed_decode_equals_whole():
    """Frame-streamed decode with carried causal caches == single-pass decode
    (the official wan VAE's feat-cache loop semantics; also the only
    HBM-feasible path at 480p x 81f)."""
    cfg = WanVAEConfig.tiny()
    vae = WanVAE(cfg, init_wan_vae_params(jax.random.PRNGKey(0), cfg))
    z = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 6, 8, cfg.z_channels)),
                    jnp.float32)
    whole = vae.decode(z, latent_chunk=None)
    for chunk in (1, 2, 3):
        streamed = vae.decode(z, latent_chunk=chunk)
        np.testing.assert_allclose(np.asarray(streamed), np.asarray(whole),
                                   rtol=1e-5, atol=1e-5)


def test_streamed_encode_equals_whole():
    """Chunked encode (1 frame + stride-multiple windows, carried caches,
    stride-phase-aware) == single-pass encode."""
    cfg = WanVAEConfig.tiny()
    vae = WanVAE(cfg, init_wan_vae_params(jax.random.PRNGKey(1), cfg))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 9, 16, 16, 3)),
                    jnp.float32)
    m_whole, lv_whole = vae.encode(x, pixel_chunk=None)
    for chunk in (2, 4):
        m_s, lv_s = vae.encode(x, pixel_chunk=chunk)
        np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_whole),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lv_s), np.asarray(lv_whole),
                                   rtol=1e-5, atol=1e-5)


def test_latent_normalization_roundtrip():
    """(z - mean)/std on encode, inverse on decode — identity when unset."""
    import dataclasses as dc
    cfg = WanVAEConfig.tiny()
    params = init_wan_vae_params(jax.random.PRNGKey(2), cfg)
    zc = cfg.z_channels
    norm_cfg = dc.replace(cfg, latent_mean=tuple(0.1 * i for i in range(zc)),
                          latent_std=tuple(1.0 + 0.05 * i for i in range(zc)))
    plain, normed = WanVAE(cfg, params), WanVAE(norm_cfg, params)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 5, 16, 16, 3)),
                    jnp.float32)
    m0, _ = plain.encode(x, pixel_chunk=None)
    m1, _ = normed.encode(x, pixel_chunk=None)
    mean = np.asarray(norm_cfg.latent_mean)
    std = np.asarray(norm_cfg.latent_std)
    np.testing.assert_allclose(np.asarray(m1), (np.asarray(m0) - mean) / std,
                               rtol=1e-5, atol=1e-5)
    # decode undoes it: same pixels from the respective latents
    y0 = plain.decode(m0, latent_chunk=None)
    y1 = normed.decode(m1, latent_chunk=None)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)


def test_bf16_compute_dtype_decode():
    # bf16 conv path: chunked == whole stays exact (same ops, same dtype),
    # output is f32, and values track the f32 path within bf16 tolerance
    import dataclasses

    cfg = WanVAEConfig.tiny()
    key = jax.random.PRNGKey(5)
    params = init_wan_vae_params(key, cfg)
    z = jax.random.normal(key, (1, 5, 8, 8, cfg.z_channels), jnp.float32)

    vae32 = WanVAE(cfg, params)
    vae16 = WanVAE(dataclasses.replace(cfg, dtype="bfloat16"), params)
    y32 = vae32.decode(z)
    y16 = vae16.decode(z)
    assert y16.dtype == jnp.float32
    assert y16.shape == y32.shape
    rel = float(jnp.max(jnp.abs(y16 - y32)) / (jnp.max(jnp.abs(y32)) + 1e-8))
    assert rel < 0.05, rel
    # streamed vs whole-clip in bf16: the two programs tile their convs
    # differently, so the f32 accumulators reassociate — agreement is
    # ulp-level rather than bit-exact (the f32 path keeps the bit-exact
    # guarantee, test_streamed_decode_matches_whole)
    y16_whole = vae16.decode(z, latent_chunk=None)
    assert float(jnp.max(jnp.abs(y16 - y16_whole))) < 0.03


def test_sniff_config_roundtrip_nondefault_shapes():
    """Shape-sniffing recovers the construction config from the state dict
    alone, including non-default geometries (VERDICT r2 Next #8)."""
    from magcache_tpu.models.vae_wan import sniff_wan_vae_config

    for cfg in (
            WanVAEConfig.tiny(),
            WanVAEConfig(base=8, num_res_blocks=1),              # full mults
            WanVAEConfig(base=4, z_channels=8, dim_mult=(1, 2, 2),
                         num_res_blocks=3,
                         temporal_down=(True, False)),
            WanVAEConfig(base=6, z_channels=4, dim_mult=(1, 4),
                         num_res_blocks=2, temporal_down=(False,)),
            # Wan2.2-VAE layout: 2x2 pixel patchify in front (conv1 in=12)
            WanVAEConfig(base=4, z_channels=12, dim_mult=(1, 2),
                         num_res_blocks=1, temporal_down=(True,),
                         patchify=2)):
        sniffed = sniff_wan_vae_config(make_wan_vae_sd(cfg))
        assert sniffed.base == cfg.base
        assert sniffed.z_channels == cfg.z_channels
        assert sniffed.dim_mult == tuple(cfg.dim_mult)
        assert sniffed.num_res_blocks == cfg.num_res_blocks
        assert sniffed.temporal_down == tuple(cfg.temporal_down)
        assert sniffed.patchify == cfg.patchify
        # the sniffed config loads the dict it was sniffed from
        params = convert_wan_vae_state_dict(make_wan_vae_sd(cfg), sniffed)
        ref = init_wan_vae_params(jax.random.PRNGKey(0), sniffed)
        jax.tree.map(lambda a, b: None if a.shape == b.shape else
                     (_ for _ in ()).throw(AssertionError((a.shape, b.shape))),
                     params, ref)


def test_wan22_patchify_geometry():
    """Wan2.2-VAE layout: 2x2 pixel-unshuffle in front of the backbone gives
    2x the backbone's spatial stride; encode/decode round-trip pixel shapes
    (models/vae_wan.py WAN22_VAE; ti2v-5B latent space is 16x16x4 @ 48ch)."""
    cfg = WanVAEConfig(base=4, z_channels=12, dim_mult=(1, 2),
                       num_res_blocks=1, temporal_down=(True,), patchify=2)
    vae = WanVAE(cfg, init_wan_vae_params(jax.random.PRNGKey(0), cfg))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 32, 32, 3)),
                    jnp.float32)
    mean, logvar = vae.encode(x)
    # one 3-D transition (/2 each) * patchify (/2 spatial) -> t:3, hw:/4
    assert mean.shape == (1, 3, 8, 8, cfg.z_channels)
    y = vae.decode(mean)
    assert y.shape == (1, 5, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_patchify_pixels_roundtrip_and_order():
    """_patchify_pixels matches torch's '(c p q) h w' channel order and
    inverts exactly."""
    from magcache_tpu.models.vae_wan import (_patchify_pixels,
                                             _unpatchify_pixels)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 4, 6, 3)),
                    jnp.float32)
    p = _patchify_pixels(x, 2)
    assert p.shape == (2, 3, 2, 3, 12)
    # channel order (c, dh, dw): out[..., c*4 + dh*2 + dw] = x[..., h*2+dh, w*2+dw, c]
    xn = np.asarray(x)
    pn = np.asarray(p)
    for c in range(3):
        for dh in range(2):
            for dw in range(2):
                np.testing.assert_array_equal(
                    pn[..., c * 4 + dh * 2 + dw],
                    xn[:, :, dh::2, dw::2, c])
    np.testing.assert_array_equal(np.asarray(_unpatchify_pixels(p, 2)), xn)


def test_wan22_full_config_stride():
    """The published WAN22_VAE constants produce the ti2v-5B latent space:
    stride (4, 16, 16), 48 channels."""
    from magcache_tpu.models.vae_wan import WAN22_VAE
    assert WAN22_VAE.z_channels == 48
    assert WAN22_VAE.patchify == 2
    assert WAN22_VAE.pixel_channels == 12
    # spatial stride = patchify * 2^(#transitions) = 2 * 8 = 16
    assert len(WAN22_VAE.dim_mult) == 4 and WAN22_VAE.base == 160
