"""CogVideoX 3D VAE tests: shapes, streaming-exact frame-sliced decode,
tiled decode, and published-naming converter layout.

Reference: videosys/models/autoencoders/autoencoder_kl_cogvideox.py
(CausalConv3d :60, SpatialNorm3D :139, tiled_decode :1162)."""

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.models.vae_cogvideox import (
    CogVideoXVAE,
    CogVideoXVAEConfig,
    convert_cogvideox_vae_state_dict,
    init_cogvideox_vae_params,
)


def _build(seed=0, **kw):
    cfg = CogVideoXVAEConfig.tiny(**kw)
    params = init_cogvideox_vae_params(jax.random.PRNGKey(seed), cfg)
    return cfg, CogVideoXVAE(cfg, params)


def test_encode_decode_shapes():
    cfg, vae = _build()
    sp = 2 ** (len(cfg.block_out_channels) - 1)          # 2 for tiny
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 16, 16, 3)),
                    jnp.float32)
    mean, logvar = vae.encode(x)
    # temporal compression 2: (5-1)/2+1 = 3 latent frames
    assert mean.shape == (1, 3, 16 // sp, 16 // sp, cfg.z_channels)
    y = vae.decode(mean)
    assert y.shape == (1, 5, 16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_frame_sliced_decode_streams_conv_caches():
    """Frame-sliced decode carries CausalConv3d caches across slices (the
    reference's conv_cache, :113-131). Like the reference, GroupNorm /
    SpatialNorm statistics are computed per slice, so the result is CLOSE to
    — not bit-identical with — the whole-clip decode; the conv caches must
    still make it far closer than slicing without caches."""
    cfg, vae = _build()
    z = jnp.asarray(np.random.default_rng(1).normal(size=(1, 5, 4, 4,
                                                          cfg.z_channels)),
                    jnp.float32)
    whole = np.asarray(vae.decode(z))

    def sliced_decode(use_caches):
        caches = {}
        outs = []
        fb, T = cfg.frame_batch, z.shape[1]
        rem = T % fb
        s0 = 0
        while s0 < T:
            n = (fb + rem) if s0 == 0 else fb
            out, caches = vae._decode_core(vae.params, z[:, s0:s0 + n],
                                           caches if use_caches else {})
            outs.append(np.asarray(out))
            s0 += n
        return np.concatenate(outs, axis=1)

    with_c = sliced_decode(True)
    without_c = sliced_decode(False)
    assert with_c.shape == whole.shape
    err_with = np.abs(with_c - whole).mean()
    err_without = np.abs(without_c - whole).mean()
    scale = np.abs(whole).mean()
    assert err_with < 0.2 * scale
    assert err_with < err_without  # caches genuinely carry context

    # single-slice case (frame_batch >= T) IS bit-identical
    out1, _ = vae._decode_core(vae.params, z, {})
    np.testing.assert_allclose(np.asarray(out1), whole, rtol=1e-5, atol=1e-5)


def test_tiled_decode_matches_whole_in_interior():
    cfg, vae = _build(tile_latent=4, tile_overlap=0.5)
    z = jnp.asarray(np.random.default_rng(2).normal(size=(1, 3, 8, 8,
                                                          cfg.z_channels)),
                    jnp.float32)
    whole = np.asarray(vae.decode(z))
    tiled = np.asarray(vae.decode_tiled(z))
    assert tiled.shape == whole.shape
    # tiles see truncated receptive fields + per-tile norm stats at seams;
    # the tiled result must stay close to the whole decode overall
    err = np.abs(tiled - whole).mean()
    assert err < 0.35 * (np.abs(whole).mean() + 1e-6)

    # a tile covering the whole latent reproduces the whole decode exactly
    import dataclasses as dc
    big = CogVideoXVAE(dc.replace(cfg, tile_latent=8, tile_overlap=0.0,
                                  frame_batch=8), vae.params)
    np.testing.assert_allclose(np.asarray(big.decode_tiled(z)), whole,
                               rtol=1e-5, atol=1e-5)


def test_converter_key_layout():
    cfg = CogVideoXVAEConfig.tiny()
    chs = cfg.block_out_channels
    rng = np.random.default_rng(3)
    sd = {}

    def c3(name, cin, cout, k=3):
        sd[f"{name}.weight"] = rng.normal(0, .05, (cout, cin, k, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def c2(name, cin, cout):
        sd[f"{name}.weight"] = rng.normal(0, .05, (cout, cin, 3, 3)).astype(np.float32)
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def gn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    def resnet(name, cin, cout, spatial):
        if spatial:
            for nm in ("norm1", "norm2"):
                c = cin if nm == "norm1" else cout
                gn(f"{name}.{nm}.norm_layer", c)
                c3(f"{name}.{nm}.conv_y.conv", cfg.z_channels, c, k=1)
                c3(f"{name}.{nm}.conv_b.conv", cfg.z_channels, c, k=1)
        else:
            gn(f"{name}.norm1", cin)
            gn(f"{name}.norm2", cout)
        c3(f"{name}.conv1.conv", cin, cout)
        c3(f"{name}.conv2.conv", cout, cout)
        if cin != cout:
            c3(f"{name}.conv_shortcut", cin, cout, k=1)

    c3("encoder.conv_in.conv", cfg.in_channels, chs[0])
    cin = chs[0]
    for i, cout in enumerate(chs):
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   cin if j == 0 else cout, cout, False)
        if i < len(chs) - 1:
            c2(f"encoder.down_blocks.{i}.downsamplers.0.conv", cout, cout)
        cin = cout
    for j in range(2):
        resnet(f"encoder.mid_block.resnets.{j}", chs[-1], chs[-1], False)
    gn("encoder.norm_out", chs[-1])
    c3("encoder.conv_out.conv", chs[-1], 2 * cfg.z_channels)

    rev = list(reversed(chs))
    c3("decoder.conv_in.conv", cfg.z_channels, rev[0])
    for j in range(2):
        resnet(f"decoder.mid_block.resnets.{j}", rev[0], rev[0], True)
    cin = rev[0]
    for i, cout in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   cin if j == 0 else cout, cout, True)
        if i < len(rev) - 1:
            c2(f"decoder.up_blocks.{i}.upsamplers.0.conv", cout, cout)
        cin = cout
    gn("decoder.norm_out.norm_layer", rev[-1])
    c3("decoder.norm_out.conv_y.conv", cfg.z_channels, rev[-1], k=1)
    c3("decoder.norm_out.conv_b.conv", cfg.z_channels, rev[-1], k=1)
    c3("decoder.conv_out.conv", rev[-1], cfg.in_channels)

    params = convert_cogvideox_vae_state_dict(sd, cfg)
    ref = init_cogvideox_vae_params(jax.random.PRNGKey(0), cfg)
    jax.tree.map(lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
        AssertionError((a.shape, b.shape))), params, ref)

    vae = CogVideoXVAE(cfg, params)
    z = jnp.ones((1, 3, 4, 4, cfg.z_channels), jnp.float32) * 0.1
    y = vae.decode(z)
    assert np.isfinite(np.asarray(y)).all()


def test_cogvideox_pipeline_with_real_vae_variant():
    """The CogVideoX pipeline decodes through the dedicated 3D VAE
    (memory-capped tiled decode, latent scaling applied)."""
    from magcache_tpu.pipelines.cogvideox import (
        CogVideoXPipeline, CogVideoXPipelineConfig)

    cfg = CogVideoXPipelineConfig(tiny=True, num_frames=5, height=32, width=32,
                                  num_inference_steps=2, dtype="float32")
    vcfg = CogVideoXVAEConfig.tiny(z_channels=16, tile_latent=8,
                                   tile_overlap=0.0, frame_batch=8)
    vae = CogVideoXVAE(vcfg, init_cogvideox_vae_params(jax.random.PRNGKey(0),
                                                       vcfg))
    pipe = CogVideoXPipeline(cfg, vae=vae)
    out = pipe.generate("a train crossing a bridge", seed=0)
    assert out.video is not None and np.isfinite(out.video).all()
