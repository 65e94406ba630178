"""OSP CausalVAE weight-mapping + numeric parity vs a torch oracle.

Oracle transcribed from `autoencoder_kl_open_sora_plan_v120.py`: CausalConv3d
(:40, replicate-front time pad), ResnetBlock3D (:277), AttnBlock3DFix (:360),
Spatial2xTime2x3DDownsample (:418), Spatial2xTime2x3DUpsample (:344),
Encoder/Decoder (:509/:629).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.models.vae_osp import (
    OSPCausalVAE,
    OSPVAEConfig,
    convert_osp_vae_state_dict,
    init_osp_vae_params,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _t_cconv(sd, base, x, stride=(1, 1, 1), spad=None):
    w = sd[f"{base}.conv.weight"]
    b = sd.get(f"{base}.conv.bias")
    kt, kh, kw = w.shape[2], w.shape[3], w.shape[4]
    if kt > 1:
        front = x[:, :, :1].repeat(1, 1, kt - 1, 1, 1)
        x = torch.cat([front, x], dim=2)
    if spad is None:
        spad = (kw // 2, kw // 2, kh // 2, kh // 2)
    x = F.pad(x, spad)
    return F.conv3d(x, w, b, stride=stride)


def _t_res(sd, base, x, groups):
    h = F.silu(F.group_norm(x, groups, sd[f"{base}.norm1.weight"],
                            sd[f"{base}.norm1.bias"], eps=1e-6))
    h = _t_cconv(sd, f"{base}.conv1", h)
    h = F.silu(F.group_norm(h, groups, sd[f"{base}.norm2.weight"],
                            sd[f"{base}.norm2.bias"], eps=1e-6))
    h = _t_cconv(sd, f"{base}.conv2", h)
    if f"{base}.nin_shortcut.conv.weight" in sd:
        x = _t_cconv(sd, f"{base}.nin_shortcut", x)
    return x + h


def _t_attn(sd, base, x, groups):
    h = F.group_norm(x, groups, sd[f"{base}.norm.weight"],
                     sd[f"{base}.norm.bias"], eps=1e-6)
    q = _t_cconv(sd, f"{base}.q", h)
    k = _t_cconv(sd, f"{base}.k", h)
    v = _t_cconv(sd, f"{base}.v", h)
    b, c, t, hh, ww = q.shape
    q = q.permute(0, 2, 1, 3, 4).reshape(b * t, c, hh * ww).permute(0, 2, 1)
    k = k.permute(0, 2, 1, 3, 4).reshape(b * t, c, hh * ww)
    v = v.permute(0, 2, 1, 3, 4).reshape(b * t, c, hh * ww)
    w_ = torch.softmax(torch.bmm(q, k) * c ** -0.5, dim=2)
    h_ = torch.bmm(v, w_.permute(0, 2, 1))
    h_ = h_.reshape(b, t, c, hh, ww).permute(0, 2, 1, 3, 4)
    return x + _t_cconv(sd, f"{base}.proj_out", h_)


def _t_down_s2t2(sd, base, x):
    x = F.pad(x, (0, 1, 0, 1, 0, 0))
    return _t_cconv(sd, f"{base}.conv", x, stride=(2, 2, 2), spad=(0, 0, 0, 0))


def _t_up_s2t2(sd, base, x):
    if x.size(2) > 1:
        x0, xr = x[:, :, :1], x[:, :, 1:]
        xr = F.interpolate(xr, scale_factor=(2, 2, 2), mode="trilinear")
        x0 = F.interpolate(x0, scale_factor=(1, 2, 2), mode="trilinear")
        x = torch.cat([x0, xr], dim=2)
    else:
        x = F.interpolate(x, scale_factor=(1, 2, 2), mode="trilinear")
    return _t_cconv(sd, f"{base}.conv", x)


def _t_encode(sd, cfg, x):
    g = cfg.groups
    h = _t_cconv(sd, "encoder.conv_in", x)
    for i in range(len(cfg.ch_mult)):
        for j in range(cfg.num_res_blocks):
            h = _t_res(sd, f"encoder.down.{i}.block.{j}", h, g)
        if cfg.down_types[i] == "s2t2":
            h = _t_down_s2t2(sd, f"encoder.down.{i}.downsample", h)
    h = _t_res(sd, "encoder.mid.block_1", h, g)
    h = _t_attn(sd, "encoder.mid.attn_1", h, g)
    h = _t_res(sd, "encoder.mid.block_2", h, g)
    h = F.silu(F.group_norm(h, g, sd["encoder.norm_out.weight"],
                            sd["encoder.norm_out.bias"], eps=1e-6))
    h = _t_cconv(sd, "encoder.conv_out", h)
    if cfg.use_quant_layer:
        h = _t_cconv(sd, "quant_conv", h)
    return h


def _t_decode(sd, cfg, z):
    g = cfg.groups
    if cfg.use_quant_layer:
        z = _t_cconv(sd, "post_quant_conv", z)
    h = _t_cconv(sd, "decoder.conv_in", z)
    h = _t_res(sd, "decoder.mid.block_1", h, g)
    h = _t_attn(sd, "decoder.mid.attn_1", h, g)
    h = _t_res(sd, "decoder.mid.block_2", h, g)
    for i in reversed(range(len(cfg.ch_mult))):
        for j in range(cfg.num_res_blocks + 1):
            h = _t_res(sd, f"decoder.up.{i}.block.{j}", h, g)
        if cfg.up_types[i] == "s2t2":
            h = _t_up_s2t2(sd, f"decoder.up.{i}.upsample", h)
    h = F.silu(F.group_norm(h, g, sd["decoder.norm_out.weight"],
                            sd["decoder.norm_out.bias"], eps=1e-6))
    return _t_cconv(sd, "decoder.conv_out", h)


def _synthetic_sd(cfg, seed=0):
    rng = np.random.default_rng(seed)
    sd = {}

    def cconv(name, cin, cout, k):
        kt, kh, kw = (k, k, k) if isinstance(k, int) else k
        sd[f"{name}.conv.weight"] = torch.tensor(
            rng.normal(0, 0.1, (cout, cin, kt, kh, kw)).astype(np.float32))
        sd[f"{name}.conv.bias"] = torch.tensor(
            rng.normal(0, 0.02, (cout,)).astype(np.float32))

    def norm(name, c):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(1, 0.05, (c,)).astype(np.float32))
        sd[f"{name}.bias"] = torch.tensor(
            rng.normal(0, 0.02, (c,)).astype(np.float32))

    def res(base, cin, cout):
        norm(f"{base}.norm1", cin)
        cconv(f"{base}.conv1", cin, cout, 3)
        norm(f"{base}.norm2", cout)
        cconv(f"{base}.conv2", cout, cout, 3)
        if cin != cout:
            cconv(f"{base}.nin_shortcut", cin, cout, 1)

    def attn(base, c):
        norm(f"{base}.norm", c)
        for n in ("q", "k", "v", "proj_out"):
            cconv(f"{base}.{n}", c, c, 1)

    chs = cfg.chs
    c = chs[0]
    cconv("encoder.conv_in", 3, c, 3)
    for i, ch in enumerate(chs):
        for j in range(cfg.num_res_blocks):
            res(f"encoder.down.{i}.block.{j}", c, ch)
            c = ch
        if cfg.down_types[i] == "s2t2":
            cconv(f"encoder.down.{i}.downsample.conv", c, c, 3)
    res("encoder.mid.block_1", c, c)
    attn("encoder.mid.attn_1", c)
    res("encoder.mid.block_2", c, c)
    norm("encoder.norm_out", c)
    cconv("encoder.conv_out", c, 2 * cfg.z_channels, 3)
    if cfg.use_quant_layer:
        cconv("quant_conv", 2 * cfg.z_channels, 2 * cfg.embed_dim, 1)
        cconv("post_quant_conv", cfg.embed_dim, cfg.z_channels, 1)

    c = chs[-1]
    cconv("decoder.conv_in", cfg.z_channels, c, 3)
    res("decoder.mid.block_1", c, c)
    attn("decoder.mid.attn_1", c)
    res("decoder.mid.block_2", c, c)
    for i in reversed(range(len(chs))):
        ch = chs[i]
        for j in range(cfg.num_res_blocks + 1):
            res(f"decoder.up.{i}.block.{j}", c, ch)
            c = ch
        if cfg.up_types[i] == "s2t2":
            cconv(f"decoder.up.{i}.upsample.conv", c, c, 3)
    norm("decoder.norm_out", c)
    cconv("decoder.conv_out", c, 3, 3)
    return sd


def test_osp_vae_numeric_parity_vs_torch():
    cfg = OSPVAEConfig.tiny()
    tsd = _synthetic_sd(cfg, seed=13)
    nsd = {k: v.numpy() for k, v in tsd.items()}
    params = convert_osp_vae_state_dict(nsd, cfg)
    ref = init_osp_vae_params(jax.random.PRNGKey(0), cfg)
    jax.tree.map(lambda a, b: None if a.shape == b.shape else 1 / 0, params, ref)

    vae = OSPCausalVAE(cfg, params)
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (1, 3, 5, 8, 8)).astype(np.float32)  # NCTHW torch
    with torch.no_grad():
        t_lat = _t_encode(tsd, cfg, torch.tensor(x)).numpy()
    mean, logvar = vae.encode(jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    j_lat = np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=-1)
    np.testing.assert_allclose(j_lat, t_lat.transpose(0, 2, 3, 4, 1),
                               rtol=3e-4, atol=3e-4)

    z = rng.normal(0, 1, (1, cfg.embed_dim, 2, 4, 4)).astype(np.float32)
    with torch.no_grad():
        t_px = _t_decode(tsd, cfg, torch.tensor(z)).numpy()
    j_px = np.asarray(vae.decode(jnp.asarray(z.transpose(0, 2, 3, 4, 1))))
    np.testing.assert_allclose(j_px, t_px.transpose(0, 2, 3, 4, 1),
                               rtol=3e-4, atol=3e-4)


def test_osp_vae_temporal_compression():
    """A 4x-time / 8x-space block layout (one spatial-only + two combined
    levels) keeps the first frame: T -> 1 + (T-1)/4, H,W -> /8 — the OSP
    pipeline's latent arithmetic."""
    cfg = OSPVAEConfig(hidden=8, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                       groups=4,
                       down_types=("spatial", "s2t2", "s2t2", ""),
                       up_types=("", "s2t2", "s2t2", "spatial"))
    vae = OSPCausalVAE(cfg, init_osp_vae_params(jax.random.PRNGKey(2), cfg))
    x = jnp.ones((1, 9, 16, 16, 3)) * 0.1
    mean, _ = vae.encode(x)
    assert mean.shape == (1, 3, 2, 2, cfg.embed_dim)
    y = vae.decode(mean)
    assert y.shape[2:] == (16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_osp_vae_v11_style_time_blocks():
    """v1.0/1.1 layout: spatial-only convs + param-free time pool/upsample;
    same 1+(T-1)/4 temporal and /8 spatial compression."""
    cfg = OSPVAEConfig(hidden=8, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                       groups=4,
                       down_types=("spatial", "spatial", "spatial", ""),
                       time_down_types=("", "time", "time", ""),
                       up_types=("", "spatial", "spatial", "spatial"),
                       time_up_types=("", "time", "time", ""))
    vae = OSPCausalVAE(cfg, init_osp_vae_params(jax.random.PRNGKey(3), cfg))
    x = jnp.ones((1, 9, 16, 16, 3)) * 0.1
    mean, _ = vae.encode(x)
    assert mean.shape == (1, 3, 2, 2, cfg.embed_dim)
    y = vae.decode(mean)
    assert y.shape[2:] == (16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_osp_time_blocks_match_torch_oracle():
    """TimeDownsample2x / TimeUpsample2x numeric parity (ref :1530-1552)."""
    from magcache_tpu.models.vae_osp import _time_down2x, _time_up2x

    rng = np.random.default_rng(6)
    x = rng.normal(0, 1, (1, 2, 5, 3, 3)).astype(np.float32)  # NCTHW
    xt = torch.tensor(x)
    front = xt[:, :, :1].repeat(1, 1, 2, 1, 1)
    t_down = F.avg_pool3d(torch.cat([front, xt], dim=2), (3, 1, 1),
                          stride=(2, 1, 1)).numpy()
    j_down = np.asarray(_time_down2x(jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    np.testing.assert_allclose(j_down, t_down.transpose(0, 2, 3, 4, 1),
                               rtol=1e-5, atol=1e-5)

    x0, xr = xt[:, :, :1], xt[:, :, 1:]
    xr = F.interpolate(xr, scale_factor=(2, 1, 1), mode="trilinear")
    t_up = torch.cat([x0, xr], dim=2).numpy()
    j_up = np.asarray(_time_up2x(jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    np.testing.assert_allclose(j_up, t_up.transpose(0, 2, 3, 4, 1),
                               rtol=1e-5, atol=1e-5)


def test_tiled_decode_shape_and_seam_blend():
    """Reference-style spatial tiling + temporal chunking
    (autoencoder_kl_open_sora_plan_v120.py:798-1030): output shape matches
    the whole-pass decode; identical tiles blend to identity."""
    from magcache_tpu.models.vae_osp import _blend_h, _blend_v, _t_chunks

    cfg = OSPVAEConfig.tiny()
    vae = OSPCausalVAE(cfg, init_osp_vae_params(jax.random.PRNGKey(0), cfg))
    # toy tiling constants keeping the reference's exactness identity
    # row_limit == overlap * scale (true for the published 256/0.125 pair)
    vae.tile_latent_min_size = 8
    vae.tile_sample_min_size = 8 * 2 ** (len(cfg.chs) - 1)
    vae.tile_latent_min_size_t = 3
    vae.tile_sample_min_size_t = 5
    z = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 16, 16, cfg.z_channels)),
                    jnp.float32)
    whole = vae.decode(z, use_tiling=False)
    tiled = vae.decode(z, use_tiling=True)
    assert tiled.shape == whole.shape
    assert np.isfinite(np.asarray(tiled)).all()

    # when the overlap regions agree, blending leaves tile b unchanged
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(1, 2, 6, 6, 3)), jnp.float32)
    bv = jnp.concatenate([a[:, :, -3:],
                          jnp.asarray(rng.normal(size=(1, 2, 3, 6, 3)),
                                      jnp.float32)], axis=2)
    np.testing.assert_allclose(np.asarray(_blend_v(a, bv, 3)),
                               np.asarray(bv), atol=1e-6)
    bh = jnp.concatenate([a[:, :, :, -3:],
                          jnp.asarray(rng.normal(size=(1, 2, 6, 3, 3)),
                                      jnp.float32)], axis=3)
    np.testing.assert_allclose(np.asarray(_blend_h(a, bh, 3)),
                               np.asarray(bh), atol=1e-6)
    # temporal chunking covers [0, t) with 1-frame overlaps
    se = _t_chunks(9, 3)
    assert se[0][0] == 0 and se[-1][1] == 9
    for (s0, e0), (s1, e1) in zip(se, se[1:]):
        assert s1 == e0 - 1


def test_tiled_encode_shape():
    cfg = OSPVAEConfig.tiny()
    vae = OSPCausalVAE(cfg, init_osp_vae_params(jax.random.PRNGKey(1), cfg))
    vae.tile_latent_min_size = 8
    vae.tile_sample_min_size = 8 * 2 ** (len(cfg.chs) - 1)
    vae.tile_latent_min_size_t = 3
    vae.tile_sample_min_size_t = 5
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(1, 9, vae.tile_sample_min_size * 2, vae.tile_sample_min_size * 2, 3)),
        jnp.float32)
    m_whole, _ = vae.encode(x, use_tiling=False)
    m_tiled, lv_tiled = vae.encode(x, use_tiling=True)
    assert m_tiled.shape == m_whole.shape
    assert lv_tiled.shape == m_whole.shape
    assert np.isfinite(np.asarray(m_tiled)).all()
