"""OpenSora VAE_Temporal weight-mapping + numeric parity vs a torch oracle.

The oracle transcribes the reference MAGVIT-style modules
(`autoencoder_kl_open_sora.py`: CausalConv3d :89, ResBlock :127, Encoder :177,
Decoder :275, VAE_Temporal :379) so bit-level agreement validates the
published OpenSora-VAE-v1.2 `temporal_vae.*` weights path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.models.vae_temporal import (
    VAETemporal,
    VAETemporalConfig,
    convert_vae_temporal_state_dict,
    init_vae_temporal_params,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _t_cconv(sd, base, x, stride=1):
    w = sd[f"{base}.conv.weight"]
    b = sd.get(f"{base}.conv.bias")
    kt, kh, kw = w.shape[2], w.shape[3], w.shape[4]
    tp = (kt - 1) + (1 - stride)
    x = F.pad(x, (kw // 2, kw // 2, kh // 2, kh // 2, tp, 0))
    return F.conv3d(x, w, b, stride=(stride, 1, 1))


def _t_res(sd, base, x, groups):
    cin = sd[f"{base}.conv1.conv.weight"].shape[1]
    cout = sd[f"{base}.conv1.conv.weight"].shape[0]
    h = F.silu(F.group_norm(x, groups, sd[f"{base}.norm1.weight"],
                            sd[f"{base}.norm1.bias"]))
    h = _t_cconv(sd, f"{base}.conv1", h)
    h = F.silu(F.group_norm(h, groups, sd[f"{base}.norm2.weight"],
                            sd[f"{base}.norm2.bias"]))
    h = _t_cconv(sd, f"{base}.conv2", h)
    if cin != cout:
        x = _t_cconv(sd, f"{base}.conv3", x)
    return x + h


def _t_encode(sd, cfg, x):
    g = cfg.groups
    nb = len(cfg.channel_multipliers)
    tf = cfg.time_factor
    pad = (tf - x.shape[2] % tf) % tf
    if pad:
        x = F.pad(x, (0, 0, 0, 0, pad, 0))
    h = _t_cconv(sd, "encoder.conv_in", x)
    for i in range(nb):
        for j in range(cfg.num_res_blocks):
            h = _t_res(sd, f"encoder.block_res_blocks.{i}.{j}", h, g)
        if i < nb - 1 and f"encoder.conv_blocks.{i}.conv.weight" in sd:
            h = _t_cconv(sd, f"encoder.conv_blocks.{i}", h, stride=2)
    for j in range(cfg.num_res_blocks):
        h = _t_res(sd, f"encoder.res_blocks.{j}", h, g)
    h = F.silu(F.group_norm(h, g, sd["encoder.norm1.weight"],
                            sd["encoder.norm1.bias"]))
    h = _t_cconv(sd, "encoder.conv2", h)
    return _t_cconv(sd, "quant_conv", h)


def _t_decode(sd, cfg, z, num_frames):
    g = cfg.groups
    nb = len(cfg.channel_multipliers)
    z = _t_cconv(sd, "post_quant_conv", z)
    h = _t_cconv(sd, "decoder.conv1", z)
    for j in range(cfg.num_res_blocks):
        h = _t_res(sd, f"decoder.res_blocks.{j}", h, g)
    for i in reversed(range(nb)):
        for j in range(cfg.num_res_blocks):
            h = _t_res(sd, f"decoder.block_res_blocks.{i}.{j}", h, g)
        if i > 0 and f"decoder.conv_blocks.{i - 1}.conv.weight" in sd:
            h = _t_cconv(sd, f"decoder.conv_blocks.{i - 1}", h)
            b, c2, t, hh, ww = h.shape
            h = h.reshape(b, c2 // 2, 2, t, hh, ww)
            h = h.permute(0, 1, 3, 2, 4, 5).reshape(b, c2 // 2, t * 2, hh, ww)
    h = F.silu(F.group_norm(h, g, sd["decoder.norm1.weight"],
                            sd["decoder.norm1.bias"]))
    h = _t_cconv(sd, "decoder.conv_out", h)
    return h[:, :, h.shape[2] - num_frames:]


def _synthetic_sd(cfg, seed=0):
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(name, cin, cout, k, bias=True):
        kt, kh, kw = (k, k, k) if isinstance(k, int) else k
        sd[f"{name}.conv.weight"] = torch.tensor(
            rng.normal(0, 0.1, (cout, cin, kt, kh, kw)).astype(np.float32))
        if bias:
            sd[f"{name}.conv.bias"] = torch.tensor(
                rng.normal(0, 0.02, (cout,)).astype(np.float32))

    def norm(name, c):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(1, 0.05, (c,)).astype(np.float32))
        sd[f"{name}.bias"] = torch.tensor(
            rng.normal(0, 0.02, (c,)).astype(np.float32))

    def res(base, cin, cout):
        norm(f"{base}.norm1", cin)
        conv(f"{base}.conv1", cin, cout, 3, bias=False)
        norm(f"{base}.norm2", cout)
        conv(f"{base}.conv2", cout, cout, 3, bias=False)
        if cin != cout:
            conv(f"{base}.conv3", cin, cout, 1, bias=False)

    nb = len(cfg.channel_multipliers)
    f0 = cfg.filters
    c = f0
    conv("encoder.conv_in", cfg.in_out_channels, f0, 3, bias=False)
    for i, m in enumerate(cfg.channel_multipliers):
        f = f0 * m
        for j in range(cfg.num_res_blocks):
            res(f"encoder.block_res_blocks.{i}.{j}", c, f)
            c = f
        if i < nb - 1 and cfg.temporal_downsample[i]:
            conv(f"encoder.conv_blocks.{i}", c, f, 3)
    for j in range(cfg.num_res_blocks):
        res(f"encoder.res_blocks.{j}", c, c)
    norm("encoder.norm1", c)
    conv("encoder.conv2", c, 2 * cfg.latent_embed_dim, 1)
    conv("quant_conv", 2 * cfg.latent_embed_dim, 2 * cfg.embed_dim, 1)
    conv("post_quant_conv", cfg.embed_dim, cfg.latent_embed_dim, 1)

    c = f0 * cfg.channel_multipliers[-1]
    conv("decoder.conv1", cfg.latent_embed_dim, c, 3)
    for j in range(cfg.num_res_blocks):
        res(f"decoder.res_blocks.{j}", c, c)
    for i in reversed(range(nb)):
        f = f0 * cfg.channel_multipliers[i]
        for j in range(cfg.num_res_blocks):
            res(f"decoder.block_res_blocks.{i}.{j}", c, f)
            c = f
        if i > 0 and cfg.temporal_downsample[i - 1]:
            conv(f"decoder.conv_blocks.{i - 1}", c, c * 2, 3)
    norm("decoder.norm1", c)
    conv("decoder.conv_out", c, cfg.in_out_channels, 3)
    return sd


def test_vae_temporal_numeric_parity_vs_torch():
    cfg = VAETemporalConfig(in_out_channels=4, latent_embed_dim=4, embed_dim=4,
                            filters=8, num_res_blocks=2,
                            channel_multipliers=(1, 2, 2),
                            temporal_downsample=(False, True), groups=4)
    tsd = _synthetic_sd(cfg, seed=11)
    nsd = {k: v.numpy() for k, v in tsd.items()}
    params = convert_vae_temporal_state_dict(nsd, cfg)
    ref = init_vae_temporal_params(jax.random.PRNGKey(0), cfg)
    jax.tree.map(lambda a, b: None if a.shape == b.shape else 1 / 0, params, ref)

    vae = VAETemporal(cfg, params)
    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (1, 4, 5, 5, 5)).astype(np.float32)  # NCTHW torch
    with torch.no_grad():
        t_lat = _t_encode(tsd, cfg, torch.tensor(x)).numpy()
    mean, logvar = vae.encode(jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    j_lat = np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=-1)
    np.testing.assert_allclose(j_lat, t_lat.transpose(0, 2, 3, 4, 1),
                               rtol=3e-4, atol=3e-4)

    z = rng.normal(0, 1, (1, cfg.embed_dim, 3, 5, 5)).astype(np.float32)
    with torch.no_grad():
        t_px = _t_decode(tsd, cfg, torch.tensor(z), num_frames=5).numpy()
    j_px = np.asarray(vae.decode(jnp.asarray(z.transpose(0, 2, 3, 4, 1)),
                                 num_frames=5))
    np.testing.assert_allclose(j_px, t_px.transpose(0, 2, 3, 4, 1),
                               rtol=3e-4, atol=3e-4)


def test_vae_temporal_padding_roundtrip_shapes():
    cfg = VAETemporalConfig.tiny()
    vae = VAETemporal(cfg, init_vae_temporal_params(jax.random.PRNGKey(1), cfg))
    x = jnp.ones((1, 5, 4, 4, cfg.in_out_channels))   # 5 frames, factor 2
    mean, logvar = vae.encode(x)
    # ceil(5/2) latent frames after front padding
    assert mean.shape == (1, 3, 4, 4, cfg.embed_dim)
    y = vae.decode(mean, num_frames=5)
    assert y.shape == (1, 5, 4, 4, cfg.in_out_channels)
    assert np.isfinite(np.asarray(y)).all()


def test_vae_temporal_prefix_loader_detects_composite():
    """OpenSora-VAE-v1.2 stores the temporal stage under `temporal_vae.`."""
    from magcache_tpu.models.vae_temporal import convert_vae_temporal_state_dict

    cfg = VAETemporalConfig.tiny()
    tsd = _synthetic_sd(cfg, seed=2)
    nsd = {"temporal_vae." + k: v.numpy() for k, v in tsd.items()}
    params = convert_vae_temporal_state_dict(nsd, cfg, prefix="temporal_vae.")
    ref = init_vae_temporal_params(jax.random.PRNGKey(0), cfg)
    jax.tree.map(lambda a, b: None if a.shape == b.shape else 1 / 0, params, ref)


def test_micro_frame_vae_accepts_vae_temporal_stage():
    """The composite decode path (VideoAutoencoderPipeline semantics) works
    with the weight-mappable temporal stage: per-17-frame chunks, front
    padding sliced off."""
    from magcache_tpu.models.vae import MicroFrameVAE
    from magcache_tpu.models.vae_sd import (
        SDVAE, SDVAEConfig, init_sd_vae_params)

    scfg = SDVAEConfig.tiny()
    spatial = SDVAE(scfg, init_sd_vae_params(jax.random.PRNGKey(0), scfg))
    tcfg = VAETemporalConfig.tiny(in_out_channels=scfg.z_channels,
                                  latent_embed_dim=4, embed_dim=4)
    temporal = VAETemporal(tcfg,
                           init_vae_temporal_params(jax.random.PRNGKey(1), tcfg))
    vae = MicroFrameVAE(spatial, temporal, micro_frame_size=3)
    x = jnp.ones((1, 5, 8, 8, 3)) * 0.1   # 5 frames -> chunks of 3 + 2
    z = vae.encode(x)
    # chunk latents: ceil(3/2)=2 and ceil(2/2)=1
    assert z.shape[1] == 3
    y = vae.decode(z)
    assert y.shape[1] == 5
    assert np.isfinite(np.asarray(y)).all()
