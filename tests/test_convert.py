"""Weight-ingestion tests: synthetic reference-named state dicts -> pytrees,
with numeric parity of the patchify-conv mapping against torch conv3d."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.models.convert import (
    convert_flux_state_dict,
    convert_wan_state_dict,
    load_params,
    save_params,
)
from magcache_tpu.models.flux import FluxConfig, init_flux_params, make_flux_core
from magcache_tpu.models.wan import WanConfig, init_wan_params, make_wan_core, patchify


def _wan_tiny_sd(cfg: WanConfig, rng):
    d, L, f = cfg.dim, cfg.layers, cfg.ffn_dim
    sd = {}

    def lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = rng.normal(0, 0.05, (o, i)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.normal(0, 0.01, (o,)).astype(np.float32)

    sd["patch_embedding.weight"] = rng.normal(0, 0.05, (d, cfg.in_channels, 1, 2, 2)).astype(np.float32)
    sd["patch_embedding.bias"] = rng.normal(0, 0.01, (d,)).astype(np.float32)
    lin("text_embedding.0", cfg.text_dim, d)
    lin("text_embedding.2", d, d)
    lin("time_embedding.0", cfg.freq_dim, d)
    lin("time_embedding.2", d, d)
    lin("time_projection.1", d, 6 * d)
    lin("head.head", d, cfg.patch_out)
    sd["head.modulation"] = rng.normal(0, 0.02, (1, 2, d)).astype(np.float32)
    for i in range(L):
        for nm in ["self_attn.q", "self_attn.k", "self_attn.v", "self_attn.o",
                   "cross_attn.q", "cross_attn.k", "cross_attn.v", "cross_attn.o"]:
            lin(f"blocks.{i}.{nm}", d, d)
        for nm in ["self_attn.norm_q", "self_attn.norm_k",
                   "cross_attn.norm_q", "cross_attn.norm_k"]:
            sd[f"blocks.{i}.{nm}.weight"] = np.ones(d, np.float32)
        sd[f"blocks.{i}.norm3.weight"] = np.ones(d, np.float32)
        sd[f"blocks.{i}.norm3.bias"] = np.zeros(d, np.float32)
        lin(f"blocks.{i}.ffn.0", d, f)
        lin(f"blocks.{i}.ffn.2", f, d)
        sd[f"blocks.{i}.modulation"] = rng.normal(0, 0.02, (1, 6, d)).astype(np.float32)
    return sd


def test_wan_convert_and_forward():
    cfg = WanConfig.tiny()
    sd = _wan_tiny_sd(cfg, np.random.default_rng(0))
    params = convert_wan_state_dict(sd, cfg)
    ref = init_wan_params(jax.random.PRNGKey(0), cfg)
    # identical tree structure and shapes
    jax.tree.map(lambda a, b: None if a.shape == b.shape else 1 / 0, params, ref)
    core = make_wan_core(cfg, (2, 4, 4))
    x = jnp.ones((1, 2, 8, 8, cfg.in_channels))
    cond = {"context": jnp.ones((1, cfg.text_len, cfg.text_dim))}
    t = jnp.full((1,), 500.0, jnp.float32)
    h, ctx = core.prepare(params, x, t, cond)
    out = core.head(params, core.trunk(params, h, ctx), ctx)
    assert np.isfinite(np.asarray(out)).all()


def test_patchify_conv_equivalence():
    """Our linear-patchify weight mapping must equal torch's conv3d."""
    torch = pytest.importorskip("torch")
    cfg = WanConfig.tiny()
    rng = np.random.default_rng(1)
    w = rng.normal(0, 0.1, (cfg.dim, cfg.in_channels, 1, 2, 2)).astype(np.float32)
    b = rng.normal(0, 0.1, (cfg.dim,)).astype(np.float32)
    x = rng.normal(size=(1, cfg.in_channels, 2, 8, 8)).astype(np.float32)  # NCDHW

    ref = torch.nn.functional.conv3d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=(1, 2, 2))
    ref = ref.flatten(2).transpose(1, 2).numpy()  # [B, S, D] like Wan's flatten

    wj = w.transpose(1, 2, 3, 4, 0).reshape(-1, cfg.dim)
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # channel-last
    tokens = patchify(cfg, xj)
    out = np.asarray(tokens @ wj + b)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def _flux_tiny_sd(cfg: FluxConfig, rng):
    d = cfg.hidden
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = rng.normal(0, 0.05, (o, i)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.01, (o,)).astype(np.float32)

    lin("img_in", cfg.in_channels, d)
    lin("txt_in", cfg.text_dim, d)
    for nm, i in [("time_in", cfg.time_embed_dim), ("vector_in", cfg.vec_dim),
                  ("guidance_in", cfg.time_embed_dim)]:
        lin(f"{nm}.in_layer", i, d)
        lin(f"{nm}.out_layer", d, d)
    lin("final_layer.adaLN_modulation.1", d, 2 * d)
    lin("final_layer.linear", d, cfg.in_channels)
    hd = cfg.head_dim
    for i in range(cfg.depth_double):
        for s in ["img", "txt"]:
            lin(f"double_blocks.{i}.{s}_mod.lin", d, 6 * d)
            lin(f"double_blocks.{i}.{s}_attn.qkv", d, 3 * d)
            lin(f"double_blocks.{i}.{s}_attn.proj", d, d)
            lin(f"double_blocks.{i}.{s}_mlp.0", d, 4 * d)
            lin(f"double_blocks.{i}.{s}_mlp.2", 4 * d, d)
            sd[f"double_blocks.{i}.{s}_attn.norm.query_norm.scale"] = np.ones(hd, np.float32)
            sd[f"double_blocks.{i}.{s}_attn.norm.key_norm.scale"] = np.ones(hd, np.float32)
    for i in range(cfg.depth_single):
        lin(f"single_blocks.{i}.modulation.lin", d, 3 * d)
        lin(f"single_blocks.{i}.linear1", d, 3 * d + 4 * d)
        lin(f"single_blocks.{i}.linear2", d + 4 * d, d)
        sd[f"single_blocks.{i}.norm.query_norm.scale"] = np.ones(hd, np.float32)
        sd[f"single_blocks.{i}.norm.key_norm.scale"] = np.ones(hd, np.float32)
    return sd


def test_flux_convert_and_forward():
    cfg = FluxConfig.tiny(mlp_ratio=4)
    sd = _flux_tiny_sd(cfg, np.random.default_rng(2))
    params = convert_flux_state_dict(sd, cfg)
    ref = init_flux_params(jax.random.PRNGKey(0), cfg)
    jax.tree.map(lambda a, b: None if a.shape == b.shape else 1 / 0, params, ref)
    core = make_flux_core(cfg, 8, 4, 4)
    x = jnp.ones((1, 16, cfg.in_channels))
    cond = {"txt": jnp.ones((1, 8, cfg.text_dim)),
            "vec": jnp.ones((1, cfg.vec_dim)),
            "guidance": jnp.full((1,), 3.5)}
    h, ctx = core.prepare(params, x, jnp.full((1,), 0.5), cond)
    out = core.head(params, core.trunk(params, h, ctx), ctx)
    assert np.isfinite(np.asarray(out)).all()


def test_orbax_save_load_roundtrip(tmp_path):
    cfg = WanConfig.tiny(layers=1)
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    save_params(params, str(tmp_path / "ckpt"))
    restored = load_params(str(tmp_path / "ckpt"), like=params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 params, restored)
