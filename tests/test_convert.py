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


# --------------------------------------------------------------------------
# Round-2 converters: Hunyuan / Qwen-Image / CogVideoX / STDiT3 / T5
# --------------------------------------------------------------------------

def _rlin(rng, sd, name, i, o, bias=True):
    sd[f"{name}.weight"] = rng.normal(0, 0.05, (o, i)).astype(np.float32)
    if bias:
        sd[f"{name}.bias"] = rng.normal(0, 0.01, (o,)).astype(np.float32)


def _tree_shapes_match(a, b):
    jax.tree.map(lambda x, y: None if x.shape == y.shape else (_ for _ in ()).throw(
        AssertionError(f"{x.shape} != {y.shape}")), a, b)


def test_hunyuan_convert_and_forward():
    from magcache_tpu.models.convert import convert_hunyuan_state_dict
    from magcache_tpu.models.hunyuan import (
        HunyuanConfig, init_hunyuan_params, make_hunyuan_core)

    cfg = HunyuanConfig.tiny()
    d, hd = cfg.hidden, cfg.head_dim
    mlp_d = cfg.mlp_ratio * d
    rng = np.random.default_rng(1)
    sd = {}
    sd["img_in.proj.weight"] = rng.normal(0, 0.05, (d, cfg.in_channels, 1, 2, 2)).astype(np.float32)
    sd["img_in.proj.bias"] = rng.normal(0, 0.01, (d,)).astype(np.float32)
    _rlin(rng, sd, "txt_in.input_embedder", cfg.text_dim, d)
    _rlin(rng, sd, "txt_in.t_embedder.mlp.0", cfg.time_embed_dim, d)
    _rlin(rng, sd, "txt_in.t_embedder.mlp.2", d, d)
    _rlin(rng, sd, "txt_in.c_embedder.linear_1", cfg.text_dim, d)
    _rlin(rng, sd, "txt_in.c_embedder.linear_2", d, d)
    for i in range(cfg.refiner_depth):
        b = f"txt_in.individual_token_refiner.blocks.{i}"
        _rlin(rng, sd, f"{b}.self_attn_qkv", d, 3 * d)
        _rlin(rng, sd, f"{b}.self_attn_proj", d, d)
        _rlin(rng, sd, f"{b}.mlp.fc1", d, mlp_d)
        _rlin(rng, sd, f"{b}.mlp.fc2", mlp_d, d)
        _rlin(rng, sd, f"{b}.adaLN_modulation.1", d, 2 * d)
        for nm in ("norm1", "norm2"):
            sd[f"{b}.{nm}.weight"] = np.ones(d, np.float32)
            sd[f"{b}.{nm}.bias"] = np.zeros(d, np.float32)
    _rlin(rng, sd, "time_in.mlp.0", cfg.time_embed_dim, d)
    _rlin(rng, sd, "time_in.mlp.2", d, d)
    _rlin(rng, sd, "vector_in.in_layer", cfg.vec_dim, d)
    _rlin(rng, sd, "vector_in.out_layer", d, d)
    _rlin(rng, sd, "guidance_in.mlp.0", cfg.time_embed_dim, d)
    _rlin(rng, sd, "guidance_in.mlp.2", d, d)
    for i in range(cfg.depth_double):
        b = f"double_blocks.{i}"
        _rlin(rng, sd, f"{b}.img_mod.linear", d, 6 * d)
        _rlin(rng, sd, f"{b}.txt_mod.linear", d, 6 * d)
        for s_ in ("img", "txt"):
            _rlin(rng, sd, f"{b}.{s_}_attn_qkv", d, 3 * d)
            _rlin(rng, sd, f"{b}.{s_}_attn_proj", d, d)
            _rlin(rng, sd, f"{b}.{s_}_mlp.fc1", d, mlp_d)
            _rlin(rng, sd, f"{b}.{s_}_mlp.fc2", mlp_d, d)
            sd[f"{b}.{s_}_attn_q_norm.weight"] = np.ones(hd, np.float32)
            sd[f"{b}.{s_}_attn_k_norm.weight"] = np.ones(hd, np.float32)
    for i in range(cfg.depth_single):
        b = f"single_blocks.{i}"
        _rlin(rng, sd, f"{b}.modulation.linear", d, 3 * d)
        _rlin(rng, sd, f"{b}.linear1", d, 3 * d + mlp_d)
        _rlin(rng, sd, f"{b}.linear2", d + mlp_d, d)
        sd[f"{b}.q_norm.weight"] = np.ones(hd, np.float32)
        sd[f"{b}.k_norm.weight"] = np.ones(hd, np.float32)
    _rlin(rng, sd, "final_layer.adaLN_modulation.1", d, 2 * d)
    _rlin(rng, sd, "final_layer.linear", d, cfg.patch_in)

    params = convert_hunyuan_state_dict(sd, cfg)
    ref = init_hunyuan_params(jax.random.PRNGKey(0), cfg)
    _tree_shapes_match(params, ref)

    core = make_hunyuan_core(cfg, txt_len=6, grid=(2, 2, 2))
    x = jnp.ones((1, 2, 4, 4, cfg.in_channels))
    cond = {"txt": jnp.ones((1, 6, cfg.text_dim)),
            "vec": jnp.ones((1, cfg.vec_dim)),
            "guidance": jnp.full((1,), 6.0)}
    t = jnp.full((1,), 500.0)
    h, ctx = core.prepare(params, x, t, cond)
    out = core.head(params, core.trunk(params, h, ctx), ctx)
    assert np.isfinite(np.asarray(out)).all()


def test_qwen_image_convert_and_forward():
    from magcache_tpu.models.convert import convert_qwen_image_state_dict
    from magcache_tpu.models.qwen_image import (
        QwenImageConfig, init_qwen_image_params, make_qwen_image_core)

    cfg = QwenImageConfig.tiny()
    f = cfg.to_flux()
    d, hd, mlp_d = f.hidden, f.head_dim, f.mlp_ratio * f.hidden
    rng = np.random.default_rng(2)
    sd = {"txt_norm.weight": np.ones(cfg.text_dim, np.float32)}
    _rlin(rng, sd, "img_in", cfg.in_channels, d)
    _rlin(rng, sd, "txt_in", cfg.text_dim, d)
    _rlin(rng, sd, "time_text_embed.timestep_embedder.linear_1", cfg.time_embed_dim, d)
    _rlin(rng, sd, "time_text_embed.timestep_embedder.linear_2", d, d)
    for i in range(cfg.depth):
        b = f"transformer_blocks.{i}"
        _rlin(rng, sd, f"{b}.img_mod.1", d, 6 * d)
        _rlin(rng, sd, f"{b}.txt_mod.1", d, 6 * d)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            _rlin(rng, sd, f"{b}.attn.{n}", d, d)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{b}.attn.{n}.weight"] = np.ones(hd, np.float32)
        _rlin(rng, sd, f"{b}.attn.to_out.0", d, d)
        _rlin(rng, sd, f"{b}.attn.to_add_out", d, d)
        _rlin(rng, sd, f"{b}.img_mlp.net.0.proj", d, mlp_d)
        _rlin(rng, sd, f"{b}.img_mlp.net.2", mlp_d, d)
        _rlin(rng, sd, f"{b}.txt_mlp.net.0.proj", d, mlp_d)
        _rlin(rng, sd, f"{b}.txt_mlp.net.2", mlp_d, d)
    _rlin(rng, sd, "norm_out.linear", d, 2 * d)
    _rlin(rng, sd, "proj_out", d, cfg.in_channels)

    params = convert_qwen_image_state_dict(sd, cfg)
    ref = init_qwen_image_params(jax.random.PRNGKey(0), cfg)
    _tree_shapes_match(params, ref)

    core = make_qwen_image_core(cfg, txt_len=5, grid_h=4, grid_w=4)
    x = jnp.ones((1, 16, cfg.in_channels))
    cond = {"txt": jnp.ones((1, 5, cfg.text_dim))}
    t = jnp.full((1,), 0.5)
    h, ctx = core.prepare(params, x, t, cond)
    out = core.head(params, core.trunk(params, h, ctx), ctx)
    assert np.isfinite(np.asarray(out)).all()


def test_cogvideox_convert_and_forward():
    from magcache_tpu.models.cogvideox import (
        CogVideoXConfig, init_cogvideox_params, make_cogvideox_core)
    from magcache_tpu.models.convert import convert_cogvideox_state_dict

    cfg = CogVideoXConfig.tiny(temb_dim=16, time_embed_dim=96)
    d, ct, hd = cfg.hidden, cfg.cond_dim, cfg.head_dim
    p2 = cfg.patch * cfg.patch
    rng = np.random.default_rng(3)
    sd = {}
    sd["patch_embed.proj.weight"] = rng.normal(0, 0.05, (d, cfg.in_channels, cfg.patch, cfg.patch)).astype(np.float32)
    sd["patch_embed.proj.bias"] = rng.normal(0, 0.01, (d,)).astype(np.float32)
    _rlin(rng, sd, "patch_embed.text_proj", cfg.text_dim, d)
    _rlin(rng, sd, "time_embedding.linear_1", cfg.time_embed_dim, ct)
    _rlin(rng, sd, "time_embedding.linear_2", ct, ct)
    for i in range(cfg.layers):
        b = f"transformer_blocks.{i}"
        _rlin(rng, sd, f"{b}.norm1.linear", ct, 6 * d)
        _rlin(rng, sd, f"{b}.norm2.linear", ct, 6 * d)
        for nm in ("norm1.norm", "norm2.norm"):
            sd[f"{b}.{nm}.weight"] = np.ones(d, np.float32)
            sd[f"{b}.{nm}.bias"] = np.zeros(d, np.float32)
        for n in ("to_q", "to_k", "to_v"):
            _rlin(rng, sd, f"{b}.attn1.{n}", d, d)
        for n in ("norm_q", "norm_k"):
            sd[f"{b}.attn1.{n}.weight"] = np.ones(hd, np.float32)
            sd[f"{b}.attn1.{n}.bias"] = np.zeros(hd, np.float32)
        _rlin(rng, sd, f"{b}.attn1.to_out.0", d, d)
        _rlin(rng, sd, f"{b}.ff.net.0.proj", d, cfg.mlp_ratio * d)
        _rlin(rng, sd, f"{b}.ff.net.2", cfg.mlp_ratio * d, d)
    sd["norm_final.weight"] = np.ones(d, np.float32)
    sd["norm_final.bias"] = np.zeros(d, np.float32)
    sd["norm_out.norm.weight"] = np.ones(d, np.float32)
    sd["norm_out.norm.bias"] = np.zeros(d, np.float32)
    _rlin(rng, sd, "norm_out.linear", ct, 2 * d)
    _rlin(rng, sd, "proj_out", d, cfg.in_channels * p2)

    params = convert_cogvideox_state_dict(sd, cfg)
    ref = init_cogvideox_params(jax.random.PRNGKey(0), cfg)
    _tree_shapes_match(params, ref)

    core = make_cogvideox_core(cfg, txt_len=4, grid=(2, 2, 2))
    x = jnp.ones((1, 2, 4, 4, cfg.in_channels))
    cond = {"txt": jnp.ones((1, 4, cfg.text_dim))}
    t = jnp.full((1,), 500.0)
    h, ctx = core.prepare(params, x, t, cond)
    out = core.head(params, core.trunk(params, h, ctx), ctx)
    assert np.isfinite(np.asarray(out)).all()


def test_stdit3_convert_and_forward():
    from magcache_tpu.models.convert import convert_stdit3_state_dict
    from magcache_tpu.models.stdit3 import (
        STDiT3Config, init_stdit3_params, make_stdit3_core)

    cfg = STDiT3Config.tiny()
    d, hd = cfg.hidden, cfg.head_dim
    pt, ph, pw = cfg.patch
    mlp_d = cfg.mlp_ratio * d
    rng = np.random.default_rng(4)
    sd = {}
    sd["x_embedder.proj.weight"] = rng.normal(0, 0.05, (d, cfg.in_channels, pt, ph, pw)).astype(np.float32)
    sd["x_embedder.proj.bias"] = rng.normal(0, 0.01, (d,)).astype(np.float32)
    _rlin(rng, sd, "t_embedder.mlp.0", cfg.freq_dim, d)
    _rlin(rng, sd, "t_embedder.mlp.2", d, d)
    _rlin(rng, sd, "fps_embedder.mlp.0", cfg.freq_dim, d)
    _rlin(rng, sd, "fps_embedder.mlp.2", d, d)
    _rlin(rng, sd, "t_block.1", d, 6 * d)
    sd["y_embedder.y_embedding"] = rng.normal(0, 0.05, (cfg.caption_max_len, cfg.caption_dim)).astype(np.float32)
    _rlin(rng, sd, "y_embedder.y_proj.fc1", cfg.caption_dim, d)
    _rlin(rng, sd, "y_embedder.y_proj.fc2", d, d)
    for pre in ("spatial_blocks", "temporal_blocks"):
        for i in range(cfg.depth):
            b = f"{pre}.{i}"
            sd[f"{b}.scale_shift_table"] = rng.normal(0, 0.02, (6, d)).astype(np.float32)
            _rlin(rng, sd, f"{b}.attn.qkv", d, 3 * d)
            _rlin(rng, sd, f"{b}.attn.proj", d, d)
            sd[f"{b}.attn.q_norm.weight"] = np.ones(hd, np.float32)
            sd[f"{b}.attn.k_norm.weight"] = np.ones(hd, np.float32)
            _rlin(rng, sd, f"{b}.cross_attn.q_linear", d, d)
            _rlin(rng, sd, f"{b}.cross_attn.kv_linear", d, 2 * d)
            _rlin(rng, sd, f"{b}.cross_attn.proj", d, d)
            _rlin(rng, sd, f"{b}.mlp.fc1", d, mlp_d)
            _rlin(rng, sd, f"{b}.mlp.fc2", mlp_d, d)
    sd["final_layer.scale_shift_table"] = rng.normal(0, 0.02, (2, d)).astype(np.float32)
    _rlin(rng, sd, "final_layer.linear", d, cfg.in_channels * 2 * pt * ph * pw)

    params = convert_stdit3_state_dict(sd, cfg)
    ref = init_stdit3_params(jax.random.PRNGKey(0), cfg)
    _tree_shapes_match(params, ref)

    core = make_stdit3_core(cfg, grid=(2, 2, 2), caption_len=4)
    x = jnp.ones((1, 2, 4, 4, cfg.in_channels))
    cond = {"y": jnp.ones((1, 4, cfg.caption_dim)), "fps": jnp.full((1,), 24.0)}
    t = jnp.full((1,), 500.0)
    h, ctx = core.prepare(params, x, t, cond)
    out = core.head(params, core.trunk(params, h, ctx), ctx)
    assert np.isfinite(np.asarray(out)).all()


def test_t5_convert_numeric_parity_vs_torch():
    """Real numeric check: tiny torch T5EncoderModel vs FlaxT5EncoderModel
    running our converted params — outputs must agree."""
    torch = pytest.importorskip("torch")
    from transformers import FlaxT5EncoderModel, T5Config, T5EncoderModel

    from magcache_tpu.models.convert import convert_t5_encoder_state_dict

    tc = T5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=2,
                  num_heads=4, relative_attention_num_buckets=8,
                  feed_forward_proj="gated-gelu", tie_word_embeddings=False)
    with torch.no_grad():
        tm = T5EncoderModel(tc).eval()
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        fm = FlaxT5EncoderModel(tc)
        params = convert_t5_encoder_state_dict(sd)
        # same tree structure as the flax model's own params
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(fm.params))
        ids = np.array([[3, 7, 12, 1, 0, 0]], np.int64)
        mask = np.array([[1, 1, 1, 1, 0, 0]], np.int64)
        t_out = tm(input_ids=torch.tensor(ids),
                   attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
        f_out = fm(input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
                   params=params).last_hidden_state
    np.testing.assert_allclose(np.asarray(f_out), t_out, rtol=2e-4, atol=2e-4)


def test_latte_convert_and_forward():
    from magcache_tpu.models.convert import convert_latte_state_dict
    from magcache_tpu.models.latte import (
        LatteConfig, init_latte_params, make_latte_core)

    cfg = LatteConfig.tiny(out_channels=8)  # published Latte-1 predicts eps+var
    d = cfg.hidden
    mlp_d = cfg.mlp_ratio * d
    rng = np.random.default_rng(5)
    sd = {}
    sd["pos_embed.proj.weight"] = rng.normal(
        0, 0.05, (d, cfg.in_channels, cfg.patch, cfg.patch)).astype(np.float32)
    sd["pos_embed.proj.bias"] = rng.normal(0, 0.01, (d,)).astype(np.float32)
    _rlin(rng, sd, "caption_projection.linear_1", cfg.caption_dim, d)
    _rlin(rng, sd, "caption_projection.linear_2", d, d)
    _rlin(rng, sd, "adaln_single.emb.timestep_embedder.linear_1",
          cfg.time_embed_dim, d)
    _rlin(rng, sd, "adaln_single.emb.timestep_embedder.linear_2", d, d)
    _rlin(rng, sd, "adaln_single.linear", d, 6 * d)
    for pre, cross in (("transformer_blocks", True),
                       ("temporal_transformer_blocks", False)):
        for i in range(cfg.depth):
            b = f"{pre}.{i}"
            sd[f"{b}.scale_shift_table"] = rng.normal(0, 0.02, (6, d)).astype(np.float32)
            for n in "qkv":
                _rlin(rng, sd, f"{b}.attn1.to_{n}", d, d)
            _rlin(rng, sd, f"{b}.attn1.to_out.0", d, d)
            if cross:
                for n in "qkv":
                    _rlin(rng, sd, f"{b}.attn2.to_{n}", d, d)
                _rlin(rng, sd, f"{b}.attn2.to_out.0", d, d)
            _rlin(rng, sd, f"{b}.ff.net.0.proj", d, mlp_d)
            _rlin(rng, sd, f"{b}.ff.net.2", mlp_d, d)
    sd["scale_shift_table"] = rng.normal(0, 0.02, (2, d)).astype(np.float32)
    _rlin(rng, sd, "proj_out", d, cfg.patch * cfg.patch * cfg.c_out)

    params = convert_latte_state_dict(sd, cfg)
    ref = init_latte_params(jax.random.PRNGKey(0), cfg)
    _tree_shapes_match(params, ref)

    # qkv concat must preserve per-projection semantics: converted qkv split
    # back into thirds == the individual to_q/to_k/to_v transposes
    wq = np.asarray(sd["transformer_blocks.0.attn1.to_q.weight"]).T
    got = np.asarray(params["spatial"]["qkv"]["w"][0][:, :d])
    np.testing.assert_allclose(got, wq, rtol=0, atol=0)

    core = make_latte_core(cfg, grid=(2, 2, 2), caption_len=4)
    x = jnp.ones((1, 2, 4, 4, cfg.in_channels))
    cond = {"y": jnp.ones((1, 4, cfg.caption_dim))}
    t = jnp.full((1,), 500.0)
    h, ctx = core.prepare(params, x, t, cond)
    out = core.head(params, core.trunk(params, h, ctx), ctx)
    assert out.shape == (1, 2, 4, 4, cfg.in_channels)  # variance half dropped
    assert np.isfinite(np.asarray(out)).all()


def test_vchitect_convert_and_forward():
    from magcache_tpu.models.convert import convert_vchitect_state_dict
    from magcache_tpu.models.vchitect import (
        VchitectConfig, init_vchitect_params, make_vchitect_core)

    cfg = VchitectConfig.tiny()
    d = cfg.hidden
    mlp_d = cfg.mlp_ratio * d
    rng = np.random.default_rng(6)
    sd = {}
    sd["pos_embed.proj.weight"] = rng.normal(
        0, 0.05, (d, cfg.in_channels, cfg.patch, cfg.patch)).astype(np.float32)
    sd["pos_embed.proj.bias"] = rng.normal(0, 0.01, (d,)).astype(np.float32)
    _rlin(rng, sd, "context_embedder", cfg.text_dim, d)
    _rlin(rng, sd, "time_text_embed.timestep_embedder.linear_1",
          cfg.time_embed_dim, d)
    _rlin(rng, sd, "time_text_embed.timestep_embedder.linear_2", d, d)
    _rlin(rng, sd, "time_text_embed.text_embedder.linear_1", cfg.vec_dim, d)
    _rlin(rng, sd, "time_text_embed.text_embedder.linear_2", d, d)
    for i in range(cfg.depth):
        b = f"transformer_blocks.{i}"
        last = i == cfg.depth - 1
        _rlin(rng, sd, f"{b}.norm1.linear", d, 6 * d)
        _rlin(rng, sd, f"{b}.norm1_context.linear", d, 2 * d if last else 6 * d)
        for n in ("to_q", "to_k", "to_v", "to_out.0", "to_q_temp", "to_k_temp",
                  "to_v_temp", "to_out_temporal", "to_q_cross",
                  "to_out_context", "add_q_proj", "add_k_proj", "add_v_proj",
                  "to_add_out_temporal"):
            _rlin(rng, sd, f"{b}.attn.{n}", d, d)
        _rlin(rng, sd, f"{b}.ff.net.0.proj", d, mlp_d)
        _rlin(rng, sd, f"{b}.ff.net.2", mlp_d, d)
        if not last:
            _rlin(rng, sd, f"{b}.attn.to_add_out", d, d)
            _rlin(rng, sd, f"{b}.ff_context.net.0.proj", d, mlp_d)
            _rlin(rng, sd, f"{b}.ff_context.net.2", mlp_d, d)
    _rlin(rng, sd, "norm_out.linear", d, 2 * d)
    _rlin(rng, sd, "proj_out", d, cfg.patch * cfg.patch * cfg.in_channels)

    params = convert_vchitect_state_dict(sd, cfg)
    ref = init_vchitect_params(jax.random.PRNGKey(0), cfg)
    _tree_shapes_match(params, ref)

    core = make_vchitect_core(cfg, grid=(2, 2, 2), txt_len=4)
    x = jnp.ones((1, 2, 4, 4, cfg.in_channels))
    cond = {"txt": jnp.ones((1, 4, cfg.text_dim)),
            "vec": jnp.ones((1, cfg.vec_dim))}
    t = jnp.full((1,), 500.0)
    h, ctx = core.prepare(params, x, t, cond)
    out = core.head(params, core.trunk(params, h, ctx), ctx)
    assert out.shape == (1, 2, 4, 4, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_osp_convert_and_forward():
    from magcache_tpu.models.convert import convert_osp_state_dict
    from magcache_tpu.models.open_sora_plan import (
        OpenSoraPlanConfig, init_osp_params, make_osp_core)

    cfg = OpenSoraPlanConfig.tiny(out_channels=8)
    d = cfg.hidden
    mlp_d = cfg.mlp_ratio * d
    pt, ph, pw = cfg.patch
    rng = np.random.default_rng(7)
    sd = {}
    sd["pos_embed.proj.weight"] = rng.normal(
        0, 0.05, (d, cfg.in_channels, ph, pw)).astype(np.float32)
    sd["pos_embed.proj.bias"] = rng.normal(0, 0.01, (d,)).astype(np.float32)
    _rlin(rng, sd, "caption_projection.linear_1", cfg.caption_dim, d)
    _rlin(rng, sd, "caption_projection.linear_2", d, d)
    _rlin(rng, sd, "adaln_single.emb.timestep_embedder.linear_1",
          cfg.time_embed_dim, d)
    _rlin(rng, sd, "adaln_single.emb.timestep_embedder.linear_2", d, d)
    _rlin(rng, sd, "adaln_single.linear", d, 6 * d)
    for i in range(cfg.depth):
        b = f"transformer_blocks.{i}"
        sd[f"{b}.scale_shift_table"] = rng.normal(0, 0.02, (6, d)).astype(np.float32)
        for n in "qkv":
            _rlin(rng, sd, f"{b}.attn1.to_{n}", d, d)
            _rlin(rng, sd, f"{b}.attn2.to_{n}", d, d)
        _rlin(rng, sd, f"{b}.attn1.to_out.0", d, d)
        _rlin(rng, sd, f"{b}.attn2.to_out.0", d, d)
        _rlin(rng, sd, f"{b}.ff.net.0.proj", d, mlp_d)
        _rlin(rng, sd, f"{b}.ff.net.2", mlp_d, d)
    sd["scale_shift_table"] = rng.normal(0, 0.02, (2, d)).astype(np.float32)
    _rlin(rng, sd, "proj_out", d, pt * ph * pw * cfg.c_out)

    params = convert_osp_state_dict(sd, cfg)
    ref = init_osp_params(jax.random.PRNGKey(0), cfg)
    _tree_shapes_match(params, ref)

    core = make_osp_core(cfg, grid=(2, 2, 2), caption_len=4)
    x = jnp.ones((1, 2, 4, 4, cfg.in_channels))
    cond = {"y": jnp.ones((1, 4, cfg.caption_dim))}
    t = jnp.full((1,), 500.0)
    h, ctx = core.prepare(params, x, t, cond)
    out = core.head(params, core.trunk(params, h, ctx), ctx)
    assert out.shape == (1, 2, 4, 4, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_osp_rope3d_matches_reference_convention():
    """Oracle transcription of the reference RoPE3D (v120 :63-120): equal
    thirds, cat(freqs,freqs) half-split, rotate_half, interpolation scaling."""
    from magcache_tpu.models.open_sora_plan import (
        OpenSoraPlanConfig, _rope_half, osp_rope_tables)

    cfg = OpenSoraPlanConfig.tiny(interpolation_scale=(1.0, 2.0, 2.0))
    grid = (2, 3, 2)
    hd = cfg.head_dim
    D = hd // 3
    cos, sin = osp_rope_tables(cfg, grid)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 2 * 3 * 2, 2, hd)).astype(np.float32)  # B,N,h,hd

    # reference math, numpy transcription
    coords = np.stack(np.meshgrid(*[np.arange(g) for g in grid],
                                  indexing="ij"), -1).reshape(-1, 3)
    exp = np.zeros_like(x)
    for ax in range(3):
        inv = 1.0 / 10000.0 ** (np.arange(0, D, 2) / D)
        pos = coords[:, ax] / cfg.interpolation_scale[ax]
        f = np.concatenate([pos[:, None] * inv[None]] * 2, axis=-1)
        c, s = np.cos(f), np.sin(f)
        seg = x[..., ax * D:(ax + 1) * D]
        rot = np.concatenate([-seg[..., D // 2:], seg[..., :D // 2]], -1)
        exp[..., ax * D:(ax + 1) * D] = (seg * c[None, :, None, :]
                                         + rot * s[None, :, None, :])
    got = np.asarray(_rope_half(jnp.asarray(x), jnp.asarray(cos),
                                jnp.asarray(sin), D))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def make_omnigen2_sd(cfg, seed=8):
    """Synthetic reference-layout OmniGen2 transformer state dict."""
    d, dk, f = cfg.hidden, cfg.kv_heads * cfg.head_dim, cfg.ffn_dim
    rng = np.random.default_rng(seed)
    sd = {}

    def nobias(name, i, o):
        sd[f"{name}.weight"] = rng.normal(0, 0.05, (o, i)).astype(np.float32)

    _rlin(rng, sd, "time_caption_embed.timestep_embedder.linear_1",
          cfg.time_embed_dim, cfg.temb_dim)
    _rlin(rng, sd, "time_caption_embed.timestep_embedder.linear_2",
          cfg.temb_dim, cfg.temb_dim)
    sd["time_caption_embed.caption_embedder.0.weight"] = np.ones(
        cfg.text_dim, np.float32)
    _rlin(rng, sd, "time_caption_embed.caption_embedder.1", cfg.text_dim, d)
    pin = cfg.in_channels * cfg.patch * cfg.patch
    _rlin(rng, sd, "x_embedder", pin, d)
    _rlin(rng, sd, "ref_image_patch_embedder", pin, d)
    for prefix, depth, modulated in (
            ("context_refiner", cfg.refiner_layers, False),
            ("noise_refiner", cfg.refiner_layers, True),
            ("ref_image_refiner", cfg.refiner_layers, True),
            ("layers", cfg.layers, True)):
        for i in range(depth):
            b = f"{prefix}.{i}"
            nobias(f"{b}.attn.to_q", d, d)
            nobias(f"{b}.attn.to_k", d, dk)
            nobias(f"{b}.attn.to_v", d, dk)
            nobias(f"{b}.attn.to_out.0", d, d)
            sd[f"{b}.attn.norm_q.weight"] = np.ones(cfg.head_dim, np.float32)
            sd[f"{b}.attn.norm_k.weight"] = np.ones(cfg.head_dim, np.float32)
            for n in ("norm2", "ffn_norm1", "ffn_norm2"):
                sd[f"{b}.{n}.weight"] = np.ones(d, np.float32)
            nobias(f"{b}.feed_forward.linear_1", d, f)
            nobias(f"{b}.feed_forward.linear_2", f, d)
            nobias(f"{b}.feed_forward.linear_3", d, f)
            if modulated:
                _rlin(rng, sd, f"{b}.norm1.linear", cfg.temb_dim, 4 * d)
                sd[f"{b}.norm1.norm.weight"] = np.ones(d, np.float32)
            else:
                sd[f"{b}.norm1.weight"] = np.ones(d, np.float32)
    _rlin(rng, sd, "norm_out.linear_1", cfg.temb_dim, d)
    _rlin(rng, sd, "norm_out.linear_2", d, pin)
    return sd


def test_omnigen2_convert_and_forward():
    from magcache_tpu.models.convert import convert_omnigen2_state_dict
    from magcache_tpu.models.omnigen2 import (
        OmniGen2Config, init_omnigen2_params, make_omnigen2_core)

    cfg = OmniGen2Config.tiny()
    d, dk = cfg.hidden, cfg.kv_heads * cfg.head_dim
    sd = make_omnigen2_sd(cfg)
    params = convert_omnigen2_state_dict(sd, cfg)
    ref = init_omnigen2_params(jax.random.PRNGKey(0), cfg)
    _tree_shapes_match(params, ref)

    # fused kv preserves per-projection semantics
    wk = np.asarray(sd["layers.0.attn.to_k.weight"]).T
    got = np.asarray(params["layers"]["kv"]["w"][0][:, :dk])
    np.testing.assert_allclose(got, wk, rtol=0, atol=0)

    core = make_omnigen2_core(cfg, txt_len=4, grid=(2, 2), ref_images=1)
    x = jnp.ones((1, 4, 4, cfg.in_channels))
    cond = {"txt": jnp.ones((1, 4, cfg.text_dim)),
            "ref": jnp.ones((1, 1, 4, 4, cfg.in_channels))}
    t = jnp.full((1,), 500.0)
    h, ctx = core.prepare(params, x, t, cond)
    out = core.head(params, core.trunk(params, h, ctx), ctx)
    assert out.shape == (1, 4, 4, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_omnigen2_sniff_and_json_config(tmp_path):
    """Checkpoint-shape sniffing + config.json-driven construction recover
    non-default geometries (VERDICT r2 Next #8)."""
    import dataclasses as dc
    import json

    from safetensors.numpy import save_file

    from magcache_tpu.models.convert import (load_omnigen2_checkpoint,
                                             omnigen2_config_from_json,
                                             sniff_omnigen2_config)
    from magcache_tpu.models.omnigen2 import (OmniGen2Config,
                                              init_omnigen2_params)

    cfg = OmniGen2Config.tiny(hidden=72, heads=6, kv_heads=3, layers=3,
                              refiner_layers=2, text_dim=40,
                              time_embed_dim=16, temb_dim=24,
                              in_channels=8, axes_dims=(4, 4, 4))
    sd = make_omnigen2_sd(cfg)
    sniffed = sniff_omnigen2_config(sd, patch=cfg.patch)
    for f in ("hidden", "heads", "kv_heads", "layers", "refiner_layers",
              "in_channels", "text_dim", "time_embed_dim", "temb_dim"):
        assert getattr(sniffed, f) == getattr(cfg, f), f
    assert sniffed.ffn_dim == cfg.ffn_dim
    assert sniffed.head_dim == cfg.head_dim

    # config.json mapping (diffusers-style keys)
    j = {"hidden_size": cfg.hidden, "num_attention_heads": cfg.heads,
         "num_kv_heads": cfg.kv_heads, "num_layers": cfg.layers,
         "num_refiner_layers": cfg.refiner_layers,
         "in_channels": cfg.in_channels, "patch_size": cfg.patch,
         "text_feat_dim": cfg.text_dim,
         "axes_dim_rope": list(cfg.axes_dims), "norm_eps": cfg.eps}
    jcfg = omnigen2_config_from_json(j)
    assert (jcfg.hidden, jcfg.heads, jcfg.layers) == (
        cfg.hidden, cfg.heads, cfg.layers)
    assert jcfg.axes_dims == cfg.axes_dims

    # end-to-end: directory with config.json + safetensors loads with cfg=None
    save_file({k: np.asarray(v) for k, v in sd.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps(j))
    params, used = load_omnigen2_checkpoint(str(tmp_path))
    assert used.hidden == cfg.hidden and used.axes_dims == cfg.axes_dims
    ref = init_omnigen2_params(
        jax.random.PRNGKey(0), dc.replace(used, dtype=cfg.dtype))
    _tree_shapes_match(params, ref)


def test_load_safetensors_dir_torch_pth_fallback(tmp_path):
    """Published torch files (Wan2.1_VAE.pth-style, hyvideo .pt with a
    'module' wrapper, bf16 storage) load through the same entry point;
    safetensors-first keeps a mixed wan ckpt_dir loading only the DiT."""
    torch = pytest.importorskip("torch")
    from safetensors.numpy import save_file

    from magcache_tpu.models.convert import load_safetensors_dir

    w = torch.arange(6, dtype=torch.float32).reshape(2, 3)
    torch.save({"module": {"a.weight": w.to(torch.bfloat16),
                           "int_buffer": torch.tensor(3)}},
               tmp_path / "mp_rank_00_model_states.pt")
    sd = load_safetensors_dir(str(tmp_path))
    np.testing.assert_allclose(sd["a.weight"], w.numpy())
    assert sd["a.weight"].dtype == np.float32
    assert "int_buffer" in sd  # non-float tensors pass through

    # a safetensors file alongside wins exclusively
    save_file({"b.weight": np.ones((2, 2), np.float32)},
              str(tmp_path / "model.safetensors"))
    sd2 = load_safetensors_dir(str(tmp_path))
    assert set(sd2) == {"b.weight"}

    # direct single-file path
    torch.save({"state_dict": {"c.weight": w}}, tmp_path / "vae.pth")
    sd3 = load_safetensors_dir(str(tmp_path / "vae.pth"))
    np.testing.assert_allclose(sd3["c.weight"], w.numpy())


def test_load_torch_dir_skips_aux_and_flags_duplicates(tmp_path):
    """A wan-style all-.pth ckpt_dir: the umt5/VAE/CLIP files must NOT be
    merged into the DiT state dict (silent last-wins + tripled host RAM);
    genuinely colliding torch shards raise instead of overwriting."""
    torch = pytest.importorskip("torch")

    from magcache_tpu.models.convert import load_safetensors_dir

    w = torch.ones(2, 2)
    torch.save({"dit.weight": w}, tmp_path / "model.pth")
    torch.save({"token_embedding.weight": w * 2},
               tmp_path / "models_t5_umt5-xxl-enc-bf16.pth")
    torch.save({"decoder.weight": w * 3}, tmp_path / "Wan2.1_VAE.pth")
    torch.save({"visual.weight": w * 4},
               tmp_path / "models_clip_open-clip-xlm.pth")
    sd = load_safetensors_dir(str(tmp_path))
    assert set(sd) == {"dit.weight"}

    d2 = tmp_path / "dup"
    d2.mkdir()
    torch.save({"x.weight": w}, d2 / "part_a.pth")
    torch.save({"x.weight": w * 5}, d2 / "part_b.pth")
    with pytest.raises(ValueError, match="duplicate keys"):
        load_safetensors_dir(str(d2))
