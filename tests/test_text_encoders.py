"""Text encoder tests: deterministic mock + native JAX T5 wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.models.text import JaxT5Encoder, MockPooledEncoder, MockTextEncoder


def test_mock_encoder_deterministic():
    enc = MockTextEncoder(8, 16)
    a = enc(["hello", "world"])
    b = enc(["hello", "world"])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (2, 8, 16)
    c = enc(["different"])
    assert np.abs(np.asarray(a[0]) - np.asarray(c[0])).max() > 0.1


def test_jax_t5_encoder_tiny_config():
    transformers = pytest.importorskip("transformers")
    cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8)
    enc = JaxT5Encoder(cfg, seq_len=10)
    ids = np.array([[3, 5, 7, 1, 0, 0, 0, 0, 0, 0]])
    mask = (ids != 0).astype(np.int32)
    out = enc.encode_ids(ids, mask)
    assert out.shape == (1, 10, 32)
    assert np.isfinite(np.asarray(out)).all()
    # padded positions are zeroed (mask applied like the reference's usage)
    assert np.abs(np.asarray(out[0, 4:])).max() == 0.0


def test_jax_t5_encoder_sharded():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    transformers = pytest.importorskip("transformers")
    from magcache_tpu.parallel.mesh import build_mesh
    cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8)
    ids = np.array([[3, 5, 7, 1, 0, 0, 0, 0, 0, 0]])
    ref = JaxT5Encoder(cfg, seq_len=10)
    # same weights, sharded
    enc = JaxT5Encoder.__new__(JaxT5Encoder)
    JaxT5Encoder.__init__(enc, cfg, seq_len=10, mesh=build_mesh(dp=1, sp=1, tp=8))
    out = enc.encode_ids(ids)
    assert out.shape == (1, 10, 32)


# ---------------------------------------------------------------------------
# Real-torch-module parity (the T5 pattern of test_convert.py:378): our JAX
# towers running CONVERTED weights from randomly initialized transformers
# modules must match those modules numerically.
# ---------------------------------------------------------------------------


def test_clip_text_parity_vs_torch():
    torch = pytest.importorskip("torch")
    import transformers

    from magcache_tpu.models.clip import (
        CLIPTextConfig, clip_text_forward, convert_clip_text_state_dict)

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, eos_token_id=95, bos_token_id=94,
        hidden_act="quick_gelu")
    with torch.no_grad():
        tm = transformers.CLIPTextModel(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        cfg = CLIPTextConfig.tiny()
        params = convert_clip_text_state_dict(sd, cfg)
        ids = np.array([[94, 3, 7, 12, 95, 0, 0, 0],
                        [94, 20, 95, 0, 0, 0, 0, 0]], np.int64)
        mask = (ids != 0).astype(np.int64)
        t_out = tm(input_ids=torch.tensor(ids),
                   attention_mask=torch.tensor(mask))
    h, pooled = clip_text_forward(params, cfg, jnp.asarray(ids),
                                  jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(h),
                               t_out.last_hidden_state.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled),
                               t_out.pooler_output.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_clip_text_legacy_eos2_pooling_parity():
    """Legacy CLIP-L configs (openai/clip-vit-large-patch14 — the FLUX/
    hyvideo text_encoder) declare eos_token_id=2, an id that never appears
    in the token stream; transformers special-cases it with argmax over the
    raw ids. A naive (ids == 2) match returns position 0 for every prompt —
    a constant pooled vector."""
    torch = pytest.importorskip("torch")
    import transformers

    from magcache_tpu.models.clip import (
        CLIPTextConfig, clip_text_forward, convert_clip_text_state_dict)

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, eos_token_id=2, bos_token_id=94,
        hidden_act="quick_gelu")
    with torch.no_grad():
        tm = transformers.CLIPTextModel(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        cfg = CLIPTextConfig.tiny(eos_token_id=2)
        params = convert_clip_text_state_dict(sd, cfg)
        # the REAL eos in CLIP streams is the largest vocab id (95 here),
        # at different positions per prompt
        ids = np.array([[94, 3, 7, 12, 95, 0, 0, 0],
                        [94, 20, 95, 0, 0, 0, 0, 0]], np.int64)
        mask = (ids != 0).astype(np.int64)
        t_out = tm(input_ids=torch.tensor(ids),
                   attention_mask=torch.tensor(mask))
    _, pooled = clip_text_forward(params, cfg, jnp.asarray(ids),
                                  jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(pooled),
                               t_out.pooler_output.numpy(),
                               rtol=2e-4, atol=2e-4)
    assert not np.allclose(np.asarray(pooled)[0], np.asarray(pooled)[1])


def test_clip_vision_parity_vs_torch():
    """Penultimate-block states (the Wan i2v conditioning slice) vs a real
    transformers.CLIPVisionModel's hidden_states[-2]."""
    torch = pytest.importorskip("torch")
    import transformers

    from magcache_tpu.models.clip import (
        CLIPVisionConfig, clip_vision_forward,
        convert_hf_clip_vision_state_dict)

    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=32, patch_size=8,
        hidden_act="quick_gelu")
    with torch.no_grad():
        tm = transformers.CLIPVisionModel(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        cfg = CLIPVisionConfig.tiny(layers=3, quick_gelu=True)
        params = convert_hf_clip_vision_state_dict(sd, cfg)
        pix = np.random.default_rng(0).normal(
            0, 1, (2, 3, 32, 32)).astype(np.float32)
        t_out = tm(pixel_values=torch.tensor(pix), output_hidden_states=True)
        ref = t_out.hidden_states[-2].numpy()
    img = jnp.asarray(pix.transpose(0, 2, 3, 1))
    out = clip_vision_forward(params, cfg, img)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("skip_layers", [0, 2])
def test_llama_parity_vs_torch(skip_layers):
    """Our Llama encoder (converted weights) vs transformers.LlamaModel
    hidden_states[-(skip+1)] — the hyvideo hidden_state_skip_layer slice."""
    torch = pytest.importorskip("torch")
    import transformers

    from magcache_tpu.models.llama import (
        LlamaConfig, convert_llama_state_dict, llama_hidden_states)

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-5,
        attn_implementation="eager")
    with torch.no_grad():
        tm = transformers.LlamaModel(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        cfg = LlamaConfig.tiny(layers=3)
        params = convert_llama_state_dict(sd, cfg)
        ids = np.array([[3, 5, 7, 11, 2, 0, 0, 0]], np.int64)
        mask = (ids != 0).astype(np.int64)
        t_out = tm(input_ids=torch.tensor(ids),
                   attention_mask=torch.tensor(mask),
                   output_hidden_states=True)
        ref = t_out.hidden_states[-(skip_layers + 1)].numpy()
    # transformers appends the final-normed state as hidden_states[-1]
    out = llama_hidden_states(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                              skip_layers=skip_layers,
                              final_norm=(skip_layers == 0))
    valid = np.asarray(mask[0], bool)
    np.testing.assert_allclose(np.asarray(out)[0, valid], ref[0, valid],
                               rtol=3e-4, atol=3e-4)


def test_llama_encoder_wrapper_crop_and_pad():
    """LlamaTextEncoder: template crop + fixed-length output without a real
    tokenizer (ids path)."""
    from magcache_tpu.models.llama import LlamaConfig
    from magcache_tpu.models.text import LlamaTextEncoder

    cfg = LlamaConfig.tiny()
    enc = LlamaTextEncoder(cfg, out_len=6, skip_layers=1, template=None)
    ids = np.array([[3, 5, 7, 1, 0, 0]], np.int64)
    out = enc.encode_ids(ids)
    assert out.shape == (1, 6, cfg.hidden)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_text_encoder_wrapper_pooled_shape():
    from magcache_tpu.models.clip import CLIPTextConfig
    from magcache_tpu.models.text import ClipTextEncoder

    cfg = CLIPTextConfig.tiny()
    enc = ClipTextEncoder(cfg)
    ids = np.array([[94, 3, 95, 0, 0, 0, 0, 0]], np.int64)
    h, pooled = enc.encode_ids(ids, (ids != 0).astype(np.int64))
    assert h.shape == (1, 8, cfg.dim)
    assert pooled.shape == (1, cfg.dim)


# ---------------------------------------------------------------------------
# UMT5 — Wan's actual text encoder (per-layer relative attention bias; the
# classic-T5 Flax tree would silently apply only block 0's bias).
# ---------------------------------------------------------------------------


def _tiny_umt5_hf_config(transformers):
    return transformers.UMT5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False)


def test_umt5_parity_vs_torch():
    """Our UMT5 encoder (converted weights) vs the real installed
    transformers.UMT5EncoderModel, per-layer bias and all."""
    torch = pytest.importorskip("torch")
    import transformers

    from magcache_tpu.models.umt5 import (UMT5Config, convert_umt5_state_dict,
                                          umt5_encode)

    with torch.no_grad():
        tm = transformers.UMT5EncoderModel(_tiny_umt5_hf_config(transformers)).eval()
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        cfg = UMT5Config.tiny()
        params = convert_umt5_state_dict(sd, cfg)
        ids = np.array([[3, 5, 7, 11, 2, 1, 0, 0],
                        [9, 4, 1, 0, 0, 0, 0, 0]], np.int64)
        mask = (ids != 0).astype(np.int64)
        ref = tm(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    out = np.asarray(umt5_encode(params, cfg, jnp.asarray(ids),
                                 jnp.asarray(mask)))
    for b in range(ids.shape[0]):
        valid = mask[b].astype(bool)
        np.testing.assert_allclose(out[b, valid], ref[b, valid],
                                   rtol=3e-4, atol=3e-4)
    # padded positions zeroed (reference downstream usage)
    assert np.abs(out[0, ~mask[0].astype(bool)]).max() == 0.0


def test_umt5_per_layer_bias_matters():
    """Sanity: zeroing layer>0 bias tables changes the output — i.e. the
    architecture actually uses per-layer bias (what FlaxT5 would drop)."""
    from magcache_tpu.models.umt5 import (UMT5Config, init_umt5_params,
                                          umt5_encode)

    cfg = UMT5Config.tiny()
    params = init_umt5_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.array([[3, 5, 7, 11, 2, 1]], np.int64))
    out = np.asarray(umt5_encode(params, cfg, ids))
    rel = np.asarray(params["blocks"]["rel"])
    rel_z = np.concatenate([rel[:1], np.zeros_like(rel[1:])])
    params2 = dict(params, blocks=dict(params["blocks"],
                                       rel=jnp.asarray(rel_z)))
    out2 = np.asarray(umt5_encode(params2, cfg, ids))
    assert np.abs(out - out2).max() > 1e-3


def test_umt5_wan_native_naming():
    """The wan-package-native key layout maps onto the same tree as the HF
    layout (gate.0 == wi_0, pos_embedding == relative_attention_bias)."""
    torch = pytest.importorskip("torch")
    import transformers

    from magcache_tpu.models.umt5 import (UMT5Config, convert_umt5_state_dict,
                                          sniff_umt5_config)

    with torch.no_grad():
        tm = transformers.UMT5EncoderModel(_tiny_umt5_hf_config(transformers)).eval()
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    cfg = UMT5Config.tiny()
    ref_params = convert_umt5_state_dict(sd, cfg)
    wan_sd = {"token_embedding.weight": sd["shared.weight"],
              "norm.weight": sd["encoder.final_layer_norm.weight"]}
    for i in range(cfg.layers):
        b = f"encoder.block.{i}.layer."
        wan_sd[f"blocks.{i}.norm1.weight"] = sd[b + "0.layer_norm.weight"]
        for n in "qkvo":
            wan_sd[f"blocks.{i}.attn.{n}.weight"] = sd[b + f"0.SelfAttention.{n}.weight"]
        wan_sd[f"blocks.{i}.pos_embedding.embedding.weight"] = (
            sd[b + "0.SelfAttention.relative_attention_bias.weight"])
        wan_sd[f"blocks.{i}.norm2.weight"] = sd[b + "1.layer_norm.weight"]
        wan_sd[f"blocks.{i}.ffn.gate.0.weight"] = sd[b + "1.DenseReluDense.wi_0.weight"]
        wan_sd[f"blocks.{i}.ffn.fc1.weight"] = sd[b + "1.DenseReluDense.wi_1.weight"]
        wan_sd[f"blocks.{i}.ffn.fc2.weight"] = sd[b + "1.DenseReluDense.wo.weight"]
    wan_params = convert_umt5_state_dict(wan_sd, cfg)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), ref_params, wan_params)
    # config sniffing recovers the geometry from either layout
    for d in (sd, wan_sd):
        c = sniff_umt5_config(d)
        assert (c.vocab_size, c.d_model, c.d_kv, c.d_ff, c.layers, c.heads,
                c.rel_buckets) == (128, 32, 8, 64, 3, 4, 8)


def test_make_t5_encoder_routing():
    """Config-typed routing: UMT5Config -> UMT5Encoder, T5Config ->
    JaxT5Encoder."""
    transformers = pytest.importorskip("transformers")
    from magcache_tpu.models.text import make_t5_encoder
    from magcache_tpu.models.umt5 import UMT5Config, UMT5Encoder

    enc = make_t5_encoder(UMT5Config.tiny(), seq_len=10)
    assert isinstance(enc, UMT5Encoder)
    ids = np.array([[3, 5, 7, 1, 0, 0, 0, 0, 0, 0]])
    out = enc.encode_ids(ids, (ids != 0).astype(np.int32))
    assert out.shape == (1, 10, 32)
    assert np.isfinite(np.asarray(out)).all()

    t5cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8)
    enc2 = make_t5_encoder(t5cfg, seq_len=10)
    assert isinstance(enc2, JaxT5Encoder)


def test_umt5_pth_ckpt_dir_routing(tmp_path):
    """A wan-style ckpt_dir (models_t5_umt5-xxl-enc-*.pth next to other .pth
    files) loads through make_t5_encoder: filename sniff -> torch .pth load
    -> wan-native key conversion."""
    torch = pytest.importorskip("torch")
    import transformers

    from magcache_tpu.models.text import make_t5_encoder
    from magcache_tpu.models.umt5 import UMT5Encoder

    with torch.no_grad():
        tm = transformers.UMT5EncoderModel(_tiny_umt5_hf_config(transformers)).eval()
        sd = {k: v for k, v in tm.state_dict().items()}
    wan_sd = {"token_embedding.weight": sd["shared.weight"],
              "norm.weight": sd["encoder.final_layer_norm.weight"]}
    for i in range(3):
        b = f"encoder.block.{i}.layer."
        wan_sd[f"blocks.{i}.norm1.weight"] = sd[b + "0.layer_norm.weight"]
        for n in "qkvo":
            wan_sd[f"blocks.{i}.attn.{n}.weight"] = sd[b + f"0.SelfAttention.{n}.weight"]
        wan_sd[f"blocks.{i}.pos_embedding.embedding.weight"] = (
            sd[b + "0.SelfAttention.relative_attention_bias.weight"])
        wan_sd[f"blocks.{i}.norm2.weight"] = sd[b + "1.layer_norm.weight"]
        wan_sd[f"blocks.{i}.ffn.gate.0.weight"] = sd[b + "1.DenseReluDense.wi_0.weight"]
        wan_sd[f"blocks.{i}.ffn.fc1.weight"] = sd[b + "1.DenseReluDense.wi_1.weight"]
        wan_sd[f"blocks.{i}.ffn.fc2.weight"] = sd[b + "1.DenseReluDense.wo.weight"]
    # bf16 storage like the published file; other .pth files ride along
    torch.save({k: v.to(torch.bfloat16) for k, v in wan_sd.items()},
               tmp_path / "models_t5_umt5-xxl-enc-bf16.pth")
    torch.save({"unrelated": torch.zeros(2)}, tmp_path / "Wan2.1_VAE.pth")
    # the REAL Wan2.1 repo layout: the DiT ships as safetensors next to the
    # encoder .pth, and the top-level config.json describes the DiT — the
    # umt5 sniff must still win over both (regression: model_type "t2v" used
    # to block detection, and the safetensors branch used to load the DiT)
    (tmp_path / "config.json").write_text('{"model_type": "t2v"}')
    from safetensors.numpy import save_file
    save_file({"dit.blocks.0.w": np.zeros((2, 2), np.float32)},
              str(tmp_path / "diffusion_pytorch_model.safetensors"))

    enc = make_t5_encoder(str(tmp_path), seq_len=8)
    assert isinstance(enc, UMT5Encoder)
    # weights-only dir (no tokenizer files): degrades to the hash tokenizer
    # like JaxT5Encoder instead of leaving tokenizer=None
    assert enc.tokenizer is not None
    assert np.asarray(enc(["a cat"])).shape == (1, 8, enc.cfg.d_model)
    ids = np.array([[3, 5, 7, 11, 2, 1, 0, 0]], np.int64)
    mask = (ids != 0).astype(np.int64)
    out = np.asarray(enc.encode_ids(ids, mask))
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    # bf16 weight storage costs ~1e-2 absolute on a tiny random model
    np.testing.assert_allclose(out[0, :6], ref[0, :6], rtol=0.1, atol=0.05)


def test_umt5_sharded_equals_single_device():
    import jax as _jax
    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from magcache_tpu.models.umt5 import UMT5Config, UMT5Encoder
    from magcache_tpu.parallel.mesh import build_mesh

    cfg = UMT5Config.tiny()
    ids = np.array([[3, 5, 7, 11, 2, 1, 0, 0]], np.int64)
    mask = (ids != 0).astype(np.int64)
    ref = UMT5Encoder(cfg, seq_len=8)
    out_ref = np.asarray(ref.encode_ids(ids, mask))
    sh = UMT5Encoder(cfg, seq_len=8, mesh=build_mesh(dp=1, sp=1, tp=8))
    out_sh = np.asarray(sh.encode_ids(ids, mask))
    np.testing.assert_allclose(out_sh, out_ref, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Qwen2 (the Qwen-Image text stack: Qwen2.5-VL text tower = Qwen2 arch with
# q/k/v biases) — parity via the qkv_bias extension of the Llama encoder.
# ---------------------------------------------------------------------------


def test_qwen2_parity_vs_torch():
    torch = pytest.importorskip("torch")
    import transformers

    from magcache_tpu.models.llama import (
        LlamaConfig, convert_llama_state_dict, llama_hidden_states)

    hf_cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-5,
        attn_implementation="eager")
    with torch.no_grad():
        tm = transformers.Qwen2Model(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        assert "layers.0.self_attn.q_proj.bias" in sd   # the Qwen2 difference
        cfg = LlamaConfig.tiny(layers=3, qkv_bias=True)
        params = convert_llama_state_dict(sd, cfg)
        assert "b" in params["blocks"]["q"]
        ids = np.array([[3, 5, 7, 11, 2, 0, 0, 0]], np.int64)
        mask = (ids != 0).astype(np.int64)
        t_out = tm(input_ids=torch.tensor(ids),
                   attention_mask=torch.tensor(mask),
                   output_hidden_states=True)
        ref = t_out.hidden_states[-1].numpy()   # final-normed last state
    out = llama_hidden_states(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                              skip_layers=0, final_norm=True)
    valid = np.asarray(mask[0], bool)
    np.testing.assert_allclose(np.asarray(out)[0, valid], ref[0, valid],
                               rtol=3e-4, atol=3e-4)


def test_qwen_template_encoder_wrapper():
    """Template crop with the Qwen-Image drop_idx + fixed out_len, ids path."""
    from magcache_tpu.models.llama import LlamaConfig
    from magcache_tpu.models.text import (LlamaTextEncoder,
                                          QWEN_IMAGE_CROP_START,
                                          QWEN_IMAGE_PROMPT_TEMPLATE)

    assert QWEN_IMAGE_CROP_START == 34
    cfg = LlamaConfig.tiny(qkv_bias=True)
    enc = LlamaTextEncoder(cfg, out_len=6, skip_layers=0,
                           template=QWEN_IMAGE_PROMPT_TEMPLATE,
                           crop_start=QWEN_IMAGE_CROP_START)
    ids = np.array([[3, 5, 7, 1, 0, 0]], np.int64)
    out = enc.encode_ids(ids)
    assert out.shape == (1, 6, cfg.hidden)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# SD3/Vchitect triple-encoder stack: CLIPTextModelWithProjection parity
# (penultimate states + projected pooled) and the combined recipe.
# ---------------------------------------------------------------------------


def test_clip_text_projection_parity_vs_torch():
    torch = pytest.importorskip("torch")
    import transformers

    from magcache_tpu.models.clip import (
        CLIPTextConfig, clip_text_forward, convert_clip_text_state_dict)

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, projection_dim=24,
        max_position_embeddings=16, eos_token_id=95, bos_token_id=94,
        hidden_act="gelu")
    with torch.no_grad():
        tm = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        cfg = CLIPTextConfig.tiny(layers=3, quick_gelu=False)
        params = convert_clip_text_state_dict(sd, cfg)
        assert "text_proj" in params
        ids = np.array([[94, 3, 7, 12, 95, 0, 0, 0]], np.int64)
        mask = (ids != 0).astype(np.int64)
        t_out = tm(input_ids=torch.tensor(ids),
                   attention_mask=torch.tensor(mask),
                   output_hidden_states=True)
    h, pooled = clip_text_forward(params, cfg, jnp.asarray(ids),
                                  jnp.asarray(mask), hidden_skip=1,
                                  project=True)
    # hidden_states[-2]: the SD3 prompt-embedding slice (un-normed)
    np.testing.assert_allclose(np.asarray(h),
                               t_out.hidden_states[-2].numpy(),
                               rtol=2e-4, atol=2e-4)
    # text_embeds: projected EOS pooling
    np.testing.assert_allclose(np.asarray(pooled),
                               t_out.text_embeds.numpy(),
                               rtol=2e-4, atol=2e-4)
    # projection must be opt-in: with project unset (the FLUX/hyvideo pooled
    # consumers), the same checkpoint yields the un-projected pooler output
    # even though it carries text_projection.weight
    _, pooled_raw = clip_text_forward(params, cfg, jnp.asarray(ids),
                                      jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(pooled_raw @ params["text_proj"]), np.asarray(pooled),
        rtol=2e-4, atol=2e-4)
    assert not np.allclose(np.asarray(pooled_raw)[..., :24],
                           np.asarray(pooled))


class _FakeTok:
    """Minimal tokenizer stub: hashes words to ids, pads to max_length."""

    def __call__(self, texts, padding=None, truncation=None, max_length=8,
                 return_tensors=None):
        ids = np.zeros((len(texts), max_length), np.int64)
        for i, t in enumerate(texts):
            toks = [3 + (hash(w) % 90) for w in t.split()][: max_length - 1]
            ids[i, :len(toks)] = toks
            ids[i, len(toks)] = 95       # eos
        return {"input_ids": ids,
                "attention_mask": (ids != 0).astype(np.int64)}


def test_sd3_text_stack_recipe():
    """context = [pad(concat(clipL, clipG)); t5] on the sequence axis,
    pooled = concat of projected pooled vectors (pipeline_vchitect.py)."""
    from magcache_tpu.models.clip import CLIPTextConfig
    from magcache_tpu.models.text import (ClipTextEncoder, MockTextEncoder,
                                          Sd3TextStack)

    cfg = CLIPTextConfig.tiny()
    clip_l = ClipTextEncoder(cfg, seq_len=8, tokenizer=_FakeTok(),
                             hidden_skip=1)
    clip_g = ClipTextEncoder(cfg, seq_len=8, tokenizer=_FakeTok(),
                             hidden_skip=1)
    t5 = MockTextEncoder(5, 128)         # [B, 5, 128] states
    stack = Sd3TextStack(clip_l, clip_g, t5)
    prompts = ["a boat on a lake", "blurry"]
    ctx = stack.context(prompts)
    pooled = stack.pooled(prompts)
    assert ctx.shape == (2, 8 + 5, 128)   # clip seq + t5 seq, padded to t5 dim
    assert pooled.shape == (2, 2 * cfg.dim)
    # clip channels beyond 2*dim are zero-padding
    assert np.abs(np.asarray(ctx[:, :8, 2 * cfg.dim:])).max() == 0.0
    assert np.abs(np.asarray(ctx[:, :8, :2 * cfg.dim])).max() > 0.0


# ---------------------------------------------------------------------------
# MT5 (Open-Sora-Plan v1.2's google/mt5-xxl, pipeline_open_sora_plan.py:207):
# a torch-only MT5EncoderModel checkpoint dir must route through the MT5
# class + from_pt fallback and match the torch module numerically.
# ---------------------------------------------------------------------------


def test_mt5_encoder_parity_vs_torch(tmp_path):
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.MT5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8)
    with torch.no_grad():
        tm = transformers.MT5EncoderModel(hf_cfg).eval()
        tm.save_pretrained(tmp_path, safe_serialization=False)  # torch .bin
        ids = np.array([[3, 5, 7, 1, 0, 0, 0, 0, 0, 0]], np.int64)
        mask = (ids != 0).astype(np.int64)
        ref = tm(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    enc = JaxT5Encoder(str(tmp_path), seq_len=10)
    from transformers import FlaxMT5EncoderModel
    assert isinstance(enc.model, FlaxMT5EncoderModel)
    out = np.asarray(enc.encode_ids(ids, mask))
    np.testing.assert_allclose(out, ref * mask[..., None], rtol=2e-4,
                               atol=2e-4)
