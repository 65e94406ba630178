"""Text encoder tests: deterministic mock + native JAX T5 wrapper."""

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
