"""Text encoder tests: deterministic mock + native JAX T5 wrapper."""

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
