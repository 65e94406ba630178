"""Parity tests for the fused tiny-sequence temporal attention kernel.

The kernel (ops/tiny_attention.py) fuses per-head qk-RMSNorm + pair-swap RoPE
+ softmax attention over a tiny T axis into one VMEM pass; these tests pin it
(interpret mode) against the unfused composition it replaces in the STDiT3
temporal path (``open_sora_transformer_3d.py:574-601`` semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.ops.rope import rope_freqs_1d
from magcache_tpu.ops.tiny_attention import _reference, tiny_temporal_attention


def _inputs(R=21, T=12, H=16, D=72, dtype=jnp.bfloat16, seed=0):
    hd = H * D
    key = jax.random.PRNGKey(seed)
    qkv = (jax.random.normal(key, (R, T, 3 * hd), jnp.float32) * 0.5).astype(dtype)
    rs = np.random.RandomState(seed + 1)
    qg = jnp.asarray(rs.uniform(0.5, 1.5, (D,)).astype(np.float32))
    kg = jnp.asarray(rs.uniform(0.5, 1.5, (D,)).astype(np.float32))
    cos, sin = rope_freqs_1d(np.arange(T), D)
    return qkv, qg, kg, jnp.asarray(cos), jnp.asarray(sin)


@pytest.mark.parametrize("use_norm,use_rope", [
    (True, True), (False, True), (True, False), (False, False)])
def test_kernel_matches_unfused(use_norm, use_rope):
    qkv, qg, kg, cos, sin = _inputs()
    H = 16
    qg_, kg_ = (qg, kg) if use_norm else (None, None)
    c_, s_ = (cos, sin) if use_rope else (None, None)
    ref = _reference(qkv, qg_, kg_, c_, s_, H, eps=1e-6, scale=None)
    got = tiny_temporal_attention(qkv, qg_, kg_, c_, s_, H, interpret=True)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    # kernel keeps scores/PV in f32 (unfused rounds to bf16) -> bf16-ulp tol
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_kernel_ragged_rows_and_f32():
    # R not a block multiple; f32 activations take the same path
    qkv, qg, kg, cos, sin = _inputs(R=19, dtype=jnp.float32)
    ref = _reference(qkv, qg, kg, cos, sin, 16, eps=1e-6, scale=None)
    got = tiny_temporal_attention(qkv, qg, kg, cos, sin, 16, interpret=True,
                                  block_r=16)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_fallback_dispatch_off_tpu():
    # on CPU the public entry must route to the unfused composition and agree
    qkv, qg, kg, cos, sin = _inputs(R=7)
    ref = _reference(qkv, qg, kg, cos, sin, 16, eps=1e-6, scale=None)
    got = tiny_temporal_attention(qkv, qg, kg, cos, sin, 16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0, rtol=0)


def test_grouped_path_matches_unfused():
    # the MXU grouped path (XLA norm/rope + block-diag grouped flash in
    # interpret mode) must agree with the unfused composition
    from magcache_tpu.ops.tiny_attention import _grouped
    qkv, qg, kg, cos, sin = _inputs(R=21, T=12)
    ref = _reference(qkv, qg, kg, cos, sin, 16, eps=1e-6, scale=None)
    got = _grouped(qkv, qg, kg, cos, sin, 16, eps=1e-6,
                   scale=1.0 / np.sqrt(72), interpret=True)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_grouped_path_no_norm_no_rope_f32():
    from magcache_tpu.ops.tiny_attention import _grouped
    qkv, *_ = _inputs(R=9, T=15, dtype=jnp.float32)
    ref = _reference(qkv, None, None, None, None, 16, eps=1e-6, scale=None)
    got = _grouped(qkv, None, None, None, None, 16, eps=1e-6,
                   scale=1.0 / np.sqrt(72), interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-3, rtol=2e-3)
