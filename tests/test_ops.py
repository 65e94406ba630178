"""Ops layer tests: attention (pallas-interpret vs XLA), RoPE, norms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.ops.attention import attention
from magcache_tpu.ops.norms import adaln_modulate, layer_norm, rms_norm
from magcache_tpu.ops.rope import apply_rope, rope_freqs_1d, rope_freqs_nd, wan_axis_dims


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("b,s,h,d", [(1, 128, 2, 64), (2, 200, 4, 128)])
def test_pallas_flash_matches_xla(b, s, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    ref = attention(q, k, v, impl="xla")
    out = attention(q, k, v, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_cross_attention_kv_len_mask():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 64, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 96, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 96, 2, 64)), jnp.float32)
    # masked result must equal attention over the truncated kv
    ref = attention(q, k[:, :80], v[:, :80], impl="xla")
    out = attention(q, k, v, kv_len=80, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    out_p = attention(q, k, v, kv_len=80, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref), atol=2e-5)


def test_attention_softmax_scale_default():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 32, 1, 64)), jnp.float32)
    k, v = q, q
    out = attention(q, k, v, impl="xla")
    # manual reference
    s = np.einsum("bshd,bkhd->bhsk", q, k) / np.sqrt(64)
    p = jax.nn.softmax(jnp.asarray(s), axis=-1)
    ref = np.einsum("bhsk,bkhd->bshd", p, v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


# ---------------------------------------------------------------------------
# rope
# ---------------------------------------------------------------------------

def test_rope_rotation_preserves_norm():
    cos, sin = rope_freqs_1d(np.arange(16), 64)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 2, 64)), jnp.float32)
    y = apply_rope(x, jnp.asarray(cos), jnp.asarray(sin))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_rope_zero_position_is_identity():
    cos, sin = rope_freqs_1d(np.zeros(4), 32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 1, 32)), jnp.float32)
    y = apply_rope(x, jnp.asarray(cos), jnp.asarray(sin))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_rope_relative_phase():
    """<R(p)x, R(q)y> depends only on p - q (the defining RoPE property)."""
    d = 32
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 1, 1, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 1, 1, d)), jnp.float32)

    def dot_at(p, q):
        cp, sp = rope_freqs_1d(np.array([p]), d)
        cq, sq = rope_freqs_1d(np.array([q]), d)
        xr = apply_rope(x, jnp.asarray(cp), jnp.asarray(sp))
        yr = apply_rope(y, jnp.asarray(cq), jnp.asarray(sq))
        return float(jnp.sum(xr * yr))

    np.testing.assert_allclose(dot_at(5, 3), dot_at(12, 10), rtol=1e-4)


def test_rope_matches_complex_multiplication():
    """Interleaved-pair rotation == complex multiply (Wan's view_as_complex path)."""
    d = 16
    pos = np.arange(8)
    cos, sin = rope_freqs_1d(pos, d)
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 8, 1, d)).astype(np.float32)
    y = apply_rope(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin))
    xc = x.reshape(1, 8, 1, d // 2, 2)
    z = xc[..., 0] + 1j * xc[..., 1]
    rot = np.exp(1j * (cos * 0))  # placeholder; rebuild angles
    inv_freq = 10000.0 ** (-np.arange(0, d, 2) / d)
    ang = pos[:, None] * inv_freq[None, :]
    zr = z * np.exp(1j * ang)[None, :, None, :]
    expected = np.stack([zr.real, zr.imag], axis=-1).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(y), expected.astype(np.float32), atol=1e-4)


def test_rope_nd_grid_shapes():
    dims = wan_axis_dims(128)
    assert sum(dims) == 128 and all(d % 2 == 0 for d in dims)
    cos, sin = rope_freqs_nd((3, 4, 5), dims)
    assert cos.shape == (60, 64) and sin.shape == (60, 64)


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------

def test_rms_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(2, 7, 32)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(32,)).astype(np.float32)
    ours = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-5))
    xt = torch.tensor(x)
    expected = (xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-5)) * torch.tensor(w)
    np.testing.assert_allclose(ours, expected.numpy(), atol=1e-5)


def test_layer_norm_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    x = np.random.default_rng(0).normal(size=(2, 7, 32)).astype(np.float32)
    ours = np.asarray(layer_norm(jnp.asarray(x), eps=1e-6))
    expected = F.layer_norm(torch.tensor(x), (32,), eps=1e-6).numpy()
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_adaln_modulate_broadcast():
    x = jnp.ones((2, 10, 8))
    shift = jnp.full((2, 8), 0.5)
    scale = jnp.full((2, 8), 1.0)
    out = adaln_modulate(x, shift, scale)
    np.testing.assert_allclose(np.asarray(out), np.full((2, 10, 8), 2.5))


def test_norms_preserve_bf16_dtype():
    x = jnp.ones((2, 4, 16), jnp.bfloat16)
    assert rms_norm(x).dtype == jnp.bfloat16
    assert layer_norm(x).dtype == jnp.bfloat16


def test_fixed_max_kernel_matches_running_max(monkeypatch):
    """MAGCACHE_FLASH_FIXED_MAX: static-shift softmax == online softmax
    (shift invariance), including trailing-key masking."""
    import numpy as np

    from magcache_tpu.ops.attention import flash_attention_bhsd

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 2, 96, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 80, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 80, 64)), jnp.float32)
    base = flash_attention_bhsd(q, k, v, kv_len=70, interpret=True)
    monkeypatch.setenv("MAGCACHE_FLASH_FIXED_MAX", "8.0")
    fixed = flash_attention_bhsd(q, k, v, kv_len=70, interpret=True)
    np.testing.assert_allclose(np.asarray(fixed), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_flash_block_env_knobs(monkeypatch):
    import numpy as np

    from magcache_tpu.ops.attention import flash_attention_bhsd

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 1, 300, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1, 300, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 1, 300, 64)), jnp.float32)
    base = flash_attention_bhsd(q, k, v, interpret=True)
    monkeypatch.setenv("MAGCACHE_FLASH_BQ", "128")
    monkeypatch.setenv("MAGCACHE_FLASH_BK", "256")
    small = flash_attention_bhsd(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(small), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


def test_bshd_kernel_ragged_tails_match_xla():
    # Non-block-divisible seq + kv: the ragged tails come straight from the
    # grid (no zero-pad), so uninitialized v rows must be masked in-kernel
    # (0 * NaN would otherwise poison the accumulator — regression test).
    import math

    from magcache_tpu.ops.attention import (
        _xla_attention_bhsd,
        flash_attention_bshd,
    )
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    b, s, h, d, skv = 2, 300, 3, 64, 77
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, skv, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, skv, h, d), jnp.float32)
    for fm in (None, 16.0):
        out = flash_attention_bshd(q, k, v, kv_len=50, fixed_max=fm,
                                   interpret=True, block_q=128, block_k=128)
        want = _xla_attention_bhsd(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), scale=1 / math.sqrt(d),
            kv_len=50).transpose(0, 2, 1, 3)
        assert jnp.max(jnp.abs(out - want)) < 3e-5
        assert not bool(jnp.any(jnp.isnan(out)))


def test_fused_prologue_matches_unfused_composition():
    # rms_norm -> heads -> apply_rope == the fused Pallas kernel, both norm
    # scopes (token = Wan WanRMSNorm-before-head-split; head = FLUX/Hunyuan
    # per-head qk norm), including ragged sequence tails.
    import numpy as np

    from magcache_tpu.ops.fused_prologue import rms_norm_rope
    from magcache_tpu.ops.norms import rms_norm
    from magcache_tpu.ops.rope import apply_rope, rope_freqs_1d

    rng = np.random.default_rng(2)
    for (b, s, heads, d, scope, gsize) in [
        (2, 300, 3, 128, "token", 3 * 128),
        (1, 512, 2, 128, "token", 2 * 128),
        (2, 300, 3, 128, "head", 128),
        (2, 130, 2, 256, "head", 256),
    ]:
        hd = heads * d
        xb = jnp.asarray(rng.standard_normal((b, s, hd)) * 2, jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal(gsize), jnp.float32)
        cos, sin = rope_freqs_1d(np.arange(s), d)
        out = rms_norm_rope(xb, g, jnp.array(cos), jnp.array(sin), heads,
                            eps=1e-6, norm_scope=scope, interpret=True,
                            block_s=128)
        if scope == "token":
            y = rms_norm(xb, g, eps=1e-6).reshape(b, s, heads, d)
        else:
            y = rms_norm(xb.reshape(b, s, heads, d), g, eps=1e-6)
        want = apply_rope(y, jnp.array(cos), jnp.array(sin))
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        assert err < 2e-2, (scope, b, s, err)  # bf16 rounding ties only


def test_fused_layer_norm_mod_matches_unfused():
    import numpy as np

    from magcache_tpu.ops.fused_prologue import layer_norm_mod
    from magcache_tpu.ops.norms import layer_norm

    rng = np.random.default_rng(4)
    b, s, hd = 2, 300, 256
    xb = jnp.asarray(rng.standard_normal((b, s, hd)) * 2, jnp.bfloat16)
    # AdaLN modulate mode
    sc = jnp.asarray(rng.standard_normal((b, 1, hd)) * 0.1, jnp.float32)
    sh = jnp.asarray(rng.standard_normal((b, 1, hd)) * 0.1, jnp.float32)
    out = layer_norm_mod(xb, scale=sc, shift=sh, eps=1e-6, interpret=True,
                         block_s=128)
    want = ((layer_norm(xb, eps=1e-6).astype(jnp.float32)) * (1 + sc)
            + sh).astype(xb.dtype)
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                 - want.astype(jnp.float32)))) < 2e-2
    # affine mode
    w = jnp.asarray(rng.standard_normal(hd), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(hd), jnp.float32)
    out = layer_norm_mod(xb, weight=w, bias=bias, eps=1e-6, interpret=True,
                         block_s=128)
    want = layer_norm(xb, w, bias, eps=1e-6)
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                 - want.astype(jnp.float32)))) < 2e-2
    # plain mode
    out = layer_norm_mod(xb, eps=1e-6, interpret=True, block_s=128)
    want = layer_norm(xb, eps=1e-6)
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                 - want.astype(jnp.float32)))) < 2e-2


# ---------------------------------------------------------------------------
# sub-128 head dims: padded layout-native kernel + grouped flash
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("b,s,h,d", [(2, 200, 4, 72), (1, 130, 2, 64)])
def test_padded_head_dim_flash_matches_xla(b, s, h, d):
    # d % 128 != 0 routes through zero-padded flash_attention_bshd; must be
    # exact vs the XLA composition (padded lanes contribute nothing)
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    ref = attention(q, k, v, impl="xla")
    out = attention(q, k, v, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_padded_head_dim_cross_kv_len():
    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.normal(size=(1, 140, 2, 72)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 96, 2, 72)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 96, 2, 72)), jnp.float32)
    ref = attention(q, k, v, kv_len=50, impl="xla")
    out = attention(q, k, v, kv_len=50, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_grouped_flash_matches_per_group_softmax():
    from magcache_tpu.ops.attention import grouped_flash_attention_bshd
    rng = np.random.default_rng(9)
    b, h, d, group, ng, gvalid = 1, 2, 128, 16, 20, 13
    s = group * ng
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    out = grouped_flash_attention_bshd(q, k, v, group=group,
                                       group_valid=gvalid, block=64,
                                       interpret=True)
    # reference: independent softmax attention per group over its first
    # gvalid keys
    qg = np.asarray(q).reshape(b, ng, group, h, d)
    kg = np.asarray(k).reshape(b, ng, group, h, d)[:, :, :gvalid]
    vg = np.asarray(v).reshape(b, ng, group, h, d)[:, :, :gvalid]
    sc = 1.0 / np.sqrt(d)
    sref = np.einsum("bgqhd,bgkhd->bghqk", qg, kg) * sc
    p = np.exp(sref - sref.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bghqk,bgkhd->bgqhd", p, vg).reshape(b, s, h, d)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)
