"""Parity of the fused qk-norm/RoPE flash kernels and the STDiT3 packed
weight layout (ops/attention.py qk_gains/rope_tables; stdit3._pack_block_group).

The fused kernels compute the norm/rotation in f32 inside VMEM, where the
unfused composition rounds intermediates to the activation dtype — parity is
exact in f32 and bf16-tolerance in bf16 (same contract as ops/tiny_attention).

Reference spec: the qk-norm-before-rope ordering of Open-Sora attention
(``videosys/models/modules/attentions.py:71-75``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.ops.attention import (
    QKNORM_FIXED_MAX,
    flash_attention_bshd,
    grouped_flash_attention_bshd,
)
from magcache_tpu.ops.norms import rms_norm
from magcache_tpu.ops.rope import apply_rope, rope_freqs_1d

TD = 72          # true head dim (STDiT3/Latte/OSP)
DP = 128         # padded lane width


def _pad_d(x):
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, DP - TD)))


def _mk(b, s, h, key, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    q = jax.random.normal(ks[0], (b, s, h, TD), dtype)
    k = jax.random.normal(ks[1], (b, s, h, TD), dtype)
    v = jax.random.normal(ks[2], (b, s, h, TD), dtype)
    qg = jax.random.uniform(ks[3], (TD,), jnp.float32, 0.5, 1.5)
    kg = jax.random.uniform(ks[4], (TD,), jnp.float32, 0.5, 1.5)
    return q, k, v, qg, kg


def _gains_padded(qg, kg, h):
    pad = lambda g: jnp.broadcast_to(jnp.pad(g, (0, DP - TD)), (h, DP))
    return pad(qg), pad(kg)


def _xla_sdpa(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("fixed_max", [None, QKNORM_FIXED_MAX])
def test_bshd_fused_qknorm_matches_unfused(fixed_max):
    b, s, h = 2, 200, 3
    q, k, v, qg, kg = _mk(b, s, h, key=0)
    scale = 1.0 / np.sqrt(TD)

    ref = _xla_sdpa(rms_norm(q, qg, eps=1e-6), rms_norm(k, kg, eps=1e-6),
                    v, scale)
    out = flash_attention_bshd(
        _pad_d(q), _pad_d(k), _pad_d(v), scale=scale, fixed_max=fixed_max,
        qk_gains=_gains_padded(qg, kg, h), true_d=TD, eps=1e-6,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out[..., :TD]), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # padded lanes carry zeros through the whole pipeline
    assert np.abs(np.asarray(out[..., TD:])).max() == 0.0


def test_bshd_fused_qknorm_bf16():
    b, s, h = 1, 130, 2
    q, k, v, qg, kg = _mk(b, s, h, key=1, dtype=jnp.bfloat16)
    scale = 1.0 / np.sqrt(TD)
    ref = _xla_sdpa(rms_norm(q, qg, eps=1e-6).astype(jnp.bfloat16),
                    rms_norm(k, kg, eps=1e-6).astype(jnp.bfloat16), v, scale)
    out = flash_attention_bshd(
        _pad_d(q), _pad_d(k), _pad_d(v), scale=scale,
        qk_gains=_gains_padded(qg, kg, h), true_d=TD, eps=1e-6,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out[..., :TD], np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_grouped_fused_norm_rope_matches_unfused():
    T, Tp, R, h = 7, 8, 6, 2
    q, k, v, qg, kg = _mk(R, T, h, key=2)
    cos, sin = rope_freqs_1d(np.arange(T), TD)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    # reference: norm -> rope -> per-group (per-row) attention over T
    qr = apply_rope(rms_norm(q, qg, eps=1e-6), cos, sin)
    kr = apply_rope(rms_norm(k, kg, eps=1e-6), cos, sin)
    ref = _xla_sdpa(qr, kr, v, 1.0 / np.sqrt(TD))

    # kernel tables: [Tp, DP] with identity padding
    cp = np.ones((Tp, DP), np.float32)
    sp = np.zeros((Tp, DP), np.float32)
    cp[:T, :TD] = np.repeat(np.asarray(cos, np.float32), 2, axis=-1)
    sp[:T, :TD] = np.repeat(np.asarray(sin, np.float32), 2, axis=-1)

    pad_t = lambda x: jnp.pad(_pad_d(x), ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
    rs = lambda x: pad_t(x).reshape(1, R * Tp, h, DP)
    out = grouped_flash_attention_bshd(
        rs(q), rs(k), rs(v), group=Tp, group_valid=T,
        scale=1.0 / np.sqrt(TD), qk_gains=_gains_padded(qg, kg, h),
        rope_tables=(jnp.asarray(cp), jnp.asarray(sp)), true_d=TD,
        eps=1e-6, interpret=True)
    out = out.reshape(R, Tp, h, DP)[:, :T, :, :TD]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_grouped_plain_still_matches():
    """No-norm/no-rope grouped call (the pre-existing contract) unchanged."""
    Tp, R, h = 8, 4, 2
    q, k, v, _, _ = _mk(R, Tp, h, key=3)
    ref = _xla_sdpa(q, k, v, 1.0 / np.sqrt(TD))
    rs = lambda x: _pad_d(x).reshape(1, R * Tp, h, DP)
    out = grouped_flash_attention_bshd(
        rs(q), rs(k), rs(v), group=Tp, scale=1.0 / np.sqrt(TD),
        interpret=True).reshape(R, Tp, h, DP)[..., :TD]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_qkv_entry_matches_split_entry():
    """grouped_attention_fused_qkv (q/k/v via lane-offset index maps into the
    raw projection output) == grouped_flash_attention_bshd on the splits."""
    from magcache_tpu.ops.attention import grouped_attention_fused_qkv

    T, Tp, R, h = 7, 8, 6, 2
    q, k, v, qg, kg = _mk(R, T, h, key=4)
    cos, sin = rope_freqs_1d(np.arange(T), TD)
    cp = np.ones((Tp, DP), np.float32)
    sp = np.zeros((Tp, DP), np.float32)
    cp[:T, :TD] = np.repeat(np.asarray(cos, np.float32), 2, axis=-1)
    sp[:T, :TD] = np.repeat(np.asarray(sin, np.float32), 2, axis=-1)
    tables = (jnp.asarray(cp), jnp.asarray(sp))
    gains = _gains_padded(qg, kg, h)

    pad_t = lambda x: jnp.pad(_pad_d(x), ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
    rs = lambda x: pad_t(x).reshape(1, R * Tp, h, DP)
    ref = grouped_flash_attention_bshd(
        rs(q), rs(k), rs(v), group=Tp, group_valid=T,
        scale=1.0 / np.sqrt(TD), qk_gains=gains, rope_tables=tables,
        true_d=TD, eps=1e-6, interpret=True).reshape(1, R * Tp, h * DP)

    qkv = jnp.concatenate(
        [pad_t(x).reshape(R, Tp, h * DP) for x in (q, k, v)], axis=-1)
    out = grouped_attention_fused_qkv(
        qkv.reshape(1, R * Tp, 3 * h * DP), h, group=Tp, group_valid=T,
        scale=1.0 / np.sqrt(TD), qk_gains=gains, rope_tables=tables,
        true_d=TD, eps=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_fused_qkv_one_shot_spatial_group():
    """Large-group (one frame per grid step) geometry: matches full softmax
    attention over each frame with ragged group tail masked."""
    from magcache_tpu.ops.attention import grouped_attention_fused_qkv

    S, Sg, B, h = 27, 32, 3, 2
    q, k, v, qg, kg = _mk(B, S, h, key=5)
    ref = _xla_sdpa(rms_norm(q, qg, eps=1e-6), rms_norm(k, kg, eps=1e-6),
                    v, 1.0 / np.sqrt(TD))
    pad_s = lambda x: jnp.pad(_pad_d(x), ((0, 0), (0, Sg - S), (0, 0), (0, 0)))
    qkv = jnp.concatenate(
        [pad_s(x).reshape(B, Sg, h * DP) for x in (q, k, v)], axis=-1)
    out = grouped_attention_fused_qkv(
        qkv, h, group=Sg, group_valid=S, scale=1.0 / np.sqrt(TD),
        qk_gains=_gains_padded(qg, kg, h), true_d=TD, eps=1e-6,
        interpret=True)
    out = out.reshape(B, Sg, h, DP)[:, :S, :, :TD]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pack_block_group_projection_algebra():
    """Padded weights produce exactly the unpadded projections plus zero
    lanes, and the input-padded proj ignores the zero lanes."""
    from magcache_tpu.models.common import linear
    from magcache_tpu.models.stdit3 import (STDiT3Config, _pack_block_group,
                                            init_stdit3_params)

    cfg = STDiT3Config.tiny()           # hidden 64, heads 4 -> d_head 16
    d, heads, td = cfg.hidden, cfg.heads, cfg.head_dim
    dp = 32
    params = init_stdit3_params(jax.random.PRNGKey(0), cfg)
    g = params["spatial"]
    gp = _pack_block_group(g, heads, td, dp)
    sl = lambda tree: jax.tree.map(lambda a: a[0], tree)  # layer-0 slice

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, d))
    qkv = linear(sl(g["qkv"]), x).reshape(2, 5, 3, heads, td)
    qkv_p = linear(sl(gp["qkv"]), x).reshape(2, 5, 3, heads, dp)
    np.testing.assert_allclose(np.asarray(qkv_p[..., :td]), np.asarray(qkv),
                               atol=1e-6)
    assert np.abs(np.asarray(qkv_p[..., td:])).max() == 0.0

    o = jax.random.normal(jax.random.PRNGKey(2), (2, 5, heads, td))
    o_p = jnp.pad(o, ((0, 0), (0, 0), (0, 0), (0, dp - td)))
    a = linear(sl(g["proj"]), o.reshape(2, 5, heads * td))
    a_p = linear(sl(gp["proj"]), o_p.reshape(2, 5, heads * dp))
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a), atol=1e-6)

    # cross kv: fused [2*H*dp] splits into aligned k/v halves
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 3, d))
    kv = linear(sl(g["cross_kv"]), y).reshape(2, 3, 2, heads, td)
    kv_p = linear(sl(gp["cross_kv"]), y).reshape(2, 3, 2, heads, dp)
    np.testing.assert_allclose(np.asarray(kv_p[..., :td]), np.asarray(kv),
                               atol=1e-6)

    # gains zero-padded
    assert gp["q_norm_p"].shape == (cfg.depth, dp)
    assert np.abs(np.asarray(gp["q_norm_p"][:, td:])).max() == 0.0
