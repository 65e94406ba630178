"""Interpret-mode parity of the fused matmul kernels against their unfused
jnp compositions (the fallbacks the same wrappers take off-TPU):

- `ops.fused_prologue.lnmod_matmul` — LN + AdaLN modulate + matmul
  [+ gelu], incl. the padded-rows write (rows_out) and the per-frame
  batch mapping (batch_repeat) the STDiT3/Latte spatial path uses.
- `ops.fused_prologue.matmul_gated_residual` — matmul + AdaLN gate
  [+ residual], incl. row-dropping (rows_out < S_in).
- `ops.attention.fused_cross_attention` — q-proj + short-KV attention +
  out-proj in one kernel, incl. the l-lane normalizer trick (true_d) and
  the fused residual.

Small shapes -> fast; the slow tier's packed-trunk test covers the same
kernels at model level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.ops.attention import fused_cross_attention
from magcache_tpu.ops.fused_prologue import (layer_norm_mod, lnmod_matmul,
                                             matmul_gated_residual)

B, S, DIN, DOUT = 2, 40, 128, 256


@pytest.fixture(scope="module")
def rngs():
    k = [jax.random.PRNGKey(i) for i in range(10)]
    x = jax.random.normal(k[0], (B, S, DIN), jnp.bfloat16)
    sc = jax.random.normal(k[1], (B, DIN), jnp.float32) * 0.1
    sh = jax.random.normal(k[2], (B, DIN), jnp.float32) * 0.1
    w = jax.random.normal(k[3], (DIN, DOUT), jnp.bfloat16) * 0.05
    bias = jax.random.normal(k[4], (DOUT,), jnp.float32) * 0.1
    return x, sc, sh, w, bias


@pytest.mark.parametrize("act", [None, "gelu"])
def test_lnmod_matmul_matches_composition(rngs, act):
    x, sc, sh, w, bias = rngs
    got = lnmod_matmul(x, sc, sh, w, bias, act=act, interpret=True)
    y = layer_norm_mod(x, scale=sc, shift=sh, eps=1e-6, interpret=True)
    ref = jnp.einsum("bsd,df->bsf", y.astype(w.dtype), w) + bias
    if act == "gelu":
        ref = jax.nn.gelu(ref, approximate=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref.astype(x.dtype),
                                                np.float32),
        rtol=0, atol=0.04)


def test_lnmod_matmul_padded_rows_and_batch_repeat(rngs):
    x, sc, sh, w, bias = rngs
    # view the batch as 2 frames per modulation row (batch_repeat), pad
    # each frame's rows 40 -> 48 with kernel-written zeros
    xr = x.reshape(B * 2, S // 2, DIN)
    got = lnmod_matmul(xr, sc, sh, w, bias, rows_out=S // 2 + 8,
                       batch_repeat=2, interpret=True)
    assert got.shape == (B * 2, S // 2 + 8, DOUT)
    np.testing.assert_array_equal(np.asarray(got[:, S // 2:], np.float32), 0)
    sc2 = jnp.repeat(sc, 2, axis=0)
    sh2 = jnp.repeat(sh, 2, axis=0)
    y = layer_norm_mod(xr, scale=sc2, shift=sh2, eps=1e-6, interpret=True)
    ref = (jnp.einsum("bsd,df->bsf", y.astype(w.dtype), w)
           + bias).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(got[:, :S // 2], np.float32),
                               np.asarray(ref, np.float32), rtol=0, atol=0.04)


def test_matmul_gated_residual_matches_composition(rngs):
    x, sc, _, w, bias = rngs
    gate = jax.random.normal(jax.random.PRNGKey(7), (B, DOUT),
                             jnp.float32) * 0.5
    resid = jax.random.normal(jax.random.PRNGKey(8), (B, S, DOUT),
                              jnp.bfloat16)
    got = matmul_gated_residual(x, w, bias, gate, resid, interpret=True)
    mm = (jnp.einsum("bsd,df->bsf", x.astype(w.dtype), w)
          + bias).astype(x.dtype)
    ref = (resid.astype(jnp.float32)
           + mm.astype(jnp.float32) * gate[:, None]).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=0, atol=0.04)


def test_matmul_gated_residual_drops_pad_rows(rngs):
    x, _, _, w, bias = rngs
    gate = jnp.ones((B, DOUT), jnp.float32)
    got = matmul_gated_residual(x, w, bias, gate, None, rows_out=S - 8,
                                interpret=True)
    full = matmul_gated_residual(x, w, bias, gate, None, interpret=True)
    assert got.shape == (B, S - 8, DOUT)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(full[:, :S - 8]))


@pytest.mark.parametrize("residual", [False, True])
def test_fused_cross_attention_matches_composition(residual):
    H, D, L, dm, true_d = 4, 128, 36, 256, 72
    ks = [jax.random.PRNGKey(i) for i in range(8)]
    x = jax.random.normal(ks[0], (B, S, dm), jnp.bfloat16) * 0.3
    wq = jax.random.normal(ks[1], (dm, H * D), jnp.bfloat16) * 0.05
    bq = jax.random.normal(ks[2], (H * D,), jnp.bfloat16) * 0.05
    # packed-layout k/v: per-head lanes >= true_d are zero
    mask = np.zeros((H * D,), np.float32)
    mask[np.arange(H * D) % D < true_d] = 1.0
    kk = jax.random.normal(ks[3], (B, L, H * D), jnp.bfloat16) * 0.3 * mask
    vv = jax.random.normal(ks[4], (B, L, H * D), jnp.bfloat16) * 0.3 * mask
    wo = jax.random.normal(ks[5], (H * D, dm), jnp.bfloat16) * 0.05
    wo = wo * mask[:, None].astype(jnp.bfloat16)   # zero pad-rows, as packed
    bo = jax.random.normal(ks[6], (dm,), jnp.bfloat16) * 0.05
    sc = 1.0 / np.sqrt(true_d)
    got = fused_cross_attention(x, wq, bq, kk, vv, wo, bo, H, scale=sc,
                                true_d=true_d, residual=residual,
                                interpret=True)
    import os
    os.environ["MAGCACHE_FUSED_CROSS"] = "0"
    try:
        ref = fused_cross_attention(x, wq, bq, kk, vv, wo, bo, H, scale=sc,
                                    residual=residual)
    finally:
        del os.environ["MAGCACHE_FUSED_CROSS"]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=0.05)
