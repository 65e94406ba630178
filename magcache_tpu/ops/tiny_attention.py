"""Fused tiny-sequence attention: qk-norm + RoPE + softmax attention in VMEM.

Temporal attention in spatial-temporal DiTs (STDiT3 ``open_sora_transformer_3d
.py:574-601``, Latte) attends over the frame axis — sequence length T ~ 12-32
— with a huge batch (rows = B*S ~ 3k-50k). Neither flash path fits: the block
kernels pad T up to a 128 block (>10x wasted MXU work) and the XLA einsum
path materializes ``[rows, H, T, T]`` score tensors whose two tiny trailing
dims tile-pad (8, 128) -> ~11x HBM blowup, plus standalone norm/rope passes
and relayout copies. Profiled on STDiT3-480p these cost ~330 ms of a 1.5 s
forward.

This kernel streams row blocks of the fused QKV projection output through
VMEM once and does everything inside:

- per-head RMS qk-norm, computed with **segment matmuls** against constant
  0/1 (and 1/D) matrices so no sub-128-lane head slicing ever happens:
  ``var = (x*x) @ Mavg  [rows, H]``; ``x *= rsqrt(var+eps) @ E``.
- interleaved-pair RoPE via the resident block-diagonal pair-swap matrix
  (same convention as `ops.rope.apply_rope`).
- softmax attention over T as a T-step loop of full-width VPU broadcasts and
  [rows, HD] @ [HD, H] segment reductions — the score "matrix" never exists
  as a tiny-trailing-dim tensor.

Numerics: norm statistics, rotation, scores and softmax all in f32 (the
unfused path rounds the normed/rotated values to the activation dtype and
feeds bf16 into the score matmul — this kernel skips those intermediate
roundings, so it is slightly MORE precise; parity tests use bf16-level
tolerances). Base-2 online softmax, identical in value to `jax.nn.softmax`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magcache_tpu.ops.attention import attention
from magcache_tpu.ops.norms import rms_norm
from magcache_tpu.ops.rope import _pair_swap_matrix, apply_rope

__all__ = ["tiny_temporal_attention"]

_LOG2E = float(np.log2(np.e))


@functools.lru_cache(maxsize=None)
def _segment_mats(heads: int, d: int) -> Tuple[np.ndarray, np.ndarray]:
    """(Mavg [H*D, H], E [H, H*D]): per-head averaging reduction and its 0/1
    expander. ``(x @ Mavg)[r, h] = mean over head h's lanes``;
    ``(y @ E)[r, h*D+i] = y[r, h]``."""
    hd = heads * d
    E = np.zeros((heads, hd), np.float32)
    for h in range(heads):
        E[h, h * d:(h + 1) * d] = 1.0
    return (E / d).T.copy(), E


@functools.lru_cache(maxsize=None)
def _block_diag_pair_swap(heads: int, d: int) -> np.ndarray:
    P = _pair_swap_matrix(d)
    out = np.zeros((heads * d, heads * d), np.float32)
    for h in range(heads):
        out[h * d:(h + 1) * d, h * d:(h + 1) * d] = P
    return out


def _kernel(qkv_ref, qg_ref, kg_ref, cos_ref, sin_ref, pmat_ref, mavg_ref,
            e_ref, o_ref, *, t_len: int, heads: int, d: int, eps: float,
            scale_log2e: float, use_norm: bool, use_rope: bool):
    hd = heads * d
    x = qkv_ref[...]                       # [bR, T, 3*HD]
    br = x.shape[0]
    rows = br * t_len
    x2 = x.reshape(rows, 3 * hd)
    q = x2[:, :hd].astype(jnp.float32)
    k = x2[:, hd:2 * hd].astype(jnp.float32)
    v = x2[:, 2 * hd:]                      # stays bf16 until the PV multiply

    if use_norm:
        mavg = mavg_ref[...]
        # gains arrive pre-folded into the expander rows (eg/kg refs are
        # E * tile(gain)) — one multiply instead of two per operand
        inv_q = jax.lax.rsqrt(jax.lax.dot(q * q, mavg) + eps)   # [rows, H]
        inv_k = jax.lax.rsqrt(jax.lax.dot(k * k, mavg) + eps)
        q = q * jax.lax.dot(inv_q, qg_ref[...])
        k = k * jax.lax.dot(inv_k, kg_ref[...])

    if use_rope:
        # cos/sin arrive tiled to [T, HD]; broadcast over the row blocks
        cos_t = jnp.tile(cos_ref[...], (br, 1))                 # [rows, HD]
        sin_t = jnp.tile(sin_ref[...], (br, 1))
        pmat = pmat_ref[...]
        q = q * cos_t + jax.lax.dot(q, pmat) * sin_t
        k = k * cos_t + jax.lax.dot(k, pmat) * sin_t

    q = q * scale_log2e
    q3 = q.reshape(br, t_len, hd)
    k3 = k.reshape(br, t_len, hd)
    v3 = v.reshape(br, t_len, hd)
    msum = mavg_ref[...] * float(d)        # ones over head segments
    e_mat = e_ref[...]

    # scores: s[t2] [rows, H] = per-head dot(q_t1, k_t2); running row max
    s = []
    m = None
    for t2 in range(t_len):
        prod = (q3 * k3[:, t2:t2 + 1, :]).reshape(rows, hd)
        st = jax.lax.dot(prod, msum)
        s.append(st)
        m = st if m is None else jnp.maximum(m, st)

    l = jnp.zeros_like(m)
    acc = jnp.zeros((rows, hd), jnp.float32)
    for t2 in range(t_len):
        p = jnp.exp2(s[t2] - m)            # [rows, H]
        l = l + p
        pe = jax.lax.dot(p, e_mat)         # [rows, HD]
        acc = acc + (pe.reshape(br, t_len, hd)
                     * v3[:, t2:t2 + 1, :]).reshape(rows, hd)

    norm = jax.lax.dot(jnp.reciprocal(l), e_mat)
    o_ref[...] = (acc * norm).reshape(br, t_len, hd).astype(o_ref.dtype)


def _grouped(qkv, q_gain, k_gain, cos, sin, heads, *, eps, scale,
             interpret=False):
    """MXU path: norm+rope in XLA, then block-diagonal grouped flash.

    Groups of T tokens pack contiguously along one long sequence so each
    [block, block] score tile covers block/group whole groups in one matmul
    pair (`ops.attention.grouped_flash_attention_bshd`). Measured on
    STDiT3-480p temporal attention this replaces ~10 ms of VPU broadcast
    loops with ~1.5 ms of MXU + elementwise time."""
    from magcache_tpu.ops.attention import grouped_flash_attention_bshd

    r, t_len, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    rs = lambda x: x.reshape(r, t_len, heads, d)
    q, k, v = rs(q), rs(k), rs(v)
    if q_gain is not None:
        q = rms_norm(q, q_gain, eps=eps)
        k = rms_norm(k, k_gain, eps=eps)
    if cos is not None:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    q = q.astype(v.dtype)
    k = k.astype(v.dtype)
    group = max(8, 1 << (t_len - 1).bit_length())
    dp = -(-d // 128) * 128
    pad = ((0, 0), (0, group - t_len), (0, 0), (0, dp - d))
    q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    out = grouped_flash_attention_bshd(
        q.reshape(1, r * group, heads, dp),
        k.reshape(1, r * group, heads, dp),
        v.reshape(1, r * group, heads, dp),
        group=group, group_valid=t_len, scale=scale, interpret=interpret)
    return out.reshape(r, group, heads, dp)[:, :t_len, :, :d].reshape(
        r, t_len, hd)


def _reference(qkv, q_gain, k_gain, cos, sin, heads, *, eps, scale):
    """Unfused composition (CPU / mesh fallback and the parity oracle)."""
    r, t_len, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    rs = lambda x: x.reshape(r, t_len, heads, d)
    q, k, v = rs(q), rs(k), rs(v)
    if q_gain is not None:
        q = rms_norm(q, q_gain, eps=eps)
        k = rms_norm(k, k_gain, eps=eps)
    if cos is not None:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    return attention(q, k, v, scale=scale).reshape(r, t_len, hd)


def tiny_temporal_attention(
    qkv: jnp.ndarray,
    q_gain: Optional[jnp.ndarray],
    k_gain: Optional[jnp.ndarray],
    cos: Optional[jnp.ndarray],
    sin: Optional[jnp.ndarray],
    heads: int,
    *,
    eps: float = 1e-6,
    scale: Optional[float] = None,
    block_r: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused qk-norm + RoPE + attention over ``qkv [R, T, 3*H*D]``, T <= 32.

    ``q_gain``/``k_gain``: per-head RMS gains ``[D]`` (None skips the norm);
    ``cos``/``sin``: interleaved-pair tables ``[T, D/2]`` (None skips RoPE).
    Returns ``[R, T, H*D]``. Falls back to the unfused composition off-TPU,
    under an active mesh plan (sharded rows stay declarative), for T > 32, or
    under ``MAGCACHE_TINY_ATTN=0``.

    ``MAGCACHE_TINY_ATTN`` selects the TPU path: "grouped" (default — XLA
    norm/rope + block-diagonal grouped flash, see `_grouped`), "vpu" (the
    fused single-pass VMEM kernel below), "0" (unfused composition).
    """
    import os

    r, t_len, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // heads
    scale = (1.0 / float(np.sqrt(d))) if scale is None else scale
    from magcache_tpu.parallel.mesh import _ACTIVE
    on_tpu = jax.default_backend() in ("tpu", "axon")
    mode = os.environ.get("MAGCACHE_TINY_ATTN", "grouped")
    if mode == "1":                       # legacy on-switch -> default path
        mode = "grouped"
    if not interpret and (not on_tpu or mode == "0" or t_len > 32
                          or d % 2 or _ACTIVE.get() is not None):
        return _reference(qkv, q_gain, k_gain, cos, sin, heads,
                          eps=eps, scale=scale)
    if mode != "vpu" and not interpret:
        return _grouped(qkv, q_gain, k_gain, cos, sin, heads,
                        eps=eps, scale=scale)
    if hd % 128 != 0:
        return _reference(qkv, q_gain, k_gain, cos, sin, heads,
                          eps=eps, scale=scale)

    use_norm = q_gain is not None
    use_rope = cos is not None
    mavg, e_mat = _segment_mats(heads, d)
    if use_rope:
        cos_t = jnp.tile(jnp.repeat(jnp.asarray(cos, jnp.float32), 2, axis=-1),
                         (1, heads))
        sin_t = jnp.tile(jnp.repeat(jnp.asarray(sin, jnp.float32), 2, axis=-1),
                         (1, heads))
        pmat = jnp.asarray(_block_diag_pair_swap(heads, d))
    else:
        cos_t = sin_t = jnp.zeros((t_len, hd), jnp.float32)
        pmat = jnp.zeros((hd, hd), jnp.float32)
    if use_norm:
        # fold the per-head gains into the 0/1 expander rows (see _kernel)
        e_j = jnp.asarray(e_mat)
        qg_t = e_j * jnp.tile(q_gain.astype(jnp.float32), (heads,))[None]
        kg_t = e_j * jnp.tile(k_gain.astype(jnp.float32), (heads,))[None]
    else:
        qg_t = kg_t = jnp.zeros((heads, hd), jnp.float32)

    kernel = functools.partial(
        _kernel, t_len=t_len, heads=heads, d=d, eps=eps,
        scale_log2e=scale * _LOG2E, use_norm=use_norm, use_rope=use_rope)
    nb = -(-r // block_r)
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_r, t_len, 3 * hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(heads, hd), const(heads, hd),
            const(t_len, hd), const(t_len, hd),
            const(hd, hd),
            const(hd, heads), const(heads, hd),
        ],
        out_specs=pl.BlockSpec((block_r, t_len, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, t_len, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * r * heads * t_len * t_len * d,
            bytes_accessed=(qkv.size + qkv.size // 3) * qkv.dtype.itemsize,
            transcendentals=r * heads * t_len * t_len,
        ),
        interpret=interpret,
    )(qkv, qg_t, kg_t, cos_t, sin_t, pmat, jnp.asarray(mavg),
      jnp.asarray(e_mat))
    return out
