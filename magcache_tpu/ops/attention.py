"""Attention for DiT trunks: first-party Pallas TPU flash attention + XLA fallback.

The reference relies on third-party CUDA flash-attn
(``videosys/models/modules/attentions.py:78,137``) or SDPA; the TPU-native
equivalent is a Pallas kernel that streams K/V blocks through VMEM with an
online-softmax accumulator so the full ``[S, S]`` score matrix never
materializes in HBM. Full (non-causal) attention, the diffusion-DiT case.

Layout convention at the API boundary is ``[batch, seq, heads, head_dim]``
(what patch-embedded DiT activations naturally are); the kernel works in
``[batch, heads, seq, head_dim]``.

Padded text keys: Wan runs cross-attention over the full zero-padded 512-token
context without masking (``magcache_generate.py:264-270`` passes
``context_lens=None``), so unmasked padded-key attention is parity there.  A
``kv_len`` argument masks trailing keys for models that do mask (and for the
wrapper's own block-size padding).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

_LOG2E = math.log2(math.e)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair_swap_np(d: int) -> "np.ndarray":
    """Interleaved-pair rotation partner matrix (same convention as
    `ops.rope._pair_swap_matrix`, re-declared here to avoid a circular
    import): (x @ P)[2i] = -x[2i+1], (x @ P)[2i+1] = x[2i]."""
    P = np.zeros((d, d), np.float32)
    idx = np.arange(d // 2)
    P[2 * idx + 1, 2 * idx] = -1.0
    P[2 * idx, 2 * idx + 1] = 1.0
    return P

__all__ = ["attention", "flash_attention_bhsd", "flash_attention_bshd",
           "fused_cross_attention", "QKNORM_FIXED_MAX"]

_NEG_INF = -1e30

# Static softmax shift for RMS-qk-normed trunks (|s·log2e| <~ sqrt(d)*g^2*1.44
# stays far inside exp2's ±126 headroom around this shift for any plausible
# learned gain). Models with qk-norm pass this to `attention(fixed_max=...)`.
QKNORM_FIXED_MAX = 16.0


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name, "")
    return int(v) if v else default


def _flash_kernel_aux(q_ref, k_ref, v_ref, o_ref, m_out_ref, l_out_ref,
                      acc_ref, m_ref, l_ref, *, scale: float, kv_len: int,
                      block_k: int):
    """Flash kernel variant that also emits per-row (max, sumexp) — the
    streaming-softmax state needed to merge partial attentions across a ring
    (ring attention over `sp`)."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)  # base-2 softmax: exp2 is the VPU-native path
    key_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_pos < kv_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[:, :1] = m_new
    l_ref[:, :1] = l_new

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)
        # (m, l) are in base-2; the ring merge uses exp2 consistently
        m_out_ref[0] = m_ref[:, :1][:, 0]
        l_out_ref[0] = l_ref[:, :1][:, 0]


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  kv_len: int, block_k: int, mask_kv: bool):
    """One (batch*head, q_block, kv_block) grid cell of online-softmax attention.

    q arrives PRE-SCALED by ``scale * log2(e)`` (one cheap [S, d] pass outside
    the kernel instead of a [block_q, block_k] pass per grid cell), and the
    trailing-key mask is compiled in only when the padded kv length actually
    exceeds ``kv_len`` — both save full VPU sweeps over the score block.
    """
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [block_q, d], pre-scaled
    k = k_ref[0]  # [block_k, d]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [block_q, block_k]; base-2 softmax (VPU-native exp2)

    if mask_kv:
        # Mask keys past the true kv length (handles wrapper padding).
        key_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_pos < kv_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]                                   # [block_q, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_ref[:, :1] = m_new
    l_ref[:, :1] = l_new

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _flash_kernel_fixed_max(q_ref, k_ref, v_ref, o_ref, acc_ref, l_ref, *,
                            kv_len: int, block_k: int, mask_kv: bool,
                            m_const: float):
    """Online softmax with a STATIC max: softmax is shift-invariant, so with
    norm-bounded scores (RMS qk-norm models) a compile-time constant ``M``
    replaces the running row max — eliminating the [bq, bk] max reduction and
    the accumulator rescale every kv step (pure-VPU passes the MXU otherwise
    waits on). Exact within fp: requires |s·log2e − M| < 126 for every score
    (exp2 head/underflow room), which qk-normed trunks satisfy by orders of
    magnitude. Opt-in via MAGCACHE_FLASH_FIXED_MAX."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if mask_kv:
        key_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_pos < kv_len, s, _NEG_INF)
    # guard: token-scope qk-norm does not bound per-head scores, so clamp at
    # exp2's overflow edge — a no-op while the shift assumption holds, score
    # saturation (not NaN) if a trained checkpoint ever violates it
    p = jnp.exp2(jnp.minimum(s, m_const + 126.0) - m_const)
    l_ref[:, :1] = l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def flash_attention_bhsd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    kv_len: Optional[int] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    fixed_max: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over ``[B, H, S, D]`` tensors (full attention).

    Default 1024x1024 blocks: measured 34% faster than 512x512 at Wan-480p
    scale (KV re-fetch traffic halves per doubling of block_q; see bench
    notes). Callers on small shapes are clamped to the padded sequence.

    Sequence lengths are padded to block multiples internally; padded keys are
    masked, padded query rows are sliced off.

    ``fixed_max``: static softmax shift in log2 units — switches to the
    no-running-max kernel (`_flash_kernel_fixed_max`). Measured **12.5%
    faster full Wan-1.3B forwards** at 480p (4.258s -> 3.727s, v5e), +2%
    more with the auto 2048 q-block. Only valid for norm-bounded scores (RMS
    qk-norm trunks: Wan/Hunyuan/FLUX/Qwen/OmniGen2 — |s·log2e| stays orders
    of magnitude inside exp2's ±126 range). Env overrides for experiments:
    ``MAGCACHE_FLASH_FIXED_MAX`` ("0" forces off), ``MAGCACHE_FLASH_BQ`` /
    ``MAGCACHE_FLASH_BK``.
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    kv_len = skv if kv_len is None else kv_len
    env_fm = os.environ.get("MAGCACHE_FLASH_FIXED_MAX", "")
    if env_fm != "":
        fixed_max = float(env_fm) or None
    if block_q is None:
        bq_env = _env_int("MAGCACHE_FLASH_BQ", 0)
        if bq_env:
            block_q = bq_env
        elif fixed_max is not None and sq >= 16384:
            # measured (Wan-480p forwards, v5e): each q-block doubling cuts
            # KV re-fetch traffic and beat its pad overhead up to 12.5% waste
            # (1024: 3.727s, 2048: 3.643s, 4096: 3.607s) — take the largest
            # block whose padding waste stays under 13%
            block_q = next((bq for bq in (4096, 2048)
                            if (-(-sq // bq) * bq) <= 1.13 * sq), 1024)
        else:
            block_q = 1024
    if block_k is None:
        block_k = _env_int("MAGCACHE_FLASH_BK", 1024)

    block_q = min(block_q, max(128, 1 << (sq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (skv - 1).bit_length()))
    sq_p = -(-sq // block_q) * block_q
    skv_p = -(-skv // block_k) * block_k
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))

    bh = b * h
    qr = q.reshape(bh, sq_p, d)
    kr = k.reshape(bh, skv_p, d)
    vr = v.reshape(bh, skv_p, d)

    qr = qr * jnp.asarray(scale * _LOG2E, qr.dtype)  # fold scale into q once
    grid = (bh, sq_p // block_q, skv_p // block_k)
    if fixed_max is not None:
        kernel = functools.partial(
            _flash_kernel_fixed_max, kv_len=kv_len, block_k=block_k,
            mask_kv=(kv_len < skv_p), m_const=fixed_max,
        )
        scratch = [
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _flash_kernel, kv_len=kv_len, block_k=block_k,
            mask_kv=(kv_len < skv_p),
        )
        scratch = [
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh_, i, j: (bh_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh_, i, j: (bh_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh_, i, j: (bh_, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh_, i, j: (bh_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # big q blocks exceed the default 16M scoped-vmem budget; the
            # per-kernel cap override keeps the 4096-row variant compilable
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_p * skv_p * d,
            bytes_accessed=(qr.size + kr.size + vr.size) * q.dtype.itemsize,
            transcendentals=bh * sq_p * skv_p,
        ),
        interpret=interpret,
    )(qr, kr, vr)
    return out.reshape(b, h, sq_p, d)[:, :, :sq, :]


def _rms_head(x_ref, g_ref, true_d: int, eps: float):
    """Per-head RMS norm of a [rows, D] block whose lanes >= ``true_d`` are
    zero-padded: the lane sum over D equals the sum over the true head dim,
    so ``var = sum(x^2)/true_d`` is exact and padded lanes stay zero through
    the gain multiply (gains are zero-padded too)."""
    xf = x_ref[...].astype(jnp.float32)
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) * (1.0 / true_d)
    return xf * jax.lax.rsqrt(var + eps) * g_ref[...]


def _flash_kernel_bshd(q_ref, k_ref, v_ref, *rest,
                       kv_len: int, block_k: int, mask_kv: bool,
                       scale_log2e: float, norm=None):
    """Running-max online softmax on native [B, S, H, D] blocks
    (block shape [1, bq, 1, d]; the head axis rides the grid, so no
    transpose/copy pass over the full tensor is ever materialized).

    ``norm=(true_d, eps)`` adds the per-head RMS qk-norm to the q/k block
    loads (gain refs [1, D] ride the grid's head axis) — one VMEM pass
    instead of standalone XLA norm passes + a sub-128-lane relayout."""
    if norm is not None:
        qg_ref, kg_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    v = v_ref[...]
    if norm is not None:
        true_d, eps = norm
        q = (_rms_head(q_ref, qg_ref, true_d, eps)
             * scale_log2e).astype(v.dtype)
        k = _rms_head(k_ref, kg_ref, true_d, eps).astype(v.dtype)
    else:
        q = q_ref[...] * jnp.asarray(scale_log2e, q_ref.dtype)
        k = k_ref[...]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if mask_kv:
        key_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_pos < kv_len, s, _NEG_INF)
        # out-of-range v rows are uninitialized (ragged tail comes straight
        # from the grid, not from a zero-pad); p is exactly 0 there but
        # 0 * NaN would still poison the accumulator — zero them.
        row_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, v.shape, 0)
        v = jnp.where(row_pos < kv_len, v, jnp.zeros_like(v))
    m_prev = m_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    l_ref[:, :1] = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[:, :1] = m_new

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[...] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _flash_kernel_bshd_fixed_max(q_ref, k_ref, v_ref, *rest,
                                 kv_len: int, block_k: int, mask_kv: bool,
                                 m_const: float, scale_log2e: float,
                                 norm=None):
    """Static-max variant of `_flash_kernel_bshd` (see
    `_flash_kernel_fixed_max` for the shift-invariance argument)."""
    if norm is not None:
        qg_ref, kg_ref, o_ref, acc_ref, l_ref = rest
    else:
        o_ref, acc_ref, l_ref = rest
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    v = v_ref[...]
    if norm is not None:
        true_d, eps = norm
        q = (_rms_head(q_ref, qg_ref, true_d, eps)
             * scale_log2e).astype(v.dtype)
        k = _rms_head(k_ref, kg_ref, true_d, eps).astype(v.dtype)
    else:
        q = q_ref[...] * jnp.asarray(scale_log2e, q_ref.dtype)
        k = k_ref[...]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if mask_kv:
        key_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_pos < kv_len, s, _NEG_INF)
        # out-of-range v rows are uninitialized (ragged tail comes straight
        # from the grid, not from a zero-pad); p is exactly 0 there but
        # 0 * NaN would still poison the accumulator — zero them.
        row_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, v.shape, 0)
        v = jnp.where(row_pos < kv_len, v, jnp.zeros_like(v))
    # overflow guard — see _flash_kernel_fixed_max
    p = jnp.exp2(jnp.minimum(s, m_const + 126.0) - m_const)
    l_ref[:, :1] = l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[...] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def flash_attention_bshd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    kv_len: Optional[int] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    fixed_max: Optional[float] = None,
    qk_gains: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    true_d: Optional[int] = None,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention directly on the DiT activation layout ``[B, S, H, D]``.

    Profiling the bhsd path at Wan-480p showed ~10% of forward time going to
    XLA layout copies (the [B,S,H,D] -> [B,H,S,D] transposes) plus pad/slice
    passes for block alignment. This variant removes both: the head axis is
    walked by the grid via BlockSpec index maps (strided DMA, fully hidden
    under the ~30x larger compute per block), and ragged tails use cdiv grids
    with masked keys / discarded out-of-range q-row writes instead of
    materialized padding. The softmax scale folds into the per-block q load
    (one [bq, d] VPU pass in VMEM instead of a full-tensor HBM pass).

    ``qk_gains=(qg, kg)`` + ``true_d``: fuse the per-head RMS qk-norm into
    the q/k block loads. ``qg``/``kg`` are [H, D] gain rows, zero-padded past
    ``true_d`` (the real head dim when D carries 128-alignment padding; the
    caller passes ``scale=1/sqrt(true_d)``). Replaces standalone XLA norm
    passes whose [.., H, true_d] intermediates relayout-copy on sub-128 head
    dims (the 35.7%-MFU STDiT3 diagnosis, NOTES.md #25).
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    kv_len = skv if kv_len is None else min(kv_len, skv)
    env_fm = os.environ.get("MAGCACHE_FLASH_FIXED_MAX", "")
    if env_fm != "":
        fixed_max = float(env_fm) or None
    if block_q is None:
        bq_env = _env_int("MAGCACHE_FLASH_BQ", 0)
        if bq_env:
            block_q = bq_env
        elif fixed_max is not None and sq >= 16384:
            block_q = next((bq for bq in (4096, 2048)
                            if (-(-sq // bq) * bq) <= 1.13 * sq), 1024)
        else:
            block_q = 1024
    if block_k is None:
        block_k = _env_int("MAGCACHE_FLASH_BK", 1024)
    block_q = min(block_q, max(128, 1 << (sq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (skv - 1).bit_length()))

    nq = -(-sq // block_q)
    nk = -(-skv // block_k)
    grid = (b * h, nq, nk)
    # ragged kv tail: the last key block runs past skv — always mask unless
    # the block divides the sequence exactly and no explicit kv_len was given
    mask_kv = kv_len < nk * block_k
    scale_log2e = scale * _LOG2E
    norm = (true_d, eps) if qk_gains is not None else None

    if fixed_max is not None:
        kernel = functools.partial(
            _flash_kernel_bshd_fixed_max, kv_len=kv_len, block_k=block_k,
            mask_kv=mask_kv, m_const=fixed_max, scale_log2e=scale_log2e,
            norm=norm)
        scratch = [
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _flash_kernel_bshd, kv_len=kv_len, block_k=block_k,
            mask_kv=mask_kv, scale_log2e=scale_log2e, norm=norm)
        scratch = [
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    # View [B, S, H, D] as [B, S, H*D] (free reshape of the contiguous
    # projection output) and walk heads via d-sized blocks of the fused last
    # dim: Mosaic requires the last two BLOCK dims tileable (8, 128), which a
    # squeezed head axis in second-to-last position would violate.
    qf = q.reshape(b, sq, h * d)
    kf = k.reshape(b, skv, h * d)
    vf = v.reshape(b, skv, h * d)
    in_specs = [
        pl.BlockSpec((None, block_q, d),
                     lambda g, i, j, h=h: (g // h, i, g % h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, block_k, d),
                     lambda g, i, j, h=h: (g // h, j, g % h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, block_k, d),
                     lambda g, i, j, h=h: (g // h, j, g % h),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qf, kf, vf]
    if norm is not None:
        gain_spec = pl.BlockSpec((None, 1, d),
                                 lambda g, i, j, h=h: (g % h, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [gain_spec, gain_spec]
        operands += [jnp.asarray(qk_gains[0], jnp.float32).reshape(h, 1, d),
                     jnp.asarray(qk_gains[1], jnp.float32).reshape(h, 1, d)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, block_q, d),
                               lambda g, i, j, h=h: (g // h, i, g % h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq, h * d), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * (nq * block_q) * (nk * block_k) * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * (nq * block_q) * (nk * block_k),
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, sq, h, d)



def _group_mask_add(block: int, group: int, gvalid: int):
    """Additive score mask for `_grouped_kernel` (None when nothing needs
    masking): 0 in-group, -inf outside / on padded group tails."""
    if block == group and gvalid == group:
        return None
    if block == group:
        row = np.where(np.arange(block) < gvalid, 0.0, _NEG_INF)
        return row.reshape(1, block).astype(np.float32)
    qi = np.arange(block)[:, None]
    ki = np.arange(block)[None, :]
    return np.where((qi // group == ki // group) & (ki % group < gvalid),
                    0.0, _NEG_INF).astype(np.float32)


def _grouped_kernel(q_ref, k_ref, v_ref, *rest, group: int, gvalid: int,
                    scale_log2e: float, norm=None, rope: bool = False,
                    masked: bool = False,
                    fixed_max: Optional[float] = None):
    """One-shot softmax attention within contiguous ``group``-token groups.

    Each grid step sees one [block, d] q tile and the SAME-position k/v tile;
    because ``group`` divides the block, every query's whole group lives in
    its own block — no online accumulation needed. Scores outside the query's
    group (and group positions >= ``gvalid``, the padded tail of each group)
    are masked.

    ``norm=(true_d, eps)`` fuses the per-head RMS qk-norm (gain refs [1, D]);
    ``rope`` fuses interleaved-pair RoPE over the in-group position: cos/sin
    refs are [group, D] tables (identity past ``true_d``), tiled to the block
    rows, applied in matmul form against the [D, D] pair-swap ref."""
    it = iter(rest)
    qg_ref = kg_ref = cos_ref = sin_ref = pm_ref = madd_ref = None
    if norm is not None:
        qg_ref, kg_ref = next(it), next(it)
    if rope:
        cos_ref, sin_ref, pm_ref = next(it), next(it), next(it)
    if masked:
        madd_ref = next(it)
    o_ref = next(it)
    v = v_ref[...]
    if norm is not None:
        true_d, eps = norm
        q = _rms_head(q_ref, qg_ref, true_d, eps)
        k = _rms_head(k_ref, kg_ref, true_d, eps)
    else:
        q = q_ref[...].astype(jnp.float32)
        k = k_ref[...].astype(jnp.float32)
    if rope:
        # tables arrive pre-tiled to [block, D] (the per-step jnp.tile was
        # a recurring VPU copy over a static pattern)
        cos_t = cos_ref[...]
        sin_t = sin_ref[...]
        pm = pm_ref[...]
        q = q * cos_t + jax.lax.dot(q, pm) * sin_t
        k = k * cos_t + jax.lax.dot(k, pm) * sin_t
    q = (q * scale_log2e).astype(v.dtype)
    k = k.astype(v.dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    # the mask pattern is identical for every grid step, so the wrapper
    # passes it as an ADDITIVE f32 operand (0 in-group / -inf out): the
    # per-step cost is one add, not iota/div/mod/compare/where chains
    # (measured: the temporal grouped kernel was VPU-bound on exactly these)
    if masked:
        s = s + madd_ref[...]
    if fixed_max is not None:
        # norm-bounded scores (RMS qk-norm): static shift, no row-max lane
        # reduction; overflow guard as in _flash_kernel_fixed_max
        p = jnp.exp2(jnp.minimum(s, fixed_max + 126.0) - fixed_max)
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # divide AFTER the [block, d] contraction: a [block, d] divide instead
    # of a [block, block] one (linearity: dot(p, v)/l == dot(p/l, v))
    o = jax.lax.dot(p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def grouped_flash_attention_bshd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    group: int,
    group_valid: Optional[int] = None,
    scale: Optional[float] = None,
    block: int = 256,
    qk_gains: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    rope_tables: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    true_d: Optional[int] = None,
    eps: float = 1e-6,
    fixed_max: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Block-diagonal grouped attention on ``[B, S, H, D]``: token ``i``
    attends exactly within its contiguous group ``i // group``.

    ``qk_gains=(qg [H, D], kg)`` + ``true_d`` fuse the per-head RMS qk-norm
    into the q/k loads; ``rope_tables=(cos, sin)`` — interleaved-pair tables
    [group, D], zero-padded rows allowed (cos=1/sin=0 past ``true_d``) —
    fuse RoPE over the in-group position. Together these subsume the whole
    XLA prologue of `ops.tiny_attention` (norm + rope + pad passes whose
    sub-128-lane intermediates relayout-copy).

    The MXU-friendly form of tiny-sequence attention (temporal attention in
    spatial-temporal DiTs: T ~ 8-32 frames x tens of thousands of spatial
    positions): instead of one grid block per (row, head) — 50k+ tiny
    dispatches — or VPU broadcast loops over the frame axis
    (`ops.tiny_attention`), groups are packed along the sequence so each
    [block, block] score tile covers ``block/group`` whole groups in one
    matmul pair, masked block-diagonally. Off-group score waste is
    ``group/block`` of the tile — at group 16 / block 256 the whole STDiT3
    temporal pass costs ~0.5 ms of MXU time vs ~10 ms for the VPU-loop
    kernel.

    Requirements: ``group`` divides ``block`` and ``S % group == 0`` (pad
    each group's tail and pass the true length as ``group_valid``; padded
    *keys* are masked — padded *query* rows compute garbage that the caller
    slices off). S is padded to a block multiple internally with whole dummy
    groups. D must be 128-aligned (pad like `attention()` does).
    """
    b, s_len, h, d = q.shape
    assert block % group == 0 and s_len % group == 0, (block, group, s_len)
    assert d % 128 == 0, d
    gvalid = group if group_valid is None else group_valid
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    block = min(block, max(group, 1 << (s_len - 1).bit_length()))
    s_p = -(-s_len // block) * block
    if s_p != s_len:
        pad = ((0, 0), (0, s_p - s_len), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    qf = q.reshape(b, s_p, h * d)
    kf = k.reshape(b, s_p, h * d)
    vf = v.reshape(b, s_p, h * d)
    grid = (b * h, s_p // block)
    norm = (true_d, eps) if qk_gains is not None else None
    madd = _group_mask_add(block, group, gvalid)
    kernel = functools.partial(_grouped_kernel, group=group, gvalid=gvalid,
                               scale_log2e=scale * _LOG2E, norm=norm,
                               rope=rope_tables is not None,
                               masked=madd is not None,
                               fixed_max=fixed_max)
    spec = pl.BlockSpec((None, block, d), lambda g, i, h=h: (g // h, i, g % h),
                        memory_space=pltpu.VMEM)
    in_specs = [spec, spec, spec]
    operands = [qf, kf, vf]
    if norm is not None:
        gain_spec = pl.BlockSpec((None, 1, d), lambda g, i, h=h: (g % h, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [gain_spec, gain_spec]
        operands += [jnp.asarray(qk_gains[0], jnp.float32).reshape(h, 1, d),
                     jnp.asarray(qk_gains[1], jnp.float32).reshape(h, 1, d)]
    if rope_tables is not None:
        # pre-tile the [group, D] tables to the block rows (trace-time; the
        # kernel previously re-tiled them on the VPU every grid step)
        tab_spec = pl.BlockSpec((block, d), lambda g, i: (0, 0),
                                memory_space=pltpu.VMEM)
        pm_spec = pl.BlockSpec((d, d), lambda g, i: (0, 0),
                               memory_space=pltpu.VMEM)
        pm = np.zeros((d, d), np.float32)
        td = d if true_d is None else true_d
        pm[:td, :td] = _pair_swap_np(td)
        in_specs += [tab_spec, tab_spec, pm_spec]
        operands += [jnp.tile(jnp.asarray(rope_tables[0], jnp.float32),
                              (block // group, 1)),
                     jnp.tile(jnp.asarray(rope_tables[1], jnp.float32),
                              (block // group, 1)),
                     jnp.asarray(pm)]
    if madd is not None:
        in_specs += [pl.BlockSpec(madd.shape, lambda g, i: (0, 0),
                                  memory_space=pltpu.VMEM)]
        operands += [jnp.asarray(madd)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s_p, h * d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_p * block * d,
            bytes_accessed=3 * b * s_p * h * d * q.dtype.itemsize,
            transcendentals=b * h * s_p * block,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, s_p, h, d)[:, :s_len]


def grouped_attention_fused_qkv(
    qkv: jnp.ndarray,
    heads: int,
    *,
    group: int,
    group_valid: Optional[int] = None,
    scale: Optional[float] = None,
    block: Optional[int] = None,
    qk_gains: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    rope_tables: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    true_d: Optional[int] = None,
    eps: float = 1e-6,
    fixed_max: Optional[float] = None,
    head_major: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Block-diagonal grouped attention reading q/k/v DIRECTLY out of the
    fused QKV projection output ``[B, S, 3*H*D]`` (column order q|k|v by
    head, or head-major ``[h0:(q|k|v), h1:(q|k|v), ...]`` when
    ``head_major`` — the layout that makes the feature axis tp-shardable,
    since a contiguous 3*D slice per head keeps each head's q/k/v on one
    device; see `parallel.collectives.sharded_grouped_attention_fused_qkv`),
    returning ``[B, S, H*D]``.

    The same array enters the kernel three times with lane-block index maps
    offset by 0/H/2H — no split/pad copies of the ~600 MB projection output
    are ever materialized (measured ~3 ms/call of HBM traffic at STDiT3-480p
    temporal shapes). Serves two geometries:

    - temporal attention: S = R*Tp frame groups (``group=Tp``, tiny)
    - spatial one-shot attention: ``group`` = the padded per-frame token
      count (e.g. 1590 -> 1600) with ``block=group`` — each grid step runs
      one frame's whole softmax in VMEM: no online accumulation, no KV
      re-fetch, and 1.3% pad waste vs 66% for pow2 flash blocks at S=1590.

    Other contracts (gains/rope/true_d, masking semantics) match
    `grouped_flash_attention_bshd`. Requires ``S % group == 0`` and 128-
    aligned D; caller slices padded rows/lanes (or feeds them onward — zero
    lanes are exact through padded-weight projections).
    """
    b, s_len, three_hd = qkv.shape
    h = heads
    assert three_hd % (3 * h) == 0, (three_hd, h)
    d = three_hd // (3 * h)
    assert d % 128 == 0, d
    assert s_len % group == 0, (s_len, group)
    gvalid = group if group_valid is None else group_valid
    scale = (1.0 / math.sqrt(d if true_d is None else true_d)
             if scale is None else scale)
    if block is None:
        block = group if group >= 256 else 256
        if group < 256:
            # prefer the smallest >=256, 8-sublane-aligned multiple of
            # ``group`` that divides s_len exactly: padding the [B,S,3HD]
            # projection output to a block multiple costs a full HBM
            # round-trip of the ~GB array plus a slice on the way out
            # (measured 2.5 ms/block at STDiT3-480p temporal shapes)
            m = group
            while m <= 1024:
                if m >= 256 and m % 8 == 0 and s_len % m == 0:
                    block = m
                    break
                m += group
    assert block % group == 0, (block, group)
    s_p = -(-s_len // block) * block
    if s_p != s_len:
        qkv = jnp.pad(qkv, ((0, 0), (0, s_p - s_len), (0, 0)))
    grid = (b * h, s_p // block)
    norm = (true_d, eps) if qk_gains is not None else None
    madd = _group_mask_add(block, group, gvalid)
    kernel = functools.partial(_grouped_kernel, group=group, gvalid=gvalid,
                               scale_log2e=scale * _LOG2E, norm=norm,
                               rope=rope_tables is not None,
                               masked=madd is not None,
                               fixed_max=fixed_max)
    if head_major:
        # feature layout [h, 3, d]: q/k/v of head g%h at lane blocks 3*(g%h)+{0,1,2}
        mk = lambda off: pl.BlockSpec(
            (None, block, d),
            lambda g, i, h=h, off=off: (g // h, i, 3 * (g % h) + off),
            memory_space=pltpu.VMEM)
        in_specs = [mk(0), mk(1), mk(2)]
    else:
        mk = lambda off: pl.BlockSpec(
            (None, block, d),
            lambda g, i, h=h, off=off: (g // h, i, off + g % h),
            memory_space=pltpu.VMEM)
        in_specs = [mk(0), mk(h), mk(2 * h)]
    operands = [qkv, qkv, qkv]
    if norm is not None:
        gain_spec = pl.BlockSpec((None, 1, d), lambda g, i, h=h: (g % h, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [gain_spec, gain_spec]
        operands += [jnp.asarray(qk_gains[0], jnp.float32).reshape(h, 1, d),
                     jnp.asarray(qk_gains[1], jnp.float32).reshape(h, 1, d)]
    if rope_tables is not None:
        # pre-tile the [group, D] tables to the block rows (trace-time; the
        # kernel previously re-tiled them on the VPU every grid step)
        tab_spec = pl.BlockSpec((block, d), lambda g, i: (0, 0),
                                memory_space=pltpu.VMEM)
        pm_spec = pl.BlockSpec((d, d), lambda g, i: (0, 0),
                               memory_space=pltpu.VMEM)
        pm = np.zeros((d, d), np.float32)
        td = d if true_d is None else true_d
        pm[:td, :td] = _pair_swap_np(td)
        in_specs += [tab_spec, tab_spec, pm_spec]
        operands += [jnp.tile(jnp.asarray(rope_tables[0], jnp.float32),
                              (block // group, 1)),
                     jnp.tile(jnp.asarray(rope_tables[1], jnp.float32),
                              (block // group, 1)),
                     jnp.asarray(pm)]
    if madd is not None:
        in_specs += [pl.BlockSpec(madd.shape, lambda g, i: (0, 0),
                                  memory_space=pltpu.VMEM)]
        operands += [jnp.asarray(madd)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, block, d),
                               lambda g, i, h=h: (g // h, i, g % h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_p, h * d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_p * block * d,
            bytes_accessed=(qkv.size + qkv.size // 3) * qkv.dtype.itemsize,
            transcendentals=b * h * s_p * block,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :s_len]


def _cross_fused_kernel(x_ref, wq_ref, bq_ref, k_ref, v_ref, wo_ref, bo_ref,
                        o_ref, *, heads: int, d: int, scale_log2e: float,
                        kv_valid: int, l_lane: bool, residual: bool):
    """q-projection + short-context attention + out-projection, one pass.

    ``l_lane``: the wrapper planted 1.0 at lane d-1 of every (zero-padded)
    V head, so the softmax normalizer arrives as a free column of the AV
    matmul — no VPU lane-sum reduce; the packed ``wo``'s zero pad-rows
    erase the normalizer lane in the out-projection.
    ``residual``: write ``x + cross(x)`` (the input block IS the trunk
    hidden, already in VMEM — the caller's residual add disappears)."""
    q = jax.lax.dot(x_ref[...], wq_ref[...],
                    preferred_element_type=jnp.float32)
    q = (q + bq_ref[...]).astype(k_ref.dtype)     # rounds like the unfused q
    k = k_ref[...]
    v = v_ref[...]
    mask = (jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], k.shape[0]), 1)
            < kv_valid)
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(mask, s * scale_log2e, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        oh = jax.lax.dot(p.astype(v.dtype), v[:, sl],
                         preferred_element_type=jnp.float32)
        if l_lane:
            outs.append(oh / oh[:, d - 1:d])
        else:
            l = jnp.sum(p, axis=-1, keepdims=True)
            outs.append(oh / l)
    o = jnp.concatenate(outs, axis=-1).astype(wo_ref.dtype)
    acc = jax.lax.dot(o, wo_ref[...], preferred_element_type=jnp.float32)
    acc = acc + bo_ref[...]
    if residual:
        acc = acc + x_ref[...].astype(jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def fused_cross_attention(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    bq: Optional[jnp.ndarray],
    k: jnp.ndarray,
    v: jnp.ndarray,
    wo: jnp.ndarray,
    bo: Optional[jnp.ndarray],
    heads: int,
    *,
    scale: Optional[float] = None,
    kv_valid: Optional[int] = None,
    true_d: Optional[int] = None,
    residual: bool = False,
    block_s: int = 512,
    force: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole cross-attention module — ``linear_q -> attention(k, v) ->
    linear_o`` — as ONE kernel for short KV contexts (DiT caption
    cross-attention: a few hundred keys vs tens of thousands of queries).

    ``true_d`` < D declares the per-head lanes >= true_d of k/v as zero
    padding (the packed-weight layout); the kernel then rides the softmax
    normalizer on the AV matmul's last pad column instead of a VPU
    lane-sum (the out-projection's zero pad-rows erase it).
    ``residual`` returns ``x + cross(x)`` with the add fused into the
    kernel's epilogue (requires d_out == d_model).

    x: [B, N, d_model]; wq: [d_model, H*D]; k/v: [B, L, H*D] (the
    precomputed, head-aligned key/value projections of the context); wo:
    [H*D, d_out]. Returns [B, N, d_out].

    Both weights and the whole K/V stay VMEM-resident across the query
    grid, so the ~N*H*D-sized q and attention-output intermediates never
    round-trip HBM (2 x 195 MB/block at STDiT3-480p), and the per-head
    score tiles are [block_s, Lp] slivers instead of flash-sized blocks.
    The reference runs this module as three separate launches around a
    flash call (``videosys/models/modules/attentions.py:107-141``).

    Padded keys beyond ``kv_valid`` (default: all L are valid — STDiT3
    attends the full 300-token padded caption, matching
    `models.stdit3` parity) are masked; L is padded to a lane multiple
    internally. D must be 128-aligned (use the packed weights)."""
    b, n, dm = x.shape
    hd = wq.shape[-1]
    d = hd // heads
    L = k.shape[1]
    d_out = wo.shape[-1]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    kv_valid = L if kv_valid is None else kv_valid
    on_tpu = jax.default_backend() in ("tpu", "axon")
    enabled = os.environ.get("MAGCACHE_FUSED_CROSS", "1") != "0"
    from magcache_tpu.parallel.mesh import _ACTIVE
    if not interpret and not force and (
            not on_tpu or not enabled or d % 128 != 0
            or dm % 128 != 0 or d_out % 128 != 0
            or _ACTIVE.get() is not None):
        q = x @ wq
        if bq is not None:
            q = q + bq
        rs = lambda t_, s_: t_.reshape(t_.shape[0], s_, heads, d)
        o = attention(rs(q, n), rs(k, L), rs(v, L), scale=scale,
                      kv_len=(kv_valid if kv_valid != L else None))
        o = o.reshape(b, n, hd) @ wo
        if bo is not None:
            o = o + bo
        if residual:
            o = o + x
        return o.astype(x.dtype)

    Lp = -(-L // 128) * 128
    if Lp != L:
        pad = ((0, 0), (0, Lp - L), (0, 0))
        k, v = jnp.pad(k, pad), jnp.pad(v, pad)
        kv_valid = min(kv_valid, L)
    l_lane = true_d is not None and true_d < d
    if l_lane:
        ones = np.zeros((1, 1, hd), np.float32)
        ones[..., d - 1::d] = 1.0
        v = v + jnp.asarray(ones, v.dtype)
    bq2 = (jnp.asarray(bq, jnp.float32).reshape(1, hd)
           if bq is not None else jnp.zeros((1, hd), jnp.float32))
    bo2 = (jnp.asarray(bo, jnp.float32).reshape(1, d_out)
           if bo is not None else jnp.zeros((1, d_out), jnp.float32))
    block_s = min(block_s, max(8, 1 << (n - 1).bit_length()))
    ns = -(-n // block_s)
    const = lambda shape: pl.BlockSpec(shape, lambda bi, i: (0, 0),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_cross_fused_kernel, heads=heads, d=d,
                          scale_log2e=scale * _LOG2E, kv_valid=kv_valid,
                          l_lane=l_lane, residual=residual),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((None, block_s, dm), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            const((dm, hd)),
            const((1, hd)),
            pl.BlockSpec((None, Lp, hd), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Lp, hd), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            const((hd, d_out)),
            const((1, d_out)),
        ],
        out_specs=pl.BlockSpec((None, block_s, d_out),
                               lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * dm * hd + 4 * b * n * Lp * hd
            + 2 * b * n * hd * d_out,
            bytes_accessed=(x.size + b * n * d_out) * x.dtype.itemsize
            + (wq.size + wo.size + k.size + v.size) * k.dtype.itemsize,
            transcendentals=b * heads * n * Lp,
        ),
        interpret=interpret,
    )(x, wq, bq2, k, v, wo, bo2)
    return out


def flash_attention_bhsd_aux(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
    scale: Optional[float] = None, kv_len: Optional[int] = None,
    block_q: int = 512, block_k: int = 512, interpret: bool = False,
):
    """Like `flash_attention_bhsd` but also returns per-row (m, l) — the
    softmax running max and normalizer, shapes [B, H, Sq] f32 — so partial
    results over KV shards can be merged exactly (ring attention)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    kv_len = skv if kv_len is None else kv_len
    block_q = min(block_q, max(128, 1 << (sq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (skv - 1).bit_length()))
    sq_p = -(-sq // block_q) * block_q
    skv_p = -(-skv // block_k) * block_k
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    bh = b * h
    qr = q.reshape(bh, sq_p, d)
    kr = k.reshape(bh, skv_p, d)
    vr = v.reshape(bh, skv_p, d)
    grid = (bh, sq_p // block_q, skv_p // block_k)
    kernel = functools.partial(_flash_kernel_aux, scale=scale, kv_len=kv_len,
                               block_k=block_k)
    out, m, l = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh_, i, j: (bh_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh_, i, j: (bh_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh_, i, j: (bh_, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda bh_, i, j: (bh_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q), lambda bh_, i, j: (bh_, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q), lambda bh_, i, j: (bh_, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq_p), jnp.float32),
            jax.ShapeDtypeStruct((bh, sq_p), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qr, kr, vr)
    out = out.reshape(b, h, sq_p, d)[:, :, :sq, :]
    # kernel softmax runs in base 2: the running max is in the scaled (base-2)
    # domain; the normalizer l = sum exp2(s2 - m2) = sum exp(s - m) is
    # base-invariant. Convert m back to natural base for the ring merge.
    m = m.reshape(b, h, sq_p)[:, :, :sq] / _LOG2E
    l = l.reshape(b, h, sq_p)[:, :, :sq]
    return out, m, l


def _xla_attention_bhsd_aux(q, k, v, *, scale, kv_len=None):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if kv_len is not None and kv_len < k.shape[2]:
        key_pos = jnp.arange(k.shape[2])
        s = jnp.where(key_pos[None, None, None, :] < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", (p / l[..., None]).astype(v.dtype), v)
    return out, m, l


def _xla_attention_bshd_native(q, k, v, *, scale, kv_len):
    """Layout-native ([B,S,H,D], no transposes) einsum attention.

    The fast path for tiny sequences (STDiT3/Latte temporal attention,
    T <= 32): the flash kernels pad the sequence up to a 128-token block
    (>10x wasted MXU work at T=12) and force [B,H,S,D] relayout copies,
    while this whole expression fuses in XLA with no padding."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if kv_len is not None and kv_len < k.shape[1]:
        key_pos = jnp.arange(k.shape[1])
        s = jnp.where(key_pos[None, None, None, :] < kv_len, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _xla_attention_bhsd(q, k, v, *, scale, kv_len):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if kv_len is not None and kv_len < k.shape[2]:
        key_pos = jnp.arange(k.shape[2])
        s = jnp.where(key_pos[None, None, None, :] < kv_len, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    kv_len: Optional[int] = None,
    impl: str = "auto",
    fixed_max: Optional[float] = None,
) -> jnp.ndarray:
    """Full attention over ``[B, S, H, D]`` activations (DiT layout).

    impl: "pallas" (TPU flash kernel), "xla" (fused XLA softmax-attention),
    "pallas_interpret" (debug), or "auto" (pallas on TPU, xla elsewhere).

    ``fixed_max``: enable the static-max flash kernel (see
    `flash_attention_bhsd`) — pass only from trunks whose scores are
    norm-bounded (RMS qk-norm before RoPE). Ignored on the XLA fallback
    (plain softmax is shift-invariant anyway) and under mesh SP paths.
    """
    import os

    if impl == "auto":
        env = os.environ.get("MAGCACHE_ATTN_IMPL")
        impl = env if env else "auto"
    if impl in ("auto", "ring", "ulysses"):
        # Under an active mesh plan, pick the sequence-parallel strategy:
        # Ulysses (all-to-all head regrouping; one full-sequence attention per
        # head group) by default, ring (ppermute K/V rotation; sequence memory
        # 1/sp, xfuser --ring_size equivalent, magcache_generate.py:637-641)
        # when forced via MAGCACHE_ATTN_IMPL=ring / impl="ring" or when the
        # global self-attention sequence exceeds MAGCACHE_RING_THRESHOLD
        # tokens (default 128Ki — the point where even one Ulysses head
        # group's full sequence strains HBM).
        from magcache_tpu.parallel.mesh import _ACTIVE
        plan = _ACTIVE.get()
        if plan is not None:
            from magcache_tpu.parallel.collectives import (
                ring_attention,
                ulysses_attention,
            )
            kv_rep = k.shape[1] != q.shape[1]
            ring_thresh = int(os.environ.get("MAGCACHE_RING_THRESHOLD",
                                             128 * 1024))
            want_ring = impl == "ring" or (impl == "auto"
                                           and q.shape[1] >= ring_thresh)
            if want_ring and not kv_rep:
                return ring_attention(q, k, v, plan.mesh, scale=scale)
            return ulysses_attention(q, k, v, plan.mesh, scale=scale,
                                     kv_len=kv_len, kv_replicated=kv_rep,
                                     fixed_max=fixed_max)
        if impl in ("ring", "ulysses"):
            raise ValueError(f"attention impl {impl!r} needs an active mesh "
                             "plan (use_mesh)")
        if max(q.shape[1], k.shape[1]) <= 128:
            d = q.shape[-1]
            return _xla_attention_bshd_native(
                q, k, v,
                scale=(1.0 / math.sqrt(d)) if scale is None else scale,
                kv_len=kv_len)
        on_tpu = jax.default_backend() in ("tpu", "axon")
        impl = "pallas" if on_tpu else "xla"
    if impl in ("pallas", "pallas_interpret") and q.shape[-1] % 128 == 0:
        # Layout-native kernel: no [B,S,H,D] -> [B,H,S,D] transpose copies,
        # no block padding passes (~10% of a Wan-480p forward; see
        # flash_attention_bshd docstring). Requires head_dim % 128 == 0 (the
        # fused-head-dim BlockSpec tiles the last dim by head_dim).
        return flash_attention_bshd(q, k, v, scale=scale, kv_len=kv_len,
                                    fixed_max=fixed_max,
                                    interpret=(impl == "pallas_interpret"))
    if impl in ("pallas", "pallas_interpret"):
        # Sub-128 head dims (CogVideoX d=64, Latte/STDiT3/OSP d=72): zero-pad
        # the head dim to 128 and keep the layout-native kernel. Exact: padded
        # q/k lanes contribute 0 to every score, padded v lanes produce output
        # lanes that are sliced off. The old [B,S,H,D] -> [B,H,S,D] transpose
        # path paid the same 128-lane MXU padding implicitly in Mosaic AND
        # four full-tensor layout copies; measured on STDiT3-480p spatial
        # attention [30,1590,16,72] this path is ~2x faster (9.1 -> ~4 ms).
        d0 = q.shape[-1]
        dp = -(-d0 // 128) * 128
        sc = (1.0 / math.sqrt(d0)) if scale is None else scale
        pad = ((0, 0), (0, 0), (0, 0), (0, dp - d0))
        out = flash_attention_bshd(
            jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
            scale=sc, kv_len=kv_len, fixed_max=fixed_max,
            interpret=(impl == "pallas_interpret"))
        return out[..., :d0]
    if impl == "xla":
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        d = q.shape[-1]
        out = _xla_attention_bhsd(
            qt, kt, vt, scale=(1.0 / math.sqrt(d)) if scale is None else scale,
            kv_len=kv_len)
        return out.transpose(0, 2, 1, 3)
    raise ValueError(f"unknown attention impl {impl!r}")
