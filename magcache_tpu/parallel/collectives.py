"""Explicit collectives: the TPU-native comm.py (``videosys/core/comm.py``).

Where `mesh.py` expresses parallelism declaratively (shardings + XLA-inserted
collectives), this module provides the hand-scheduled equivalents of the
reference's primitives for the cases where explicit control wins:

- `split_sequence` / `gather_sequence` (``comm.py:252-363``) — device_put /
  all-gather of a sequence-sharded activation;
- `all_to_all_switch` (``comm.py:215-244,384-406`` + the DSP "dynamic switch",
  ``open_sora_transformer_3d.py:275-296``) — swap which of two axes is
  sharded, via `lax.all_to_all` inside `shard_map`;
- `ulysses_attention` — xfuser-style Ulysses sequence parallelism
  (``MagCache4Wan2.1/magcache_generate.py:818-829``): all-to-all scatters
  heads / gathers sequence so each device runs *full-sequence* flash attention
  on a head subset, then the inverse all-to-all restores sequence sharding.
  KV for cross-attention stays replicated (text is short) so it needs no
  collective at all.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from magcache_tpu.parallel.mesh import AXIS_DP, AXIS_SP, AXIS_TP

__all__ = ["split_sequence", "gather_sequence", "all_to_all_switch",
           "ulysses_attention", "ring_attention",
           "sharded_grouped_attention_fused_qkv",
           "sharded_lnmod_matmul", "sharded_matmul_gated_residual",
           "sharded_fused_cross_attention"]


def _token_parallel(mesh: Mesh, n: int):
    """(dp_n, sp_n, padded_n) for sharding [B, N, F] activations B over dp
    and tokens over sp; weights replicated. Used by the fused-matmul
    wrappers below — their kernels are strictly per-token, so the mesh
    execution is a pure shard_map with no collectives inside."""
    axes = dict(mesh.shape)
    dp_n = axes.get(AXIS_DP, 1)
    sp_n = axes.get(AXIS_SP, 1)
    return dp_n, sp_n, -(-n // sp_n) * sp_n


def sharded_lnmod_matmul(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    w: jnp.ndarray,
    bias,
    mesh: Mesh,
    *,
    act: Optional[str] = None,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """`ops.fused_prologue.lnmod_matmul` under a device mesh: x [B, N, d_in]
    with B over dp and tokens over sp; w/bias replicated (tp callers take
    the declaratively-sharded composition instead — the contraction dim
    would need an in-map psum). LayerNorm is per-token, so shards never
    communicate."""
    from magcache_tpu.ops.fused_prologue import lnmod_matmul

    b, n, _ = x.shape
    dp_n, sp_n, n_p = _token_parallel(mesh, n)
    if n_p != n:
        x = jnp.pad(x, ((0, 0), (0, n_p - n), (0, 0)))
    spec = P(AXIS_DP, AXIS_SP, None)

    def local(xl, sc, sh, wl, bl):
        return lnmod_matmul(xl, sc, sh, wl, bl, act=act, eps=eps,
                            force=True, interpret=interpret)

    bias2 = (jnp.zeros((w.shape[-1],), jnp.float32) if bias is None
             else jnp.asarray(bias))
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, P(AXIS_DP, None), P(AXIS_DP, None),
                  P(None, None), P(None)),
        out_specs=spec, check_vma=False)(x, scale, shift, w, bias2)
    return out[:, :n]


def sharded_matmul_gated_residual(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias,
    gate: jnp.ndarray,
    resid: Optional[jnp.ndarray],
    mesh: Mesh,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """`ops.fused_prologue.matmul_gated_residual` under a device mesh
    (token-parallel, replicated weights; same contract as
    `sharded_lnmod_matmul`)."""
    from magcache_tpu.ops.fused_prologue import matmul_gated_residual

    b, n, _ = x.shape
    dp_n, sp_n, n_p = _token_parallel(mesh, n)
    if n_p != n:
        x = jnp.pad(x, ((0, 0), (0, n_p - n), (0, 0)))
        if resid is not None:
            resid = jnp.pad(resid, ((0, 0), (0, n_p - n), (0, 0)))
    spec = P(AXIS_DP, AXIS_SP, None)
    bias2 = (jnp.zeros((w.shape[-1],), jnp.float32) if bias is None
             else jnp.asarray(bias))
    if resid is None:
        def local(xl, wl, bl, g):
            return matmul_gated_residual(xl, wl, bl, g, None, force=True,
                                         interpret=interpret)

        out = jax.shard_map(
            local, mesh=mesh,
            in_specs=(spec, P(None, None), P(None), P(AXIS_DP, None)),
            out_specs=spec, check_vma=False)(x, w, bias2, gate)
    else:
        def local(xl, wl, bl, g, r):
            return matmul_gated_residual(xl, wl, bl, g, r, force=True,
                                         interpret=interpret)

        out = jax.shard_map(
            local, mesh=mesh,
            in_specs=(spec, P(None, None), P(None), P(AXIS_DP, None), spec),
            out_specs=spec, check_vma=False)(x, w, bias2, gate, resid)
    return out[:, :n]


def sharded_fused_cross_attention(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    bq,
    k: jnp.ndarray,
    v: jnp.ndarray,
    wo: jnp.ndarray,
    bo,
    heads: int,
    mesh: Mesh,
    *,
    scale: Optional[float] = None,
    true_d: Optional[int] = None,
    residual: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """`ops.attention.fused_cross_attention` under a device mesh: queries
    token-parallel over dp x sp, the short K/V context replicated over sp
    (it is tiny — the reference replicates text context the same way,
    ``magcache_generate.py:818-829`` KV note), weights replicated."""
    from magcache_tpu.ops.attention import fused_cross_attention

    b, n, _ = x.shape
    dp_n, sp_n, n_p = _token_parallel(mesh, n)
    if n_p != n:
        x = jnp.pad(x, ((0, 0), (0, n_p - n), (0, 0)))
    spec = P(AXIS_DP, AXIS_SP, None)
    kv_spec = P(AXIS_DP, None, None)
    bq2 = (jnp.zeros((wq.shape[-1],), jnp.float32) if bq is None
           else jnp.asarray(bq))
    bo2 = (jnp.zeros((wo.shape[-1],), jnp.float32) if bo is None
           else jnp.asarray(bo))

    def local(xl, wql, bql, kl, vl, wol, bol):
        return fused_cross_attention(xl, wql, bql, kl, vl, wol, bol, heads,
                                     scale=scale, true_d=true_d,
                                     residual=residual, force=True,
                                     interpret=interpret)

    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, P(None, None), P(None), kv_spec, kv_spec,
                  P(None, None), P(None)),
        out_specs=spec, check_vma=False)(x, wq, bq2, k, v, wo, bo2)
    return out[:, :n]


def sharded_grouped_attention_fused_qkv(
    qkv: jnp.ndarray,
    heads: int,
    mesh: Mesh,
    *,
    group: int,
    group_valid: Optional[int] = None,
    scale: Optional[float] = None,
    qk_gains=None,
    rope_tables=None,
    true_d: Optional[int] = None,
    eps: float = 1e-6,
    fixed_max: Optional[float] = None,
    shard_tokens: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """`ops.attention.grouped_attention_fused_qkv` under a device mesh.

    The kernel grid is embarrassingly parallel over batch x heads and the
    group (block-diagonal) structure never crosses a shard boundary, so the
    mesh execution is a pure shard_map — no collectives inside; XLA places
    the resharding around it (the DSP all-to-all position, reference
    ``open_sora_transformer_3d.py:275-296``, where the fast attention runs
    *inside* the sequence-parallel layout).

    Layouts:
    - ``shard_tokens=False`` (spatial one-shot): ``[B, S, F]`` with B over
      ``dp x sp`` (padded up with zero rows when uneven — exact: zero
      q/k/v groups produce zero outputs that are sliced off) and the
      feature axis over ``tp``.
    - ``shard_tokens=True`` (temporal groups): B over ``dp``, tokens over
      ``sp`` padded to whole ``group*sp`` multiples so every device's local
      token count is group-aligned, features over ``tp``.

    ``tp > 1`` requires the head-major fused-QKV feature layout
    (`models.packed.pack_block_group(head_major=True)`): a contiguous
    ``3*D`` slice per head keeps each head's q/k/v on one device.
    ``qk_gains`` are per-head ``[heads, D]`` and shard with the heads.
    """
    from magcache_tpu.ops.attention import grouped_attention_fused_qkv

    axes = dict(mesh.shape)
    dp_n = axes.get(AXIS_DP, 1)
    sp_n = axes.get(AXIS_SP, 1)
    tp_n = axes.get(AXIS_TP, 1)
    assert heads % tp_n == 0, (heads, tp_n)
    hl = heads // tp_n
    head_major = tp_n > 1
    feat = AXIS_TP if tp_n > 1 else None
    B, S, _ = qkv.shape
    if shard_tokens:
        nb = dp_n
        gs = group * sp_n
        Sp = -(-S // gs) * gs
        if Sp != S:
            qkv = jnp.pad(qkv, ((0, 0), (0, Sp - S), (0, 0)))
        in_q = P(AXIS_DP, AXIS_SP, feat)
    else:
        nb = dp_n * sp_n
        in_q = P((AXIS_DP, AXIS_SP), None, feat)
    Bp = -(-B // nb) * nb
    if Bp != B:
        qkv = jnp.pad(qkv, ((0, Bp - B), (0, 0), (0, 0)))
    specs = [in_q]
    operands = [qkv]
    if qk_gains is not None:
        gspec = P(AXIS_TP if tp_n > 1 else None, None)
        specs += [gspec, gspec]
        operands += [jnp.asarray(qk_gains[0]), jnp.asarray(qk_gains[1])]

    def local(x, *gains):
        return grouped_attention_fused_qkv(
            x, hl, group=group, group_valid=group_valid, scale=scale,
            qk_gains=(tuple(gains) if gains else None),
            rope_tables=rope_tables, true_d=true_d, eps=eps,
            fixed_max=fixed_max, head_major=head_major, interpret=interpret)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the vma checker rejects inside shard_map
    out = jax.shard_map(local, mesh=mesh, in_specs=tuple(specs),
                        out_specs=in_q, check_vma=False)(*operands)
    return out[:B, :S]


def split_sequence(x: jnp.ndarray, mesh: Mesh, dim: int = 1) -> jnp.ndarray:
    """Constrain x to be sharded over `sp` along ``dim`` (reference
    split_sequence: scatter the sequence across the SP group)."""
    spec = [None] * x.ndim
    spec[dim] = AXIS_SP
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def gather_sequence(x: jnp.ndarray, mesh: Mesh, dim: int = 1,
                    spec: Optional[tuple] = None) -> jnp.ndarray:
    """All-gather x along ``dim`` over the sp axis, leaving every other
    axis's sharding untouched (reference gather_sequence). ``spec`` is the
    input's PartitionSpec entries; defaults to sp-on-dim only."""
    if spec is None:
        in_spec = [None] * x.ndim
        in_spec[dim] = AXIS_SP
    else:
        in_spec = list(spec) + [None] * (x.ndim - len(spec))
    out = list(in_spec)
    out[dim] = None
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*out)))


def all_to_all_switch(x: jnp.ndarray, mesh: Mesh, scatter_dim: int,
                      gather_dim: int, axis: str = AXIS_SP) -> jnp.ndarray:
    """DSP dynamic switch: reshard from gather_dim-sharded to
    scatter_dim-sharded with one all-to-all (instead of gather+scatter).

    Input must be sharded over ``axis`` along ``gather_dim``; output is
    sharded along ``scatter_dim``.
    """
    in_spec = [None] * x.ndim
    in_spec[gather_dim] = axis
    out_spec = [None] * x.ndim
    out_spec[scatter_dim] = axis

    def local(xs):
        return jax.lax.all_to_all(xs, axis, split_axis=scatter_dim,
                                  concat_axis=gather_dim, tiled=True)

    return jax.shard_map(local, mesh=mesh, in_specs=P(*in_spec),
                         out_specs=P(*out_spec))(x)


def _local_full_attention(q, k, v, *, scale, kv_len, fixed_max=None):
    """Per-shard attention over the full sequence; flash kernel on TPU."""
    from magcache_tpu.ops.attention import _xla_attention_bhsd, flash_attention_bhsd

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if jax.default_backend() in ("tpu", "axon"):
        out = flash_attention_bhsd(qt, kt, vt, scale=scale, kv_len=kv_len,
                                   fixed_max=fixed_max)
    else:
        import math
        d = q.shape[-1]
        out = _xla_attention_bhsd(
            qt, kt, vt, scale=(1.0 / math.sqrt(d)) if scale is None else scale,
            kv_len=kv_len)
    return out.transpose(0, 2, 1, 3)


def ulysses_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mesh: Mesh,
    *, scale: Optional[float] = None, kv_len: Optional[int] = None,
    kv_replicated: bool = False, fixed_max: Optional[float] = None,
) -> jnp.ndarray:
    """Sequence-parallel attention over [B, S, H, D] activations sharded
    (dp, sp, tp, -). Heads must divide by sp * tp.

    kv_replicated=True: cross-attention with short, unsharded K/V — each
    device already holds the whole context, so only Q rides sp and no
    collective is needed.
    """
    q_spec = P(AXIS_DP, AXIS_SP, AXIS_TP, None)
    kv_spec = P(AXIS_DP, None, AXIS_TP, None) if kv_replicated else q_spec
    sp = mesh.shape[AXIS_SP]

    def local(ql, kl, vl):
        if kv_replicated or sp == 1:
            # Q stays sequence-sharded; attention over the full local KV.
            return _local_full_attention(ql, kl, vl, scale=scale,
                                         kv_len=kv_len, fixed_max=fixed_max)
        # Ulysses: heads -> sp groups, sequence gathered
        a2a = functools.partial(jax.lax.all_to_all, axis_name=AXIS_SP,
                                split_axis=2, concat_axis=1, tiled=True)
        qg, kg, vg = a2a(ql), a2a(kl), a2a(vl)
        og = _local_full_attention(qg, kg, vg, scale=scale,
                                    kv_len=kv_len, fixed_max=fixed_max)
        # inverse: sequence -> sp shards, heads gathered
        return jax.lax.all_to_all(og, axis_name=AXIS_SP, split_axis=1,
                                  concat_axis=2, tiled=True)

    return jax.shard_map(local, mesh=mesh, in_specs=(q_spec, kv_spec, kv_spec),
                         out_specs=q_spec)(q, k, v)


def _partial_attention(q, k, v, *, scale):
    """Per-shard attention returning (out, m, l) for streaming-softmax merge."""
    from magcache_tpu.ops.attention import (
        _xla_attention_bhsd_aux,
        flash_attention_bhsd_aux,
    )
    import math

    qt, kt, vt = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    d = q.shape[-1]
    sc = (1.0 / math.sqrt(d)) if scale is None else scale
    if jax.default_backend() in ("tpu", "axon"):
        o, m, l = flash_attention_bhsd_aux(qt, kt, vt, scale=sc)
    else:
        o, m, l = _xla_attention_bhsd_aux(qt, kt, vt, scale=sc)
    return o.transpose(0, 2, 1, 3), m, l


def ring_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mesh: Mesh,
    *, scale: Optional[float] = None,
) -> jnp.ndarray:
    """Ring attention over `sp`: K/V shards rotate around the ring
    (`lax.ppermute`) while each device keeps its Q shard; partial softmax
    results merge exactly via the streaming (m, l) state.

    The TPU equivalent of xfuser's ring attention (``--ring_size``,
    ``magcache_generate.py:637-641``): sequence memory scales 1/sp with no
    full-sequence gather, at the cost of sp sequential steps — use when even
    one Ulysses head-group's full sequence would not fit HBM.
    """
    spec = P(AXIS_DP, AXIS_SP, AXIS_TP, None)
    sp = mesh.shape[AXIS_SP]

    def local(ql, kl, vl):
        o, m, l = _partial_attention(ql, kl, vl, scale=scale)

        def body(i, carry):
            o_acc, m_acc, l_acc, kc, vc = carry
            perm = [(j, (j + 1) % sp) for j in range(sp)]
            kc = jax.lax.ppermute(kc, AXIS_SP, perm)
            vc = jax.lax.ppermute(vc, AXIS_SP, perm)
            o2, m2, l2 = _partial_attention(ql, kc, vc, scale=scale)
            # merge two normalized partials: [B, S, H, D] with m,l [B, H, S]
            m_new = jnp.maximum(m_acc, m2)
            w1 = l_acc * jnp.exp(m_acc - m_new)
            w2 = l2 * jnp.exp(m2 - m_new)
            tot = w1 + w2
            wt1 = (w1 / tot).transpose(0, 2, 1)[..., None]
            wt2 = (w2 / tot).transpose(0, 2, 1)[..., None]
            o_new = (o_acc.astype(jnp.float32) * wt1
                     + o2.astype(jnp.float32) * wt2).astype(o_acc.dtype)
            return o_new, m_new, w1 + w2, kc, vc

        if sp > 1:
            o, m, l, _, _ = jax.lax.fori_loop(0, sp - 1, body, (o, m, l, kl, vl))
        return o

    return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec)(q, k, v)
