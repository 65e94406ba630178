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
           "ulysses_attention"]


def split_sequence(x: jnp.ndarray, mesh: Mesh, dim: int = 1) -> jnp.ndarray:
    """Constrain x to be sharded over `sp` along ``dim`` (reference
    split_sequence: scatter the sequence across the SP group)."""
    spec = [None] * x.ndim
    spec[dim] = AXIS_SP
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def gather_sequence(x: jnp.ndarray, mesh: Mesh, dim: int = 1) -> jnp.ndarray:
    """Constrain x to be replicated along ``dim`` (reference gather_sequence)."""
    spec = [None] * x.ndim
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


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


def _local_full_attention(q, k, v, *, scale, kv_len):
    """Per-shard attention over the full sequence; flash kernel on TPU."""
    from magcache_tpu.ops.attention import _xla_attention_bhsd, flash_attention_bhsd

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if jax.default_backend() in ("tpu", "axon"):
        out = flash_attention_bhsd(qt, kt, vt, scale=scale, kv_len=kv_len)
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
    kv_replicated: bool = False,
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
            return _local_full_attention(ql, kl, vl, scale=scale, kv_len=kv_len)
        # Ulysses: heads -> sp groups, sequence gathered
        a2a = functools.partial(jax.lax.all_to_all, axis_name=AXIS_SP,
                                split_axis=2, concat_axis=1, tiled=True)
        qg, kg, vg = a2a(ql), a2a(kl), a2a(vl)
        og = _local_full_attention(qg, kg, vg, scale=scale, kv_len=kv_len)
        # inverse: sequence -> sp shards, heads gathered
        return jax.lax.all_to_all(og, axis_name=AXIS_SP, split_axis=1,
                                  concat_axis=2, tiled=True)

    return jax.shard_map(local, mesh=mesh, in_specs=(q_spec, kv_spec, kv_spec),
                         out_specs=q_spec)(q, k, v)
