"""Rotary position embeddings for video/image DiTs.

Video DiTs (Wan, HunyuanVideo, FLUX) split each attention head's channel dim
into per-axis segments and rotate each segment by that axis's position: FLUX
uses (text, h, w) ids through a single ``pos_embed(ids)``; Wan splits head_dim
into (t: d-4d', h: 2d', w: 2d') half-complex segments. We represent rotations
as precomputed (cos, sin) tables — static per (grid, head_dim) — and apply
them with the half-rotate trick, which maps to pure VPU elementwise work and
fuses into the attention prologue.

The rotation convention is the interleaved-pair ("complex") one used by both
Wan (``torch.view_as_complex`` on [..., d/2, 2]) and diffusers' FLUX
(`apply_rotary_emb` with `use_real_unbind_dim=-1`): pairs are adjacent
elements (x0,x1), (x2,x3), ... — NOT the split-half convention of LLaMA.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["rope_freqs_1d", "rope_freqs_nd", "apply_rope"]


def rope_freqs_1d(
    positions: np.ndarray, dim: int, theta: float = 10000.0
) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables for 1-D positions; shapes ``[len(pos), dim/2]`` (f32).

    freq_k = pos * theta^(-2k/dim), the standard RoPE frequency ladder.
    """
    assert dim % 2 == 0
    inv_freq = theta ** (-np.arange(0, dim, 2, dtype=np.float64) / dim)
    angles = np.asarray(positions, dtype=np.float64)[:, None] * inv_freq[None, :]
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def rope_freqs_nd(
    grid_sizes: Sequence[int],
    axis_dims: Sequence[int],
    theta: float = 10000.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) for an N-D grid flattened in row-major order.

    ``axis_dims`` are per-axis channel budgets summing to head_dim; each must
    be even. E.g. Wan: head_dim=128 -> (t=44, h=42, w=42) via
    ``d-4*(d//6), 2*(d//6), 2*(d//6)``; FLUX: (16, 56, 56).
    Returns shapes ``[prod(grid), head_dim/2]``.
    """
    assert len(grid_sizes) == len(axis_dims)
    coords = np.stack(
        np.meshgrid(*[np.arange(g) for g in grid_sizes], indexing="ij"), axis=-1
    ).reshape(-1, len(grid_sizes))
    cos_parts, sin_parts = [], []
    for ax, d in enumerate(axis_dims):
        c, s = rope_freqs_1d(coords[:, ax], d, theta)
        cos_parts.append(c)
        sin_parts.append(s)
    return np.concatenate(cos_parts, axis=-1), np.concatenate(sin_parts, axis=-1)


def wan_axis_dims(head_dim: int) -> Tuple[int, int, int]:
    """Wan's (t, h, w) head-dim split: h = w = 2*(d//6), t = d - 4*(d//6)."""
    hw = 2 * (head_dim // 6)
    return head_dim - 2 * hw, hw, hw


@functools.lru_cache(maxsize=None)
def _pair_swap_matrix(d: int) -> np.ndarray:
    """[d, d] permutation-with-sign P such that (x @ P)[2i] = -x[2i+1] and
    (x @ P)[2i+1] = x[2i] — the 90° rotation partner of each interleaved pair
    as a single tiny MXU matmul (one nonzero per column, so the contraction
    is exact in f32). Cached as numpy (a cached jnp array would leak tracers
    when first materialized inside a jit trace)."""
    P = np.zeros((d, d), np.float32)
    idx = np.arange(0, d, 2)
    P[idx + 1, idx] = -1.0
    P[idx, idx + 1] = 1.0
    return P


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x[..., seq, heads, head_dim]`` by (cos, sin) of ``[seq, head_dim/2]``.

    Interleaved-pair convention: (x_even, x_odd) -> (x_e*cos - x_o*sin,
    x_e*sin + x_o*cos). Rotation math runs in f32 (parity with the reference's
    float64/float32 complex path) and returns the input dtype.

    Lowering note: the naive ``reshape(.., d/2, 2)`` + ``stack`` formulation
    forces XLA onto size-2-minor-dim T(2,128) layouts — at Wan-480p that cost
    ~300 ms of relayout copies per forward. Instead the identical rotation is
    computed as ``x * C + (x @ P) * S`` with full-width duplicated tables and
    the pair-swap-with-sign permutation ``P`` (one 128x128 f32 matmul on the
    MXU, bit-exact since each output has exactly one contraction term); every
    tensor stays in the standard {2,1,0} layout and the elementwise work
    fuses into the attention prologue.
    """
    dtype = x.dtype
    d = x.shape[-1]
    x32 = x.astype(jnp.float32)
    # [seq, d/2] -> [seq, d] duplicated per pair; loop-invariant, so XLA
    # hoists it out of the block scan
    cos2 = jnp.repeat(cos.astype(jnp.float32), 2, axis=-1)[..., :, None, :]
    sin2 = jnp.repeat(sin.astype(jnp.float32), 2, axis=-1)[..., :, None, :]
    partner = x32 @ jnp.asarray(_pair_swap_matrix(d))
    out = x32 * cos2 + partner * sin2
    return out.astype(dtype)
