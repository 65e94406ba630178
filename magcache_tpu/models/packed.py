"""Shared 128-lane packed-attention helpers for sub-128 head-dim DiTs.

STDiT3 / Latte / OSP-v110 run 16 heads x 72 lanes (CogVideoX 48 x 64); any
activation holding a sub-128 minor dim forces Mosaic/XLA relayout copies on
every reshape — measured as the dominant waste of the STDiT3 trunk
(tools/profile_stdit3_knockout.py, NOTES.md #25). Packing the attention
*weights* (zero output columns / zero input rows — exact) moves the
alignment into the matmuls so activations never leave 128-lane layouts, and
`ops.attention.grouped_attention_fused_qkv` consumes the projection output
directly with qk-norm/RoPE fused into the kernel loads.

The packed tree is built once per forward, outside the layer scan (~2 ms of
HBM traffic at 480p); checkpoints and converters keep reference shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from magcache_tpu.ops.rope import rope_freqs_1d

__all__ = ["pack_block_group", "grouped_rope_tables"]

_ATTN_OUT = {"qkv": 3, "cross_q": 1, "cross_kv": 2}   # n fused outputs
_ATTN_IN = ("proj", "cross_o")                        # head-side inputs


def pack_block_group(g: dict, heads: int, d_head: int, dp: int,
                     head_major: bool = False) -> dict:
    """Zero-pad a stacked block group's attention weights so projections emit
    ``[.., H, dp]`` natively. Missing keys (e.g. Latte temporal blocks carry
    no cross attention) pass through; ``q_norm``/``k_norm`` gains gain
    zero-padded ``*_p`` twins for the in-kernel fused norm.

    ``head_major``: emit the fused QKV projection in ``[h, 3, dp]`` feature
    order instead of ``[3, h, dp]`` — each head's q/k/v contiguous, so the
    feature axis can be tp-sharded without splitting a head across devices
    (mesh execution; pairs with ``head_major=True`` on the grouped kernel).
    Applies to "qkv" only: cross_kv keeps k|v order for ``jnp.split``."""
    L, dm = g["qkv"]["w"].shape[0], g["qkv"]["w"].shape[1]

    def pad_out(p, n, hm=False):
        w = p["w"].reshape(L, dm, n, heads, d_head)
        w = jnp.pad(w, ((0, 0),) * 4 + ((0, dp - d_head),))
        if hm:
            w = w.transpose(0, 1, 3, 2, 4)      # (L, dm, heads, n, dp)
        out = {"w": w.reshape(L, dm, n * heads * dp)}
        if "b" in p:
            b = p["b"].reshape(L, n, heads, d_head)
            b = jnp.pad(b, ((0, 0),) * 3 + ((0, dp - d_head),))
            if hm:
                b = b.transpose(0, 2, 1, 3)
            out["b"] = b.reshape(L, n * heads * dp)
        return out

    def pad_in(p):
        w = p["w"].reshape(L, heads, d_head, dm)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, dp - d_head), (0, 0)))
        out = {"w": w.reshape(L, heads * dp, dm)}
        if "b" in p:
            out["b"] = p["b"]
        return out

    out = dict(g)
    for k, n in _ATTN_OUT.items():
        if k in g:
            out[k] = pad_out(g[k], n, hm=head_major and k == "qkv")
    for k in _ATTN_IN:
        if k in g:
            out[k] = pad_in(g[k])
    if "q_norm" in g:
        gpad = lambda x: jnp.pad(x, ((0, 0), (0, dp - d_head)))
        out["q_norm_p"] = gpad(g["q_norm"])      # [L, dp], zeros past d_head
        out["k_norm_p"] = gpad(g["k_norm"])
    return out


def grouped_rope_tables(T: int, Tp: int, d_head: int, dp: int,
                        theta: float = 10000.0):
    """Interleaved-pair RoPE tables for the grouped temporal kernel:
    [Tp, dp] cos/sin with identity (cos=1, sin=0) on padded rows/lanes."""
    cos, sin = rope_freqs_1d(np.arange(T), d_head, theta)
    c = np.repeat(np.asarray(cos, np.float32), 2, axis=-1)
    s = np.repeat(np.asarray(sin, np.float32), 2, axis=-1)
    cp = np.ones((Tp, dp), np.float32)
    sp = np.zeros((Tp, dp), np.float32)
    cp[:T, :d_head] = c
    sp[:T, :d_head] = s
    return jnp.asarray(cp), jnp.asarray(sp)
