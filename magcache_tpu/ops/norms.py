"""Normalization + AdaLN modulation primitives.

These are deliberately tiny jnp functions: XLA fuses them into the surrounding
matmuls on TPU, so no hand-written kernel is needed for the elementwise parts
(HBM-bandwidth-bound ops fuse; see repo guide). Norm statistics are computed in
f32 regardless of input dtype — the reference keeps norm/modulation islands in
fp32 too (e.g. ``MagCache4Wan2.1/magcache_generate.py:249-262`` autocasts the
time-embedding path to fp32, and Wan's WanLayerNorm/WanRMSNorm upcast).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

__all__ = ["rms_norm", "layer_norm", "adaln_modulate"]


def rms_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray] = None, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm with f32 statistics; returns in the input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    out = x32 * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm (optionally affine-free, as in DiT pre-modulation norms)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def adaln_modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """DiT AdaLN modulation ``x * (1 + scale) + shift``.

    ``shift``/``scale`` broadcast over the token axis (shape ``[..., 1, dim]``
    or ``[..., dim]``). The 6-way AdaLN pattern (shift/scale/gate for attn and
    mlp) of Wan/STDiT3 (``open_sora_transformer_3d.py:169-171``) is built from
    this primitive.
    """
    if shift.ndim == x.ndim - 1:
        shift = shift[..., None, :]
        scale = scale[..., None, :]
    return x * (1.0 + scale) + shift
