"""Shared building blocks for DiT model families.

All models are pure functions over parameter pytrees. Blocks of equal shape
are **stacked along a leading depth axis** and executed with `lax.scan`, so
XLA traces/compiles one block body regardless of depth — the TPU-idiomatic
replacement for the reference's Python ``for block in self.blocks`` loops
(``MagCache4Wan2.1/magcache_generate.py:297-298``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Initializer = Callable[[jax.Array, tuple], jnp.ndarray]


def lecun_normal(key, shape, dtype=jnp.float32):
    fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
    # python-float scale keeps weak typing (a numpy scalar would upcast bf16)
    return jax.random.normal(key, shape, dtype) * float(1.0 / np.sqrt(fan_in))


def linear_params(key, d_in, d_out, *, depth=None, dtype=jnp.float32, bias=True):
    kw, kb = jax.random.split(key)
    shape = (d_in, d_out) if depth is None else (depth, d_in, d_out)
    p = {"w": lecun_normal(kw, shape, dtype)}
    if bias:
        p["b"] = jnp.zeros(shape[:-2] + (d_out,), dtype)
    return p


def linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0,
                       *, scale: float = 1.0) -> jnp.ndarray:
    """Sinusoidal timestep features, f32 (the reference keeps the whole time
    path in fp32, ``magcache_generate.py:249-253``).

    Convention: half cos / half sin with frequencies ``max_period^{-i/(dim/2)}``.
    """
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = scale * t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def mlp_embedder(key, d_in, d_hidden, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "in": linear_params(k1, d_in, d_hidden, dtype=dtype),
        "out": linear_params(k2, d_hidden, d_hidden, dtype=dtype),
    }


def apply_mlp_embedder(p, x, act=jax.nn.silu):
    return linear(p["out"], act(linear(p["in"], x)))


def scan_blocks(block_fn: Callable, h, stacked_params, *, remat: bool = False):
    """Run ``h = block_fn(params_i, h)`` for each block along the stacked axis."""
    fn = jax.checkpoint(block_fn) if remat else block_fn

    def body(carry, p):
        return fn(p, carry), None

    out, _ = jax.lax.scan(body, h, stacked_params)
    return out
