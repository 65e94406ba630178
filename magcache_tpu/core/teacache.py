"""TeaCache — the activation-dependent comparator cache the reference keeps
in-tree (``eval/magcache/experiments/opensora.py:34-227``,
``experiments/Wan2.1_EVAL/wan_teacache.py``, FramePack toggles).

Decision rule (``opensora.py:88-107``): on each step compute the *modulated
input* (first block's AdaLN-modulated, normed embedding); accumulate a
polynomial-rescaled relative-L1 distance to the previous step's; skip the
trunk while the accumulator stays under ``rel_l1_thresh`` (never on the first
or last step), resetting on compute. Unlike MagCache the predicate depends on
activations, so it cannot be precomputed: it runs in-graph as a `lax.cond` on
a traced boolean — the dynamic-control-flow path of this framework (MagCache's
static schedule is the fast path; this is the general one).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.sampler import DiTCore, _cfg_combine, _stack_lanes

__all__ = ["TeaCacheConfig", "sample_euler_teacache", "OPEN_SORA_TEA_COEFFS"]

# rescale polynomial fitted for Open-Sora (opensora.py:100)
OPEN_SORA_TEA_COEFFS = (2.17546007e2, -1.18329252e2, 2.68662585e1,
                        -4.59364272e-2, 4.84426240e-2)


@dataclasses.dataclass(frozen=True)
class TeaCacheConfig:
    rel_l1_thresh: float = 0.2
    coefficients: Tuple[float, ...] = OPEN_SORA_TEA_COEFFS


def default_tea_signal(core: DiTCore):
    """Signal = the trunk input itself (models with AdaLN-first blocks should
    pass their own modulated-input extractor for reference parity)."""

    def fn(params, hidden, ctx):
        return hidden

    return fn


def sample_euler_teacache(
    core: DiTCore,
    params,
    x_init: jnp.ndarray,
    cond,
    *,
    timesteps: np.ndarray,
    dts: np.ndarray,
    tea_cfg: TeaCacheConfig,
    signal_fn: Optional[Callable] = None,
    guidance_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Euler sampler with the TeaCache skip policy (single cache lane over the
    whole stacked batch, like the reference's joint-CFG usage)."""
    signal_fn = signal_fn or default_tea_signal(core)
    n_lanes = 2 if guidance_scale is not None else 1
    batch = x_init.shape[0]
    num_steps = len(timesteps)

    x_l0 = _stack_lanes(x_init, n_lanes)
    t0v = jnp.asarray(timesteps[:1])
    hshape = jax.eval_shape(lambda p, x, t, c: core.prepare(p, x, t, c)[0],
                            params, x_l0, t0v, cond)
    cache0 = jnp.zeros(hshape.shape, hshape.dtype)
    sshape = jax.eval_shape(
        lambda p, x, t, c: signal_fn(p, *core.prepare(p, x, t, c)),
        params, x_l0, t0v, cond)
    prev0 = jnp.zeros(sshape.shape, sshape.dtype)

    coeffs = jnp.asarray(np.asarray(tea_cfg.coefficients, np.float32))
    ts = jnp.asarray(np.asarray(timesteps, np.float32))
    dts_a = jnp.asarray(np.asarray(dts, np.float32))
    # first/last steps always compute (opensora.py:96-98)
    forced = np.zeros(num_steps, bool)
    forced[0] = forced[-1] = True

    def body(carry, step_in):
        x, cache, prev_mod, acc = carry
        t, dt, force = step_in
        x2 = _stack_lanes(x, n_lanes)
        tvec = jnp.full((x2.shape[0],), t, jnp.float32)
        hidden, ctx = core.prepare(params, x2, tvec, cond)
        mod = signal_fn(params, hidden, ctx)

        rel = jnp.mean(jnp.abs(mod - prev_mod)) / jnp.maximum(
            jnp.mean(jnp.abs(prev_mod)), 1e-8)
        acc_try = acc + jnp.polyval(coeffs, rel.astype(jnp.float32))
        skip = (~force) & (acc_try < tea_cfg.rel_l1_thresh)
        acc_new = jnp.where(force, 0.0, jnp.where(skip, acc_try, 0.0))

        def do_skip(args):
            hidden, cache = args
            return hidden + cache, cache

        def do_compute(args):
            hidden, cache = args
            h = core.trunk(params, hidden, ctx)
            return h, h - hidden

        h_out, cache = jax.lax.cond(skip, do_skip, do_compute, (hidden, cache))
        out = core.head(params, h_out, ctx)
        v = _cfg_combine(out, guidance_scale, batch)
        x = x + dt.astype(x.dtype) * v.astype(x.dtype)
        return (x, cache, mod, acc_new), skip

    (x_fin, _, _, _), skips = jax.lax.scan(
        body, (x_init, cache0, prev0, jnp.asarray(0.0, jnp.float32)),
        (ts, dts_a, jnp.asarray(forced)))
    return x_fin
