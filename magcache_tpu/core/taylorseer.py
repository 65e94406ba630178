"""TaylorSeer — the feature-forecasting comparator cache (third switch on the
reference's OmniGen2 path).

The reference exposes TaylorSeer as a mutually-exclusive alternative to
TeaCache/MagCache for OmniGen2 (``MagCache4OmniGen2/inference.py:167-212``;
``magcache/magcache_utils.py:424-429, 446-521`` swaps one
``(cache_dic, current)`` pair per guidance branch onto the transformer before
each ``predict``). The algorithm itself lives in the external ``omnigen2``
package, so — like TeaCache — we carry an independent implementation of the
published scheme ("From Reusing to Forecasting: Accelerating Diffusion Models
with TaylorSeers"): at *fresh* steps compute the trunk and update a stack of
backward finite-difference derivatives of the cached feature; at every other
step **forecast** the feature with the Taylor polynomial

    y(i_last + x) ≈ Σ_k  d_k · x^k / k!

instead of running the trunk at all.

TPU shape: the fresh/forecast decision depends only on the step index
(interval sampling — ``fresh_threshold`` in the published code), so the whole
schedule — fresh bits, forecast distances, update distances, and available
history depth — precomputes on the host and enters one `lax.scan` as static
per-step arrays; the derivative stack is scan-carried state in HBM and a
forecast step costs ``order`` fused multiply-adds over the residual buffer
(no trunk, no collectives — the stack inherits the activations' sharding).

One deliberate difference from the published module-level hook: we cache and
forecast the **trunk residual** (``trunk(h) - h``, the MagCache cache
boundary) rather than the raw trunk output. At a skipped step the freshly
computed embedding ``h`` is available anyway, so ``h + r̂`` strictly dominates
forecasting the absolute feature (it reuses current-step information the
Taylor stack cannot see). Parity of the decision schedule is unaffected.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.sampler import (DiTCore, _cfg_combine, _init_cache,
                                       _stack_lanes)

__all__ = ["TaylorSeerConfig", "taylorseer_schedule", "taylor_update",
           "taylor_forecast", "sample_euler_taylorseer"]


@dataclasses.dataclass(frozen=True)
class TaylorSeerConfig:
    """``interval`` = the published ``fresh_threshold`` (compute every N-th
    step), ``order`` = ``max_order`` (derivative depth), ``warmup`` =
    ``first_enhance`` (leading always-compute steps). The published OmniGen2
    defaults are not shipped in the reference tree; these mirror the public
    TaylorSeer release's common settings and are fully configurable."""

    num_steps: int
    interval: int = 4
    order: int = 2
    warmup: int = 3


def taylorseer_schedule(cfg: TaylorSeerConfig):
    """Host-side static schedule.

    Returns ``(fresh, x_fc, upd, hist)`` — all length ``num_steps``:
      fresh[i]  compute the trunk at step i
      x_fc[i]   forecast distance i - last_fresh  (non-fresh steps)
      upd[i]    finite-difference span last_fresh_gap (fresh steps)
      hist[i]   #fresh steps strictly before i (caps usable derivative order)
    """
    n, w, iv = cfg.num_steps, cfg.warmup, cfg.interval
    fresh = np.zeros(n, bool)
    for i in range(n):
        # published interval sampling: step % fresh_threshold == 0, plus the
        # first_enhance warmup — phase anchored at step 0, not at warmup end
        fresh[i] = i < w or i % iv == 0
    x_fc = np.zeros(n, np.float32)
    upd = np.ones(n, np.float32)
    hist = np.zeros(n, np.int32)
    last = -1
    seen = 0
    for i in range(n):
        hist[i] = seen
        if fresh[i]:
            upd[i] = float(i - last) if last >= 0 else 1.0
            last = i
            seen += 1
        else:
            x_fc[i] = float(i - last)
    return fresh, x_fc, upd, hist


def _factorials(order: int) -> np.ndarray:
    return np.asarray([math.factorial(k) for k in range(order + 1)],
                      np.float32)


def taylor_update(derivs: jnp.ndarray, y: jnp.ndarray, ud, hs,
                  order: int) -> jnp.ndarray:
    """Refresh the derivative stack with a freshly computed feature ``y``.

    ``derivs``: [order+1, *y.shape] previous stack; ``ud``: span (steps) since
    the previous fresh step; ``hs``: #fresh steps so far (depth-k differences
    only become valid once k prior fresh features exist — the published
    first-enhance guard)."""
    # derivative stack stays in its own (f32) dtype regardless of the
    # trunk compute dtype — a bf16 y would otherwise make jnp.stack promote
    # inconsistently between the fresh/forecast cond branches
    new = [y.astype(derivs.dtype)]
    for k in range(1, order + 1):
        d_k = (new[k - 1] - derivs[k - 1]) / ud.astype(derivs.dtype)
        new.append(jnp.where(hs >= k, d_k, jnp.zeros_like(d_k)))
    return jnp.stack(new)


def taylor_forecast(derivs: jnp.ndarray, xf, order: int) -> jnp.ndarray:
    """Evaluate the Taylor polynomial at distance ``xf`` from the last fresh
    step: Σ_k derivs[k] · xf^k / k!."""
    fact = _factorials(order)
    xq = xf.astype(derivs.dtype)
    y = derivs[0]
    pw = xq
    for k in range(1, order + 1):
        y = y + derivs[k] * (pw / fact[k])
        pw = pw * xq
    return y


def sample_euler_taylorseer(
    core: DiTCore,
    params,
    x_init: jnp.ndarray,
    cond,
    *,
    timesteps: np.ndarray,
    dts: np.ndarray,
    ts_cfg: TaylorSeerConfig,
    guidance_scale: Optional[float] = None,
    lanes: Optional[int] = None,
    combine_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """Euler sampler with TaylorSeer forecasting on the trunk residual.

    Lane semantics match the reference's OmniGen2 loop: every guidance branch
    keeps its own derivative stack (they share the stacked leading axis here,
    exactly like MagCache's lane caches) and all branches follow the same
    interval schedule (the reference swaps per-branch ``cache_dic`` objects
    but drives them with the same step counter)."""
    assert core.init_state is None, "TaylorSeer sampler is stateless-trunk only"
    num_steps = len(timesteps)
    assert ts_cfg.num_steps == num_steps, (ts_cfg.num_steps, num_steps)
    batch = x_init.shape[0]
    if lanes is not None:
        n_lanes = lanes
    elif guidance_scale is not None:
        n_lanes = 2
    else:
        n_lanes = 1

    fresh, x_fc, upd, hist = taylorseer_schedule(ts_cfg)
    order = ts_cfg.order

    x_l0 = _stack_lanes(x_init, n_lanes)
    t0 = jnp.asarray(timesteps[:1])
    resid0 = _init_cache(core, params, x_l0, t0, cond)
    derivs0 = jnp.zeros((order + 1,) + resid0.shape, jnp.float32)

    ts = jnp.asarray(np.asarray(timesteps, np.float32))
    dts_a = jnp.asarray(np.asarray(dts, np.float32))

    def body(carry, step_in):
        x, derivs = carry
        t, dt, is_fresh, xf, ud, hs, idx = step_in
        x2 = _stack_lanes(x, n_lanes)
        tvec = jnp.full((x2.shape[0],), t, jnp.float32)
        hidden, ctx = core.prepare(params, x2, tvec, cond)

        def do_fresh(args):
            hidden, derivs = args
            h = core.trunk(params, hidden, ctx)
            return h, taylor_update(derivs, h - hidden, ud, hs, order)

        def do_forecast(args):
            hidden, derivs = args
            fc = taylor_forecast(derivs, xf, order)
            # the trunk hidden rides the compute dtype (bf16 in production)
            # while the forecast math is f32 — cast the reconstructed
            # feature back so both cond branches agree (bf16 trunks crashed
            # the cond on dtype mismatch before)
            h = (hidden.astype(fc.dtype) + fc).astype(hidden.dtype)
            return h, derivs

        h_out, derivs = jax.lax.cond(is_fresh, do_fresh, do_forecast,
                                     (hidden, derivs))
        out = core.head(params, h_out, ctx)
        v = _cfg_combine(out, guidance_scale, batch, combine_fn, n_lanes, idx)
        x = x + dt.astype(x.dtype) * v.astype(x.dtype)
        return (x, derivs), is_fresh

    (x_fin, _), _ = jax.lax.scan(
        body, (x_init, derivs0),
        (ts, dts_a, jnp.asarray(fresh), jnp.asarray(x_fc), jnp.asarray(upd),
         jnp.asarray(hist), jnp.arange(num_steps)))
    return x_fin
