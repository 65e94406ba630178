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

__all__ = ["TeaCacheConfig", "sample_euler_teacache", "OPEN_SORA_TEA_COEFFS",
           "TeaCacheLanes", "wan_teacache_settings", "WAN_TEA_COEFFS",
           "FRAMEPACK_TEA_COEFFS", "FRAMEPACK_TEA_THRESH"]

# rescale polynomial fitted for Open-Sora (opensora.py:100)
OPEN_SORA_TEA_COEFFS = (2.17546007e2, -1.18329252e2, 2.68662585e1,
                        -4.59364272e-2, 4.84426240e-2)

# Published Wan rescale polynomials (trained constants, carried as data like
# the MagCache ratios). Keyed (model_key, use_ret_steps); source:
# ``experiments/Wan2.1_EVAL/wan_teacache.py:913-928`` (t2v, keyed by ckpt
# name) and ``:1025-1038`` (i2v, keyed by resolution).
WAN_TEA_COEFFS = {
    ("t2v-1.3B", True): (-5.21862437e4, 9.23041404e3, -5.28275948e2,
                         1.36987616e1, -4.99875664e-2),
    ("t2v-14B", True): (-3.03318725e5, 4.90537029e4, -2.65530556e3,
                        5.87365115e1, -3.15583525e-1),
    ("t2v-1.3B", False): (2.39676752e3, -1.31110545e3, 2.01331979e2,
                          -8.29855975e0, 1.37887774e-1),
    ("t2v-14B", False): (-5784.54975374, 5449.50911966, -1811.16591783,
                         256.27178429, -13.02252404),
    ("i2v-480P", True): (2.57151496e5, -3.54229917e4, 1.40286849e3,
                         -1.35890334e1, 1.32517977e-1),
    ("i2v-720P", True): (8.10705460e3, 2.13393892e3, -3.72934672e2,
                         1.66203073e1, -4.17769401e-2),
    ("i2v-480P", False): (-3.02331670e2, 2.23948934e2, -5.25463970e1,
                          5.87348440e0, -2.01973289e-1),
    ("i2v-720P", False): (-114.36346466, 65.26524496, -18.82220707,
                          4.91518089, -0.23412683),
}


# FramePack's packed-HunyuanVideo TeaCache rescale polynomial + default
# threshold (the reference gradio demo toggles it via the external
# ``diffusers_helper`` transformer's initialize_teacache,
# ``magcache_demo_gradio.py:533-535``; the constants are the public FramePack
# release's). Single-lane: FramePack is CFG-distilled (one forward/step).
FRAMEPACK_TEA_COEFFS = (7.33226126e2, -4.01131952e2, 6.75869174e1,
                        -3.14987800e0, 9.61237896e-2)
FRAMEPACK_TEA_THRESH = 0.15


def wan_teacache_settings(model_key: str, sample_steps: int,
                          use_ret_steps: bool):
    """(coefficients, ret_steps, cutoff_steps) in *forward counts* — the
    reference's cnt units (2 forwards per scheduler step).

    use_ret_steps=True: signal = e0 (6-way modulation), ret 10*2 for t2v /
    5*2 for i2v, no cutoff (``wan_teacache.py:913-921, 1025-1031``);
    False: signal = e (time embedding), ret 1*2, cutoff 2n-2 (``:922-928``).
    """
    coeffs = WAN_TEA_COEFFS[(model_key, use_ret_steps)]
    if use_ret_steps:
        ret = (10 if model_key.startswith("t2v") else 5) * 2
        cutoff = sample_steps * 2
    else:
        ret = 1 * 2
        cutoff = sample_steps * 2 - 2
    return coeffs, ret, cutoff


@dataclasses.dataclass(frozen=True)
class TeaCacheLanes:
    """Per-lane TeaCache decision state for the generic samplers — the
    reference Wan eval's even/odd (cond/uncond) design: each CFG lane keeps
    its own previous-signal, accumulator, and residual, and decides
    independently (``wan_teacache.py:533-590``).

    Plugs into ``unipc_executor(dynamic_skip=...)``: the decision depends on
    activations, so it runs in-graph; the forced-compute window
    (cnt < ret_steps or cnt >= cutoff_steps) is static and precomputes on the
    host (`forced_mask`). ``signal_fn(params, hidden, ctx) -> [rows, ...]``
    extracts the modulated input (Wan: ctx["e0"] when use_ret_steps else
    ctx["e"], ``wan_teacache.py:534``).
    """

    thresh: float
    coefficients: Tuple[float, ...]
    ret_steps: int                      # forward-count units (2 per step)
    cutoff_steps: int
    lanes: int = 2
    signal_fn: Optional[Callable] = None

    def forced_mask(self, num_steps: int) -> np.ndarray:
        """bool[num_steps, lanes]: True = always compute (window edges)."""
        fwd = np.arange(num_steps)[:, None] * self.lanes + np.arange(self.lanes)
        return (fwd < self.ret_steps) | (fwd >= self.cutoff_steps)

    def init_state(self, sig_sd) -> tuple:
        """Zero state from the signal's ShapeDtypeStruct: (prev_signal,
        acc[lanes]). prev starts as zeros — step 0 is inside the forced
        window by construction (ret_steps >= 2), so the first distance
        against zeros is never consumed."""
        return (jnp.zeros(sig_sd.shape, sig_sd.dtype),
                jnp.zeros((self.lanes,), jnp.float32))

    def decide(self, params, hidden, ctx, state, forced_bits):
        """(skip_bits[lanes], new_state) — the reference accumulator update:
        on forced or over-threshold steps the accumulator resets to 0; under
        threshold it keeps the running sum and the lane skips
        (``wan_teacache.py:538-564``)."""
        prev, acc = state
        sig = self.signal_fn(params, hidden, ctx)
        rows = sig.shape[0]
        per_lane = rows // self.lanes
        coeffs = jnp.asarray(np.asarray(self.coefficients, np.float32))
        sigs = sig.reshape((self.lanes, per_lane) + sig.shape[1:])
        prevs = prev.reshape((self.lanes, per_lane) + sig.shape[1:])
        axes = tuple(range(1, sigs.ndim))
        rel = (jnp.mean(jnp.abs(sigs - prevs), axis=axes)
               / jnp.maximum(jnp.mean(jnp.abs(prevs), axis=axes), 1e-8))
        acc_try = acc + jnp.polyval(coeffs, rel.astype(jnp.float32))
        skip = (~forced_bits) & (acc_try < self.thresh)
        acc_new = jnp.where(skip, acc_try, 0.0)
        return skip, (sig, acc_new)


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
