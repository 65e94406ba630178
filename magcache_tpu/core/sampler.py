"""Cached denoising loops: MagCache compiled into `lax.scan` samplers.

This replaces the reference's monkey-patched ``Model.forward`` + Python
scheduler loop (``MagCache4Wan2.1/magcache_generate.py:198-311`` inside wan's
``generate``) with a functional, jit-once design:

- A model is three pure functions (`DiTCore`): ``prepare`` (embeddings),
  ``trunk`` (the N transformer blocks — the thing MagCache elides), and
  ``head`` (final layer + unpatchify). The cached residual is
  ``trunk_out - trunk_in``, exactly the reference's ``residual_x = x - ori_x``.
- The denoise loop is one `lax.scan`; the skip decision is **precomputed on
  the host** (`compute_skip_schedule` — legal because it never depends on
  activations) and enters the scan as a per-step boolean, so the skipped step
  is a `lax.cond` branch containing a single residual add.
- CFG runs **batched**: cond and uncond ride one leading axis of size
  ``2*batch`` through a single trunk evaluation per scheduler step (the
  reference's two sequential forwards exist only for GPU memory reasons; the
  math is identical because no op couples batch elements). Each lane keeps its
  own cache slice and its own skip bit; a step where only one lane skips
  computes the trunk and per-lane selects — outputs still match the reference
  lane-for-lane.
- Calibration mode (``magcache_generate.py:160-193``) runs the same scan
  full-compute and stacks per-step (norm_ratio, norm_std, cos_dis) statistics
  per lane as scan outputs — one device->host transfer for the whole run.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.calibration import calibration_stats
from magcache_tpu.core.magcache import MagCacheConfig, compute_skip_schedule
from magcache_tpu.schedulers.unipc import UniPCSchedule

__all__ = ["DiTCore", "sample_euler", "sample_unipc", "sample_pndm",
           "calibrate_euler", "calibrate_unipc"]


@dataclasses.dataclass(frozen=True)
class DiTCore:
    """A DiT denoiser split at the MagCache cache boundary.

    prepare: (params, x, t, cond) -> (hidden, ctx)   # patch/time/text embed
    trunk:   (params, hidden, ctx) -> hidden          # the blocks (cacheable)
    head:    (params, hidden, ctx) -> out             # final layer + unpatchify
    """

    prepare: Callable[..., Tuple[jnp.ndarray, Any]]
    trunk: Callable[..., jnp.ndarray]
    head: Callable[..., jnp.ndarray]
    # Optional persistent trunk state threaded across denoise steps (e.g. PAB
    # attention-output caches). When set, trunk's signature becomes
    #   trunk(params, hidden, ctx, state, step_idx) -> (hidden, state)
    # and init_state(params, hidden, ctx) -> state builds the initial pytree.
    init_state: Optional[Callable] = None


def _lane_masks(cache_cfg: Optional[MagCacheConfig], num_steps: int):
    """Static per-scheduler-step skip bits, one per lane.

    Forward index of scheduler step i, lane l is ``i*lanes + l`` — the
    reference's ``cnt`` ordering ([cond, uncond] per step,
    ``magcache_generate.py:899``: num_steps = sample_steps*2).
    """
    if cache_cfg is None:
        lanes = 1
        return np.zeros((num_steps, 1), bool), lanes
    if hasattr(cache_cfg, "skip_schedule"):
        # alternative static policies (e.g. core.rolling's eval-variant
        # schedule) provide their own per-forward bits
        sched = np.asarray(cache_cfg.skip_schedule())
    else:
        sched = compute_skip_schedule(cache_cfg)
    lanes = cache_cfg.lanes
    assert cache_cfg.num_steps == num_steps * lanes, (
        f"cache num_steps {cache_cfg.num_steps} != sampler steps {num_steps} * lanes {lanes}"
    )
    return sched.reshape(num_steps, lanes), lanes


def _cfg_combine(out: jnp.ndarray, guidance_scale: Optional[float], batch: int,
                 combine_fn: Optional[Callable] = None, n_lanes: int = 1,
                 step_idx=None):
    """Combine lane outputs. Default dual-lane: uncond + g*(cond - uncond).

    ``combine_fn(lane_outputs: list[, step_idx]) -> v`` supports N-branch
    guidance (OmniGen2's cond/uncond/ref, ``magcache_utils.py:396-546``); a
    two-argument combine_fn receives the traced step index (step-dependent
    guidance like OmniGen2's cfg_range, ``magcache_utils.py:463-464``)."""
    if combine_fn is not None:
        chunks = [out[i * batch:(i + 1) * batch] for i in range(n_lanes)]
        import inspect
        if step_idx is not None and len(
                inspect.signature(combine_fn).parameters) >= 2:
            return combine_fn(chunks, step_idx)
        return combine_fn(chunks)
    if guidance_scale is None:
        return out
    cond, uncond = out[:batch], out[batch:]
    return uncond + guidance_scale * (cond - uncond)


def _gather_rows(tree, idx, rows):
    """Gather axis-0 rows of every per-row leaf in a ctx pytree.

    A leaf is per-row iff its leading dim equals the lane-stacked row count;
    row-independent leaves (RoPE tables, grids, scalars) pass through."""
    return jax.tree.map(
        lambda a: a[idx] if (hasattr(a, "ndim") and a.ndim >= 1
                             and a.shape[0] == rows) else a,
        tree)


def _cached_trunk(core: DiTCore, params, hidden, ctx, cache, skip_bits,
                  lane_of_row, state=None, step_idx=None,
                  partial_lanes: Optional[int] = None):
    """One trunk evaluation under the cache policy.

    skip_bits: bool[lanes] (traced, from static schedule); cache has hidden's
    shape. Returns (hidden_out, new_cache, new_state).

    When ``partial_lanes`` is set (L = cache lanes == stacked lanes, stateless
    trunk), the step dispatches through a ``lax.switch`` on how many lanes
    skip: s == L replays residuals, s == 0 runs the full trunk, and
    0 < s < L gathers only the non-skipping lanes' rows, runs the trunk on
    the reduced batch, and scatters residuals back — so a one-lane skip costs
    half a trunk, matching the reference's per-forward skip economics
    (``magcache_generate.py:294-298``: cond and uncond are separate forwards,
    each independently skippable). All shapes stay static per branch.
    """

    def run_trunk(hidden, ctx):
        if core.init_state is None:
            return core.trunk(params, hidden, ctx), state
        return core.trunk(params, hidden, ctx, state, step_idx)

    if partial_lanes is not None and core.init_state is None:
        L = partial_lanes
        rows = hidden.shape[0]
        per_lane = rows // L
        row_skip = skip_bits[lane_of_row]                    # bool[rows]
        # Stable ascending sort: non-skipping rows first, original order kept.
        order = jnp.argsort(row_skip, stable=True)

        def make_branch(s):
            if s == L:
                def all_skip_branch(hidden, ctx, cache, order):
                    return hidden + cache, cache, state
                return all_skip_branch
            if s == 0:
                def full_branch(hidden, ctx, cache, order):
                    h, _ = run_trunk(hidden, ctx)
                    resid = h - hidden
                    return h, resid, state
                return full_branch
            keep = (L - s) * per_lane

            def partial_branch(hidden, ctx, cache, order):
                idx = order[:keep]
                h_g, _ = run_trunk(hidden[idx], _gather_rows(ctx, idx, rows))
                resid_g = h_g - hidden[idx]
                resid_full = cache.at[idx].set(resid_g.astype(cache.dtype))
                return hidden + resid_full, resid_full, state
            return partial_branch

        n_skip = jnp.sum(skip_bits.astype(jnp.int32))
        return jax.lax.switch(n_skip, [make_branch(s) for s in range(L + 1)],
                              hidden, ctx, cache, order)

    all_skip = jnp.all(skip_bits)

    def do_skip(args):
        hidden, cache = args
        return hidden + cache, cache, state

    def do_compute(args):
        hidden, cache = args
        h, new_state = run_trunk(hidden, ctx)
        resid = h - hidden
        row_skip = skip_bits[lane_of_row]  # bool[rows]
        mask = row_skip.reshape((-1,) + (1,) * (hidden.ndim - 1))
        resid_sel = jnp.where(mask, cache, resid)
        return hidden + resid_sel, resid_sel, new_state

    return jax.lax.cond(all_skip, do_skip, do_compute, (hidden, cache))


def _init_cache(core: DiTCore, params, x_lanes, t0, cond):
    """Residual cache buffer, **sharded like the activations**: under a mesh
    plan the cache carries the hidden sequence's (dp, sp, tp) layout, so cache
    memory scales 1/sp and skip steps need no collectives — the reference's
    sharded-cache pattern (``eval/magcache/experiments/opensora.py:284-312``)."""
    from magcache_tpu.parallel.mesh import maybe_shard

    hshape = jax.eval_shape(lambda p, x, t, c: core.prepare(p, x, t, c)[0],
                            params, x_lanes, t0, cond)
    cache = jnp.zeros(hshape.shape, hshape.dtype)
    if cache.ndim == 3:
        cache = maybe_shard(cache, "tokens")
    return cache


def _stack_lanes(x: jnp.ndarray, lanes: int) -> jnp.ndarray:
    return jnp.concatenate([x] * lanes, axis=0) if lanes > 1 else x


def _init_trunk_state(core: DiTCore, params, x_lanes, t0, cond):
    if core.init_state is None:
        return None
    hidden, ctx = jax.eval_shape(core.prepare, params, x_lanes, t0, cond)
    return core.init_state(params, hidden, ctx)


def _lane_setup(cache_cfg, num_steps, guidance_scale, lanes, combine_fn, batch):
    """Resolve (skip_mask, n_lanes, lane_of_row, partial_lanes). ``n_lanes`` is
    how many copies of x the sampler stacks per step; the cache may have fewer
    lanes (e.g. Open-Sora's joint CFG batch uses one lane over a batch of 2).
    ``partial_lanes`` enables the reduced-batch trunk for lane-asymmetric skip
    steps (only meaningful with >=2 independently-skipping cache lanes)."""
    skip_mask, cache_lanes = _lane_masks(cache_cfg, num_steps)
    if lanes is not None:
        n_lanes = lanes
    elif combine_fn is not None:
        n_lanes = max(cache_lanes, 1)
    elif guidance_scale is not None:
        n_lanes = 2
    else:
        n_lanes = 1
    rows = batch * n_lanes
    if cache_lanes == 1:
        lane_rows = np.zeros(rows, int)
    else:
        assert cache_lanes == n_lanes, (cache_lanes, n_lanes)
        lane_rows = np.arange(rows) // batch
    partial_lanes = cache_lanes if cache_lanes == n_lanes and cache_lanes > 1 else None
    return skip_mask, n_lanes, jnp.asarray(lane_rows, jnp.int32), partial_lanes


def sample_euler(
    core: DiTCore,
    params,
    x_init: jnp.ndarray,
    cond,
    *,
    timesteps: np.ndarray,
    dts: np.ndarray,
    cache_cfg: Optional[MagCacheConfig] = None,
    guidance_scale: Optional[float] = None,
    lanes: Optional[int] = None,
    combine_fn: Optional[Callable] = None,
    skip_mask_override: Optional[jnp.ndarray] = None,
    x_coeffs: Optional[np.ndarray] = None,
    in_scales: Optional[np.ndarray] = None,
    noise_scales: Optional[np.ndarray] = None,
    noise_key: Optional[jax.Array] = None,
    dynamic_skip=None,
    dpm_coeffs=None,
    return_skips: bool = False,
    post_step: Optional[Callable] = None,
    calibrate: bool = False,
    calibrate_lanes: Optional[int] = None,
) -> jnp.ndarray:
    """Linear-update sampler: ``x <- cx_i * x + dt_i * v [+ ns_i * z_i]`` per
    step, with MagCache. ``x_coeffs`` defaults to ones (plain Euler);
    CogVideoX's DDIM passes its host-precomputed (c_x, c_v=dts) pair.

    ``calibrate=True``: full-compute run (no cache/skip machinery) that emits
    per-step per-lane magnitude stats ``f32[num_steps-1, lanes, 3]`` as the
    second return value — calibration then rides the *same trajectory* the
    pipeline samples with (DDIM/EA/PNDM/DPM coefficients included), the
    reference's patched-forward semantics. Mutually exclusive with
    ``cache_cfg``/``dynamic_skip``/``return_skips``.

    ``calibrate_lanes``: how many lane groups the calibration stats are
    emitted for — set to the *cache's* lane count when it differs from the
    sampler's CFG lanes (CogVideoX / Open-Sora cache the joint CFG batch in
    one lane, so their recorded ratios must be one joint residual per step,
    directly installable via ``prepare_mag_ratios(..., lanes=1)``). Defaults
    to the sampler lane count.

    ``post_step``: ``x -> x`` applied to the sample after every update —
    latent-replacement conditioning (Wan2.2 ti2v re-imposes the encoded image
    as latent frame 0 each step).

    ``return_skips=True``: also return the realized per-step skip bits
    bool[num_steps, lanes] (static-schedule bits, or the in-graph decisions
    when ``dynamic_skip`` is set) — the evaluator's per-variant skip counter.

    ``in_scales``: per-step scaling of the *model input only*
    (``x_model = in_i * x`` — diffusers ``scale_model_input`` for k-sigma
    schedules); ``noise_scales`` + ``noise_key``: ancestral noise injection
    (EulerAncestral's sigma_up term), noise drawn per step via
    ``fold_in(noise_key, step)``.

    ``skip_mask_override`` (bool[num_steps, lanes], may be a traced argument)
    replaces the host-precomputed schedule — lets one compiled program serve
    both the full-compute and cached runs.

    ``cond`` must already be lane-stacked ([cond; uncond; ...] on axis 0) when
    CFG is active (``guidance_scale`` or ``combine_fn`` set). ``dts`` is the
    per-step multiplier of the model output (sigma deltas for FlowMatch,
    t-deltas/T for RFLOW).

    ``dynamic_skip`` (e.g. `core.teacache.TeaCacheLanes`): activation-gated
    per-lane skip policy; the static schedule slot then carries the policy's
    forced-compute mask and skip bits are computed in-graph each step (same
    contract as `unipc_executor`). Mutually exclusive with ``cache_cfg``.

    ``dpm_coeffs`` (`schedulers.dpm_flow.dpmpp_2m_flow_coeffs` dict): switch
    the update rule to DPM-Solver++(2M) data prediction —
    ``x0 = x - sigma_t * v; D = a*x0 + b*x0_prev; x <- c_x*x + c_d*D`` with
    the previous step's x0 carried through the scan. Mutually exclusive with
    ``x_coeffs``/``in_scales``/``noise_scales`` (``dts`` is ignored).
    """
    num_steps = len(timesteps)
    batch = x_init.shape[0]
    if calibrate:
        assert cache_cfg is None and dynamic_skip is None \
            and skip_mask_override is None and not return_skips, (
                "calibrate is a full-compute recording mode")
        if calibrate_lanes is not None:
            assert batch % calibrate_lanes == 0 or calibrate_lanes == 1, (
                calibrate_lanes, batch)
    skip_mask, n_lanes, lane_of_row, partial_lanes = _lane_setup(
        cache_cfg, num_steps, guidance_scale, lanes, combine_fn, batch)
    if dynamic_skip is not None:
        assert cache_cfg is None and skip_mask_override is None
        assert core.init_state is None, "dynamic skip needs a stateless trunk"
        assert dynamic_skip.lanes == n_lanes, (dynamic_skip.lanes, n_lanes)
        skip_mask = dynamic_skip.forced_mask(num_steps)
        lane_of_row = jnp.asarray(np.arange(batch * n_lanes) // batch,
                                  jnp.int32)
        partial_lanes = n_lanes if n_lanes > 1 else None

    x_l0 = _stack_lanes(x_init, n_lanes)
    cache0 = _init_cache(core, params, x_l0, jnp.asarray(timesteps[:1]), cond)
    if dynamic_skip is not None:
        tvec0 = jnp.zeros((x_l0.shape[0],), jnp.float32)
        h_sd, ctx_sd = jax.eval_shape(core.prepare, params, x_l0, tvec0, cond)
        sig_sd = jax.eval_shape(dynamic_skip.signal_fn, params, h_sd, ctx_sd)
        cache0 = (cache0, dynamic_skip.init_state(sig_sd))

    ts = jnp.asarray(np.asarray(timesteps, np.float32))
    dts_a = jnp.asarray(np.asarray(dts, np.float32))
    cxs = jnp.asarray(np.ones(num_steps, np.float32) if x_coeffs is None
                      else np.asarray(x_coeffs, np.float32))
    cins = jnp.asarray(np.ones(num_steps, np.float32) if in_scales is None
                       else np.asarray(in_scales, np.float32))
    nss = jnp.asarray(np.zeros(num_steps, np.float32) if noise_scales is None
                      else np.asarray(noise_scales, np.float32))
    ancestral = noise_scales is not None
    if ancestral:
        assert noise_key is not None, "noise_scales needs a noise_key"
    if dpm_coeffs is not None:
        assert x_coeffs is None and in_scales is None and not ancestral, (
            "dpm_coeffs replaces the linear-update coefficients")
        dsig = jnp.asarray(dpm_coeffs["sigma_t"])
        da = jnp.asarray(dpm_coeffs["a"])
        db = jnp.asarray(dpm_coeffs["b"])
        dcx = jnp.asarray(dpm_coeffs["c_x"])
        dcd = jnp.asarray(dpm_coeffs["c_d"])
    else:
        z = jnp.zeros(num_steps, jnp.float32)
        dsig = da = db = dcx = dcd = z
    skips = (jnp.asarray(skip_mask) if skip_mask_override is None
             else skip_mask_override)
    state0 = _init_trunk_state(core, params, x_l0, jnp.asarray(timesteps[:1]), cond)

    def body(carry, step_in):
        x, cache, state, x0_prev = carry
        cache_prev = cache[0] if dynamic_skip is not None else cache
        t, dt, cx, cin, ns, skip_bits, idx, dpc = step_in
        x2 = _stack_lanes(cin.astype(x.dtype) * x, n_lanes)
        tvec = jnp.full((x2.shape[0],), t, jnp.float32)
        hidden, ctx = core.prepare(params, x2, tvec, cond)
        if dynamic_skip is not None:
            cache, dstate = cache
            skip_now, dstate = dynamic_skip.decide(params, hidden, ctx,
                                                   dstate, skip_bits)
            h_out, cache, state = _cached_trunk(
                core, params, hidden, ctx, cache, skip_now, lane_of_row,
                state, idx, partial_lanes=partial_lanes)
            cache = (cache, dstate)
        else:
            h_out, cache, state = _cached_trunk(
                core, params, hidden, ctx, cache, skip_bits, lane_of_row,
                state, idx, partial_lanes=partial_lanes)
        out = core.head(params, h_out, ctx)
        v = _cfg_combine(out, guidance_scale, batch, combine_fn, n_lanes, idx)
        if dpm_coeffs is not None:
            sg, av, bv, cxd, cdd = (c.astype(x.dtype) for c in dpc)
            x0 = x - sg * v.astype(x.dtype)
            d = av * x0 + bv * x0_prev
            x = cxd * x + cdd * d
            x0_prev = x0
        else:
            x = cx.astype(x.dtype) * x + dt.astype(x.dtype) * v.astype(x.dtype)
        if ancestral:
            z = jax.random.normal(jax.random.fold_in(noise_key, idx),
                                  x.shape, x.dtype)
            x = x + ns.astype(x.dtype) * z
        if post_step is not None:
            x = post_step(x)
        if calibrate:
            cl = calibrate_lanes or n_lanes
            rpl = x2.shape[0] // cl
            emitted = jnp.stack([
                calibration_stats(cache[l * rpl:(l + 1) * rpl],
                                  cache_prev[l * rpl:(l + 1) * rpl])
                for l in range(cl)])               # [calibrate_lanes, 3]
        else:
            emitted = (skip_now if dynamic_skip is not None
                       else skip_bits) if return_skips else None
        return (x, cache, state, x0_prev), emitted

    (x_fin, _, _, _), emitted = jax.lax.scan(
        body, (x_init, cache0, state0, jnp.zeros_like(x_init)),
        (ts, dts_a, cxs, cins, nss, skips, jnp.arange(num_steps),
         (dsig, da, db, dcx, dcd)))
    if calibrate:
        return x_fin, emitted[1:]   # step 0 has no previous residual
    if return_skips:
        return x_fin, emitted
    return x_fin


def sample_rflow_masked(
    core: DiTCore,
    params,
    x_init: jnp.ndarray,            # [B, T, H, W, C] with refs already pasted
    cond,
    *,
    timesteps: np.ndarray,
    dts: np.ndarray,                # (t_i - t_{i+1})/T per step
    num_train_timesteps: int,
    mask: jnp.ndarray,              # f32[B, T]: 0=condition frame (frozen),
                                    # (0,1)=edit ratio, 1=freely generated
    noise_key: jax.Array,
    lanes: int = 2,
    combine_fn: Optional[Callable] = None,
    guidance_scale: Optional[float] = None,
    cache_cfg=None,
    return_skips: bool = False,
) -> jnp.ndarray:
    """RFLOW Euler sampling with Open-Sora masked-frame conditioning
    (``scheduling_rflow_open_sora.py:215-255``): per step, frames whose
    ``mask * T >= t`` become *active* — on their first active step they are
    re-noised to the current level (``add_noise``; frames with mask==1 are
    pre-marked as noised and stay clean), the model sees them under the t=0
    modulation path (``x_mask``), and after the Euler update inactive frames
    revert to their pre-update latents.

    The frame mask changes per step, so this is a dedicated scan rather than a
    ``sample_euler`` mode; the single-lane MagCache residual cache composes
    the same way (static schedule, skip => hidden + cached residual).
    """
    num_steps = len(timesteps)
    batch = x_init.shape[0]
    skip_mask, cache_lanes = _lane_masks(cache_cfg, num_steps)
    assert cache_lanes == 1, (
        "masked RFLOW uses the joint-CFG single cache lane (the Open-Sora "
        "configuration); per-lane caches are not defined for it")
    lane_rows = jnp.asarray(np.zeros(batch * lanes, int), jnp.int32)

    x_l0 = _stack_lanes(x_init, lanes)
    cache0 = _init_cache(core, params, x_l0, jnp.asarray(timesteps[:1]), cond)
    state0 = _init_trunk_state(core, params, x_l0, jnp.asarray(timesteps[:1]),
                               cond)
    ts = jnp.asarray(np.asarray(timesteps, np.float32))
    dts_a = jnp.asarray(np.asarray(dts, np.float32))
    noise_added0 = mask >= 1.0                      # bool[B, T]

    def body(carry, step_in):
        x, noise_added, cache, state = carry
        t, dt, skip_bits, idx = step_in
        x0 = x
        upper = (mask * num_train_timesteps) >= t   # bool[B, T]
        add = upper & (~noise_added)
        tp = 1.0 - t / num_train_timesteps          # add_noise timepoint
        noise = jax.random.normal(jax.random.fold_in(noise_key, idx),
                                  x.shape, x.dtype)
        x_noise = tp.astype(x.dtype) * x0 + (1.0 - tp).astype(x.dtype) * noise
        bcast = add[:, :, None, None, None]
        xm = jnp.where(bcast, x_noise, x0)

        x2 = _stack_lanes(xm, lanes)
        tvec = jnp.full((x2.shape[0],), t, jnp.float32)
        cond2 = dict(cond)
        cond2["x_mask"] = _stack_lanes(upper, lanes)
        hidden, ctx = core.prepare(params, x2, tvec, cond2)
        h_out, cache, state = _cached_trunk(core, params, hidden, ctx, cache,
                                            skip_bits, lane_rows, state, idx)
        out = core.head(params, h_out, ctx)
        v = _cfg_combine(out, guidance_scale, batch, combine_fn, lanes, idx)
        x = xm + dt.astype(x.dtype) * v.astype(x.dtype)
        x = jnp.where(upper[:, :, None, None, None], x, x0)
        emitted = skip_bits if return_skips else None
        return (x, upper, cache, state), emitted

    (x_fin, _, _, _), emitted = jax.lax.scan(
        body, (x_init, noise_added0, cache0, state0),
        (ts, dts_a, jnp.asarray(skip_mask), jnp.arange(num_steps)))
    if return_skips:
        return x_fin, emitted
    return x_fin


def calibrate_euler(
    core: DiTCore,
    params,
    x_init: jnp.ndarray,
    cond,
    *,
    timesteps: np.ndarray,
    dts: np.ndarray,
    lanes: int = 1,
    guidance_scale: Optional[float] = None,
    combine_fn: Optional[Callable] = None,
    dpm_coeffs=None,
    prev_residual: Optional[jnp.ndarray] = None,
    return_residual: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-compute run recording calibration stats.

    Returns (x_final, stats[num_steps-1, lanes, 3]) where stats follow the
    reference's ``cnt >= lanes`` convention: step i compares against step i-1's
    same-lane residual (``magcache_generate.py:165-175``); callers interleave
    lanes to recover the reference's flat ``cnt`` ordering.

    ``combine_fn``: N-branch guidance combine (OmniGen2-style), same contract
    as the samplers'; lanes are stacked on the batch axis when it is given.

    ``prev_residual``: seed for step 0's predecessor residual — FramePack's
    section loop passes the previous section's final residual so the recording
    matches the reference's class-level lists that accumulate one continuous
    ``cnt`` across sections (the cross-section boundary ratio is kept); stats
    then has ``num_steps`` rows. ``return_residual=True`` additionally returns
    the run's final residual for that carry.
    """
    batch = x_init.shape[0]
    n_stack = (2 if guidance_scale is not None
               else lanes if combine_fn is not None else 1)
    x_l0 = _stack_lanes(x_init, n_stack)
    cache0 = (prev_residual if prev_residual is not None else
              _init_cache(core, params, x_l0, jnp.asarray(timesteps[:1]), cond))
    ts = jnp.asarray(np.asarray(timesteps, np.float32))
    dts_a = jnp.asarray(np.asarray(dts, np.float32))
    rows = x_l0.shape[0]
    rows_per_lane = rows // lanes
    n_cal = len(timesteps)
    if dpm_coeffs is not None:
        dpm_steps = tuple(jnp.asarray(dpm_coeffs[kk]) for kk in
                          ("sigma_t", "a", "b", "c_x", "c_d"))
    else:
        dpm_steps = tuple(jnp.zeros(n_cal, jnp.float32) for _ in range(5))

    def body(carry, step_in):
        x, cache, x0p = carry
        t, dt, idx, dpc = step_in
        x2 = _stack_lanes(x, n_stack)
        tvec = jnp.full((x2.shape[0],), t, jnp.float32)
        hidden, ctx = core.prepare(params, x2, tvec, cond)
        h = core.trunk(params, hidden, ctx)
        resid = h - hidden
        per_lane = [
            calibration_stats(
                resid[l * rows_per_lane:(l + 1) * rows_per_lane],
                cache[l * rows_per_lane:(l + 1) * rows_per_lane],
            )
            for l in range(lanes)
        ]
        stats = jnp.stack(per_lane)  # [lanes, 3]
        out = core.head(params, h, ctx)
        v = _cfg_combine(out, guidance_scale, batch, combine_fn, lanes, idx)
        if dpm_coeffs is not None:
            sg, av, bv, cxd, cdd = (c_.astype(x.dtype) for c_ in dpc)
            x0 = x - sg * v.astype(x.dtype)
            x = cxd * x + cdd * (av * x0 + bv * x0p)
            x0p = x0
        else:
            x = x + dt.astype(x.dtype) * v.astype(x.dtype)
        return (x, resid, x0p), stats

    (x_fin, resid_fin, _), stats = jax.lax.scan(
        body, (x_init, cache0, jnp.zeros_like(x_init)),
        (ts, dts_a, jnp.arange(n_cal), dpm_steps))
    if prev_residual is None:
        stats = stats[1:]  # step 0 has no previous residual
    if return_residual:
        return x_fin, stats, resid_fin
    return x_fin, stats


def unipc_executor(
    core: DiTCore,
    schedule: UniPCSchedule,
    *,
    cache_cfg: Optional[MagCacheConfig] = None,
    guidance_scale: Optional[float] = None,
    lanes: Optional[int] = None,
    combine_fn: Optional[Callable] = None,
    skip_mask_override: Optional[jnp.ndarray] = None,
    batch: int = 1,
    calibrate: bool = False,
    dynamic_skip=None,
    emit_skips: bool = False,
    post_step: Optional[Callable] = None,
):
    """Build the UniPC step machinery without committing to a dispatch shape.

    ``post_step``: ``x -> x`` applied to both the corrected sample and the
    next-step prediction after every step — latent-replacement conditioning
    (Wan2.2 ti2v frame-0 clamp).

    ``emit_skips=True``: the body emits the realized per-step skip bits
    bool[lanes] as scan outputs (mutually exclusive with ``calibrate``).

    Returns ``(init_carry, step_inputs, body)`` where ``body(params, cond)``
    yields a scan-compatible ``f(carry, step_in) -> (carry, None)``. Callers
    either `lax.scan` the whole run in one dispatch (`sample_unipc`) or slice
    ``step_inputs`` into host-dispatched segments — bounding single-dispatch
    duration (streaming previews, RPC deadline limits) with one compile.

    ``calibrate=True`` disables the cache (full compute) and makes the body
    emit per-step calibration statistics ``f32[lanes, 3]`` as scan outputs —
    calibration then runs *inside the very sampler that generation uses*, the
    reference's semantics (``magcache_generate.py:921-928`` patches
    ``magcache_calibration`` into the same unipc/dpm++ trajectory; recording
    from a different solver's trajectory would yield systematically-off
    mag_ratios).

    ``dynamic_skip`` (e.g. `core.teacache.TeaCacheLanes`): an
    activation-dependent per-lane skip policy. The static ``skips`` step
    input then carries the policy's *forced-compute* mask instead, and each
    step computes its skip bits in-graph from the policy's carried state —
    the TeaCache path of the reference Wan eval (``wan_teacache.py:533-590``)
    under the same UniPC trajectory. Mutually exclusive with ``cache_cfg``.
    """
    if calibrate:
        cache_cfg = None
        skip_mask_override = None
        assert not emit_skips, "emit_skips and calibrate are exclusive"
    n = schedule.num_steps
    order = schedule.order
    # carry `order` previous data predictions: predictor at step i uses
    # m_{i-1}..m_{i-order+1}; the corrector (correcting i-1 -> i) additionally
    # reaches back to m_{i-order}.
    hist = max(2, order)
    skip_mask, n_lanes, lane_of_row, partial_lanes = _lane_setup(
        cache_cfg, n, guidance_scale, lanes, combine_fn, batch)
    if dynamic_skip is not None:
        assert cache_cfg is None and skip_mask_override is None and not calibrate
        assert core.init_state is None, "dynamic skip needs a stateless trunk"
        L = dynamic_skip.lanes
        assert L == n_lanes, (L, n_lanes)
        skip_mask = dynamic_skip.forced_mask(n)       # forced-compute bits
        lane_of_row = jnp.asarray(np.arange(batch * n_lanes) // batch,
                                  jnp.int32)
        partial_lanes = L if L > 1 else None

    # Host-precomputed per-step coefficient tables (padded to fixed width).
    p_cx = np.zeros(n); p_cm0 = np.zeros(n); p_w = np.zeros((n, hist))      # pairs m_hist[l-1] = m_{i-l}
    c_cx = np.zeros(n); c_cm0 = np.zeros(n); c_w = np.zeros((n, hist)); c_wt = np.zeros(n)  # c_w pairs m_hist[l] = m_{i-1-l}
    use_corr = np.zeros(n, bool)
    for i in range(n):
        cx, cm0, w, offs = schedule.predictor_coeffs(i)
        p_cx[i], p_cm0[i] = cx, cm0
        for l, wl in zip(offs, w):
            p_w[i, l - 1] = wl
        if schedule.corrector_ok(i):
            cx, cm0, w, offs, wt = schedule.corrector_coeffs(i)
            c_cx[i], c_cm0[i], c_wt[i] = cx, cm0, wt
            for l, wl in zip(offs, w):
                c_w[i, l - 1] = wl
            use_corr[i] = True

    def init_carry(params, x_init, cond):
        x_l0 = _stack_lanes(x_init, n_lanes)
        cache0 = _init_cache(core, params, x_l0,
                             jnp.asarray(schedule.timesteps[:1]), cond)
        if dynamic_skip is not None:
            tvec0 = jnp.zeros((x_l0.shape[0],), jnp.float32)
            h_sd, ctx_sd = jax.eval_shape(core.prepare, params, x_l0, tvec0,
                                          cond)
            sig_sd = jax.eval_shape(dynamic_skip.signal_fn, params, h_sd,
                                    ctx_sd)
            cache0 = (cache0, dynamic_skip.init_state(sig_sd))
        m0 = jnp.zeros_like(x_init)
        m_hist0 = jnp.stack([m0] * hist)
        return (x_init, x_init, m_hist0, cache0)

    ts = jnp.asarray(schedule.timesteps)
    sig = jnp.asarray(schedule.sigmas[:-1])
    skips = (jnp.asarray(skip_mask) if skip_mask_override is None
             else skip_mask_override)
    step_in = (
        ts, sig, skips,
        jnp.asarray(p_cx, jnp.float32), jnp.asarray(p_cm0, jnp.float32),
        jnp.asarray(p_w, jnp.float32),
        jnp.asarray(c_cx, jnp.float32), jnp.asarray(c_cm0, jnp.float32),
        jnp.asarray(c_w, jnp.float32), jnp.asarray(c_wt, jnp.float32),
        jnp.asarray(use_corr),
    )

    def body(params, cond):
        def f(carry, inp):
            x_pred, x_prev, m_hist, cache = carry
            (t, sigma, skip_bits, pcx, pcm0, pw, ccx, ccm0, cw, cwt, uc) = inp
            x2 = _stack_lanes(x_pred, n_lanes)
            tvec = jnp.full((x2.shape[0],), t, jnp.float32)
            hidden, ctx = core.prepare(params, x2, tvec, cond)
            stats = None
            skip_now = skip_bits
            if calibrate:
                assert core.init_state is None, "calibration needs a stateless trunk"
                h_out = core.trunk(params, hidden, ctx)
                resid = h_out - hidden
                rows_per_lane = hidden.shape[0] // n_lanes
                stats = jnp.stack([
                    calibration_stats(
                        resid[l * rows_per_lane:(l + 1) * rows_per_lane],
                        cache[l * rows_per_lane:(l + 1) * rows_per_lane])
                    for l in range(n_lanes)
                ])  # [lanes, 3]
                cache = resid
            elif dynamic_skip is not None:
                cache, tstate = cache
                skip_now, tstate = dynamic_skip.decide(params, hidden, ctx,
                                                       tstate, skip_bits)
                h_out, cache, _ = _cached_trunk(core, params, hidden, ctx,
                                                cache, skip_now, lane_of_row,
                                                partial_lanes=partial_lanes)
                cache = (cache, tstate)
            else:
                h_out, cache, _ = _cached_trunk(core, params, hidden, ctx, cache,
                                                skip_bits, lane_of_row,
                                                partial_lanes=partial_lanes)
            out = core.head(params, h_out, ctx)
            v = _cfg_combine(out, guidance_scale, batch, combine_fn, n_lanes)
            m = x_pred - sigma.astype(x_pred.dtype) * v.astype(x_pred.dtype)

            # corrector of the previous step, using this step's model output:
            # m0 = m_{i-1} = m_hist[0]; history m_{i-1-l} = m_hist[l]
            x_corr = (ccx * x_prev + ccm0 * m_hist[0] + cwt * m
                      + jnp.tensordot(cw[:-1], m_hist[1:], axes=1))
            x_cur = jnp.where(uc, x_corr, x_pred)

            # predictor for the next sample: m0 = m_i; history m_{i-l} = m_hist[l-1]
            x_next = (pcx * x_cur + pcm0 * m + jnp.tensordot(pw, m_hist, axes=1))
            if post_step is not None:
                x_cur = post_step(x_cur)
                x_next = post_step(x_next)

            m_hist = jnp.concatenate([m[None], m_hist[:-1]], axis=0)
            return (x_next, x_cur, m_hist, cache), (
                skip_now if emit_skips else stats)
        return f

    return init_carry, step_in, body


def calibrate_unipc(
    core: DiTCore,
    params,
    x_init: jnp.ndarray,
    cond,
    schedule: UniPCSchedule,
    *,
    lanes: int = 1,
    guidance_scale: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-compute UniPC run recording calibration stats from the *actual*
    generation trajectory (reference: ``magcache_generate.py:921-928``).

    Returns (x_final, stats[num_steps-1, lanes, 3]); same step-(i vs i-1)
    same-lane convention as `calibrate_euler`.
    """
    init_carry, step_in, body = unipc_executor(
        core, schedule, guidance_scale=guidance_scale,
        lanes=lanes if lanes > 1 else None, batch=x_init.shape[0],
        calibrate=True)
    carry0 = init_carry(params, x_init, cond)
    (x_fin, _, _, _), stats = jax.lax.scan(body(params, cond), carry0, step_in)
    return x_fin, stats[1:]  # step 0 has no previous residual


def sample_unipc(
    core: DiTCore,
    params,
    x_init: jnp.ndarray,
    cond,
    schedule: UniPCSchedule,
    *,
    cache_cfg: Optional[MagCacheConfig] = None,
    guidance_scale: Optional[float] = None,
    lanes: Optional[int] = None,
    combine_fn: Optional[Callable] = None,
    skip_mask_override: Optional[jnp.ndarray] = None,
    dynamic_skip=None,
    return_skips: bool = False,
    post_step: Optional[Callable] = None,
) -> jnp.ndarray:
    """UniPC predictor-corrector flow sampler with MagCache (single-dispatch
    `lax.scan` over `unipc_executor`'s step machinery). ``return_skips=True``
    also returns the realized skip bits bool[num_steps, lanes]."""
    init_carry, step_in, body = unipc_executor(
        core, schedule, cache_cfg=cache_cfg, guidance_scale=guidance_scale,
        lanes=lanes, combine_fn=combine_fn,
        skip_mask_override=skip_mask_override, batch=x_init.shape[0],
        dynamic_skip=dynamic_skip, emit_skips=return_skips,
        post_step=post_step)
    carry0 = init_carry(params, x_init, cond)
    (x_fin, _, _, _), aux = jax.lax.scan(body(params, cond), carry0, step_in)
    # after the final step the "predictor" output for sigma=0 is x_fin; the
    # corrected final sample is x_fin itself (terminal sigma 0 => x = m).
    if return_skips:
        return x_fin, aux
    return x_fin


def sample_dpm_cogvideo(
    core: DiTCore,
    params,
    x_init: jnp.ndarray,
    cond,
    schedule,                       # CogVideoDPMSchedule
    *,
    cache_cfg: Optional[MagCacheConfig] = None,
    guidance_scale: Optional[float] = None,
    lanes: Optional[int] = None,
    combine_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """DPM-Solver++ 2M sampler on the CogVideoX alpha schedule, with MagCache.

    Host-precomputed per-step coefficients (`CogVideoDPMSchedule.step_arrays`);
    the scanned body combines (x, m_i, m_{i-1}) linearly.
    """
    n = schedule.num_steps
    batch = x_init.shape[0]
    skip_mask, n_lanes, lane_of_row, partial_lanes = _lane_setup(
        cache_cfg, n, guidance_scale, lanes, combine_fn, batch)
    c_x, c_m0, c_m1, sa, sb = schedule.step_arrays()

    x_l0 = _stack_lanes(x_init, n_lanes)
    ts0 = jnp.asarray(schedule.timesteps[:1].astype(np.float32))
    cache0 = _init_cache(core, params, x_l0, ts0, cond)

    step_in = (
        jnp.asarray(schedule.timesteps.astype(np.float32)),
        jnp.asarray(skip_mask),
        jnp.asarray(c_x), jnp.asarray(c_m0), jnp.asarray(c_m1),
        jnp.asarray(sa), jnp.asarray(sb),
    )

    def body(carry, inp):
        x, m_prev, cache = carry
        t, skip_bits, cx, cm0, cm1, sat, sbt = inp
        x2 = _stack_lanes(x, n_lanes)
        tvec = jnp.full((x2.shape[0],), t, jnp.float32)
        hidden, ctx = core.prepare(params, x2, tvec, cond)
        h_out, cache, _ = _cached_trunk(core, params, hidden, ctx, cache,
                                        skip_bits, lane_of_row,
                                        partial_lanes=partial_lanes)
        out = core.head(params, h_out, ctx)
        v = _cfg_combine(out, guidance_scale, batch, combine_fn, n_lanes)
        m = sat * x - sbt * v.astype(x.dtype)
        x = cx * x + cm0 * m + cm1 * m_prev
        return (x, m, cache), None

    (x_fin, _, _), _ = jax.lax.scan(
        body, (x_init, jnp.zeros_like(x_init), cache0), step_in)
    return x_fin


def sample_pndm(
    core: DiTCore,
    params,
    x_init: jnp.ndarray,
    cond,
    schedule,                       # PNDMSchedule
    *,
    cache_cfg: Optional[MagCacheConfig] = None,
    guidance_scale: Optional[float] = None,
    lanes: Optional[int] = None,
    combine_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """PNDM/PLMS sampler (Open-Sora-Plan v1.1's scheduler) with MagCache:
    Adams-Bashforth epsilon history + host-precomputed (c_x, c_e) transfer,
    as one `lax.scan` over the n+1 plms iterations — the duplicated second
    timestep's Heun redo runs from the stashed counter-0 sample
    (schedulers/pndm.py documents the math)."""
    n = schedule.num_steps
    batch = x_init.shape[0]
    skip_mask, n_lanes, lane_of_row, partial_lanes = _lane_setup(
        cache_cfg, n, guidance_scale, lanes, combine_fn, batch)

    x_l0 = _stack_lanes(x_init, n_lanes)
    ts0 = jnp.asarray(schedule.timesteps[:1])
    cache0 = _init_cache(core, params, x_l0, ts0, cond)
    state0 = _init_trunk_state(core, params, x_l0, ts0, cond)
    e_hist0 = jnp.stack([jnp.zeros_like(x_init)] * 3)   # h0, h1, h2

    step_in = (
        jnp.arange(n),
        jnp.asarray(schedule.timesteps),
        jnp.asarray(skip_mask),
        jnp.asarray(schedule.c_x), jnp.asarray(schedule.c_e),
        jnp.asarray(schedule.eps_weights),
        jnp.asarray(schedule.push_eps), jnp.asarray(schedule.use_cur),
    )

    def body(carry, inp):
        x, e_hist, cache, state = carry
        idx, t, skip_bits, cx, ce, wts, push, use_cur = inp
        x2 = _stack_lanes(x, n_lanes)
        tvec = jnp.full((x2.shape[0],), t, jnp.float32)
        hidden, ctx = core.prepare(params, x2, tvec, cond)
        h_out, cache, state = _cached_trunk(core, params, hidden, ctx, cache,
                                            skip_bits, lane_of_row,
                                            state=state, step_idx=idx,
                                            partial_lanes=partial_lanes)
        out = core.head(params, h_out, ctx)
        e = _cfg_combine(out, guidance_scale, batch, combine_fn,
                         n_lanes).astype(x.dtype)
        e_all = jnp.concatenate([e[None], e_hist], axis=0)     # [4, ...]
        e_prime = jnp.tensordot(wts, e_all, axes=1)
        # counter 1 redoes the first transfer from the stashed counter-0
        # sample (x_init — cur_sample is only ever read there)
        base = jnp.where(use_cur.astype(bool), x_init, x)
        x = cx.astype(x.dtype) * base + ce.astype(x.dtype) * e_prime
        e_hist = jnp.where(push.astype(bool),
                           jnp.concatenate([e[None], e_hist[:-1]], axis=0),
                           e_hist)
        return (x, e_hist, cache, state), None

    (x_fin, _, _, _), _ = jax.lax.scan(
        body, (x_init, e_hist0, cache0, state0), step_in)
    return x_fin
