"""The MagCache decision algebra, as a pure functional library.

MagCache (arXiv:2506.09045) skips diffusion-transformer trunk evaluations by
replaying a cached trunk residual whenever the *predicted* relative error of
doing so — derived from pre-calibrated per-step magnitude ratios — stays under
an error budget.  The recurrence (reference:
``MagCache4Wan2.1/magcache_generate.py:279-301``) is, per forward index ``cnt``
with lane ``l = cnt % lanes``::

    if gate(cnt):                             # retention gate: never skip early steps
        acc_ratio[l] *= mag_ratios[cnt]
        acc_steps[l] += 1
        acc_err[l]   += |1 - acc_ratio[l]|
        if acc_err[l] ⋖ E and acc_steps[l] <= K and extra_guards(cnt):
            skip = True                        # replay cached residual
        else:
            acc_{err,steps}[l] = 0; acc_ratio[l] = 1.0   # reset, force compute

Crucially the decision depends only on ``(cnt, mag_ratios, E, K, R)`` — never
on activations.  On TPU this means the whole skip schedule can be *precomputed
on the host* (`compute_skip_schedule`) and baked into the jitted denoise loop
as a static boolean array, so XLA sees fixed-shape control flow and a skipped
step compiles to a single residual add.  A dynamic in-graph mode
(`dynamic_init` / `dynamic_update`) is kept for reference-parity testing; the
two must always produce identical schedules (property-tested).

Per-model quirks captured here (all cited against the reference):

- retention gate rounding: Wan/Qwen use ``cnt >= int(N*R)``
  (``magcache_generate.py:279``); FLUX rounds: ``cnt >= int(R*N + 0.5)``
  (``MagCache4FLUX/magcache_flux.py:327``).
- error-budget strictness: Wan/Qwen use ``err < E``
  (``magcache_generate.py:285``); FLUX/FramePack use ``err <= E``
  (``magcache_flux.py:332``, ``MagCache4FramePack/magcache_demo_gradio.py:265``).
- FLUX forces compute at the canonical 28-step index 11:
  ``round(cnt*(28-1)/(N-1)) != 11`` (``magcache_flux.py:332``); same for
  Kontext (``magcache_flux_kontext.py:334``).
- FramePack adds a per-step ratio guard ``|1 - mag_ratios[cnt]| <= 0.06`` and a
  ``cnt >= 1`` floor (``magcache_demo_gradio.py:259-265``).
- Wan2.2 two-expert (high/low-noise) models re-gate retention around the
  expert boundary ``split_step`` per task mode
  (``MagCache4Wan2.2/magcache_generate.py:294-303``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "MagCacheConfig",
    "MagCacheState",
    "compute_skip_schedule",
    "dynamic_init",
    "dynamic_update",
    "nearest_interp",
    "prepare_mag_ratios",
]


def nearest_interp(src_array: np.ndarray, target_length: int) -> np.ndarray:
    """Nearest-neighbour resample of a calibrated ratio array to a new step count.

    Exact semantics of the reference ``nearest_interp``
    (``MagCache4Wan2.1/magcache_generate.py:27-34``): index map
    ``round(arange(T) * (S-1)/(T-1))``; a target length of 1 returns the last
    element.
    """
    src_array = np.asarray(src_array)
    src_length = len(src_array)
    if target_length == 1:
        return src_array[-1:]
    scale = (src_length - 1) / (target_length - 1)
    mapped = np.round(np.arange(target_length) * scale).astype(int)
    return src_array[mapped]


def prepare_mag_ratios(
    raw_ratios: Sequence[float],
    num_steps: int,
    lanes: int = 1,
    pad: Optional[int] = None,
) -> np.ndarray:
    """Pad and resample calibrated ratios to ``num_steps`` forward indices.

    Mirrors the reference installation logic: calibrated arrays are prepended
    with ``[1.0] * lanes`` padding (the first residual has no predecessor;
    ``magcache_generate.py:908-912``), then, when the requested step count
    differs, each CFG lane's subsequence is nearest-resampled independently and
    re-interleaved (``magcache_generate.py:914-919``;
    single-lane: ``magcache_flux.py:461-463``).

    Args:
      raw_ratios: the calibrated ratios (without padding).
      num_steps: total forward count (``sample_steps * lanes`` for sequential
        CFG models).
      lanes: number of CFG cache lanes (1 = distilled, 2 = cond/uncond).
      pad: how many 1.0 entries to prepend; defaults to ``lanes``.
    """
    pad = lanes if pad is None else pad
    ratios = np.concatenate([np.ones(pad), np.asarray(raw_ratios, dtype=np.float64)])
    if len(ratios) != num_steps:
        if lanes == 1:
            ratios = nearest_interp(ratios, num_steps)
        else:
            assert num_steps % lanes == 0, (num_steps, lanes)
            per_lane = num_steps // lanes
            cols = [nearest_interp(ratios[l::lanes], per_lane) for l in range(lanes)]
            ratios = np.stack(cols, axis=1).reshape(-1)
    return ratios.astype(np.float64)


@dataclasses.dataclass(frozen=True)
class MagCacheConfig:
    """Static configuration for one MagCache run (hashable; safe as a jit static arg).

    Attributes mirror the reference's E/K/R triple plus per-model quirk flags.
    """

    num_steps: int                       # total forward count (steps * lanes if sequential CFG)
    mag_ratios: Tuple[float, ...]        # len == num_steps, already padded/resampled
    thresh: float = 0.12                 # E, accumulated-error budget
    max_consecutive_skips: int = 2       # K
    retention_ratio: float = 0.2         # R, fraction of early steps always computed
    lanes: int = 1                       # CFG cache lanes; lane of forward i is i % lanes

    # --- quirk flags (defaults = Wan2.1 semantics) ---
    gate_rounds: bool = False            # True: gate at int(R*N + 0.5) (FLUX)
    err_inclusive: bool = False          # True: skip while err <= E (FLUX/FramePack)
    min_gate_step: int = 0               # FramePack: cnt >= 1 floor
    max_ratio_deviation: Optional[float] = None   # FramePack: |1-ratio[cnt]| <= 0.06
    forced_compute_canonical: Tuple[int, ...] = ()  # FLUX: canonical step ids never skipped
    canonical_num_steps: Optional[int] = None       # FLUX: 28
    split_step: Optional[int] = None     # Wan2.2: expert boundary (in forward indices)
    mode: str = "t2v"                    # Wan2.2 gating mode: "t2v" | "i2v" | "ti2v"

    def __post_init__(self):
        object.__setattr__(self, "mag_ratios", tuple(float(r) for r in self.mag_ratios))
        assert len(self.mag_ratios) == self.num_steps, (
            f"mag_ratios length {len(self.mag_ratios)} != num_steps {self.num_steps}; "
            "run prepare_mag_ratios() first"
        )

    # -- retention gate ----------------------------------------------------
    def gate_open(self, cnt: int) -> bool:
        """True when MagCache may consider skipping forward index ``cnt``.

        Wan2.1: ``cnt >= int(N*R)`` (``magcache_generate.py:279``).
        FLUX:   ``cnt >= int(R*N+0.5)`` (``magcache_flux.py:327``).
        FramePack adds ``cnt >= 1`` (``magcache_demo_gradio.py:259``).
        Wan2.2 split-expert gating (``MagCache4Wan2.2/magcache_generate.py:294-303``):
          i2v: gate opens at ``int(split + (N-split)*R)``;
          t2v: closed while ``cnt < int(split*R)`` and re-closed on
               ``split <= cnt <= (N-split)*R + split``.
        """
        n, r = self.num_steps, self.retention_ratio
        if self.split_step is not None:
            ss = self.split_step
            if self.mode == "i2v":
                if cnt < int(ss + (n - ss) * r):
                    return False
            else:  # t2v
                if cnt < int(ss * r) or (ss <= cnt <= (n - ss) * r + ss):
                    return False
        else:
            gate = int(n * r + 0.5) if self.gate_rounds else int(n * r)
            if cnt < gate:
                return False
        return cnt >= self.min_gate_step

    def forced_compute(self, cnt: int) -> bool:
        """FLUX-style canonical-step exclusion (``magcache_flux.py:332``)."""
        if not self.forced_compute_canonical:
            return False
        cn = self.canonical_num_steps
        canonical = int(np.round(cnt * ((cn - 1) / (self.num_steps - 1))))
        return canonical in self.forced_compute_canonical


def compute_skip_schedule(cfg: MagCacheConfig) -> np.ndarray:
    """Run the scalar recurrence on the host and return ``bool[num_steps]``.

    This is simultaneously (a) the numpy oracle the dynamic mode is tested
    against and (b) the static skip schedule baked into the jitted sampler —
    valid because the reference decision never looks at activations
    (``magcache_generate.py:279-292``: pure scalar/numpy math).
    """
    ratios = np.asarray(cfg.mag_ratios, dtype=np.float64)
    acc_ratio = np.ones(cfg.lanes)
    acc_err = np.zeros(cfg.lanes)
    acc_steps = np.zeros(cfg.lanes, dtype=np.int64)
    skip = np.zeros(cfg.num_steps, dtype=bool)
    for cnt in range(cfg.num_steps):
        lane = cnt % cfg.lanes
        if not cfg.gate_open(cnt):
            continue
        acc_ratio[lane] *= ratios[cnt]
        acc_steps[lane] += 1
        acc_err[lane] += abs(1.0 - acc_ratio[lane])
        if cfg.err_inclusive:
            ok = acc_err[lane] <= cfg.thresh
        else:
            ok = acc_err[lane] < cfg.thresh
        ok = ok and acc_steps[lane] <= cfg.max_consecutive_skips
        if cfg.max_ratio_deviation is not None:
            ok = ok and abs(1.0 - ratios[cnt]) <= cfg.max_ratio_deviation
        ok = ok and not cfg.forced_compute(cnt)
        if ok:
            skip[cnt] = True
        else:
            acc_ratio[lane] = 1.0
            acc_err[lane] = 0.0
            acc_steps[lane] = 0
    return skip


# --------------------------------------------------------------------------
# Dynamic (in-graph) mode — reference-parity path.
#
# The same recurrence expressed on traced scalars carried through `lax.scan`.
# Used to validate the static schedule and for workloads where mag_ratios are
# themselves computed on device (e.g. online calibration).
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MagCacheState:
    """Per-lane scalar carry for the dynamic decision path (a pytree)."""

    acc_ratio: jax.Array   # f32[lanes]
    acc_err: jax.Array     # f32[lanes]
    acc_steps: jax.Array   # i32[lanes]


def dynamic_init(cfg: MagCacheConfig) -> MagCacheState:
    return MagCacheState(
        acc_ratio=jnp.ones((cfg.lanes,), jnp.float32),
        acc_err=jnp.zeros((cfg.lanes,), jnp.float32),
        acc_steps=jnp.zeros((cfg.lanes,), jnp.int32),
    )


def dynamic_update(
    state: MagCacheState, cnt: jax.Array, cfg: MagCacheConfig
) -> Tuple[jax.Array, MagCacheState]:
    """One decision step on traced values. Returns ``(skip: bool[], new_state)``.

    ``cnt`` is the traced forward index (i32 scalar); all config-derived
    quantities are static, so the gate and guards lower to cheap scalar ops.
    """
    ratios = jnp.asarray(np.asarray(cfg.mag_ratios), jnp.float32)
    gate_mask = jnp.asarray(
        np.array([cfg.gate_open(i) for i in range(cfg.num_steps)]), jnp.bool_
    )
    forced_mask = jnp.asarray(
        np.array([cfg.forced_compute(i) for i in range(cfg.num_steps)]), jnp.bool_
    )
    lane = jnp.mod(cnt, cfg.lanes)
    gated = gate_mask[cnt]
    cur_ratio = ratios[cnt]

    new_ratio = state.acc_ratio.at[lane].multiply(cur_ratio)
    new_steps = state.acc_steps.at[lane].add(1)
    new_err = state.acc_err.at[lane].add(jnp.abs(1.0 - new_ratio[lane]))

    if cfg.err_inclusive:
        ok = new_err[lane] <= cfg.thresh
    else:
        ok = new_err[lane] < cfg.thresh
    ok = ok & (new_steps[lane] <= cfg.max_consecutive_skips)
    if cfg.max_ratio_deviation is not None:
        ok = ok & (jnp.abs(1.0 - cur_ratio) <= cfg.max_ratio_deviation)
    ok = ok & ~forced_mask[cnt]

    skip = gated & ok
    reset = gated & ~ok

    sel = lambda on_reset, updated, old: jnp.where(
        reset, on_reset, jnp.where(gated, updated, old)
    )
    out = MagCacheState(
        acc_ratio=sel(state.acc_ratio.at[lane].set(1.0), new_ratio, state.acc_ratio),
        acc_err=sel(state.acc_err.at[lane].set(0.0), new_err, state.acc_err),
        acc_steps=sel(state.acc_steps.at[lane].set(0), new_steps, state.acc_steps),
    )
    return skip, out
