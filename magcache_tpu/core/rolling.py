"""Rolling-cache MagCache — the C2 *eval-variant* policy that produced the
published Wan VBench numbers.

The eval scripts run a different forward from the release adapters
(``eval/magcache/experiments/Wan2.1_EVAL/wan_magcache.py:683-817``):

- forward counter ``t`` over *forwards* (2/step, cond at even, uncond at odd);
- ``skip_time = int(num_forwards * 0.2)``: the first 20% of forwards always
  compute (vs the adapters' ``retention_ratio`` over scheduler steps);
- ``cache_time = 10``: the per-forward ratio table starts at forward 10
  (``self.ratio[self.t - 10]``) and residuals are only recorded from there;
- per-lane accumulators (``t % 2``): ``sim *= ratio; steps += 1;
  err += |1 - sim|``; skip while ``err <= E and steps <= K`` (both
  *inclusive* — the adapters use ``steps < K``), reset on compute;
- no forced-compute quirks (no FLUX step-11 rule, no ratio-deviation guard);
- residuals live in a k-deep rolling queue (``push_tensor_roll``,
  ``experiments/opensora.py:13-31``) — but the shipped scripts allocate depth
  k=1 and only ever consume ``queue[..., -1]`` (the deep-reuse branch is
  commented out), so the queue degenerates to the standard newest-residual
  slot. We therefore reuse the samplers' residual cache unchanged; only the
  *decision schedule* differs.

Like the adapter policy, the decision depends only on the published ratio
table and the counters — it is fully static, so it compiles into the same
``skip_mask_override``/lane machinery as MagCache (zero per-step overhead).

Published ratio table: ``data/eval_rolling_ratios.json`` (the eval forward
applies ``**0.5`` before use — done at load here, ``wan_magcache.py:1144``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import numpy as np

__all__ = ["RollingCacheConfig", "compute_rolling_schedule",
           "load_eval_ratios"]

_RATIOS = None


def load_eval_ratios(key: str = "wan-t2v-50step") -> np.ndarray:
    """Published eval-calibration ratios (sqrt applied, reference :1144)."""
    global _RATIOS
    if _RATIOS is None:
        path = os.path.join(os.path.dirname(__file__), "..", "data",
                            "eval_rolling_ratios.json")
        with open(path) as f:
            _RATIOS = json.load(f)
    return np.sqrt(np.asarray(_RATIOS[key], np.float64))


def compute_rolling_schedule(num_forwards: int, ratios: np.ndarray,
                             thresh: float, K: int, *,
                             cache_time: int = 10,
                             retention: float = 0.2,
                             lanes: int = 2,
                             use_abs: bool = True,
                             skip_time: Optional[int] = None) -> np.ndarray:
    """bool[num_forwards] skip bits — direct transcription of the eval
    decision loops:

    - Wan (``wan_magcache.py:770-789``): ``lanes=2`` cond/uncond counters,
      ``err += |1 - sim|``, ratio indexed ``[t - cache_time]`` (table starts
      at forward 10), ``skip_time = int(num_forwards * retention)``;
    - Open-Sora (``experiments/opensora.py:296-312``): ``lanes=1`` (joint
      CFG batch), ``err += 1 - sim`` (no abs), ratio indexed ``[t - 1]``
      (``cache_time=1``), explicit ``skip_time`` (6 at 30 steps).

    ``ratios`` covers forwards ``cache_time ..``; when its length differs
    from ``num_forwards - cache_time`` it is nearest-index resampled per
    lane (the reference scripts only support their exact step counts)."""
    need = num_forwards - cache_time
    r = np.asarray(ratios, np.float64)
    # the ratio table interleaves lanes starting at forward ``cache_time``;
    # ``r[t - cache_time]`` lands on lane ``t % lanes`` only when cache_time
    # is lane-aligned (10 and 1 in the references both are)
    assert lanes == 1 or cache_time % lanes == 0, (cache_time, lanes)
    if len(r) != need:
        assert len(r) >= lanes, (
            f"ratio table too short to resample per lane: {len(r)} < {lanes}")
        # resample each lane's sub-sequence to preserve the interleaving
        # (cond/uncond forwards carry distinct trajectories when lanes=2)
        per = need // lanes + (1 if need % lanes else 0)
        src = r[:len(r) - (len(r) % lanes) or None].reshape(-1, lanes)
        idx = np.minimum((np.arange(per) * len(src)) // max(per, 1),
                         len(src) - 1)
        r = src[idx].reshape(-1)[:need]
    skip = np.zeros(num_forwards, bool)
    # the references assume skip_time >= cache_time; at smaller runs
    # forwards before cache_time have no recorded residual, so they stay
    # compute-only rather than replicating the silent negative-index wrap
    if skip_time is None:
        skip_time = int(num_forwards * retention)
    skip_time = max(skip_time, cache_time)
    acc_sim = [1.0] * lanes
    acc_steps = [0] * lanes
    acc_err = [0.0] * lanes
    for t in range(num_forwards):
        if t < skip_time:
            continue
        lane = t % lanes
        cur = r[t - cache_time]
        acc_sim[lane] *= cur
        acc_steps[lane] += 1
        err = 1.0 - acc_sim[lane]
        acc_err[lane] += abs(err) if use_abs else err
        if acc_err[lane] <= thresh and acc_steps[lane] <= K:
            skip[t] = True
        else:
            acc_sim[lane] = 1.0
            acc_steps[lane] = 0
            acc_err[lane] = 0.0
    if not skip.any():
        # the eval scripts' argparse defaults (thresh=0.015, K=-1) are
        # deliberately inert — acc_steps is incremented before the <=K check,
        # so K=-1 can never skip; the published VBench runs passed
        # --magcache_thresh 0.12 --magcache_K 2/4 (wan_eval.sh). Warn so a
        # bare `--cache_policy rolling` run isn't mistaken for a cached one.
        from magcache_tpu.utils.logging import get_logger
        get_logger(__name__).warning(
            "rolling cache schedule has ZERO skips (thresh=%s K=%s) — the "
            "reference eval defaults are inert; the published runs used "
            "--magcache_thresh 0.12 --magcache_K 2 (or 4)", thresh, K)
    return skip


@dataclasses.dataclass(frozen=True)
class RollingCacheConfig:
    """Drop-in ``cache_cfg`` for the samplers (duck-typed via
    ``skip_schedule()`` — see ``core.sampler._lane_masks``)."""

    num_steps: int                       # forwards = scheduler steps * lanes
    thresh: float = 0.12
    K: int = 2
    lanes: int = 2
    cache_time: int = 10
    retention: float = 0.2
    use_abs: bool = True
    skip_time: Optional[int] = None
    ratios: Optional[Tuple[float, ...]] = None   # default: published table

    def skip_schedule(self) -> np.ndarray:
        r = (np.asarray(self.ratios, np.float64) if self.ratios is not None
             else load_eval_ratios())
        return compute_rolling_schedule(
            self.num_steps, r, self.thresh, self.K,
            cache_time=self.cache_time, retention=self.retention,
            lanes=self.lanes, use_abs=self.use_abs,
            skip_time=self.skip_time)

    @staticmethod
    def opensora(num_steps: int, thresh: float = 0.12, K: int = 3,
                 skip_time: Optional[int] = None) -> "RollingCacheConfig":
        """The Open-Sora eval configuration (``experiments/opensora.py:
        411-440``): single lane over the joint CFG batch, ratio[t-1] table,
        non-abs error, skip_time=6 at 30 steps (0.2 retention)."""
        return RollingCacheConfig(
            num_steps=num_steps, thresh=thresh, K=K, lanes=1, cache_time=1,
            use_abs=False, skip_time=skip_time,
            ratios=tuple(load_eval_ratios("opensora-30step")))
