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
                             retention: float = 0.2) -> np.ndarray:
    """bool[num_forwards] skip bits — direct transcription of the eval
    decision loop (``wan_magcache.py:770-789``). ``ratios`` covers forwards
    ``cache_time ..``; when its length differs from
    ``num_forwards - cache_time`` it is nearest-index resampled per lane
    (the reference script only supports the exact 50-step table)."""
    need = num_forwards - cache_time
    r = np.asarray(ratios, np.float64)
    if len(r) != need:
        # resample each lane's sub-sequence to preserve the cond/uncond
        # interleaving (even/odd forwards carry distinct trajectories)
        half = need // 2 + (need % 2)
        src = r.reshape(-1, 2)
        idx = np.minimum((np.arange(half) * len(src)) // max(half, 1),
                         len(src) - 1)
        r = src[idx].reshape(-1)[:need]
    skip = np.zeros(num_forwards, bool)
    # the reference assumes skip_time >= cache_time (true at 50 steps: 20 vs
    # 10); at smaller runs forwards before cache_time have no recorded
    # residual, so they stay compute-only rather than replicating the
    # script's silent negative-index wrap
    skip_time = max(int(num_forwards * retention), cache_time)
    acc_sim = [1.0, 1.0]
    acc_steps = [0, 0]
    acc_err = [0.0, 0.0]
    for t in range(num_forwards):
        if t < skip_time:
            continue
        lane = t % 2
        cur = r[t - cache_time]
        acc_sim[lane] *= cur
        acc_steps[lane] += 1
        acc_err[lane] += abs(1.0 - acc_sim[lane])
        if acc_err[lane] <= thresh and acc_steps[lane] <= K:
            skip[t] = True
        else:
            acc_sim[lane] = 1.0
            acc_steps[lane] = 0
            acc_err[lane] = 0.0
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
    ratios: Optional[Tuple[float, ...]] = None   # default: published table

    def skip_schedule(self) -> np.ndarray:
        r = (np.asarray(self.ratios, np.float64) if self.ratios is not None
             else load_eval_ratios())
        return compute_rolling_schedule(
            self.num_steps, r, self.thresh, self.K,
            cache_time=self.cache_time, retention=self.retention)
