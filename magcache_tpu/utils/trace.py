"""Observability: step timing, skip-event logging, and profiler hooks.

The reference's observability is wall-clock prints around generate
(``experiments/Wan2.1_EVAL/wan_magcache.py:1157-1180``), printed skip events
(``wan_magcache.py:790``) and tqdm bars (``scheduling_rflow_open_sora.py:219``).
Equivalents here:

- `StepTimer` — wall-clock sections with a summary table;
- `log_skip_schedule` — prints the precomputed skip schedule up front (with a
  static schedule the full skip report exists *before* the run — strictly more
  informative than the reference's per-step prints);
- `profile_trace` — wraps `jax.profiler.trace` for TensorBoard-viewable TPU
  traces (the native replacement for "none in-tree").
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np

from magcache_tpu.core.magcache import MagCacheConfig, compute_skip_schedule
from magcache_tpu.utils.logging import get_logger

logger = get_logger(__name__)

__all__ = ["StepTimer", "log_skip_schedule", "profile_trace"]


class StepTimer:
    """Accumulate named wall-clock sections; print a summary."""

    def __init__(self):
        self.sections: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> str:
        rows = []
        for name, vals in self.sections.items():
            v = np.asarray(vals)
            rows.append(f"{name:24s} n={len(v):3d} total={v.sum():8.2f}s "
                        f"mean={v.mean():7.3f}s p50={np.median(v):7.3f}s")
        return "\n".join(rows)

    def log_summary(self):
        for line in self.summary().splitlines():
            logger.info(line)


def log_skip_schedule(cfg: MagCacheConfig, name: str = "magcache") -> np.ndarray:
    """Print which forwards the schedule elides (reference prints skip events
    per step; with a static schedule we can report everything up front)."""
    sched = compute_skip_schedule(cfg)
    skipped = np.flatnonzero(sched)
    logger.info(
        "%s: skipping %d/%d forwards (E=%.3g K=%d R=%.2g) at cnt=%s",
        name, len(skipped), cfg.num_steps, cfg.thresh,
        cfg.max_consecutive_skips, cfg.retention_ratio, skipped.tolist())
    return sched


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """TPU profiler trace (view in TensorBoard / xprof); no-op if dir is None."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
