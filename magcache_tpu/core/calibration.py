"""Calibration mode: record per-step magnitude-ratio statistics of trunk residuals.

Reference semantics (``MagCache4Wan2.1/magcache_generate.py:160-193``): run the
model full-compute and, for each forward index ``cnt >= lanes``, compare the
current trunk residual against the *same-lane* previous one
(``residual_cache[cnt % 2]``):

    ratio_tok  = ||r_t||_dim / ||r_{t-lanes}||_dim          (per token)
    norm_ratio = mean(ratio_tok)        # NOT the ratio of global norms
    norm_std   = std(ratio_tok)         # torch unbiased std (ddof=1)
    cos_dis    = mean(1 - cos_sim(r_t, r_prev, dim=-1, eps=1e-8))

all rounded to 5 decimals and dumped to JSON side-files
(``save_json("wan2_1_mag_ratio", ...)``, ``magcache_generate.py:36-38,191-193``).
The recorded ``norm_ratio`` array becomes the ``mag_ratios`` constant for the
skip mode (after ``[1.0]*lanes`` padding).
"""

from __future__ import annotations

import dataclasses
import json
from typing import List

import jax.numpy as jnp
import numpy as np

__all__ = ["calibration_stats", "CalibrationRecorder"]


def calibration_stats(residual: jnp.ndarray, prev_residual: jnp.ndarray) -> jnp.ndarray:
    """Compute (norm_ratio, norm_std, cos_dis) for one residual pair on device.

    ``residual`` has shape ``[..., tokens, dim]``; statistics are taken over
    all token positions (matching ``residual_x.norm(dim=-1)`` then ``.mean()``
    over the remaining axes, ``magcache_generate.py:166-169``).
    Returns an f32[3] array so a single host transfer fetches all three.
    """
    r = residual.astype(jnp.float32)
    p = prev_residual.astype(jnp.float32)
    r_norm = jnp.linalg.norm(r, axis=-1)
    p_norm = jnp.linalg.norm(p, axis=-1)
    ratio_tok = r_norm / p_norm
    norm_ratio = jnp.mean(ratio_tok)
    # torch.Tensor.std() is unbiased (ddof=1); match it. (ddof=0 when a single
    # token, where the unbiased estimator is undefined.)
    norm_std = jnp.std(ratio_tok, ddof=1 if ratio_tok.size > 1 else 0)
    eps = 1e-8
    cos = jnp.sum(r * p, axis=-1) / jnp.maximum(r_norm * p_norm, eps)
    cos_dis = jnp.mean(1.0 - cos)
    return jnp.stack([norm_ratio, norm_std, cos_dis])


@dataclasses.dataclass
class CalibrationRecorder:
    """Host-side accumulator mirroring the reference's list-append + JSON dump."""

    lanes: int = 1
    norm_ratio: List[float] = dataclasses.field(default_factory=list)
    norm_std: List[float] = dataclasses.field(default_factory=list)
    cos_dis: List[float] = dataclasses.field(default_factory=list)

    def record(self, stats: np.ndarray) -> None:
        stats = np.asarray(stats, dtype=np.float64)
        self.norm_ratio.append(round(float(stats[0]), 5))
        self.norm_std.append(round(float(stats[1]), 5))
        self.cos_dis.append(round(float(stats[2]), 5))

    def record_batch(self, stats: np.ndarray) -> None:
        """Record a whole run's worth of stats, shape [n, 3] in forward order."""
        for row in np.asarray(stats):
            self.record(row)

    def mag_ratios(self) -> np.ndarray:
        """The calibrated array ready for `prepare_mag_ratios` (unpadded)."""
        return np.asarray(self.norm_ratio, dtype=np.float64)

    def save(self, prefix: str) -> None:
        """Dump `<prefix>_mag_ratio.json` etc., like the reference's save_json
        (``magcache_generate.py:36-38,191-193``)."""
        for name, data in [
            ("mag_ratio", self.norm_ratio),
            ("mag_std", self.norm_std),
            ("cos_dis", self.cos_dis),
        ]:
            with open(f"{prefix}_{name}.json", "w") as f:
                json.dump(data, f)
