"""Pipeline base: the `Config -> Pipeline.generate()` convention.

Mirrors the reference's user API shape — ``VideoSysPipeline.generate`` with
``__call__`` alias (``videosys/core/pipeline.py:10-48``) and the per-model
Config objects that declare sampling + parallel + cache settings
(``pipeline_open_sora.py:72-163``) — re-founded on jitted JAX stages.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PipelineOutput:
    latents: jnp.ndarray
    video: Optional[np.ndarray] = None   # [T, H, W, 3] uint8 when decoded
    image: Optional[np.ndarray] = None   # [H, W, 3] uint8 when decoded
    calibration: Optional[dict] = None   # calibration-mode artifacts
    timings: Optional[dict] = None
    skips: Optional[np.ndarray] = None   # realized skip bits (record_skips)


class BasePipeline:
    """generate(...) is the single entry point; __call__ aliases it.

    Pipelines that support per-request cache-schedule overrides (the
    one-program-many-schedules serving surface, reference engine kwarg
    pass-through ``videosys/core/engine.py:100-101``) define
    ``skip_mask_for(thresh, K, retention_ratio, use_magcache)`` — typically
    via `_skip_mask_from_cfg` below — and accept
    ``generate(skip_override=...)``. The serving layer feature-detects
    ``skip_mask_for`` and 400-rejects overrides for pipelines without it."""

    def generate(self, prompt, **kwargs) -> PipelineOutput:
        raise NotImplementedError

    def __call__(self, *args, **kwargs) -> PipelineOutput:
        return self.generate(*args, **kwargs)

    @staticmethod
    def _skip_mask_from_cfg(cache_cfg, use_magcache: bool = True
                            ) -> np.ndarray:
        """Host-precompute the ``bool[num_steps, lanes]`` skip mask of a
        MagCacheConfig (all-False = full compute). Feeding it to
        ``generate(skip_override=...)`` runs any E/K/R triple through ONE
        compiled program (the sampler's ``skip_mask_override``)."""
        from magcache_tpu.core.sampler import _lane_masks
        steps = cache_cfg.num_steps // cache_cfg.lanes
        if not use_magcache:
            return np.zeros((steps, cache_cfg.lanes), bool)
        mask, _ = _lane_masks(cache_cfg, steps)
        return mask


def calibration_dict(stats) -> dict:
    """Flatten sampler calibration stats [steps-1, lanes, 3] into the
    reference's printed lists (norm_ratio / norm_std / cos_dis in flat cnt
    order, 5-decimal rounding — ``magcache_generate.py:921-928``)."""
    import jax

    flat = np.asarray(jax.device_get(stats)).reshape(-1, 3)
    return {
        "norm_ratio": [round(float(v), 5) for v in flat[:, 0]],
        "norm_std": [round(float(v), 5) for v in flat[:, 1]],
        "cos_dis": [round(float(v), 5) for v in flat[:, 2]],
    }
