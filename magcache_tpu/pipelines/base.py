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
    """generate(...) is the single entry point; __call__ aliases it."""

    def generate(self, prompt, **kwargs) -> PipelineOutput:
        raise NotImplementedError

    def __call__(self, *args, **kwargs) -> PipelineOutput:
        return self.generate(*args, **kwargs)
