"""Pyramid Attention Broadcast (PAB) — the reference's predecessor cache,
kept in-tree as a second strategy (``videosys/core/pab_mgr.py``).

PAB reuses *attention outputs* (spatial / temporal / cross) and MLP outputs
across adjacent diffusion steps inside a timestep window: reuse when
``count % range != 0 and lo < timestep < hi`` (``pab_mgr.py:54-91``), where
``count`` advances once per step — so, like MagCache, the decision is a pure
function of the step index and config, never of activations.

TPU translation: the per-(step, type) broadcast decisions are **precomputed
as boolean masks** (`broadcast_masks`) and the cached outputs live in the
sampler's trunk-state pytree, stacked per block (`DiTCore.init_state`
threading) — replacing the reference's global-singleton manager + per-module
mutable attributes with explicit scan state.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["PABConfig", "broadcast_masks", "OPEN_SORA_PAB", "LATTE_PAB",
           "COGVIDEOX_PAB", "VCHITECT_PAB", "OSP_V110_PAB", "OSP_V120_PAB",
           "OpenSoraPABConfig", "LattePABConfig", "CogVideoXPABConfig",
           "VchitectPABConfig", "OpenSoraPlanV110PABConfig",
           "OpenSoraPlanV120PABConfig"]


@dataclasses.dataclass(frozen=True)
class PABConfig:
    """Timestep-window + stride gating per reuse type (``pab_mgr.py:6-40``)."""

    spatial_broadcast: bool = False
    spatial_threshold: Tuple[int, int] = (0, 0)   # (lo, hi) exclusive window
    spatial_range: int = 2

    temporal_broadcast: bool = False
    temporal_threshold: Tuple[int, int] = (0, 0)
    temporal_range: int = 2

    cross_broadcast: bool = False
    cross_threshold: Tuple[int, int] = (0, 0)
    cross_range: int = 2

    mlp_broadcast: bool = False
    mlp_threshold: Tuple[int, int] = (0, 0)
    mlp_range: int = 2


# Open-Sora defaults (videosys OpenSoraPABConfig: spatial/temporal 450-930,
# ranges 2/4; cross 450-930 range 6)
OPEN_SORA_PAB = PABConfig(
    spatial_broadcast=True, spatial_threshold=(450, 930), spatial_range=2,
    temporal_broadcast=True, temporal_threshold=(450, 930), temporal_range=4,
    cross_broadcast=True, cross_threshold=(450, 930), cross_range=6,
)

# Per-family defaults matching the reference's named PABConfig subclasses.
# The reference's Latte/OSP-v110 configs additionally skip *MLP* outputs in
# the first few blocks at a handful of coarse timesteps
# (``pipeline_latte.py:47-61`` mlp_*_broadcast_config); that block-granular
# gating is not reproduced — mlp reuse here is all-blocks window+stride, so
# the presets leave it off (enable via ``mlp_broadcast=True`` explicitly).
LATTE_PAB = PABConfig(        # videosys LattePABConfig, pipeline_latte.py:35
    spatial_broadcast=True, spatial_threshold=(100, 800), spatial_range=2,
    temporal_broadcast=True, temporal_threshold=(100, 800), temporal_range=3,
    cross_broadcast=True, cross_threshold=(100, 800), cross_range=6,
)
COGVIDEOX_PAB = PABConfig(    # CogVideoXPABConfig, pipeline_cogvideox.py:34
    spatial_broadcast=True, spatial_threshold=(100, 850), spatial_range=2,
)
VCHITECT_PAB = PABConfig(     # VchitectPABConfig, pipeline_vchitect.py:32
    spatial_broadcast=True, spatial_threshold=(100, 800), spatial_range=2,
    temporal_broadcast=True, temporal_threshold=(100, 800), temporal_range=4,
    cross_broadcast=True, cross_threshold=(100, 800), cross_range=6,
)
OSP_V110_PAB = PABConfig(     # OpenSoraPlanV110PABConfig
    spatial_broadcast=True, spatial_threshold=(100, 850), spatial_range=2,
    temporal_broadcast=True, temporal_threshold=(100, 850), temporal_range=4,
    cross_broadcast=True, cross_threshold=(100, 850), cross_range=6,
)
OSP_V120_PAB = PABConfig(     # OpenSoraPlanV120PABConfig
    spatial_broadcast=True, spatial_threshold=(100, 850), spatial_range=2,
    cross_broadcast=True, cross_threshold=(100, 850), cross_range=6,
)


def _preset_factory(preset: PABConfig):
    def factory(**overrides) -> PABConfig:
        return dataclasses.replace(preset, **overrides)
    return factory


# Reference-named constructors (``videosys/__init__.py`` export surface):
# callables returning a PABConfig with that family's defaults, overridable
# field-by-field like the reference's keyword arguments.
OpenSoraPABConfig = _preset_factory(OPEN_SORA_PAB)
LattePABConfig = _preset_factory(LATTE_PAB)
CogVideoXPABConfig = _preset_factory(COGVIDEOX_PAB)
VchitectPABConfig = _preset_factory(VCHITECT_PAB)
OpenSoraPlanV110PABConfig = _preset_factory(OSP_V110_PAB)
OpenSoraPlanV120PABConfig = _preset_factory(OSP_V120_PAB)


def _mask(enabled, lo_hi, stride, timesteps):
    lo, hi = lo_hi
    out = np.zeros(len(timesteps), bool)
    if not enabled:
        return out
    for count, t in enumerate(timesteps):
        # count advances every step (pab_mgr.py:65-66); reuse when not on the
        # refresh stride and inside the window
        if count % stride != 0 and lo < t < hi:
            out[count] = True
    return out


def broadcast_masks(cfg: PABConfig, timesteps: Sequence[float]) -> dict:
    """bool[num_steps] per reuse type, from the (static) sampling timesteps."""
    ts = [int(t) for t in timesteps]
    return {
        "spatial": _mask(cfg.spatial_broadcast, cfg.spatial_threshold,
                         cfg.spatial_range, ts),
        "temporal": _mask(cfg.temporal_broadcast, cfg.temporal_threshold,
                          cfg.temporal_range, ts),
        "cross": _mask(cfg.cross_broadcast, cfg.cross_threshold,
                       cfg.cross_range, ts),
        "mlp": _mask(cfg.mlp_broadcast, cfg.mlp_threshold, cfg.mlp_range, ts),
    }
