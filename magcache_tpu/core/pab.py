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

__all__ = ["PABConfig", "broadcast_masks", "mlp_skip_masks",
           "OPEN_SORA_PAB", "LATTE_PAB",
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

    # Block-granular MLP gating (``pab_mgr.py:108-139``): tuples of
    # ``(anchor_timestep, (block_idx, ...), skip_count)``. At an anchor step
    # the listed blocks compute their MLP and SAVE it; for the following
    # ``skip_count`` steps those blocks REPLAY the anchor's output. When
    # None, ``mlp_broadcast`` falls back to the all-blocks window+stride
    # rule above.
    mlp_spatial_config: Optional[Tuple[Tuple[int, Tuple[int, ...], int], ...]] = None
    mlp_temporal_config: Optional[Tuple[Tuple[int, Tuple[int, ...], int], ...]] = None


# Open-Sora defaults (videosys OpenSoraPABConfig: spatial/temporal 450-930,
# ranges 2/4; cross 450-930 range 6)
OPEN_SORA_PAB = PABConfig(
    spatial_broadcast=True, spatial_threshold=(450, 930), spatial_range=2,
    temporal_broadcast=True, temporal_threshold=(450, 930), temporal_range=4,
    cross_broadcast=True, cross_threshold=(450, 930), cross_range=6,
)

# Per-family defaults matching the reference's named PABConfig subclasses.
# The Latte/OSP-v110 configs additionally skip *MLP* outputs in the first
# few blocks at specific coarse timesteps (block-granular gating,
# ``pab_mgr.py:108-139``); the anchor/block/skip-count lists below transcribe
# ``pipeline_latte.py:47-61`` and ``pipeline_open_sora_plan.py:54-85``.
_LATTE_MLP = tuple((t, (0, 1, 2, 3, 4), 2)
                   for t in (720, 640, 560, 480, 400))
_OSP_V110_MLP = tuple((t, (0, 1, 2, 3, 4, 5, 6), 2)
                      for t in range(738, 425, -24))

LATTE_PAB = PABConfig(        # videosys LattePABConfig, pipeline_latte.py:35
    spatial_broadcast=True, spatial_threshold=(100, 800), spatial_range=2,
    temporal_broadcast=True, temporal_threshold=(100, 800), temporal_range=3,
    cross_broadcast=True, cross_threshold=(100, 800), cross_range=6,
    mlp_broadcast=True, mlp_spatial_config=_LATTE_MLP,
    mlp_temporal_config=_LATTE_MLP,
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
    mlp_broadcast=True, mlp_spatial_config=_OSP_V110_MLP,
    mlp_temporal_config=_OSP_V110_MLP,
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
    """bool[num_steps] per reuse type, from the (static) sampling timesteps.

    The ``mlp`` mask here is the all-blocks window+stride rule; models whose
    reference counterparts gate MLPs per block (Latte, OSP-v110) should use
    ``mlp_skip_masks`` instead."""
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


def _anchor_of(ts, t, config):
    """Transcription of ``PABManager._is_t_in_skip_config``
    (``pab_mgr.py:94-106``): first config key (dict order) whose
    ``[key, key+skip_count]`` slice of the sampled timesteps contains ``t``.
    Returns the anchor timestep or None."""
    for key in config:
        if key not in ts:
            continue
        idx = ts.index(key)
        rng = ts[idx:idx + 1 + int(config[key]["skip_count"])]
        if t in rng:
            return key
    return None


def mlp_skip_masks(cfg: PABConfig, timesteps: Sequence[float],
                   num_blocks: int, temporal: bool = False) -> dict:
    """Block-granular MLP gating masks (``pab_mgr.py:108-139``).

    Returns ``{"reuse": bool[steps, blocks], "save": bool[steps, blocks]}``:
    ``reuse`` replays the cached anchor output instead of computing;
    ``save`` stores the (computed) output into the cache. At an anchor step
    a listed block computes + saves (reference ``next_flag``); for the next
    ``skip_count`` steps it reuses. Blocks outside the list (or steps outside
    any anchor span) compute without touching the cache. Decisions are a pure
    function of (step index, config) — precomputed here as static masks, the
    same translation MagCache uses.

    Without a block config, falls back to the all-blocks window+stride rule
    broadcast over blocks (save = every computed step refreshes — matching
    the always-refresh semantics of the whole-layer path)."""
    ts = [int(t) for t in timesteps]
    n = len(ts)
    reuse = np.zeros((n, num_blocks), bool)
    save = np.zeros((n, num_blocks), bool)
    if not cfg.mlp_broadcast:
        return {"reuse": reuse, "save": save}
    conf = cfg.mlp_temporal_config if temporal else cfg.mlp_spatial_config
    if conf is None:
        m = _mask(True, cfg.mlp_threshold, cfg.mlp_range, ts)
        reuse[:] = m[:, None]
        save[:] = ~m[:, None]
        return {"reuse": reuse, "save": save}
    config = {int(t): {"block": tuple(blocks), "skip_count": int(sc)}
              for t, blocks, sc in conf}
    for i, t in enumerate(ts):
        anchor = _anchor_of(ts, t, config)
        for b in range(num_blocks):
            if t in config and b in config[t]["block"]:
                save[i, b] = True        # anchor: compute + save
            elif anchor is not None and b in config[anchor]["block"]:
                reuse[i, b] = True       # inside a span: replay the anchor
    return {"reuse": reuse, "save": save}
