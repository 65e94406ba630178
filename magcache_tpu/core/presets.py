"""Per-model MagCache presets: default E/K/R triples + quirk flags + calibrated ratios.

One place encoding the reference's appendix table of defaults (SURVEY.md §Appendix);
every entry cites where the reference sets it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from magcache_tpu.core.magcache import MagCacheConfig, prepare_mag_ratios
from magcache_tpu.data import get_calibrated_ratios, ratio_pad


@dataclasses.dataclass(frozen=True)
class MagCachePreset:
    ratio_key: str                 # key into data/calibrated_ratios.json
    thresh: float
    K: int
    retention_ratio: float
    lanes: int
    gate_rounds: bool = False
    err_inclusive: bool = False
    min_gate_step: int = 0
    max_ratio_deviation: Optional[float] = None
    forced_compute_canonical: tuple = ()
    canonical_num_steps: Optional[int] = None


# E/K/R sources:
#   wan2.1 1.3B: MagCache4Wan2.1/magcache_generate.py:745-759 (E=0.12 K=2 R=0.2)
#   wan2.1 14B/i2v: MagCache4Wan2.1/README.md:19,33 (E=0.24 K=6)
#   wan2.2: MagCache4Wan2.2/README.md:10-62 recommended commands (E=0.06 K=2;
#     t2v-A14B R=0.4, i2v-A14B R=0.1, ti2v R=0.2 = the CLI default); the bare
#     CLI default E is 0.04 (magcache_generate.py:548-562)
#   hunyuan: magcache_sample_video.py:303-305 (E=0.24 K=6 R=0.2)
#   flux: magcache_flux.py:466-468 (E=0.24 K=5 R=0.1, forced canonical step 11 of 28)
#   flux-kontext: magcache_flux_kontext.py:465-467 (E=0.05 K=4 R=0.2)
#   qwen-image(+edit): READMEs:12 (E=0.06 K=2 R=0.2)
#   framepack: magcache_demo_gradio.py:63-74,707-709 (E=0.1 K=3 R=0.2, guard 0.06, cnt>=1)
#   omnigen2: magcache/magcache_utils.py:69,82-83 (E~0.05 K=3 R=0.2)
#   opensora: experiments/opensora.py:420-433 (E=0.12 K=3, skip_time=6 of 30 => R=0.2)
PRESETS: dict[str, MagCachePreset] = {
    "wan2.1-t2v-1.3B": MagCachePreset("wan2.1-t2v-1.3B", 0.12, 2, 0.2, lanes=2),
    "wan2.1-t2v-14B": MagCachePreset("wan2.1-t2v-14B", 0.24, 6, 0.2, lanes=2),
    "wan2.1-i2v-480p": MagCachePreset("wan2.1-i2v-480p", 0.12, 4, 0.2, lanes=2),
    "wan2.1-i2v-720p": MagCachePreset("wan2.1-i2v-720p", 0.24, 6, 0.2, lanes=2),
    "wan2.1-vace-1.3B": MagCachePreset("wan2.1-vace-1.3B", 0.12, 2, 0.2, lanes=2),
    "wan2.1-vace-14B": MagCachePreset("wan2.1-vace-14B", 0.24, 6, 0.2, lanes=2),
    "wan2.2-t2v-A14B": MagCachePreset("wan2.2-t2v-A14B", 0.06, 2, 0.4, lanes=2),
    "wan2.2-i2v-A14B": MagCachePreset("wan2.2-i2v-A14B", 0.06, 2, 0.1, lanes=2),
    "wan2.2-ti2v-5B-t2v": MagCachePreset("wan2.2-ti2v-5B-t2v", 0.06, 2, 0.2, lanes=2),
    "wan2.2-ti2v-5B-i2v": MagCachePreset("wan2.2-ti2v-5B-i2v", 0.06, 2, 0.2, lanes=2),
    "hunyuanvideo-720p": MagCachePreset("hunyuanvideo-720p", 0.24, 6, 0.2, lanes=1),
    "hunyuanvideo-544p": MagCachePreset("hunyuanvideo-544p", 0.24, 6, 0.2, lanes=1),
    "flux-dev": MagCachePreset(
        "flux-dev", 0.24, 5, 0.1, lanes=1,
        gate_rounds=True, err_inclusive=True,
        forced_compute_canonical=(11,), canonical_num_steps=28,
    ),
    "flux-kontext-dev": MagCachePreset(
        "flux-kontext-dev", 0.05, 4, 0.2, lanes=1,
        gate_rounds=True, err_inclusive=True,
        forced_compute_canonical=(11,), canonical_num_steps=28,
    ),
    "qwen-image": MagCachePreset("qwen-image", 0.06, 2, 0.2, lanes=2),
    "qwen-image-edit": MagCachePreset("qwen-image-edit", 0.06, 2, 0.2, lanes=2),
    "framepack": MagCachePreset(
        "framepack", 0.10, 3, 0.2, lanes=1,
        err_inclusive=True, min_gate_step=1, max_ratio_deviation=0.06,
    ),
    "framepack-f1": MagCachePreset(
        "framepack-f1", 0.10, 3, 0.2, lanes=1,
        err_inclusive=True, min_gate_step=1, max_ratio_deviation=0.06,
    ),
    "omnigen2-t2i_cond": MagCachePreset("omnigen2-t2i_cond", 0.05, 3, 0.2, lanes=1),
    "omnigen2-t2i_uncond": MagCachePreset("omnigen2-t2i_uncond", 0.05, 3, 0.2, lanes=1),
    "omnigen2-edit_cond": MagCachePreset("omnigen2-edit_cond", 0.05, 3, 0.2, lanes=1),
    "omnigen2-edit_uncond": MagCachePreset("omnigen2-edit_uncond", 0.05, 3, 0.2, lanes=1),
    "omnigen2-edit_ref": MagCachePreset("omnigen2-edit_ref", 0.05, 3, 0.2, lanes=1),
    "opensora-v1.2": MagCachePreset("opensora-v1.2", 0.12, 3, 0.2, lanes=1),
}


def make_config(
    preset: str,
    sample_steps: int,
    *,
    thresh: Optional[float] = None,
    K: Optional[int] = None,
    retention_ratio: Optional[float] = None,
    split_step: Optional[int] = None,
    mode: str = "t2v",
    ratios=None,
) -> MagCacheConfig:
    """Build a ready-to-run MagCacheConfig for ``sample_steps`` scheduler steps.

    ``num_steps = sample_steps * lanes`` for sequential-CFG models
    (``magcache_generate.py:899``); ratios are padded + nearest-resampled to
    match (``prepare_mag_ratios``). E/K/R overrides mirror the reference CLI
    flags ``--magcache_thresh/--magcache_K/--retention_ratio``.
    """
    if preset not in PRESETS:
        # common shorthand: the "-dev" model-id suffix dropped
        if f"{preset}-dev" in PRESETS:
            preset = f"{preset}-dev"
        else:
            raise KeyError(
                f"unknown MagCache preset {preset!r}; known: "
                f"{sorted(PRESETS)}")
    p = PRESETS[preset]
    num_steps = sample_steps * p.lanes
    if ratios is not None:
        # user-recorded calibration (unpadded norm_ratio list) replaces the
        # published table; same pad+resample install path
        ratios = prepare_mag_ratios(ratios, num_steps, lanes=p.lanes)
    else:
        ratios = prepare_mag_ratios(
            get_calibrated_ratios(p.ratio_key), num_steps, lanes=p.lanes,
            pad=ratio_pad(p.ratio_key),
        )
    return MagCacheConfig(
        num_steps=num_steps,
        mag_ratios=tuple(ratios),
        thresh=p.thresh if thresh is None else thresh,
        max_consecutive_skips=p.K if K is None else K,
        retention_ratio=p.retention_ratio if retention_ratio is None else retention_ratio,
        lanes=p.lanes,
        gate_rounds=p.gate_rounds,
        err_inclusive=p.err_inclusive,
        min_gate_step=p.min_gate_step,
        max_ratio_deviation=p.max_ratio_deviation,
        forced_compute_canonical=p.forced_compute_canonical,
        canonical_num_steps=p.canonical_num_steps,
        split_step=split_step,
        mode=mode,
    )
