"""Experiment runners: golden full-compute vs cached runs + similarity report.

The reference's eval flow (``eval/magcache/experiments/opensora.py:375-455``,
``Wan2.1_EVAL/wan_magcache.py``): run a prompt list under {base, teacache,
magcache} configurations, save videos, then compare each accelerated run
against the base run with PSNR/SSIM/LPIPS and wall-clock. This module
reproduces that harness over our pipelines; outputs are ``.npy`` latents
(decoded videos when a VAE is attached) plus a JSON/txt report.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from magcache_tpu.eval.compare import compare_videos
from magcache_tpu.utils.logging import get_logger

logger = get_logger(__name__)

__all__ = ["run_experiment", "ExperimentResult"]


@dataclasses.dataclass
class ExperimentResult:
    name: str
    seconds_per_prompt: float
    metrics_vs_base: Dict[str, float]
    outputs: List[np.ndarray]


def _to_frames(latents: np.ndarray) -> np.ndarray:
    """Squash latents to a [T, H, W, C<=3]-ish array for the metrics — no
    normalization (the variant/base PAIR shares one min-max in
    `_norm_pair`; independent per-array scales would hide global magnitude
    drift). For real runs attach a VAE and compare decoded videos instead."""
    lat = np.asarray(latents)
    if lat.ndim == 5:            # [B, T, H, W, C]
        lat = lat[0]
    elif lat.ndim == 3:          # [B, S, C] image tokens
        lat = lat[0][None]
    return lat[..., :3].astype(np.float32)


def _norm_pair(a: np.ndarray, b: np.ndarray):
    lo = min(a.min(), b.min())
    hi = max(a.max(), b.max())
    sc = max(hi - lo, 1e-8)
    return ((a - lo) / sc).astype(np.float32), ((b - lo) / sc).astype(
        np.float32)


def run_experiment(
    make_pipeline,                    # (variant_name) -> pipeline
    prompts: Sequence[str],
    variants: Sequence[str] = ("base", "magcache"),
    seed: int = 42,
    out_dir: Optional[str] = None,
    metrics: Sequence[str] = ("psnr", "ssim"),
) -> Dict[str, ExperimentResult]:
    """Run each variant over the prompts; compare all variants to 'base'.

    ``make_pipeline(variant)`` builds the pipeline for a variant name; the
    first variant is the golden baseline.
    """
    results: Dict[str, ExperimentResult] = {}
    raw: Dict[str, List[np.ndarray]] = {}
    for variant in variants:
        pipe = make_pipeline(variant)
        outs, t0 = [], time.time()
        for i, prompt in enumerate(prompts):
            out = pipe.generate(prompt, seed=seed + i)
            arr = out.video if out.video is not None else np.asarray(out.latents)
            outs.append(arr)
        dt = (time.time() - t0) / max(len(prompts), 1)
        raw[variant] = outs
        logger.info("variant %s: %.2fs/prompt", variant, dt)
        results[variant] = ExperimentResult(variant, dt, {}, outs)

    base = variants[0]
    for variant in variants[1:]:
        per = []
        for a, b in zip(raw[variant], raw[base]):
            fa, fb = _norm_pair(_to_frames(a), _to_frames(b))
            per.append(compare_videos(fa, fb, metrics=metrics))
        agg = {m: float(np.mean([p[m] for p in per])) for m in metrics}
        results[variant].metrics_vs_base = agg
        logger.info("variant %s vs %s: %s", variant, base, agg)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        for variant, outs in raw.items():
            for i, arr in enumerate(outs):
                np.save(os.path.join(out_dir, f"{variant}_{i}.npy"), arr)
        summary = {
            v: {"seconds_per_prompt": r.seconds_per_prompt,
                "metrics_vs_base": r.metrics_vs_base}
            for v, r in results.items()
        }
        with open(os.path.join(out_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
    return results
