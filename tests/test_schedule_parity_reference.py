"""Reference schedule parity: our skip schedule == the reference's, exactly.

Round-1 review hypothesized the perf gap to the reference's published 2.2x /
2.8x (Wan1.3B E012K2R02 / E012K4R02, ``MagCache4Wan2.1/README.md:101-103``)
came from schedule divergence ("the reference's schedule elides more
forwards").  This file settles that question with an oracle transcription of
the reference decision loop (``MagCache4Wan2.1/magcache_generate.py:277-292``)
run on the reference's own installed 1.3B mag_ratios
(``magcache_generate.py:912``):

  E=0.12 K=2 R=0.2  ->  50/100 forwards skipped  (wall-clock ceiling 2.00x)
  E=0.12 K=4 R=0.2  ->  58/100 forwards skipped  (ceiling 2.38x)
  E=0.24 K=6 R=0.2  ->  64/100 forwards skipped  (ceiling 2.78x)

and asserts `compute_skip_schedule` produces the *identical* boolean schedule
for every (E, K, R) x step-count combination, including nearest-interp
resampling at non-50 step counts.

Consequence (documented for the bench): with identical schedules, a fair
wall-clock speedup is bounded by total_forwards / computed_forwards; the
reference's published 2.2x at E012K2R02 *exceeds its own 2.00x ceiling*
(ditto 2.8x > 2.38x at K4), i.e. its A800 full-compute baseline ran slower
per forward than its cached run.  Matching the reference therefore means
matching/beating its *absolute* sec/video and its schedule — both are covered
by tests + bench — not reproducing a >ceiling ratio.
"""

from __future__ import annotations

import numpy as np
import pytest

from magcache_tpu.core.magcache import (
    MagCacheConfig,
    compute_skip_schedule,
    nearest_interp,
    prepare_mag_ratios,
)
from magcache_tpu.core.presets import make_config
from magcache_tpu.data import get_calibrated_ratios

# The reference's installed Wan2.1-T2V-1.3B ratios (magcache_generate.py:912),
# *without* the [1.0]*2 padding it prepends at install time.
REF_RATIOS_13B = [
    1.0124, 1.02213, 1.00166, 1.0041, 0.99791, 1.00061, 0.99682, 0.99762,
    0.99634, 0.99685, 0.99567, 0.99586, 0.99416, 0.99422, 0.99578, 0.99575,
    0.9957, 0.99563, 0.99511, 0.99506, 0.99535, 0.99531, 0.99552, 0.99549,
    0.99541, 0.99539, 0.9954, 0.99536, 0.99489, 0.99485, 0.99518, 0.99514,
    0.99484, 0.99478, 0.99481, 0.99479, 0.99415, 0.99413, 0.99419, 0.99416,
    0.99396, 0.99393, 0.99388, 0.99386, 0.99349, 0.99349, 0.99309, 0.99304,
    0.9927, 0.9927, 0.99228, 0.99226, 0.99171, 0.9917, 0.99137, 0.99135,
    0.99068, 0.99063, 0.99005, 0.99003, 0.98944, 0.98942, 0.98849, 0.98849,
    0.98758, 0.98757, 0.98644, 0.98643, 0.98504, 0.98503, 0.9836, 0.98359,
    0.98202, 0.98201, 0.97977, 0.97978, 0.97717, 0.97718, 0.9741, 0.97411,
    0.97003, 0.97002, 0.96538, 0.96541, 0.9593, 0.95933, 0.95086, 0.95089,
    0.94013, 0.94019, 0.92402, 0.92414, 0.90241, 0.9026, 0.86821, 0.86868,
    0.81838, 0.81939,
]


def reference_nearest_interp(src_array, target_length):
    """Oracle: nearest_interp (magcache_generate.py:27-34), verbatim semantics."""
    src_array = np.asarray(src_array)
    src_length = len(src_array)
    if target_length == 1:
        return src_array[-1:]
    scale = (src_length - 1) / (target_length - 1)
    mapped_indices = np.round(np.arange(target_length) * scale).astype(int)
    return src_array[mapped_indices]


def reference_install(raw_no_pad, sample_steps):
    """Oracle: ratio installation (magcache_generate.py:908-919).

    Prepends [1.0]*2, then if the length differs from sample_steps*2,
    nearest-resamples each CFG lane independently and re-interleaves.
    """
    mag_ratios = np.concatenate([np.ones(2), np.asarray(raw_no_pad)])
    if len(mag_ratios) != sample_steps * 2:
        con = reference_nearest_interp(mag_ratios[0::2], sample_steps)
        ucon = reference_nearest_interp(mag_ratios[1::2], sample_steps)
        mag_ratios = np.concatenate(
            [con.reshape(-1, 1), ucon.reshape(-1, 1)], axis=1
        ).reshape(-1)
    return mag_ratios


def reference_decision_loop(mag_ratios, num_steps, thresh, K, retention_ratio):
    """Oracle: the per-forward skip decision (magcache_generate.py:277-292),
    transcribed verbatim (two CFG lanes alternating by cnt % 2)."""
    accumulated_ratio = [1.0, 1.0]
    accumulated_steps = [0, 0]
    accumulated_err = [0.0, 0.0]
    skips = np.zeros(num_steps, dtype=bool)
    for cnt in range(num_steps):
        if cnt >= int(num_steps * retention_ratio):
            lane = cnt % 2
            cur_mag_ratio = mag_ratios[cnt]
            accumulated_ratio[lane] = accumulated_ratio[lane] * cur_mag_ratio
            accumulated_steps[lane] += 1
            cur_skip_err = np.abs(1 - accumulated_ratio[lane])
            accumulated_err[lane] += cur_skip_err
            if accumulated_err[lane] < thresh and accumulated_steps[lane] <= K:
                skips[cnt] = True
            else:
                accumulated_err[lane] = 0
                accumulated_steps[lane] = 0
                accumulated_ratio[lane] = 1.0
    return skips


HEADLINE = [
    # (E, K, R, skipped_forwards_of_100, wall-clock ceiling, published claim)
    (0.12, 2, 0.2, 50, 2.00, 2.2),
    (0.12, 4, 0.2, 58, 2.38, 2.8),
    (0.24, 6, 0.2, 64, 2.78, None),
]


def test_repo_ratio_data_matches_reference_install():
    ours = get_calibrated_ratios("wan2.1-t2v-1.3B")
    assert np.allclose(ours, REF_RATIOS_13B), (
        "data/calibrated_ratios.json wan2.1-t2v-1.3B drifted from "
        "magcache_generate.py:912"
    )


@pytest.mark.parametrize("E,K,R,want_skips,ceiling,published", HEADLINE)
def test_headline_schedules_identical_to_reference(E, K, R, want_skips, ceiling, published):
    ref_ratios = reference_install(REF_RATIOS_13B, 50)
    ref_sched = reference_decision_loop(ref_ratios, 100, E, K, R)
    assert int(ref_sched.sum()) == want_skips

    cfg = make_config("wan2.1-t2v-1.3B", 50, thresh=E, K=K, retention_ratio=R)
    ours = compute_skip_schedule(cfg)
    np.testing.assert_array_equal(ours, ref_sched)

    # The arithmetic wall-clock ceiling this schedule admits (skip cost -> 0).
    computed = 100 - want_skips
    assert abs(100 / computed - ceiling) < 0.01
    if published is not None:
        # The reference's published ratio exceeds its own ceiling — recorded
        # here so the bench's vs-published comparison stays interpretable.
        assert published > ceiling


@pytest.mark.parametrize("sample_steps", [10, 20, 30, 40, 50, 64, 100])
@pytest.mark.parametrize("E,K,R", [(0.12, 2, 0.2), (0.12, 4, 0.2), (0.24, 6, 0.2),
                                   (0.05, 3, 0.1), (0.3, 8, 0.3)])
def test_schedule_parity_sweep(sample_steps, E, K, R):
    """Full parity across step counts (exercises nearest-interp resampling)."""
    num = sample_steps * 2
    ref_ratios = reference_install(REF_RATIOS_13B, sample_steps)
    ref_sched = reference_decision_loop(ref_ratios, num, E, K, R)

    ours_ratios = prepare_mag_ratios(REF_RATIOS_13B, num, lanes=2, pad=2)
    np.testing.assert_allclose(ours_ratios, ref_ratios)
    cfg = MagCacheConfig(num_steps=num, mag_ratios=tuple(ours_ratios),
                         thresh=E, max_consecutive_skips=K,
                         retention_ratio=R, lanes=2)
    np.testing.assert_array_equal(compute_skip_schedule(cfg), ref_sched)


def test_headline_skips_are_lane_paired():
    """At the headline configs every skip is a cond/uncond *pair* — a batched
    2-lane trunk loses nothing vs the reference's per-forward skipping there.
    (Partial-lane savings still matter for asymmetric configs; see
    test_sampler.py's partial-skip coverage.)"""
    for E, K, R, *_ in HEADLINE:
        cfg = make_config("wan2.1-t2v-1.3B", 50, thresh=E, K=K, retention_ratio=R)
        s = compute_skip_schedule(cfg).reshape(50, 2)
        np.testing.assert_array_equal(s[:, 0], s[:, 1])


def test_asymmetric_lane_skips_exist_somewhere():
    """Sanity: lane-asymmetric steps do occur for some configs/step counts, so
    the partial-lane trunk path is not dead code."""
    found = False
    for steps in (25, 33, 47):
        for E, K in ((0.02, 2), (0.04, 3), (0.06, 4)):
            num = steps * 2
            ratios = prepare_mag_ratios(REF_RATIOS_13B, num, lanes=2, pad=2)
            cfg = MagCacheConfig(num_steps=num, mag_ratios=tuple(ratios),
                                 thresh=E, max_consecutive_skips=K,
                                 retention_ratio=0.2, lanes=2)
            s = compute_skip_schedule(cfg).reshape(steps, 2)
            if (s[:, 0] != s[:, 1]).any():
                found = True
    assert found
