"""Core MagCache algebra tests.

The key property: `compute_skip_schedule` (host/static), the dynamic in-graph
recurrence, and an *independent* transcription of each reference adapter's
Python decision code must all agree step-for-step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.core.magcache import (
    MagCacheConfig,
    compute_skip_schedule,
    dynamic_init,
    dynamic_update,
    nearest_interp,
    prepare_mag_ratios,
)
from magcache_tpu.core.presets import PRESETS, make_config
from magcache_tpu.data import available_ratio_keys, get_calibrated_ratios


# ---------------------------------------------------------------------------
# Independent oracles: direct transcriptions of the reference adapters'
# decision loops (one per style), kept deliberately naive.
# ---------------------------------------------------------------------------

def wan_style_schedule(mag_ratios, num_steps, E, K, R, split_step=None, mode="t2v"):
    """Wan2.1 (magcache_generate.py:279-292) / Wan2.2 (:294-303) decision loop."""
    acc_ratio, acc_err, acc_steps = [1.0, 1.0], [0.0, 0.0], [0, 0]
    out = []
    for cnt in range(num_steps):
        skip = False
        if split_step is not None:
            if mode == "i2v":
                use = not (cnt < int(split_step + (num_steps - split_step) * R))
            else:
                use = not (
                    cnt < int(split_step * R)
                    or (split_step <= cnt <= (num_steps - split_step) * R + split_step)
                )
        else:
            use = cnt >= int(num_steps * R)
        if use:
            lane = cnt % 2
            acc_ratio[lane] *= mag_ratios[cnt]
            acc_steps[lane] += 1
            acc_err[lane] += abs(1 - acc_ratio[lane])
            if acc_err[lane] < E and acc_steps[lane] <= K:
                skip = True
            else:
                acc_err[lane], acc_steps[lane], acc_ratio[lane] = 0.0, 0, 1.0
        out.append(skip)
    return np.array(out)


def flux_style_schedule(mag_ratios, num_steps, E, K, R, canonical=28, forced=11):
    """FLUX (magcache_flux.py:326-338): rounded gate, <=, forced canonical step."""
    acc_ratio, acc_err, acc_steps = 1.0, 0.0, 0
    out = []
    for cnt in range(num_steps):
        skip = False
        if cnt >= int(R * num_steps + 0.5):
            acc_ratio *= mag_ratios[cnt]
            acc_steps += 1
            acc_err += abs(1 - acc_ratio)
            if (
                acc_err <= E
                and acc_steps <= K
                and int(np.round(cnt * ((canonical - 1) / (num_steps - 1)))) != forced
            ):
                skip = True
            else:
                acc_ratio, acc_err, acc_steps = 1.0, 0.0, 0
        out.append(skip)
    return np.array(out)


def framepack_style_schedule(mag_ratios, num_steps, E, K, R):
    """FramePack (magcache_demo_gradio.py:258-271): cnt>=1 floor + ratio guard."""
    acc_ratio, acc_err, acc_steps = 1.0, 0.0, 0
    out = []
    for cnt in range(num_steps):
        skip = False
        if cnt >= int(R * num_steps) and cnt >= 1:
            acc_ratio *= mag_ratios[cnt]
            acc_err += abs(1 - acc_ratio)
            acc_steps += 1
            if acc_err <= E and acc_steps <= K and abs(1 - mag_ratios[cnt]) <= 0.06:
                skip = True
            else:
                acc_ratio, acc_err, acc_steps = 1.0, 0.0, 0
        out.append(skip)
    return np.array(out)


# ---------------------------------------------------------------------------
# nearest_interp / prepare_mag_ratios
# ---------------------------------------------------------------------------

def test_nearest_interp_identity():
    x = np.arange(10.0)
    np.testing.assert_array_equal(nearest_interp(x, 10), x)


def test_nearest_interp_endpoints():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    y = nearest_interp(x, 7)
    assert y[0] == 1.0 and y[-1] == 4.0 and len(y) == 7


def test_nearest_interp_target_one_returns_last():
    x = np.array([5.0, 6.0, 7.0])
    np.testing.assert_array_equal(nearest_interp(x, 1), [7.0])


def test_nearest_interp_matches_reference_formula():
    rng = np.random.default_rng(0)
    for src_len, tgt_len in [(100, 50), (50, 100), (27, 28), (98, 60), (3, 17)]:
        x = rng.uniform(0.8, 1.2, src_len)
        scale = (src_len - 1) / (tgt_len - 1)
        expected = x[np.round(np.arange(tgt_len) * scale).astype(int)]
        np.testing.assert_array_equal(nearest_interp(x, tgt_len), expected)


def test_prepare_mag_ratios_interleaved():
    """Dual-lane interp resamples each lane independently then re-interleaves
    (magcache_generate.py:914-919)."""
    raw = get_calibrated_ratios("wan2.1-t2v-1.3B")  # 98 values
    out = prepare_mag_ratios(raw, num_steps=60, lanes=2, pad=2)
    padded = np.concatenate([[1.0, 1.0], raw])
    con = nearest_interp(padded[0::2], 30)
    ucon = nearest_interp(padded[1::2], 30)
    expected = np.stack([con, ucon], axis=1).reshape(-1)
    np.testing.assert_array_equal(out, expected)
    assert len(out) == 60


def test_prepare_mag_ratios_no_resample_when_exact():
    raw = get_calibrated_ratios("flux-dev")  # 27 values
    out = prepare_mag_ratios(raw, num_steps=28, lanes=1, pad=1)
    np.testing.assert_array_equal(out, np.concatenate([[1.0], raw]))


# ---------------------------------------------------------------------------
# Static schedule vs independent oracles
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("steps,E,K,R", [(50, 0.12, 2, 0.2), (50, 0.12, 4, 0.2),
                                         (50, 0.24, 6, 0.2), (20, 0.12, 3, 0.3)])
def test_wan_schedule_matches_oracle(steps, E, K, R):
    cfg = make_config("wan2.1-t2v-1.3B", steps, thresh=E, K=K, retention_ratio=R)
    oracle = wan_style_schedule(np.asarray(cfg.mag_ratios), cfg.num_steps, E, K, R)
    np.testing.assert_array_equal(compute_skip_schedule(cfg), oracle)


@pytest.mark.parametrize("steps", [50, 40, 30])
@pytest.mark.parametrize("mode,split_frac", [("t2v", 0.4), ("i2v", 0.55)])
def test_wan22_split_schedule_matches_oracle(steps, mode, split_frac):
    key = "wan2.2-t2v-A14B" if mode == "t2v" else "wan2.2-i2v-A14B"
    split = int(steps * split_frac) * 2  # forward-index boundary, like init_magcache :293
    cfg = make_config(key, steps, split_step=split, mode=mode)
    oracle = wan_style_schedule(
        np.asarray(cfg.mag_ratios), cfg.num_steps, cfg.thresh,
        cfg.max_consecutive_skips, cfg.retention_ratio, split_step=split, mode=mode)
    np.testing.assert_array_equal(compute_skip_schedule(cfg), oracle)


@pytest.mark.parametrize("steps", [28, 20, 50])
def test_flux_schedule_matches_oracle(steps):
    cfg = make_config("flux-dev", steps)
    oracle = flux_style_schedule(
        np.asarray(cfg.mag_ratios), steps, cfg.thresh, cfg.max_consecutive_skips,
        cfg.retention_ratio)
    np.testing.assert_array_equal(compute_skip_schedule(cfg), oracle)


def test_flux_forced_step_never_skipped():
    cfg = make_config("flux-dev", 28)
    sched = compute_skip_schedule(cfg)
    assert not sched[11]


@pytest.mark.parametrize("steps", [25, 30])
def test_framepack_schedule_matches_oracle(steps):
    cfg = make_config("framepack", steps)
    oracle = framepack_style_schedule(
        np.asarray(cfg.mag_ratios), steps, cfg.thresh, cfg.max_consecutive_skips,
        cfg.retention_ratio)
    np.testing.assert_array_equal(compute_skip_schedule(cfg), oracle)


# ---------------------------------------------------------------------------
# Schedule invariants across every preset
# ---------------------------------------------------------------------------

CALIBRATED_STEPS = {2: 49, 1: None}  # lanes -> default; None means len(ratios)+pad


def _native_steps(preset_key):
    p = PRESETS[preset_key]
    raw = get_calibrated_ratios(p.ratio_key)
    from magcache_tpu.data import ratio_pad
    return (len(raw) + ratio_pad(p.ratio_key)) // p.lanes


@pytest.mark.parametrize("preset", sorted(PRESETS))
def test_preset_invariants(preset):
    steps = _native_steps(preset)
    cfg = make_config(preset, steps)
    sched = compute_skip_schedule(cfg)
    # 1. no skip while the retention gate is closed
    for cnt in range(cfg.num_steps):
        if not cfg.gate_open(cnt):
            assert not sched[cnt], (preset, cnt)
    # 2. per-lane consecutive skip runs never exceed K
    for lane in range(cfg.lanes):
        lane_sched = sched[lane::cfg.lanes]
        run = 0
        for s in lane_sched:
            run = run + 1 if s else 0
            assert run <= cfg.max_consecutive_skips, (preset, lane)
    # 3. presets at their calibrated step counts should actually skip something
    assert sched.sum() > 0, preset


def test_wan13b_default_schedule_plausible_speedup():
    """E=0.12/K=2/R=0.2 @50 steps should elide a large minority of forwards
    (reference reports 2.2x wall-clock, MagCache4Wan2.1/README.md:101)."""
    cfg = make_config("wan2.1-t2v-1.3B", 50)
    frac = compute_skip_schedule(cfg).mean()
    assert 0.25 < frac < 0.7, frac


# ---------------------------------------------------------------------------
# Dynamic (in-graph) mode == static schedule
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("preset,steps", [
    ("wan2.1-t2v-1.3B", 50), ("wan2.1-t2v-14B", 50), ("flux-dev", 28),
    ("framepack", 25), ("hunyuanvideo-720p", 50), ("qwen-image", 50),
    ("opensora-v1.2", 30),
])
def test_dynamic_matches_static(preset, steps):
    cfg = make_config(preset, steps)

    def step(state, cnt):
        skip, state = dynamic_update(state, cnt, cfg)
        return state, skip

    _, skips = jax.lax.scan(step, dynamic_init(cfg), jnp.arange(cfg.num_steps))
    np.testing.assert_array_equal(np.asarray(skips), compute_skip_schedule(cfg))


def test_dynamic_matches_static_wan22_split():
    cfg = make_config("wan2.2-t2v-A14B", 40, split_step=34, mode="t2v")

    def step(state, cnt):
        skip, state = dynamic_update(state, cnt, cfg)
        return state, skip

    _, skips = jax.lax.scan(step, dynamic_init(cfg), jnp.arange(cfg.num_steps))
    np.testing.assert_array_equal(np.asarray(skips), compute_skip_schedule(cfg))


# ---------------------------------------------------------------------------
# Data registry sanity
# ---------------------------------------------------------------------------

def test_all_ratio_keys_loadable():
    for key in available_ratio_keys():
        r = get_calibrated_ratios(key)
        assert r.ndim == 1 and len(r) > 0
        assert np.all(r > 0.3) and np.all(r < 2.0), key


def test_config_is_hashable_static_arg():
    cfg = make_config("flux-dev", 28)
    assert hash(cfg) == hash(make_config("flux-dev", 28))
