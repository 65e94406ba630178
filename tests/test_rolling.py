"""Rolling-cache (C2 eval-variant) policy tests.

Reference decision loop: ``eval/magcache/experiments/Wan2.1_EVAL/
wan_magcache.py:770-808`` (forward-indexed counters, cache_time=10 ratio
table, inclusive K, per-lane t%2 accumulators).
"""

import numpy as np
import pytest

from magcache_tpu.core.rolling import (
    RollingCacheConfig,
    compute_rolling_schedule,
    load_eval_ratios,
)


class _RefModel:
    """Stateful transcription of the reference class-attribute bookkeeping:
    one ``forward()`` per model call, exactly the eval script's control flow
    (skip_forward flag, else-reset, end-of-run state reset)."""

    def __init__(self, num_steps, ratio, thresh, K):
        self.num_steps = num_steps
        self.ratio = ratio
        self.magcache_thresh = thresh
        self.magcache_K = K
        self.t = 0
        self.accumulated_sim = [1.0, 1.0]
        self.accumulated_steps = [0, 0]
        self.accumulated_err = [0, 0]
        self.skip_steps = 0

    def forward(self):
        skip_forward = False
        cache_time = 10
        skip_time = int(self.num_steps * 0.2)
        if self.t >= skip_time:
            cur_scale = self.ratio[self.t - 10]
            self.accumulated_sim[self.t % 2] = (
                self.accumulated_sim[self.t % 2] * cur_scale)
            self.accumulated_steps[self.t % 2] += 1
            self.accumulated_err[self.t % 2] += np.abs(
                1 - self.accumulated_sim[self.t % 2])
            if (self.accumulated_err[self.t % 2] <= self.magcache_thresh
                    and self.accumulated_steps[self.t % 2] <= self.magcache_K):
                skip_forward = True
            else:
                self.accumulated_sim[self.t % 2] = 1.0
                self.accumulated_steps[self.t % 2] = 0
                self.accumulated_err[self.t % 2] = 0
        if skip_forward:
            self.skip_steps += 1
        self.t += 1
        if self.t >= self.num_steps:
            self.t = 0
            self.skip_steps = 0
            self.accumulated_sim = [1.0, 1.0]
            self.accumulated_steps = [0, 0]
            self.accumulated_err = [0, 0]
        return skip_forward


@pytest.mark.parametrize("thresh,K", [(0.015, -1), (0.1, 4), (0.2, 6),
                                      (0.05, 2)])
def test_schedule_matches_reference_transcription(thresh, K):
    ratios = load_eval_ratios()
    n = 100                                  # 50 steps x 2 lanes
    ref = _RefModel(n, ratios, thresh, K)
    want = np.array([ref.forward() for _ in range(n)])
    got = compute_rolling_schedule(n, ratios, thresh, K)
    np.testing.assert_array_equal(got, want)


def test_schedule_invariants():
    ratios = load_eval_ratios()
    s = compute_rolling_schedule(100, ratios, 0.1, 4)
    # retention region: first 20% of forwards never skip
    assert not s[:20].any()
    assert s.sum() > 0
    # per-lane consecutive skips bounded by K (steps counter is inclusive)
    for lane in range(2):
        bits = s[lane::2]
        run = best = 0
        for b in bits:
            run = run + 1 if b else 0
            best = max(best, run)
        assert best <= 4
    # default eval-script K=-1 can never skip
    assert compute_rolling_schedule(100, ratios, 0.015, -1).sum() == 0


def test_resampling_preserves_lane_interleave():
    # a table whose lanes are distinguishable: even forwards 1.0 (no error),
    # odd forwards 0.5 (instant reset)
    tab = np.tile([1.0, 0.5], 45)
    s = compute_rolling_schedule(16, tab, 0.05, 10, cache_time=10)
    # lane 0 accumulates sim=1 -> err 0 -> skips every eligible forward;
    # lane 1's err jumps 0.5 -> never skips
    assert s[4::2].sum() > 0 and not s[1::2].any()


def test_rolling_pipeline_integration():
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig

    cfg = WanPipelineConfig(task="t2v", tiny=True, size=(64, 64), frame_num=5,
                            sample_steps=8, dtype="float32",
                            use_magcache=True, cache_policy="rolling",
                            magcache_thresh=0.2, magcache_K=4)
    pipe = WanPipeline(cfg)
    pipe.record_skips = True
    out = pipe.generate("a boat", seed=0)
    assert np.isfinite(np.asarray(out.latents)).all()
    want = RollingCacheConfig(num_steps=16, thresh=0.2, K=4).skip_schedule()
    got = np.asarray(out.skips).astype(bool).reshape(-1)
    np.testing.assert_array_equal(got, want.reshape(8, 2).reshape(-1))
    assert got.sum() > 0


class _RefOpenSora:
    """Stateful transcription of the Open-Sora eval decision
    (``experiments/opensora.py:296-312``): single lane, ratio[t-1],
    err += (1 - sim) without abs, inclusive K."""

    def __init__(self, ratio, thresh, K, skip_time):
        self.ratio = ratio
        self.magcache_thresh = thresh
        self.K = K
        self.skip_time = skip_time
        self.t = 0
        self.accumulated_sim = 1.0
        self.accumulated_steps = 0
        self.accumulated_err = 0.0

    def forward(self):
        skip_forward = False
        if self.t >= self.skip_time:
            cur_scale = self.ratio[self.t - 1]
            self.accumulated_sim = self.accumulated_sim * cur_scale
            self.accumulated_steps += 1
            self.accumulated_err += 1 - self.accumulated_sim
            if (self.accumulated_err <= self.magcache_thresh
                    and self.accumulated_steps <= self.K):
                skip_forward = True
            else:
                self.accumulated_sim = 1.0
                self.accumulated_steps = 0
                self.accumulated_err = 0
        self.t += 1
        return skip_forward


@pytest.mark.parametrize("thresh,K,skip_time", [(0.12, 3, 6), (0.24, 5, 6),
                                                (0.06, 2, 10)])
def test_opensora_schedule_matches_reference_transcription(thresh, K,
                                                           skip_time):
    ratios = load_eval_ratios("opensora-30step")
    ref = _RefOpenSora(ratios, thresh, K, skip_time)
    want = np.array([ref.forward() for _ in range(30)])
    got = RollingCacheConfig.opensora(30, thresh=thresh, K=K,
                                      skip_time=skip_time).skip_schedule()
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 0


def test_opensora_rolling_pipeline_integration():
    from magcache_tpu.pipelines.open_sora import (OpenSoraPipeline,
                                                  OpenSoraPipelineConfig)

    cfg = OpenSoraPipelineConfig(tiny=True, num_frames=8, height=32,
                                 width=32, num_sampling_steps=30,
                                 caption_len=6, dtype="float32",
                                 use_magcache=True, cache_policy="rolling")
    pipe = OpenSoraPipeline(cfg)
    pipe.record_skips = True
    out = pipe.generate("a boat", seed=0)
    assert np.isfinite(np.asarray(out.latents)).all()
    want = RollingCacheConfig.opensora(30).skip_schedule()
    got = np.asarray(out.skips).astype(bool).reshape(-1)
    np.testing.assert_array_equal(got, want)
    assert got.sum() > 0
