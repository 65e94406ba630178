"""Utils tests: trace/observability, seeds, video io."""

import numpy as np
import pytest

from magcache_tpu.core.presets import make_config
from magcache_tpu.utils.misc import save_video, set_seed, to_uint8_video
from magcache_tpu.utils.trace import StepTimer, log_skip_schedule


def test_step_timer_sections():
    import time
    t = StepTimer()
    with t.section("a"):
        time.sleep(0.01)
    with t.section("a"):
        time.sleep(0.01)
    with t.section("b"):
        pass
    s = t.summary()
    assert "a" in s and "n=  2" in s and "b" in s


def test_log_skip_schedule_returns_schedule():
    cfg = make_config("flux-dev", 28)
    sched = log_skip_schedule(cfg, "flux")
    assert sched.sum() > 0 and len(sched) == 28


def test_set_seed_dp_offset():
    import jax
    a = set_seed(7)
    b = set_seed(7, dp_rank=0)
    c = set_seed(7, dp_rank=1)
    assert (np.asarray(a) == np.asarray(b)).all()
    assert (np.asarray(a) != np.asarray(c)).any()


def test_to_uint8_and_save_video(tmp_path):
    v = np.random.default_rng(0).uniform(-1, 1, (3, 8, 8, 3)).astype(np.float32)
    u = to_uint8_video(v)
    assert u.dtype == np.uint8 and u.shape == v.shape
    path = save_video(v, str(tmp_path / "clip.mp4"))
    import os
    assert os.path.exists(path)  # mp4 via imageio or .npy fallback


def test_root_api_exports_mirror_reference_surface():
    """videosys/__init__.py exposes Engine + (Config, Pipeline) per family;
    magcache_tpu's root mirrors that, lazily."""
    import magcache_tpu as m
    for name in ("Engine", "PABConfig", "WanPipeline", "WanPipelineConfig",
                 "OpenSoraPipeline", "OpenSoraPlanPipelineConfig",
                 "CogVideoXPipeline", "LattePipeline", "VchitectPipeline",
                 "FluxPipelineConfig", "OmniGen2Pipeline",
                 "FramePackPipelineConfig", "QwenImagePipeline",
                 "TeaCacheConfig", "TaylorSeerConfig"):
        assert getattr(m, name) is not None, name
        assert name in m.__all__
    import pytest
    with pytest.raises(AttributeError):
        m.NoSuchThing
