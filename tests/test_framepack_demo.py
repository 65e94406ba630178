"""FramePack demo session tests (the gradio UI's worker surface, no gradio).

Reference behavior: ``MagCache4FramePack/magcache_demo_gradio.py`` — worker
thread + event stream (:406-662), Stop-button interruption (:510-511,
:665-666), checkbox mutual exclusion (:30-52)."""

import numpy as np

from magcache_tpu.ui.framepack_demo import (
    DemoSession,
    handle_magcache_change,
    handle_teacache_change,
)


def test_checkbox_mutual_exclusion():
    # checking magcache while teacache is on unchecks teacache, and vice versa
    assert handle_magcache_change(True, True) == (True, False)
    assert handle_teacache_change(True, True) == (False, True)
    # no unintended changes otherwise
    assert handle_magcache_change(True, False) == (True, False)
    assert handle_magcache_change(False, True) == (False, True)
    assert handle_teacache_change(False, False) == (False, False)


def _session(tmp_path, sections=3):
    from magcache_tpu.pipelines.framepack import (FramePackPipeline,
                                                  FramePackPipelineConfig)
    cfg = FramePackPipelineConfig(tiny=True, pyramid=False, height=64,
                                  width=64, txt_len=8, latent_window_size=2,
                                  total_sections=sections, steps=3)
    return DemoSession(pipeline=FramePackPipeline(cfg),
                       out_dir=str(tmp_path))


def test_worker_streams_sections_and_files(tmp_path):
    s = _session(tmp_path, sections=3)
    s.start("a cat", seed=0)
    events = list(s.events())
    flags = [f for f, _ in events]
    assert flags[-1] == "end"
    assert flags.count("file") == 3          # one growing artifact per section
    # progress percentages are monotone and the saved file grows in frames
    pcts = [d[2] for f, d in events if f == "progress" and d[0] is not None]
    assert pcts == sorted(pcts) and pcts[-1] == 100
    paths = [d for f, d in events if f == "file"]
    lens = [np.load(p).shape[1] for p in paths]
    assert lens == sorted(lens) and lens[-1] == 3 * 2
    s.join()


def test_end_interrupts_after_first_section(tmp_path):
    s = _session(tmp_path, sections=4)
    s.start("a cat", seed=0)
    seen_files = 0
    for flag, data in s.events():
        if flag == "file":
            seen_files += 1
            s.end()                           # press Stop after first artifact
        if flag == "end":
            break
    s.join()
    assert 1 <= seen_files < 4               # stopped well before completion


def test_cfg_change_rebuilds_pipeline_and_start_guards_running(tmp_path):
    """The UI widgets feed cfg_kw into every start(): a changed caching
    config must rebuild the pipeline (it used to be silently ignored after
    the first run), and Start during a live run must refuse instead of
    orphaning the running worker."""
    import pytest

    kw = dict(tiny=True, pyramid=False, height=64, width=64, txt_len=8,
              latent_window_size=2, total_sections=2, steps=3)
    s = DemoSession(out_dir=str(tmp_path))
    s.start("a cat", seed=0, **kw)
    with pytest.raises(RuntimeError, match="already running"):
        s.start("a cat", seed=1, **kw)
    list(s.events())
    s.join()
    first = s.pipeline
    assert first.config.use_magcache is False

    s.start("a cat", seed=0, use_magcache=True, magcache_thresh=1e9, **kw)
    list(s.events())
    s.join()
    assert s.pipeline is not first
    assert s.pipeline.config.use_magcache is True

    # unchanged cfg reuses the built pipeline (no recompile churn)
    second = s.pipeline
    s.start("a cat", seed=2, use_magcache=True, magcache_thresh=1e9, **kw)
    list(s.events())
    s.join()
    assert s.pipeline is second


def test_demo_session_runs_f1_variant():
    """The F1 demo (``magcache_demo_gradio_f1.py``) is the same UI over the
    forward-ordered pipeline; the session builds it from widget kwargs."""
    from magcache_tpu.ui.framepack_demo import DemoSession

    sess = DemoSession(out_dir="/tmp/framepack_demo_f1_test")
    sess.start("a fox", seed=1, tiny=True, model="framepack-f1",
               total_sections=2, steps=3, latent_window_size=2,
               use_magcache=True)
    kinds = [flag for flag, _ in sess.events(timeout=600.0)]
    sess.join()
    assert "file" in kinds and kinds[-1] == "end"
    assert not any(k == "error" for k in kinds)
