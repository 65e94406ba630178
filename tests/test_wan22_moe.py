"""Wan2.2 two-expert MoE pipeline tests."""

import jax
import numpy as np
import pytest

from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig


def _cfg(**kw):
    base = dict(model="wan2.2-t2v-A14B", tiny=True, size=(64, 32), frame_num=9,
                sample_steps=6, sample_solver="unipc", sample_shift=5.0,
                dtype="float32", moe_boundary=0.9)
    base.update(kw)
    return WanPipelineConfig(**base)


def test_moe_two_experts_run():
    pipe = WanPipeline(_cfg())
    out = pipe.generate("a bird", seed=0)
    assert out.latents.shape == (1, 3, 4, 8, 16)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_moe_expert_actually_switches():
    """Changing only the low-noise expert's params must change the output
    (proves the second phase runs the second expert)."""
    pipe = WanPipeline(_cfg())
    a = pipe.generate("a bird", seed=0)
    from magcache_tpu.models.wan import init_wan_params
    pipe2 = WanPipeline(_cfg(), params=pipe.params,
                        params_low=init_wan_params(jax.random.PRNGKey(99),
                                                   pipe.model_cfg))
    b = pipe2.generate("a bird", seed=0)
    assert np.abs(np.asarray(a.latents) - np.asarray(b.latents)).max() > 1e-4
    # and changing only the HIGH expert also changes it
    pipe3 = WanPipeline(_cfg(), params=init_wan_params(jax.random.PRNGKey(98),
                                                       pipe.model_cfg),
                        params_low=pipe2.params_low)
    c = pipe3.generate("a bird", seed=0)
    assert np.abs(np.asarray(b.latents) - np.asarray(c.latents)).max() > 1e-4


def test_moe_with_magcache_split_gating():
    pipe = WanPipeline(_cfg(use_magcache=True))
    out = pipe.generate("a bird", seed=1)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_a14b_auto_boundary_defaults():
    """A bare A14B config engages the two-expert switch with the wan.configs
    boundary (t2v 0.875 / i2v 0.900 — the reference's cfg.boundary,
    magcache_generate.py:697,773); explicit values win; Wan2.1 stays dense."""
    assert WanPipelineConfig(model="wan2.2-t2v-A14B").moe_boundary == 0.875
    assert WanPipelineConfig(model="wan2.2-i2v-A14B",
                             task="i2v").moe_boundary == 0.900
    assert WanPipelineConfig(model="wan2.2-t2v-A14B",
                             moe_boundary=0.5).moe_boundary == 0.5
    assert WanPipelineConfig(model="wan2.1-t2v-1.3B").moe_boundary is None
    assert WanPipelineConfig(model="wan2.2-ti2v-5B-t2v",
                             task="ti2v").moe_boundary is None


def test_moe_guide_pair_equal_matches_scalar():
    """guide_scale=(g, g) must be bit-identical to guide_scale=g (same body
    compiled for both phases)."""
    pipe_s = WanPipeline(_cfg(guide_scale=5.0))
    pipe_t = WanPipeline(_cfg(guide_scale=(5.0, 5.0)), params=pipe_s.params,
                         params_low=pipe_s.params_low)
    a = np.asarray(pipe_s.generate("a bird", seed=0).latents)
    b = np.asarray(pipe_t.generate("a bird", seed=0).latents)
    np.testing.assert_array_equal(a, b)


def test_moe_guide_pair_per_phase():
    """(low, high) CFG scales apply per expert phase: changing only the
    low-noise scale changes the output, and a (low, high) run differs from
    both uniform-scale runs (reference passes the wan.configs tuple through,
    magcache_generate.py:715)."""
    pipe = WanPipeline(_cfg(guide_scale=(3.0, 4.0)))
    mixed = np.asarray(pipe.generate("a bird", seed=0).latents)
    uni_hi = np.asarray(
        WanPipeline(_cfg(guide_scale=4.0), params=pipe.params,
                    params_low=pipe.params_low)
        .generate("a bird", seed=0).latents)
    uni_lo = np.asarray(
        WanPipeline(_cfg(guide_scale=3.0), params=pipe.params,
                    params_low=pipe.params_low)
        .generate("a bird", seed=0).latents)
    assert np.abs(mixed - uni_hi).max() > 1e-5
    assert np.abs(mixed - uni_lo).max() > 1e-5
    # the high-noise phase of the mixed run IS the uniform-high run's phase:
    # with boundary at step b, the first phase outputs agree, so the runs
    # only diverge through the low-noise phase. Cheap structural check: the
    # mixed run is closer to uni_hi early... (skipped — phase outputs are not
    # exposed; the two inequality checks above pin the wiring)


def test_cli_a14b_defaults():
    """Bare --task t2v-A14B/i2v-A14B/ti2v-5B resolve the wan.configs defaults
    (steps/shift/guide/frame_num, _validate_args magcache_generate.py:409-419)
    and auto-engage the MoE boundary."""
    from magcache_tpu.cli.generate import build_parser

    def wan_cfg(argv):
        from magcache_tpu.cli import generate as G
        args = build_parser().parse_args(argv)
        # resolve config without building the full-size pipeline: replicate
        # the _wan_pipeline config block on tiny geometry
        args.tiny = True
        _, cfg = G._wan_pipeline(args)
        return cfg

    c = wan_cfg(["--task", "t2v-A14B", "--prompt", "x", "--size", "832*480"])
    assert c.sample_steps == 40 and c.sample_shift == 12.0
    assert c.guide_pair == (3.0, 4.0) and c.moe_boundary == 0.875
    c = wan_cfg(["--task", "i2v-A14B", "--prompt", "x", "--size", "832*480"])
    assert c.sample_steps == 40 and c.sample_shift == 5.0
    assert c.guide_pair == (3.5, 3.5) and c.moe_boundary == 0.900
    c = wan_cfg(["--task", "ti2v-5B", "--prompt", "x", "--size", "832*480"])
    assert c.sample_steps == 50 and c.sample_shift == 5.0
    assert c.guide_pair == (5.0, 5.0) and c.moe_boundary is None
    # explicit flags win
    c = wan_cfg(["--task", "t2v-A14B", "--prompt", "x", "--size", "832*480",
                 "--sample_steps", "30", "--sample_shift", "7.0",
                 "--sample_guide_scale", "6.5"])
    assert c.sample_steps == 30 and c.sample_shift == 7.0
    assert c.guide_pair == (6.5, 6.5)


def test_cli_ti2v_frame_default(monkeypatch):
    """ti2v-5B defaults frame_num to 121 (wan.configs ti2v_5B.frame_num);
    explicit --frame_num wins. Pipeline construction is stubbed so the full
    5B geometry resolves without building the model."""
    import magcache_tpu.pipelines.wan as W
    from magcache_tpu.cli import generate as G

    captured = {}

    class _Stub:
        def __init__(self, cfg, **kw):
            captured["cfg"] = cfg
    monkeypatch.setattr(W, "WanPipeline", _Stub)

    args = G.build_parser().parse_args(
        ["--task", "ti2v-5B", "--prompt", "x", "--size", "1280*704"])
    G._wan_pipeline(args)
    assert captured["cfg"].frame_num == 121
    args = G.build_parser().parse_args(
        ["--task", "ti2v-5B", "--prompt", "x", "--size", "1280*704",
         "--frame_num", "49"])
    G._wan_pipeline(args)
    assert captured["cfg"].frame_num == 49
    # A14B keeps the Wan2.1-style 81 default
    args = G.build_parser().parse_args(
        ["--task", "t2v-A14B", "--prompt", "x", "--size", "1280*720"])
    G._wan_pipeline(args)
    assert captured["cfg"].frame_num == 81
