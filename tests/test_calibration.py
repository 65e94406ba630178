"""Calibration statistics parity vs a torch transcription of the reference math.

The reference computes per-token norm ratios, their (unbiased) std, and mean
cosine distance (``MagCache4Wan2.1/magcache_generate.py:166-173``). We verify
our jnp implementation against torch-CPU doing exactly those ops.
"""

import numpy as np
import pytest

from magcache_tpu.core.calibration import CalibrationRecorder, calibration_stats

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("shape", [(1, 64, 32), (2, 128, 16), (77, 8)])
def test_calibration_stats_match_torch(shape):
    rng = np.random.default_rng(42)
    r = rng.normal(size=shape).astype(np.float32)
    p = rng.normal(size=shape).astype(np.float32)

    ours = np.asarray(calibration_stats(r, p))

    rt, pt = torch.tensor(r), torch.tensor(p)
    ratio_tok = rt.norm(dim=-1) / pt.norm(dim=-1)
    expected_ratio = ratio_tok.mean().item()
    expected_std = ratio_tok.std().item()
    expected_cos = (1 - F.cosine_similarity(rt, pt, dim=-1, eps=1e-8)).mean().item()

    np.testing.assert_allclose(ours[0], expected_ratio, rtol=1e-5)
    np.testing.assert_allclose(ours[1], expected_std, rtol=1e-4)
    np.testing.assert_allclose(ours[2], expected_cos, rtol=1e-5, atol=1e-6)


def test_recorder_round_trip(tmp_path):
    rec = CalibrationRecorder(lanes=2)
    rec.record_batch(np.array([[1.01234567, 0.001, 0.02], [0.99, 0.002, 0.03]]))
    assert rec.norm_ratio == [1.01235, 0.99]
    rec.save(str(tmp_path / "test"))
    import json
    with open(tmp_path / "test_mag_ratio.json") as f:
        assert json.load(f) == [1.01235, 0.99]
    np.testing.assert_array_equal(rec.mag_ratios(), [1.01235, 0.99])


def test_unipc_calibration_differs_from_euler_and_matches_trajectory():
    """Calibration must run inside the generation solver (reference:
    magcache_generate.py:921-928). On the same toy model, UniPC-trajectory
    stats differ measurably from Euler-trajectory stats — the round-1 bug of
    always calibrating with Euler silently corrupted UniPC schedules."""
    import jax
    import jax.numpy as jnp

    from magcache_tpu.core.sampler import (
        DiTCore, calibrate_euler, calibrate_unipc, sample_unipc)
    from magcache_tpu.schedulers.flow_match import FlowMatchSchedule
    from magcache_tpu.schedulers.unipc import UniPCSchedule

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    params = {
        "w1": jax.random.normal(ks[0], (8, 24)) * 0.4,
        "w2": jax.random.normal(ks[1], (24, 8)) * 0.4,
    }
    core = DiTCore(
        prepare=lambda p, x, t, c: (x + 0.01 * t[:, None] + c, None),
        trunk=lambda p, h, ctx: h + jnp.tanh(h @ p["w1"]) @ p["w2"],
        head=lambda p, h, ctx: h,
    )
    steps = 12
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    cond = jnp.concatenate([jnp.asarray(rng.normal(size=(2, 8)), jnp.float32),
                            jnp.zeros((2, 8), jnp.float32)])

    usch = UniPCSchedule.create(steps, shift=3.0)
    esch = FlowMatchSchedule.create(steps, shift=3.0)

    xu, stats_u = calibrate_unipc(core, params, x, cond, usch,
                                  lanes=2, guidance_scale=5.0)
    xe, stats_e = calibrate_euler(core, params, x, cond,
                                  timesteps=esch.timesteps,
                                  dts=np.diff(esch.sigmas),
                                  lanes=2, guidance_scale=5.0)
    assert stats_u.shape == (steps - 1, 2, 3)
    assert stats_e.shape == (steps - 1, 2, 3)
    assert np.isfinite(np.asarray(stats_u)).all()
    # trajectories differ -> recorded mag_ratios differ (the bug was real)
    ratios_u = np.asarray(stats_u[:, :, 0])
    ratios_e = np.asarray(stats_e[:, :, 0])
    assert np.abs(ratios_u - ratios_e).max() > 1e-4

    # calibration's full-compute final sample == generation's full-compute run
    x_gen = sample_unipc(core, params, x, cond, usch, guidance_scale=5.0)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(x_gen),
                               rtol=1e-5, atol=1e-5)


def test_framepack_calibration_mode():
    """FramePack calibration (the reference patches magcache_calibration into
    the same per-section forward): per-section full-compute stats accumulate
    across sections like the reference's class-level lists."""
    from magcache_tpu.pipelines.framepack import (FramePackPipeline,
                                                  FramePackPipelineConfig)
    steps, sections = 4, 2
    cfg = FramePackPipelineConfig(
        tiny=True, pyramid=False, height=64, width=64, txt_len=16,
        latent_window_size=3, total_sections=sections, steps=steps,
        magcache_calibration=True)
    pipe = FramePackPipeline(cfg)
    # record_skips + calibration must not crash (the evaluator's standard
    # comparator setup); calibration wins, skips stay None
    pipe.record_skips = True
    out = pipe.generate("a cat", seed=0)
    assert out.calibration is not None
    assert out.skips is None
    # one continuous cnt across sections: section boundaries carry the
    # previous section's final residual, so only the very first forward has
    # no predecessor (steps * sections - 1 entries, the reference's
    # class-level lists)
    n = steps * sections - 1
    assert len(out.calibration["norm_ratio"]) == n
    r = np.asarray(out.calibration["norm_ratio"])
    assert np.isfinite(r).all() and (r > 0).all()


def test_omnigen2_calibration_t2i_and_edit():
    """OmniGen2 calibration: per-branch stats in the reference's flat
    (cond, uncond[, ref]) cnt order — 2 lanes for t2i, 3 for edit (the
    split-lane program pair)."""
    from magcache_tpu.pipelines.omnigen2 import (OmniGen2Pipeline,
                                                 OmniGen2PipelineConfig)
    steps = 4
    for mode, lanes in (("t2i", 2), ("edit", 3)):
        cfg = OmniGen2PipelineConfig(
            mode=mode, tiny=True, num_inference_steps=steps,
            magcache_calibration=True, dtype="float32")
        pipe = OmniGen2Pipeline(cfg)
        out = pipe.generate("a cat", seed=0)
        assert out.calibration is not None, mode
        n = (steps - 1) * lanes
        assert len(out.calibration["norm_ratio"]) == n, mode
        r = np.asarray(out.calibration["norm_ratio"])
        assert np.isfinite(r).all() and (r > 0).all(), mode


def test_sample_euler_calibrate_matches_calibrate_euler():
    """sample_euler(calibrate=True) — calibration riding the pipeline's own
    trajectory — agrees with the standalone recorder on the plain-euler path
    (differences are compile-variant f32 rounding only)."""
    import jax
    import jax.numpy as jnp

    from magcache_tpu.core.sampler import calibrate_euler, sample_euler
    from magcache_tpu.models.wan import (WanConfig, init_wan_params,
                                         make_wan_core)
    cfg = WanConfig.tiny()
    core = make_wan_core(cfg, (2, 2, 4))
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 2, 4, 8, cfg.in_channels)),
                    jnp.float32)
    cond = {"context": jnp.asarray(
        rng.normal(size=(2, cfg.text_len, cfg.text_dim)), jnp.float32)}
    ts = np.linspace(1000, 1, 5).astype(np.float32)
    dts = -np.ones(5, np.float32) * 0.1
    xa, sa = calibrate_euler(core, params, x, cond, timesteps=ts, dts=dts,
                             lanes=2, guidance_scale=5.0)
    xb, sb = sample_euler(core, params, x, cond, timesteps=ts, dts=dts,
                          guidance_scale=5.0, calibrate=True)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                               rtol=1e-3, atol=1e-5)
    assert np.asarray(sb).shape == (4, 2, 3)


def test_videosys_families_calibration_mode():
    """Every videosys-family pipeline records calibration on its own
    trajectory (DDIM / RFLOW / flow-match / Euler-Ancestral); lengths follow
    (steps-1) x lanes; OSP v110's PNDM recorder is explicitly rejected."""
    import pytest

    steps = 4
    from magcache_tpu.pipelines.latte import LattePipeline, LattePipelineConfig
    cal = LattePipeline(LattePipelineConfig(
        tiny=True, num_frames=4, height=64, width=64, caption_len=6,
        num_sampling_steps=steps, magcache_calibration=True)).generate("x")
    # the Latte cache is single-lane over the joint CFG batch, so the
    # recording must be one joint residual ratio per step (installable back)
    assert len(cal.calibration["norm_ratio"]) == steps - 1
    out = LattePipeline(LattePipelineConfig(
        tiny=True, num_frames=4, height=64, width=64, caption_len=6,
        num_sampling_steps=steps, use_magcache=True, magcache_thresh=1e9,
        magcache_ratios=tuple(cal.calibration["norm_ratio"]))).generate("x")
    assert out.latents.shape == cal.latents.shape

    from magcache_tpu.pipelines.vchitect import (VchitectPipeline,
                                                 VchitectPipelineConfig)
    out = VchitectPipeline(VchitectPipelineConfig(
        tiny=True, num_frames=4, height=32, width=32, txt_len=6,
        num_inference_steps=steps, magcache_calibration=True)).generate("x")
    assert len(out.calibration["norm_ratio"]) == (steps - 1) * 2

    from magcache_tpu.pipelines.open_sora import (OpenSoraPipeline,
                                                  OpenSoraPipelineConfig)
    cal = OpenSoraPipeline(OpenSoraPipelineConfig(
        tiny=True, num_sampling_steps=steps,
        magcache_calibration=True)).generate("x")
    assert len(cal.calibration["norm_ratio"]) == steps - 1
    out = OpenSoraPipeline(OpenSoraPipelineConfig(
        tiny=True, num_sampling_steps=steps, use_magcache=True,
        magcache_ratios=tuple(cal.calibration["norm_ratio"]))).generate("x")
    assert out.latents.shape == cal.latents.shape

    from magcache_tpu.pipelines.cogvideox import (CogVideoXPipeline,
                                                  CogVideoXPipelineConfig)
    cal = CogVideoXPipeline(CogVideoXPipelineConfig(
        tiny=True, num_frames=9, height=32, width=32, txt_len=6,
        num_inference_steps=steps, magcache_calibration=True)).generate("x")
    assert len(cal.calibration["norm_ratio"]) == steps - 1
    out = CogVideoXPipeline(CogVideoXPipelineConfig(
        tiny=True, num_frames=9, height=32, width=32, txt_len=6,
        num_inference_steps=steps, use_magcache=True,
        magcache_ratios=tuple(cal.calibration["norm_ratio"]))).generate("x")
    assert out.latents.shape == cal.latents.shape

    from magcache_tpu.pipelines.open_sora_plan import (
        OpenSoraPlanPipeline, OpenSoraPlanPipelineConfig)
    out = OpenSoraPlanPipeline(OpenSoraPlanPipelineConfig(
        tiny=True, version="v120", num_frames=5, height=32, width=32,
        caption_len=6, num_inference_steps=steps,
        magcache_calibration=True)).generate("x")
    assert len(out.calibration["norm_ratio"]) == (steps - 1) * 2

    with pytest.raises(ValueError, match="v120"):
        OpenSoraPlanPipeline(OpenSoraPlanPipelineConfig(
            tiny=True, version="v110", num_frames=5, height=32, width=32,
            caption_len=6, num_inference_steps=steps,
            magcache_calibration=True)).generate("x")
