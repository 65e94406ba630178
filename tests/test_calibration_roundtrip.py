"""Close the calibrate -> install -> generate loop as the offline quality
gate (the reference's calibrate-then-hardcode flow,
``MagCache4Wan2.1/magcache_generate.py:163-193,921-928``): record mag ratios
on the model's own trajectory, install them, and let the E/K/R decision run
NATURALLY (no forced thresholds) — skips must happen and the cached result
must stay close to full compute."""

import json

import numpy as np
import pytest

from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig

BASE = dict(model="wan2.1-t2v-1.3B", tiny=True, size=(64, 32), frame_num=9,
            sample_steps=8, sample_solver="unipc", dtype="float32")
PROMPT = "a calibration prompt"


@pytest.fixture(scope="module")
def roundtrip():
    cal = WanPipeline(WanPipelineConfig(magcache_calibration=True, **BASE))
    rec = cal.generate(PROMPT, seed=0)
    ratios = tuple(rec.calibration["norm_ratio"])

    gen = WanPipeline(WanPipelineConfig(use_magcache=True,
                                        mag_ratios_override=ratios, **BASE),
                      params=cal.params)
    gen.record_skips = True
    cached = gen.generate(PROMPT, seed=0)

    full = WanPipeline(WanPipelineConfig(**BASE), params=cal.params)
    ref = full.generate(PROMPT, seed=0)
    return rec, ratios, cached, ref


def test_calibration_records_per_lane_stats(roundtrip):
    rec, ratios, _, _ = roundtrip
    # flat cnt ordering [cond, uncond, ...]: (steps-1)*lanes entries
    assert len(ratios) == (BASE["sample_steps"] - 1) * 2
    for name in ("norm_ratio", "norm_std", "cos_dis"):
        assert np.isfinite(rec.calibration[name]).all()


def test_recorded_ratios_drive_natural_skips(roundtrip):
    """Published defaults (E=0.12, K=2, R=0.2) + the model's OWN recorded
    ratios -> the accumulated-error rule must elect skips by itself."""
    _, _, cached, _ = roundtrip
    skips = np.asarray(cached.skips)
    assert skips.sum() > 0, "no naturally-decided skips"
    assert skips.sum() < skips.size, "schedule degenerated to all-skip"
    # retention window always computes: first 20% of forwards are unskipped
    n_ret = int(skips.size * 0.2)
    assert not skips.reshape(-1)[:n_ret].any()


def test_roundtrip_quality_close_to_full(roundtrip):
    _, _, cached, ref = roundtrip
    a, b = np.asarray(cached.latents), np.asarray(ref.latents)
    mse = float(((a - b) ** 2).mean())
    rng = float(b.max() - b.min())
    psnr = 10 * np.log10(rng * rng / mse) if mse > 0 else 99.0
    # structural gate (random init): the cached trajectory must stay close
    # to full compute, not just finite
    assert psnr > 20.0, f"latent PSNR {psnr:.2f}"


def test_recorded_ratios_decide_the_schedule(roundtrip):
    """The executed skip pattern equals the host recurrence run over the
    RECORDED ratios (not the preset's published table) — the install path
    really feeds the calibration output into the decision algebra."""
    _, ratios, cached, _ = roundtrip
    gen_cfg = WanPipelineConfig(use_magcache=True,
                                mag_ratios_override=ratios, **BASE)
    expected = WanPipeline(gen_cfg).skip_mask_for()
    executed = np.asarray(cached.skips).reshape(expected.shape)
    np.testing.assert_array_equal(executed, expected)


def test_cli_roundtrip_calibrate_to_json_to_generate(tmp_path):
    """--magcache_calibration writes *_mag_ratio.json; --mag_ratios_json
    ingests it and generation skips naturally (reference flow end-to-end)."""
    from magcache_tpu.cli.generate import main

    calib_file = str(tmp_path / "cal")
    args = ["--task", "t2v-1.3B", "--tiny", "--cpu", "--size", "64*32",
            "--frame_num", "9", "--sample_steps", "8",
            "--prompt", PROMPT, "--base_seed", "0"]
    main(args + ["--magcache_calibration", "--save_file", calib_file])
    ratio_json = calib_file + "_mag_ratio.json"
    with open(ratio_json) as f:
        ratios = json.load(f)
    assert len(ratios) == 14 and all(np.isfinite(ratios))

    out_file = str(tmp_path / "gen")
    main(args + ["--use_magcache", "--mag_ratios_json", ratio_json,
                 "--save_file", out_file])
    lat = np.load(out_file + "_latents.npy")
    assert np.isfinite(lat).all()
