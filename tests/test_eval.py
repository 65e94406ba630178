"""Eval harness tests: PSNR/SSIM parity vs independent implementations,
LPIPS behavior, golden-compare walker, VBench aggregation."""

import json
import os

import numpy as np
import pytest

from magcache_tpu.eval.compare import compare_dirs, compare_videos, write_report
from magcache_tpu.eval.metrics import LPIPSModel, lpips_distance, psnr, ssim
from magcache_tpu.eval.vbench import QUALITY_LIST, SEMANTIC_LIST, aggregate_vbench


def test_psnr_identity_and_known_value():
    a = np.random.default_rng(0).uniform(size=(2, 16, 16, 3))
    assert psnr(a, a) == 100.0
    b = np.clip(a + 0.1, 0, 1)
    mse = np.mean((a[0] - b[0]) ** 2)
    expected0 = 20 * np.log10(1 / np.sqrt(mse))
    mse1 = np.mean((a[1] - b[1]) ** 2)
    expected = (expected0 + 20 * np.log10(1 / np.sqrt(mse1))) / 2
    np.testing.assert_allclose(psnr(a, b), expected, rtol=1e-6)


def test_ssim_identity_and_monotonic():
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(1, 32, 32, 3))
    assert ssim(a, a) > 0.999
    small = np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1)
    big = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1)
    assert ssim(a, small) > ssim(a, big)


def test_ssim_matches_reference_formula():
    """Cross-check one frame against a direct transcription using scipy."""
    from scipy.signal import convolve2d
    rng = np.random.default_rng(2)
    a = rng.uniform(size=(32, 32)).astype(np.float64) * 255
    b = np.clip(a + rng.normal(0, 10, a.shape), 0, 255)
    g = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5 ** 2)); g /= g.sum()
    win = np.outer(g, g)
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1 = convolve2d(a, win, mode="valid"); mu2 = convolve2d(b, win, mode="valid")
    s1 = convolve2d(a * a, win, mode="valid") - mu1 ** 2
    s2 = convolve2d(b * b, win, mode="valid") - mu2 ** 2
    s12 = convolve2d(a * b, win, mode="valid") - mu1 * mu2
    expected = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2))
                / ((mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))).mean()
    got = ssim((a / 255)[None, :, :, None], (b / 255)[None, :, :, None])
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_lpips_zero_for_identical_and_monotonic():
    rng = np.random.default_rng(3)
    a = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    assert lpips_distance(a, a) < 1e-6
    near = np.clip(a + rng.normal(0, 0.01, a.shape), 0, 1).astype(np.float32)
    far = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1).astype(np.float32)
    assert lpips_distance(a, near) < lpips_distance(a, far)


def test_lpips_torch_state_dict_mapping():
    """Shape-level converter check with a synthetic lpips-alex state dict."""
    specs = [(11, 64, 3), (5, 192, 64), (3, 384, 192), (3, 256, 384), (3, 256, 256)]
    slices = [(1, 0), (2, 3), (3, 6), (4, 8), (5, 10)]
    sd = {}
    rng = np.random.default_rng(0)
    for (k, cout, cin), (sl, idx) in zip(specs, slices):
        sd[f"net.slice{sl}.{idx}.weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32)
        sd[f"net.slice{sl}.{idx}.bias"] = np.zeros(cout, np.float32)
    for i, c in enumerate([64, 192, 384, 256, 256]):
        sd[f"lin{i}.model.1.weight"] = np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32)
    model = LPIPSModel.from_torch_state_dict(sd)
    assert model.pretrained
    a = np.random.default_rng(1).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    d = lpips_distance(a, np.roll(a, 3, axis=1), model=model)
    assert np.isfinite(d) and d > 0


def test_compare_dirs_and_report(tmp_path):
    rng = np.random.default_rng(0)
    gold = tmp_path / "gold"; cached = tmp_path / "cached"
    gold.mkdir(); cached.mkdir()
    for i in range(3):
        v = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
        np.save(gold / f"v{i}.npy", v)
        np.save(cached / f"v{i}.npy", np.clip(v + rng.normal(0, 0.05, v.shape), 0, 1))
    res = compare_dirs(str(cached), str(gold), metrics=("psnr", "ssim"))
    assert res["count"] == 3
    assert 10 < res["mean"]["psnr"] < 40
    p = write_report(res, str(tmp_path / "report.txt"))
    assert "mean psnr" in open(p).read()


def test_vbench_aggregation_weights():
    scores = {d: 0.8 for d in QUALITY_LIST + SEMANTIC_LIST}
    out = aggregate_vbench(scores)
    assert set(out) == {"total score", "quality score", "semantic score"}
    # total = (4q + s)/5
    np.testing.assert_allclose(
        out["total score"],
        (4 * out["quality score"] + out["semantic score"]) / 5, rtol=1e-9)
    # perfect scores (at max of each range, dims capped) -> quality 1.0
    perfect = {d: 1.0 for d in QUALITY_LIST}
    perfect.update({"motion smoothness": 0.9975, "scene": 0.8222,
                    "appearance style": 0.2855, "temporal style": 0.364,
                    "overall consistency": 0.364,
                    **{d: 1.0 for d in SEMANTIC_LIST if d not in
                       ("scene", "appearance style", "temporal style", "overall consistency")}})
    out2 = aggregate_vbench(perfect)
    np.testing.assert_allclose(out2["total score"], 1.0, rtol=1e-6)


def test_run_experiment_harness(tmp_path):
    from magcache_tpu.eval.experiments import run_experiment
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig

    def make(variant):
        return WanPipeline(WanPipelineConfig(
            tiny=True, size=(64, 32), frame_num=9, sample_steps=4,
            sample_solver="euler", dtype="float32",
            use_magcache=(variant == "magcache")))

    res = run_experiment(make, ["a cat", "a dog"],
                         variants=("base", "magcache"),
                         out_dir=str(tmp_path), metrics=("psnr",))
    assert "magcache" in res and res["magcache"].metrics_vs_base["psnr"] > 5
    assert (tmp_path / "summary.json").exists()
    assert (tmp_path / "base_0.npy").exists()


def test_lpips_random_backbone_warns():
    """lpips_distance must refuse to be silently meaningless (round-1 review
    weak #5): a random backbone fires a UserWarning unless acknowledged."""
    import warnings

    import magcache_tpu.eval.metrics as M

    a = np.random.default_rng(0).random((1, 32, 32, 3)).astype(np.float32)
    M._DEFAULT_LPIPS = None
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lpips_distance(a, a)
        assert any("RANDOM" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lpips_distance(a, a, allow_random_backbone=True)
        assert not any("RANDOM" in str(x.message) for x in w)


def test_load_lpips_weights_safetensors(tmp_path):
    """load_lpips_weights installs a pretrained default from a synthetic
    lpips-alex checkpoint; subsequent calls stop warning."""
    import warnings

    from safetensors.numpy import save_file

    import magcache_tpu.eval.metrics as M

    specs = [(11, 4, 2, 64), (5, 1, 2, 192), (3, 1, 1, 384), (3, 1, 1, 256),
             (3, 1, 1, 256)]
    rng = np.random.default_rng(0)
    sd, cin = {}, 3
    conv_idx = [0, 0, 0, 0, 0]
    for i, (k, s, p, cout) in enumerate(specs):
        sd[f"net.slice{i+1}.{i}.weight"] = rng.normal(0, 0.05, (cout, cin, k, k)).astype(np.float32)
        sd[f"net.slice{i+1}.{i}.bias"] = np.zeros(cout, np.float32)
        cin = cout
    for i, c in enumerate((64, 192, 384, 256, 256)):
        sd[f"lin{i}.model.1.weight"] = np.abs(rng.normal(0, 0.05, (1, c, 1, 1))).astype(np.float32)
    path = tmp_path / "lpips_alex.safetensors"
    save_file(sd, str(path))

    model = M.load_lpips_weights(str(path))
    assert model.pretrained
    a = rng.random((1, 32, 32, 3)).astype(np.float32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        M.lpips_distance(a, a)
        assert not any("RANDOM" in str(x.message) for x in w)
    M._DEFAULT_LPIPS = None  # restore


def test_evaluate_cli_self_check(tmp_path):
    """The quality-gate CLI runs full-vs-magcache on the tiny model and
    reports PSNR/SSIM (reference flow: common_metrics/eval.py:76-150)."""
    from magcache_tpu.cli.evaluate import main

    out = tmp_path / "EVAL.json"
    res = main(["--self_check", "--cpu", "--steps", "4",
                "--json", str(out)])
    assert out.exists()
    m = res["metrics_magcache_vs_full"]
    assert np.isfinite(m["latent_psnr"]) and np.isfinite(m["latent_ssim"])
    # anti-vacuity: every comparator variant actually skipped
    for fam, key in (("wan", "magcache"), ("wan", "teacache"),
                     ("flux", "magcache"), ("framepack", "teacache"),
                     ("omnigen2", "taylorseer")):
        assert res[fam]["skips"][key]["skipped"] > 0
