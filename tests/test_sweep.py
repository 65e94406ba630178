"""Wan sweep harness tests (C2): prompt slicing, fixed seeds, manifest,
dp-batched generation — reference: wan_eval.sh + wan_magcache.py:1157-1180."""

import json
import os

import numpy as np

from magcache_tpu.eval.sweep import DEFAULT_PROMPTS, SweepConfig, run_sweep


def _tiny_cfg(**kw):
    base = dict(variant="full", out_dir=None, size=(64, 32), frame_num=9,
                sample_steps=2, sample_solver="euler", dtype="float32",
                tiny=True)
    base.update(kw)
    return SweepConfig(**base)


def test_sweep_slice_seeds_and_manifest(tmp_path):
    out = tmp_path / "s"
    cfg = _tiny_cfg(out_dir=str(out), start_index=1, end_index=3, base_seed=7)
    summary = run_sweep(cfg)
    assert summary["count"] == 2
    files = sorted(os.listdir(out))
    assert "00001.npy" in files and "00002.npy" in files
    rows = [json.loads(l) for l in open(out / "manifest.jsonl")]
    assert [r["index"] for r in rows] == [1, 2]
    assert [r["seed"] for r in rows] == [8, 9]          # base_seed + index
    assert rows[0]["prompt"] == DEFAULT_PROMPTS[1]

    # fixed seeds -> identical re-run
    out2 = tmp_path / "s2"
    run_sweep(_tiny_cfg(out_dir=str(out2), start_index=1, end_index=3,
                        base_seed=7))
    a = np.load(out / "00001.npy")
    b = np.load(out2 / "00001.npy")
    np.testing.assert_array_equal(a, b)


def test_sweep_dp_batched(tmp_path):
    """dp=2 consumes prompts in mesh-batched pairs through generate_batch."""
    import jax
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs 2 devices")
    out = tmp_path / "dp"
    cfg = _tiny_cfg(out_dir=str(out), end_index=4, dp=2)
    summary = run_sweep(cfg)
    assert summary["count"] == 4
    assert sorted(os.listdir(out))[:4] == [
        "00000.npy", "00001.npy", "00002.npy", "00003.npy"]


def test_sweep_vbench_loop_and_json_prompts(tmp_path):
    """VBench protocol: JSON prompt list with prompt_en fields and 5 videos
    per prompt at seed = loop index (experiments/utils.py:9-21)."""
    pf = tmp_path / "prompts.json"
    pf.write_text(json.dumps([{"prompt_en": "a red fox"},
                              {"prompt_en": "a blue bird"}]))
    out = tmp_path / "s"
    cfg = _tiny_cfg(out_dir=str(out), prompts_file=str(pf), loop=2)
    summary = run_sweep(cfg)
    assert summary["count"] == 2
    files = sorted(f for f in os.listdir(out) if f.endswith(".npy"))
    assert files == ["00000-0.npy", "00000-1.npy",
                     "00001-0.npy", "00001-1.npy"]
    rows = [json.loads(l) for l in open(out / "manifest.jsonl")]
    assert sorted({r["prompt"] for r in rows}) == ["a blue bird", "a red fox"]
    # seed == loop index, NOT base_seed + prompt index
    assert {(r["loop"], r["seed"]) for r in rows} == {(0, 0), (1, 1)}
    # same prompt, different seeds -> different latents
    a = np.load(out / "00000-0.npy")
    b = np.load(out / "00000-1.npy")
    assert np.abs(a - b).max() > 1e-4
