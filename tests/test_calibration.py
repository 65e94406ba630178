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
