"""Flow-match DPM-Solver++(2M) scheduler tests (OmniGen2 --scheduler
dpmsolver++, reference inference.py:41-47,220-228)."""
import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.schedulers.dpm_flow import dpmpp_2m_flow_coeffs


def test_perfect_model_one_step_recovers_data():
    # if the model predicts the true velocity of a straight flow-match path
    # x_t = (1-s)x0 + s*eps (v = eps - x0), the final sigma=0 update lands
    # exactly on x0 regardless of where it starts
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 8)).astype(np.float32)
    eps = rng.standard_normal((2, 8)).astype(np.float32)
    sigmas = np.array([1.0, 0.6, 0.3, 0.0])
    co = dpmpp_2m_flow_coeffs(sigmas)
    x = eps.copy()          # x at sigma=1
    x0p = np.zeros_like(x)
    for i in range(3):
        s = sigmas[i]
        v = eps - x0        # exact velocity everywhere on the path
        pred = x - co["sigma_t"][i] * v
        d = co["a"][i] * pred + co["b"][i] * x0p
        x = co["c_x"][i] * x + co["c_d"][i] * d
        x0p = pred
    np.testing.assert_allclose(x, x0, rtol=1e-5, atol=1e-5)


def test_omnigen2_edit_split_lane_dpm_runs_and_differs_from_euler():
    from magcache_tpu.pipelines.omnigen2 import (
        OmniGen2Pipeline,
        OmniGen2PipelineConfig,
    )
    lats = {}
    for sched in ("euler", "dpmsolver++"):
        cfg = OmniGen2PipelineConfig(
            mode="edit", num_inference_steps=4, tiny=True, height=32,
            width=32, txt_len=6, scheduler=sched, use_magcache=True)
        out = OmniGen2Pipeline(cfg).generate("x", seed=0)
        lats[sched] = np.asarray(out.latents)
        assert np.isfinite(lats[sched]).all()
    assert not np.allclose(lats["euler"], lats["dpmsolver++"])
