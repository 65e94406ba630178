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


def test_wan_dpm_solver_runs_and_differs_from_unipc():
    # reference --sample_solver choices are unipc/dpm++
    # (magcache_generate.py:728-731); both must run the cached pipeline and
    # produce distinct trajectories
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig
    lats = {}
    for solver in ("unipc", "dpm++"):
        cfg = WanPipelineConfig(model="wan2.1-t2v-1.3B", tiny=True,
                                size=(64, 32), frame_num=9,
                                sample_steps=4, sample_solver=solver,
                                use_magcache=True)
        out = WanPipeline(cfg).generate("x", seed=0)
        lats[solver] = np.asarray(out.latents)
        assert np.isfinite(lats[solver]).all()
    assert not np.allclose(lats["unipc"], lats["dpm++"])


def test_dpm_calibration_rides_dpm_trajectory():
    # calibrate_euler(dpm_coeffs=...) must record stats from the DPM++
    # trajectory, not Euler's (SURVEY §7.4: calibration drift corrupts
    # schedules) — toy-core check, the Wan pipeline passes dpm through
    from magcache_tpu.core.sampler import calibrate_euler
    from tests.test_sampler import DIM, make_toy

    core, params = make_toy(5)
    n = 6
    sigmas = np.linspace(1.0, 0.0, n + 1)
    timesteps = (sigmas[:-1] * 1000.0).astype(np.float32)
    co = dpmpp_2m_flow_coeffs(sigmas)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (2, DIM))
    cond = jax.random.normal(jax.random.PRNGKey(5), (2, 4))
    _, s_eul = calibrate_euler(core, params, x0, cond, timesteps=timesteps,
                               dts=np.diff(sigmas))
    _, s_dpm = calibrate_euler(core, params, x0, cond, timesteps=timesteps,
                               dts=np.zeros(n), dpm_coeffs=co)
    assert not np.allclose(np.asarray(s_eul), np.asarray(s_dpm))
