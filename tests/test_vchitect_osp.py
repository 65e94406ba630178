"""Vchitect + Open-Sora-Plan model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.core.sampler import sample_euler
from magcache_tpu.models.open_sora_plan import (
    OpenSoraPlanConfig,
    init_osp_params,
    make_osp_core,
)
from magcache_tpu.models.vchitect import (
    VchitectConfig,
    init_vchitect_params,
    make_vchitect_core,
)
from magcache_tpu.schedulers.flow_match import FlowMatchSchedule


def test_vchitect_forward_and_sampling():
    cfg = VchitectConfig.tiny()
    params = init_vchitect_params(jax.random.PRNGKey(0), cfg)
    core = make_vchitect_core(cfg, (2, 4, 4), txt_len=6)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 8, cfg.in_channels)), jnp.float32)
    cond = {"txt": jnp.asarray(rng.normal(size=(2, 6, cfg.text_dim)), jnp.float32),
            "vec": jnp.asarray(rng.normal(size=(2, cfg.vec_dim)), jnp.float32)}
    t = jnp.full((2,), 500.0, jnp.float32)
    hidden, ctx = core.prepare(params, jnp.concatenate([x, x]), t, cond)
    assert hidden.shape == (2, 32, cfg.hidden)
    out = core.head(params, core.trunk(params, hidden, ctx), ctx)
    assert out.shape == (2, 2, 8, 8, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()

    sch = FlowMatchSchedule.create(3, shift=3.0)
    s = sample_euler(core, params, x, cond, timesteps=sch.timesteps,
                     dts=np.diff(sch.sigmas), guidance_scale=7.0)
    assert np.isfinite(np.asarray(s)).all()


def test_osp_forward_and_sampling():
    cfg = OpenSoraPlanConfig.tiny()
    params = init_osp_params(jax.random.PRNGKey(0), cfg)
    core = make_osp_core(cfg, (2, 4, 4), caption_len=6)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 8, cfg.in_channels)), jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(2, 6, cfg.caption_dim)), jnp.float32)}
    t = jnp.full((2,), 400.0, jnp.float32)
    hidden, ctx = core.prepare(params, jnp.concatenate([x, x]), t, cond)
    assert hidden.shape == (2, 32, cfg.hidden)
    out = core.head(params, core.trunk(params, hidden, ctx), ctx)
    assert out.shape == (2, 2, 8, 8, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()

    sch = FlowMatchSchedule.create(3)
    s = sample_euler(core, params, x, cond, timesteps=sch.timesteps,
                     dts=np.diff(sch.sigmas), guidance_scale=5.0)
    assert np.isfinite(np.asarray(s)).all()


# ---------------------------------------------------------------------------
# Round 2: the B11/B12 models become reachable products (pipelines + CLI)
# ---------------------------------------------------------------------------

def test_vchitect_pipeline_generates():
    from magcache_tpu.pipelines.vchitect import (
        VchitectPipeline, VchitectPipelineConfig)

    cfg = VchitectPipelineConfig(tiny=True, num_frames=4, height=32, width=32,
                                 num_inference_steps=3, txt_len=6,
                                 use_magcache=True, retention_ratio=0.3)
    out = VchitectPipeline(cfg).generate("a red panda drumming", seed=1)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_open_sora_plan_pipeline_generates_and_is_seeded():
    from magcache_tpu.pipelines.open_sora_plan import (
        OpenSoraPlanPipeline, OpenSoraPlanPipelineConfig)

    cfg = OpenSoraPlanPipelineConfig(tiny=True, num_frames=5, height=32,
                                     width=32, num_inference_steps=4,
                                     caption_len=6)
    pipe = OpenSoraPlanPipeline(cfg)
    a = np.asarray(pipe.generate("a glass orb", seed=3).latents)
    b = np.asarray(pipe.generate("a glass orb", seed=3).latents)
    c = np.asarray(pipe.generate("a glass orb", seed=4).latents)
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)          # ancestral noise is seeded
    assert np.abs(a - c).max() > 1e-6


def test_euler_ancestral_schedule_matches_diffusers_semantics():
    """Verbatim numpy oracle of diffusers EulerAncestralDiscreteScheduler
    (linspace spacing, epsilon prediction) stepping a linear model — the
    scan-sampler arrays must reproduce the trajectory exactly."""
    from magcache_tpu.core.sampler import DiTCore, sample_euler
    from magcache_tpu.schedulers.euler_ancestral import EulerAncestralSchedule

    steps, train = 6, 1000
    sch = EulerAncestralSchedule.create(steps, train_steps=train)

    # oracle: diffusers semantics with the same per-step gaussian draws
    betas = np.linspace(0.0001, 0.02, train)
    abar = np.cumprod(1 - betas)
    sig_all = np.sqrt((1 - abar) / abar)
    ts = np.linspace(0, train - 1, steps)[::-1]
    sigmas = np.concatenate([np.interp(ts, np.arange(train), sig_all), [0.0]])

    A = np.asarray(np.random.default_rng(0).normal(size=(1, 8)), np.float32)
    W = np.asarray(np.random.default_rng(1).normal(size=(8, 8)) * 0.1, np.float32)

    def model_eps(x_scaled, t):
        return np.tanh(x_scaled @ W) + 0.01 * t / train

    import jax
    key = jax.random.PRNGKey(5)
    zs = [np.asarray(jax.random.normal(jax.random.fold_in(key, i), (1, 8),
                                       jnp.float32)) for i in range(steps)]

    x = A * sigmas[0]
    for i in range(steps):
        s1, s2 = sigmas[i], sigmas[i + 1]
        eps = model_eps(x / np.sqrt(s1 ** 2 + 1), ts[i])
        sigma_up = np.sqrt(max(s2 ** 2 * (s1 ** 2 - s2 ** 2) / s1 ** 2, 0.0))
        sigma_down = np.sqrt(max(s2 ** 2 - sigma_up ** 2, 0.0))
        x = x + (sigma_down - s1) * eps
        x = x + sigma_up * zs[i]

    # The sampler's v is head(trunk(prepare(x*cin))); with trunk = input + eps
    # (a nonzero residual for the cache boundary) the update becomes
    #   x <- cx*x + dt*(x*cin + eps);  choosing cx_i = 1 - dt_i*cin_i
    # reproduces the oracle's x + dt*eps exactly.
    core = DiTCore(
        prepare=lambda p, xx, t, c: (xx, t),
        trunk=lambda p, h, ctx: h + (jnp.tanh(h @ jnp.asarray(W))
                                     + 0.01 * ctx[:, None] / train),
        head=lambda p, h, ctx: h,
    )
    cx = 1.0 - sch.dts * sch.in_scales
    out = sample_euler(
        core, None, jnp.asarray(A * sigmas[0], jnp.float32), None,
        timesteps=sch.timesteps, dts=sch.dts, x_coeffs=cx,
        in_scales=sch.in_scales, noise_scales=sch.noise_scales,
        noise_key=key)
    np.testing.assert_allclose(np.asarray(out), x, rtol=2e-4, atol=2e-4)


def test_pndm_schedule_matches_diffusers_semantics():
    """Numpy oracle of diffusers PNDMScheduler (skip_prk, plms, leading
    spacing, scaled_linear betas) stepping a linear eps model."""
    from magcache_tpu.core.sampler import DiTCore, sample_pndm
    from magcache_tpu.schedulers.pndm import PNDMSchedule

    steps, train = 6, 1000
    sch = PNDMSchedule.create(steps, train_steps=train)

    betas = np.linspace(0.0001 ** 0.5, 0.02 ** 0.5, train) ** 2
    abar = np.cumprod(1 - betas)
    ratio = train // steps
    base = np.arange(steps) * ratio
    # set_timesteps: plms_timesteps duplicates the second-to-last ascending
    # timestep, then reverses — n+1 iterations
    ts = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
    assert len(ts) == steps + 1 and ts[1] == ts[2]

    W = np.asarray(np.random.default_rng(1).normal(size=(8, 8)) * 0.1,
                   np.float32)

    def model_eps(x, t):
        return np.tanh(x @ W) + 0.001 * t

    def transfer(x, t, t_prev, e_p):
        a_t = abar[t]
        # final_alpha_cumprod = abar[0] (PNDM set_alpha_to_one=False default)
        a_prev = abar[t_prev] if t_prev >= 0 else abar[0]
        x_coef = np.sqrt(a_prev / a_t)
        e_coef = -(a_prev - a_t) / (np.sqrt(a_t) * (
            np.sqrt(1 - a_prev) + np.sqrt(a_prev * (1 - a_t) / a_t)))
        return x_coef * x + e_coef * e_p

    x = np.asarray(np.random.default_rng(0).normal(size=(1, 8)), np.float32)
    x0 = x.copy()
    # faithful step_plms transcription: counter-1 Heun redo from cur_sample
    # with averaged eps and no history append
    ets, cur_sample = [], None
    for counter, t in enumerate(ts):
        e = model_eps(x, t)
        t_prev = t - ratio
        if counter != 1:
            ets = ets[-3:] + [e]
        else:
            t_prev, t = t, t + ratio
        if len(ets) == 1 and counter == 0:
            e_p = e
            cur_sample = x
        elif len(ets) == 1 and counter == 1:
            e_p = (e + ets[-1]) / 2
            x = cur_sample
        elif len(ets) == 2:
            e_p = (3 * ets[-1] - ets[-2]) / 2
        elif len(ets) == 3:
            e_p = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
        else:
            e_p = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3]
                   - 9 * ets[-4]) / 24
        x = transfer(x, t, t_prev, e_p)

    # the trunk must carry a nonzero residual (cache boundary), so it adds
    # eps on top of its input and the head subtracts the input back out
    # (prepare threads x through ctx)
    core = DiTCore(
        prepare=lambda p, xx, t, c: (xx, (t, xx)),
        trunk=lambda p, h, ctx: h + (jnp.tanh(h @ jnp.asarray(W))
                                     + 0.001 * ctx[0][:, None]),
        head=lambda p, h, ctx: h - ctx[1],
    )
    out = sample_pndm(core, None, jnp.asarray(x0), None, sch)
    np.testing.assert_allclose(np.asarray(out), x, rtol=2e-4, atol=2e-4)


def test_open_sora_plan_v110_pipeline():
    from magcache_tpu.pipelines.open_sora_plan import (
        OpenSoraPlanPipeline, OpenSoraPlanPipelineConfig)

    cfg = OpenSoraPlanPipelineConfig(version="v110", tiny=True, num_frames=5,
                                     height=32, width=32,
                                     num_inference_steps=5, caption_len=6,
                                     use_magcache=True, retention_ratio=0.4)
    out = OpenSoraPlanPipeline(cfg).generate("a lighthouse at dusk", seed=2)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_vchitect_pab_refresh_matches_plain_and_sampler_runs():
    """Vchitect PAB (reference: VchitectPABConfig, pipeline_vchitect.py:32-44):
    a refresh step equals the plain trunk; broadcast steps reuse caches
    through a full sampled run."""
    import jax.numpy as jnp

    from magcache_tpu.core.pab import PABConfig
    from magcache_tpu.core.sampler import sample_euler
    from magcache_tpu.models.vchitect import (
        VchitectConfig, init_vchitect_params, make_vchitect_core)
    from magcache_tpu.schedulers.flow_match import FlowMatchSchedule

    cfg = VchitectConfig.tiny()
    params = init_vchitect_params(jax.random.PRNGKey(0), cfg)
    grid, txt_len = (2, 2, 2), 4
    # FlowMatch timesteps are in [0, 1000); window covers the middle
    ts = FlowMatchSchedule.create(4, shift=1.0).timesteps
    pab = PABConfig(spatial_broadcast=True, spatial_threshold=(100, 800),
                    spatial_range=2, temporal_broadcast=True,
                    temporal_threshold=(100, 800), temporal_range=2,
                    mlp_broadcast=True, mlp_threshold=(100, 800), mlp_range=2)
    core_p = make_vchitect_core(cfg, grid, txt_len, pab=pab, timesteps=ts)
    core_n = make_vchitect_core(cfg, grid, txt_len)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 2, 4, 4, cfg.in_channels)), jnp.float32)
    cond = {"txt": jnp.asarray(rng.normal(size=(1, txt_len, cfg.text_dim)),
                               jnp.float32),
            "vec": jnp.asarray(rng.normal(size=(1, cfg.vec_dim)), jnp.float32)}
    t = jnp.full((1,), float(ts[0]), jnp.float32)
    hidden, ctx = core_p.prepare(params, x, t, cond)
    state = core_p.init_state(params, jax.eval_shape(lambda: hidden),
                              jax.eval_shape(lambda: ctx))
    h_p, st2 = core_p.trunk(params, hidden, ctx, state, jnp.asarray(0))
    h_n = core_n.trunk(params, hidden, ctx)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_n), atol=1e-5)
    # temporal cache = (projected video part, raw per-frame context part);
    # the video projection is zero-init (ref to_out_temporal), so assert on
    # the raw context part
    assert float(jnp.abs(st2["temporal"][1]).max()) > 0

    out = sample_euler(core_p, params, x, cond, timesteps=ts,
                       dts=np.diff(FlowMatchSchedule.create(4, shift=1.0).sigmas))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("version", ["v120", "v110"])
def test_osp_pipeline_pab_runs(version):
    """Reference OSP PAB defaults (OpenSoraPlanV120PABConfig / V110):
    the pipeline generates finitely with PAB reuse enabled."""
    from magcache_tpu.pipelines.open_sora_plan import (
        OpenSoraPlanPipeline, OpenSoraPlanPipelineConfig)

    cfg = OpenSoraPlanPipelineConfig(
        version=version, tiny=True, num_frames=5, height=32, width=32,
        num_inference_steps=3, caption_len=6, enable_pab=True)
    out = OpenSoraPlanPipeline(cfg).generate("a lighthouse at dusk", seed=2)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_osp_and_latte_caption_cleaning_reaches_encoder():
    """OSP cleans captions by default (pipeline_open_sora_plan.py:930
    clean_caption=True, applied twice); Latte only when asked
    (pipeline_latte.py:296 defaults False)."""
    from magcache_tpu.pipelines.latte import LattePipeline, LattePipelineConfig
    from magcache_tpu.pipelines.open_sora_cond import clean_caption
    from magcache_tpu.pipelines.open_sora_plan import (
        OpenSoraPlanPipeline, OpenSoraPlanPipelineConfig)

    raw = "a <p>bird</p> ((with watermark))"
    want = clean_caption(clean_caption(raw))
    assert want != raw

    seen = []

    class Recorder:
        def __init__(self, length, dim):
            self.length, self.dim = length, dim

        def __call__(self, prompts):
            seen.append(list(prompts))
            return np.zeros((len(prompts), self.length, self.dim), np.float32)

    cfg = OpenSoraPlanPipelineConfig(tiny=True, num_frames=5, height=32,
                                     width=32, num_inference_steps=2,
                                     caption_len=6)
    pipe = OpenSoraPlanPipeline(
        cfg, text_encoder=Recorder(6, cfg.model_config().caption_dim))
    pipe.generate(raw, seed=0)
    assert seen[-1][0] == want

    cfg_l = LattePipelineConfig(tiny=True, num_frames=2, height=32, width=32,
                                num_sampling_steps=2, caption_len=6)
    LattePipeline(cfg_l, text_encoder=Recorder(
        6, cfg_l.model_config().caption_dim)).generate(raw, seed=0)
    assert seen[-1][0] == raw            # default off, reference parity
    cfg_l2 = LattePipelineConfig(tiny=True, num_frames=2, height=32, width=32,
                                 num_sampling_steps=2, caption_len=6,
                                 clean_caption=True)
    LattePipeline(cfg_l2, text_encoder=Recorder(
        6, cfg_l2.model_config().caption_dim)).generate(raw, seed=0)
    assert seen[-1][0] == want
