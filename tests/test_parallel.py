"""Sharding tests on the 8-device virtual CPU mesh: a sharded dp x sp x tp run
must produce the same numbers as single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from magcache_tpu.core.presets import make_config
from magcache_tpu.core.sampler import sample_euler
from magcache_tpu.models.wan import WanConfig, init_wan_params, make_wan_core
from magcache_tpu.parallel.mesh import (
    MeshPlan,
    activation_sharding,
    build_mesh,
    maybe_shard,
    shard_params,
    use_mesh,
)
from magcache_tpu.schedulers.flow_match import FlowMatchSchedule

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")

CFG = WanConfig.tiny(heads=4, dim=96)
GRID = (2, 4, 4)
LAT = (2, 8, 8)


def _setup():
    params = init_wan_params(jax.random.PRNGKey(0), CFG)
    core = make_wan_core(CFG, GRID)
    rng = np.random.default_rng(0)
    f, h, w = LAT
    x = jnp.asarray(rng.normal(size=(2, f, h, w, CFG.in_channels)), jnp.float32)
    cond = {"context": jnp.asarray(
        rng.normal(size=(4, CFG.text_len, CFG.text_dim)), jnp.float32)}
    return core, params, x, cond


def _run(core, params, x, cond, cache_cfg):
    sch = FlowMatchSchedule.create(4, shift=3.0)
    return sample_euler(core, params, x, cond, timesteps=sch.timesteps,
                        dts=np.diff(sch.sigmas), cache_cfg=cache_cfg,
                        guidance_scale=5.0)


def test_sharded_run_matches_single_device():
    core, params, x, cond = _setup()
    cache_cfg = make_config("wan2.1-t2v-1.3B", 4)

    ref = np.asarray(_run(core, params, x, cond, cache_cfg))

    mesh = build_mesh(dp=2, sp=2, tp=2)
    plan = MeshPlan(mesh)
    params_s = shard_params(params, mesh)
    x_s = jax.device_put(x, activation_sharding(mesh, "latents", x.ndim))
    cond_s = {"context": jax.device_put(
        cond["context"], activation_sharding(mesh, "context", 3))}

    with use_mesh(plan):
        jitted = jax.jit(lambda p, xx, cc: _run(core, p, xx, cc, cache_cfg))
        out = jitted(params_s, x_s, cond_s)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_param_sharding_specs():
    mesh = build_mesh(dp=1, sp=1, tp=8)
    params = shard_params(init_wan_params(jax.random.PRNGKey(0), CFG), mesh)
    qkv_spec = params["blocks"]["q"]["w"].sharding.spec
    assert qkv_spec == P(None, None, "tp")
    o_spec = params["blocks"]["o"]["w"].sharding.spec
    assert o_spec == P(None, "tp", None)
    # embeddings replicated
    assert params["patch_embedding"]["w"].sharding.spec == P()


def test_maybe_shard_noop_without_plan():
    x = jnp.ones((2, 4, 8))
    assert maybe_shard(x, "tokens") is x


def test_dp_only_mesh():
    core, params, x, cond = _setup()
    mesh = build_mesh(dp=2)
    ref = np.asarray(_run(core, params, x, cond, None))
    with use_mesh(MeshPlan(mesh)):
        out = jax.jit(lambda p, xx, cc: _run(core, p, xx, cc, None))(
            shard_params(params, mesh),
            jax.device_put(x, activation_sharding(mesh, "latents", x.ndim)),
            {"context": jax.device_put(cond["context"],
                                       activation_sharding(mesh, "context", 3))})
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_ring_attention_selected_and_matches_single_device(monkeypatch):
    """MAGCACHE_ATTN_IMPL=ring routes self-attention through the ppermute
    ring path inside a full Wan block run on the 2x2x2 mesh and reproduces
    the single-device numbers (xfuser --ring_size equivalence,
    magcache_generate.py:637-641)."""
    core, params, x, cond = _setup()
    cache_cfg = make_config("wan2.1-t2v-1.3B", 4)
    ref = np.asarray(_run(core, params, x, cond, cache_cfg))

    # prove the ring path is actually taken: spy on ring_attention
    import magcache_tpu.parallel.collectives as C
    calls = []
    orig = C.ring_attention

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(C, "ring_attention", spy)
    monkeypatch.setenv("MAGCACHE_ATTN_IMPL", "ring")

    mesh = build_mesh(dp=2, sp=2, tp=2)
    plan = MeshPlan(mesh)
    params_s = shard_params(params, mesh)
    x_s = jax.device_put(x, activation_sharding(mesh, "latents", x.ndim))
    cond_s = {"context": jax.device_put(
        cond["context"], activation_sharding(mesh, "context", 3))}
    with use_mesh(plan):
        out = jax.jit(lambda p, xx, cc: _run(core, p, xx, cc, cache_cfg))(
            params_s, x_s, cond_s)
    assert calls, "ring_attention was not selected"
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_ring_auto_threshold_selection(monkeypatch):
    """auto impl flips to ring once the global sequence crosses
    MAGCACHE_RING_THRESHOLD."""
    import magcache_tpu.parallel.collectives as C
    from magcache_tpu.ops.attention import attention

    calls = {"ring": 0, "ulysses": 0}
    orig_ring, orig_uly = C.ring_attention, C.ulysses_attention
    monkeypatch.setattr(C, "ring_attention",
                        lambda *a, **k: (calls.__setitem__("ring", calls["ring"] + 1),
                                         orig_ring(*a, **k))[1])
    monkeypatch.setattr(C, "ulysses_attention",
                        lambda *a, **k: (calls.__setitem__("ulysses", calls["ulysses"] + 1),
                                         orig_uly(*a, **k))[1])
    monkeypatch.setenv("MAGCACHE_RING_THRESHOLD", "64")
    monkeypatch.delenv("MAGCACHE_ATTN_IMPL", raising=False)

    mesh = build_mesh(dp=1, sp=8, tp=1)
    plan = MeshPlan(mesh)
    rng = np.random.default_rng(0)
    mk = lambda: jax.device_put(
        jnp.asarray(rng.normal(size=(1, 128, 8, 16)), jnp.float32),
        NamedSharding(mesh, P(None, "sp", None, None)))
    q, k, v = mk(), mk(), mk()
    with use_mesh(plan):
        out_ring = attention(q, k, v)          # 128 >= 64 -> ring
    assert calls["ring"] == 1
    monkeypatch.setenv("MAGCACHE_RING_THRESHOLD", "100000")
    with use_mesh(plan):
        out_uly = attention(q, k, v)           # below threshold -> ulysses
    assert calls["ulysses"] == 1
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_uly),
                               rtol=2e-4, atol=2e-4)


def test_osp_v120_sharded_run_matches_single_device():
    """Full-3D-attention OSP v1.2 under the dp x sp x tp mesh == single
    device (RoPE3D + qkv/proj shardings exercise the new TP patterns)."""
    from magcache_tpu.models.open_sora_plan import (
        OpenSoraPlanConfig, init_osp_params, make_osp_core)

    cfg = OpenSoraPlanConfig.tiny()
    params = init_osp_params(jax.random.PRNGKey(3), cfg)
    core = make_osp_core(cfg, (2, 4, 4), caption_len=6)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 2, 8, 8, cfg.in_channels)), jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(4, 6, cfg.caption_dim)),
                             jnp.float32)}
    sch = FlowMatchSchedule.create(3, shift=1.0)

    def run(p, xx, cc):
        return sample_euler(core, p, xx, cc, timesteps=sch.timesteps,
                            dts=np.diff(sch.sigmas), guidance_scale=5.0)

    ref = np.asarray(run(params, x, cond))
    mesh = build_mesh(dp=2, sp=2, tp=2)
    with use_mesh(MeshPlan(mesh)):
        out = jax.jit(run)(
            shard_params(params, mesh),
            jax.device_put(x, activation_sharding(mesh, "latents", x.ndim)),
            {"y": jax.device_put(cond["y"],
                                 activation_sharding(mesh, "context", 3))})
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_vchitect_sharded_run_matches_single_device():
    """Vchitect's 3-path attention (temporal RoPE + frame-0 cross + joint
    spatial, pre_only last block) under the mesh == single device."""
    from magcache_tpu.models.vchitect import (
        VchitectConfig, init_vchitect_params, make_vchitect_core)

    cfg = VchitectConfig.tiny()
    params = init_vchitect_params(jax.random.PRNGKey(4), cfg)
    core = make_vchitect_core(cfg, (2, 2, 2), txt_len=4)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 2, 4, 4, cfg.in_channels)), jnp.float32)
    cond = {"txt": jnp.asarray(rng.normal(size=(4, 4, cfg.text_dim)), jnp.float32),
            "vec": jnp.asarray(rng.normal(size=(4, cfg.vec_dim)), jnp.float32)}
    sch = FlowMatchSchedule.create(3, shift=1.0)

    def run(p, xx, cc):
        return sample_euler(core, p, xx, cc, timesteps=sch.timesteps,
                            dts=np.diff(sch.sigmas), guidance_scale=7.0)

    ref = np.asarray(run(params, x, cond))
    mesh = build_mesh(dp=2, sp=2, tp=2)
    with use_mesh(MeshPlan(mesh)):
        out = jax.jit(run)(
            shard_params(params, mesh),
            jax.device_put(x, activation_sharding(mesh, "latents", x.ndim)),
            {"txt": jax.device_put(cond["txt"],
                                   activation_sharding(mesh, "context", 3)),
             "vec": cond["vec"]})
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_teacache_dynamic_skip_sharded_equals_single():
    """The in-graph TeaCache decision (per-lane means + accumulator carried
    across the scan) must shard transparently: dp x sp x tp run == single
    device. The decision reduction is a global mean, so XLA inserts the
    collectives; the policy state (prev signal) carries the activations'
    sharding like the residual cache does."""
    from magcache_tpu.core.teacache import TeaCacheLanes

    core, params, x, cond = _setup()
    tea = TeaCacheLanes(thresh=0.4, coefficients=(1.0, 0.0), ret_steps=2,
                        cutoff_steps=6, lanes=2,
                        signal_fn=lambda p, h, ctx: h)
    sch = FlowMatchSchedule.create(4, shift=3.0)

    def run(p, xx, cc):
        return sample_euler(core, p, xx, cc, timesteps=sch.timesteps,
                            dts=np.diff(sch.sigmas), guidance_scale=5.0,
                            dynamic_skip=tea)

    ref = np.asarray(run(params, x, cond))

    mesh = build_mesh(dp=2, sp=2, tp=2)
    plan = MeshPlan(mesh)
    params_s = shard_params(params, mesh)
    x_s = jax.device_put(x, activation_sharding(mesh, "latents", x.ndim))
    cond_s = {"context": jax.device_put(
        cond["context"], activation_sharding(mesh, "context", 3))}
    with use_mesh(plan):
        out = jax.jit(run)(params_s, x_s, cond_s)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_ti2v_segmented_forward_sharded_equals_single():
    """Wan2.2 ti2v per-token-timestep forward (static token-prefix split at
    n0, models/wan.py::_wan_block) under an sp-sharded token axis must match
    single-device — the concat-of-slices modulation is the construct most
    likely to regress under pjit."""
    core, params, x, cond = _setup()
    img = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 1) + LAT[1:] + (CFG.in_channels,)), jnp.float32)
    cond = {"context": cond["context"][:2], "ti2v_img": img}

    def fwd(p, xx, cc):
        t = jnp.full((xx.shape[0],), 400.0, jnp.float32)
        hidden, ctx = core.prepare(p, xx, t, cc)
        return core.head(p, core.trunk(p, hidden, ctx), ctx)

    ref = np.asarray(jax.jit(fwd)(params, x, cond))

    mesh = build_mesh(dp=2, sp=2, tp=2)
    plan = MeshPlan(mesh)
    params_s = shard_params(params, mesh)
    x_s = jax.device_put(x, activation_sharding(mesh, "latents", x.ndim))
    cond_s = {k: jax.device_put(v, activation_sharding(mesh, "context", v.ndim)
                                if k == "context" else
                                activation_sharding(mesh, "latents", v.ndim))
              for k, v in cond.items()}
    with use_mesh(plan):
        out = jax.jit(fwd)(params_s, x_s, cond_s)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
