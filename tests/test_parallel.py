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
