"""Execute (not just lower) a cached UniPC step at 14B WIDTH on the virtual
mesh (VERDICT r4 item 8): test_14b_lowering.py pins that the full-size
program lowers and XLA-compiles under tp4 x sp2, but runtime-only issues
(sharded buffer donation, collective deadlock, per-shard layout bugs) only
surface when the program RUNS. A depth-reduced config keeps the true 14B
width — dim 5120 / ffn 13824 / 40 heads / text_len 512, the dimensions the
tp and sp splits actually act on — with 2 of the 40 layers, so the step
executes in CPU-feasible time with real (materialized, sharded) weights.

Marked slow: ~2.8 GB of f32 weights and a multi-minute CPU compile.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.core.presets import make_config
from magcache_tpu.core.sampler import sample_unipc
from magcache_tpu.models.wan import WAN_14B, init_wan_params, make_wan_core
from magcache_tpu.parallel.mesh import (
    MeshPlan,
    activation_sharding,
    build_mesh,
    shard_params,
    use_mesh,
)
from magcache_tpu.schedulers.unipc import UniPCSchedule

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 virtual devices")]


def test_wan14b_width_cached_unipc_executes_tp4_sp2():
    mesh = build_mesh(dp=1, sp=2, tp=4)
    cfg = dataclasses.replace(WAN_14B, layers=2)
    grid = (2, 4, 4)                 # tiny latent grid; width is the point
    core = make_wan_core(cfg, grid)
    params = shard_params(init_wan_params(jax.random.PRNGKey(0), cfg), mesh)

    steps = 3
    sch = UniPCSchedule.create(steps, shift=5.0)
    cache_cfg = make_config("wan2.1-t2v-14B", steps)
    # one lane-symmetric skip in the middle exercises the cached replay path
    skip = jnp.asarray(np.array([[False, False], [True, True],
                                 [False, False]]))

    def fn(params, x, cond):
        return sample_unipc(core, params, x, cond, sch, cache_cfg=cache_cfg,
                            guidance_scale=5.0, skip_mask_override=skip)

    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 2, 8, 8, cfg.in_channels)), jnp.float32),
        activation_sharding(mesh, "latents", 5))
    cond = {"context": jax.device_put(
        jnp.asarray(np.random.default_rng(1).normal(
            size=(2, cfg.text_len, cfg.text_dim)) * 0.02, jnp.float32),
        activation_sharding(mesh, "context", 3))}

    with use_mesh(MeshPlan(mesh)):
        out = jax.jit(fn)(params, x, cond)
    out.block_until_ready()
    arr = np.asarray(out)
    assert arr.shape == (1, 2, 8, 8, cfg.in_channels)
    assert np.isfinite(arr).all()
