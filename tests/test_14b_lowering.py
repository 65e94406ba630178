"""Derisk the 14B multi-chip story without hardware: AOT-lower and
XLA-compile the real WAN_14B geometry (81f x 480x832, 50-step UniPC, full
cached sampler) over a tp=4 x sp=2 mesh of 8 virtual devices.

No weights are materialized — params enter as ShapeDtypeStructs with the
Megatron `param_shardings` specs, so this pins that the full-size sharded
program lowers and compiles (the driver's `dryrun_multichip` executes the
tiny variant; this covers the geometry that exceeds one chip's HBM,
NOTES.md #19)."""

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
    param_shardings,
    use_mesh,
)
from magcache_tpu.schedulers.unipc import UniPCSchedule


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_wan14b_480p_unipc_lowers_and_compiles_tp4_sp2():
    mesh = build_mesh(dp=1, sp=2, tp=4)
    cfg = dataclasses.replace(WAN_14B, dtype="bfloat16")
    grid = (21, 30, 52)              # 81 frames, 480x832 latents, 2x2 patch
    core = make_wan_core(cfg, grid)

    shapes = jax.eval_shape(lambda k: init_wan_params(k, cfg),
                            jax.random.PRNGKey(0))
    pshard = param_shardings(shapes, mesh)
    # sanity: at least one attention projection is tp-sharded
    flat = jax.tree_util.tree_leaves(pshard)
    assert any("tp" in str(s.spec) for s in flat)

    sch = UniPCSchedule.create(50, shift=5.0)
    cache_cfg = make_config("wan2.1-t2v-14B", 50)

    def fn(params, x, cond):
        return sample_unipc(core, params, x, cond, sch, cache_cfg=cache_cfg,
                            guidance_scale=5.0)

    x_sd = jax.ShapeDtypeStruct((1, 21, 60, 104, cfg.in_channels),
                                jnp.float32)
    cond_sd = {"context": jax.ShapeDtypeStruct(
        (2, cfg.text_len, cfg.text_dim), jnp.bfloat16)}
    in_sh = (pshard, activation_sharding(mesh, "latents", 5),
             {"context": activation_sharding(mesh, "context", 3)})
    with use_mesh(MeshPlan(mesh)):
        lowered = jax.jit(fn, in_shardings=in_sh).lower(shapes, x_sd, cond_sd)
    txt = lowered.as_text()
    # partitioned program with sharding annotations (GSPMD or shardy dialect)
    assert "num_partitions = 8" in txt
    assert "sdy.sharding" in txt or "mhlo.sharding" in txt
    compiled = lowered.compile()    # ~20s on CPU; no weight buffers allocated
    assert compiled is not None
    out_aval = jax.eval_shape(fn, shapes, x_sd, cond_sd)
    assert out_aval.shape == (1, 21, 60, 104, cfg.in_channels)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_wan5b_ti2v_720p_lowers_and_compiles_sp2_tp2():
    """Wan2.2 TI2V-5B at its real 720p geometry (1280x704 x 121f, 48-ch
    Wan2.2 latents) with the per-token (t, t=0) segmented modulation and the
    frame-0 latent-replacement post_step, lowered + XLA-compiled over
    sp=2 x tp=2 (dp=2) — pins the new ti2v path at full scale under pjit."""
    from magcache_tpu.core.sampler import unipc_executor
    from magcache_tpu.models.wan import WAN_5B
    from magcache_tpu.pipelines.wan import _ti2v_post

    mesh = build_mesh(dp=2, sp=2, tp=2)
    cfg = dataclasses.replace(WAN_5B, dtype="bfloat16")
    grid = (31, 22, 40)              # 121f, 704x1280 / (4,16,16), 2x2 patch
    core = make_wan_core(cfg, grid)

    shapes = jax.eval_shape(lambda k: init_wan_params(k, cfg),
                            jax.random.PRNGKey(0))
    pshard = param_shardings(shapes, mesh)

    sch = UniPCSchedule.create(50, shift=5.0)
    cache_cfg = make_config("wan2.2-ti2v-5B-i2v", 50)

    def fn(params, x, cond):
        init_carry, step_in, body = unipc_executor(
            core, sch, cache_cfg=cache_cfg, guidance_scale=5.0, batch=2,
            post_step=_ti2v_post(cond))
        carry = init_carry(params, x, cond)
        return jax.lax.scan(body(params, cond), carry, step_in)[0][0]

    x_sd = jax.ShapeDtypeStruct((2, 31, 44, 80, cfg.in_channels), jnp.float32)
    cond_sd = {
        "context": jax.ShapeDtypeStruct((4, cfg.text_len, cfg.text_dim),
                                        jnp.bfloat16),
        "ti2v_img": jax.ShapeDtypeStruct((2, 1, 44, 80, cfg.in_channels),
                                         jnp.float32),
    }
    in_sh = (pshard, activation_sharding(mesh, "latents", 5),
             {"context": activation_sharding(mesh, "context", 3),
              "ti2v_img": activation_sharding(mesh, "latents", 5)})
    with use_mesh(MeshPlan(mesh)):
        lowered = jax.jit(fn, in_shardings=in_sh).lower(shapes, x_sd, cond_sd)
    txt = lowered.as_text()
    assert "num_partitions = 8" in txt
    assert "sdy.sharding" in txt or "mhlo.sharding" in txt
    compiled = lowered.compile()
    assert compiled is not None
