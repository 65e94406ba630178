"""Trunk compute-dtype regression tests.

A silent dtype promotion — e.g. adding an f32 sincos position table to a
bf16 hidden, or f32 embedding params promoting the patch-embed output —
runs every downstream GEMM at 1/4 the MXU rate without changing any result
materially. This bit STDiT3/Latte/Vchitect (fixed in round 3: the 480p
STDiT3 forward was 3.1x slower than its bf16 form). These tests pin the
contract: with ``dtype="bfloat16"`` configs, the hidden entering the trunk
and the trunk output stay bfloat16; f32 is reserved for the norm/modulation
islands inside blocks and the final head.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _check(core, params, x, t, cond):
    hidden, ctx = core.prepare(params, x, t, cond)
    assert hidden.dtype == jnp.bfloat16, (
        f"prepare() hidden is {hidden.dtype}, expected bfloat16 — "
        "an f32 table/param promoted the trunk")
    out = core.trunk(params, hidden, ctx)
    tree = jax.tree.leaves(out)
    assert tree[0].dtype == jnp.bfloat16, (
        f"trunk output is {tree[0].dtype}, expected bfloat16")


def test_stdit3_bf16_trunk():
    from magcache_tpu.models.stdit3 import (STDiT3Config, init_stdit3_params,
                                            make_stdit3_core)
    cfg = STDiT3Config.tiny(dtype="bfloat16")
    params = init_stdit3_params(jax.random.PRNGKey(0), cfg)
    core = make_stdit3_core(cfg, (2, 4, 4), cfg.caption_max_len)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 2, 8, 8, cfg.in_channels)), jnp.float32)
    cond = {"y": jnp.asarray(
        rng.normal(size=(2, cfg.caption_max_len, cfg.caption_dim)), jnp.float32)}
    _check(core, params, x, jnp.full((2,), 500.0), cond)


def test_latte_bf16_trunk():
    from magcache_tpu.models.latte import (LatteConfig, init_latte_params,
                                           make_latte_core)
    cfg = LatteConfig.tiny(dtype="bfloat16")
    params = init_latte_params(jax.random.PRNGKey(0), cfg)
    core = make_latte_core(cfg, (2, 4, 4), 6)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 2, 8, 8, cfg.in_channels)), jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(2, 6, cfg.caption_dim)), jnp.float32)}
    _check(core, params, x, jnp.full((2,), 500.0), cond)


def test_vchitect_bf16_trunk():
    from magcache_tpu.models.vchitect import (VchitectConfig,
                                              init_vchitect_params,
                                              make_vchitect_core)
    cfg = VchitectConfig.tiny(dtype="bfloat16")
    params = init_vchitect_params(jax.random.PRNGKey(0), cfg)
    core = make_vchitect_core(cfg, (2, 4, 4), txt_len=6)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 2, 8, 8, cfg.in_channels)), jnp.float32)
    cond = {"txt": jnp.asarray(rng.normal(size=(2, 6, cfg.text_dim)), jnp.float32),
            "vec": jnp.asarray(rng.normal(size=(2, cfg.vec_dim)), jnp.float32)}
    hidden, ctx = core.prepare(params, x, jnp.full((2,), 500.0), cond)
    assert hidden.dtype == jnp.bfloat16


def test_osp_bf16_trunk():
    from magcache_tpu.models.open_sora_plan import (OpenSoraPlanConfig,
                                                    init_osp_params,
                                                    make_osp_core)
    cfg = OpenSoraPlanConfig.tiny(dtype="bfloat16")
    params = init_osp_params(jax.random.PRNGKey(0), cfg)
    core = make_osp_core(cfg, (2, 4, 4), caption_len=6)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 2, 8, 8, cfg.in_channels)), jnp.float32)
    cond = {"y": jnp.asarray(rng.normal(size=(2, 6, cfg.caption_dim)), jnp.float32)}
    hidden, ctx = core.prepare(params, x, jnp.full((2,), 400.0), cond)
    assert hidden.dtype == jnp.bfloat16


def test_cogvideox_bf16_trunk():
    from magcache_tpu.models.cogvideox import (CogVideoXConfig,
                                               init_cogvideox_params,
                                               make_cogvideox_core)
    cfg = CogVideoXConfig.tiny(dtype="bfloat16")
    params = init_cogvideox_params(jax.random.PRNGKey(0), cfg)
    core = make_cogvideox_core(cfg, 6, (2, 4, 4))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 2, 8, 8, cfg.in_channels)), jnp.float32)
    cond = {"txt": jnp.asarray(rng.normal(size=(2, 6, cfg.text_dim)), jnp.float32)}
    hidden, ctx = core.prepare(params, x, jnp.full((2,), 500.0), cond)
    tree = jax.tree.leaves(hidden)
    assert all(l.dtype == jnp.bfloat16 for l in tree if l.ndim >= 2)


def test_wan_bf16_trunk():
    from magcache_tpu.models.wan import (WanConfig, init_wan_params,
                                         make_wan_core)
    cfg = WanConfig.tiny(dtype="bfloat16")
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    core = make_wan_core(cfg, (2, 4, 4))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 8, cfg.in_channels)), jnp.float32)
    cond = {"context": jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)), jnp.float32)}
    hidden, ctx = core.prepare(params, x, jnp.full((1,), 500.0), cond)
    assert hidden.dtype == jnp.bfloat16


def test_flux_bf16_trunk():
    from magcache_tpu.models.flux import (FluxConfig, init_flux_params,
                                          make_flux_core)
    cfg = FluxConfig.tiny(dtype="bfloat16")
    params = init_flux_params(jax.random.PRNGKey(0), cfg)
    core = make_flux_core(cfg, 8, 4, 4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, cfg.in_channels)), jnp.float32)
    cond = {"txt": jnp.asarray(rng.normal(size=(1, 8, cfg.text_dim)),
                               jnp.float32),
            "vec": jnp.asarray(rng.normal(size=(1, cfg.vec_dim)), jnp.float32),
            "guidance": jnp.full((1,), 4.0, jnp.float32)}
    _check(core, params, x, jnp.full((1,), 0.5), cond)


def test_hunyuan_bf16_trunk():
    from magcache_tpu.models.hunyuan import (HunyuanConfig,
                                             init_hunyuan_params,
                                             make_hunyuan_core)
    cfg = HunyuanConfig.tiny(dtype="bfloat16")
    params = init_hunyuan_params(jax.random.PRNGKey(0), cfg)
    core = make_hunyuan_core(cfg, 8, (3, 4, 4))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 3, 8, 8, cfg.in_channels)),
                    jnp.float32)
    cond = {"txt": jnp.asarray(rng.normal(size=(1, 8, cfg.text_dim)),
                               jnp.float32),
            "vec": jnp.asarray(rng.normal(size=(1, cfg.vec_dim)), jnp.float32),
            "guidance": jnp.full((1,), 6.0, jnp.float32)}
    _check(core, params, x, jnp.full((1,), 0.5), cond)


def test_qwen_image_bf16_trunk():
    from magcache_tpu.models.qwen_image import (QwenImageConfig,
                                                init_qwen_image_params,
                                                make_qwen_image_core)
    cfg = QwenImageConfig.tiny(dtype="bfloat16")
    params = init_qwen_image_params(jax.random.PRNGKey(0), cfg)
    core = make_qwen_image_core(cfg, txt_len=5, grid_h=4, grid_w=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, cfg.in_channels)), jnp.float32)
    cond = {"txt": jnp.asarray(rng.normal(size=(1, 5, cfg.text_dim)),
                               jnp.float32)}
    _check(core, params, x, jnp.full((1,), 0.5), cond)


def test_omnigen2_bf16_trunk():
    from magcache_tpu.models.omnigen2 import (OmniGen2Config,
                                              init_omnigen2_params,
                                              make_omnigen2_core)
    cfg = OmniGen2Config.tiny(dtype="bfloat16")
    params = init_omnigen2_params(jax.random.PRNGKey(0), cfg)
    core = make_omnigen2_core(cfg, txt_len=4, grid=(2, 2), ref_images=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, cfg.in_channels)), jnp.float32)
    cond = {"txt": jnp.asarray(rng.normal(size=(1, 4, cfg.text_dim)),
                               jnp.float32)}
    _check(core, params, x, jnp.full((1,), 500.0), cond)
