"""CLIP vision tower + Wan i2v input-encoding tests.

Reference flow: wan.WanI2V.generate (invoked from
MagCache4Wan2.1/magcache_generate.py:989-1018) — CLIP penultimate-block visual
features + VAE first-frame latents under a 4-channel first-frame mask.
"""

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.models.clip import (
    CLIPVisionConfig,
    clip_vision_forward,
    convert_clip_vision_state_dict,
    init_clip_vision_params,
    preprocess_clip_image,
)


def test_clip_forward_shapes_and_penultimate():
    cfg = CLIPVisionConfig.tiny()
    params = init_clip_vision_params(jax.random.PRNGKey(0), cfg)
    img = np.random.default_rng(0).random((1, cfg.image_size, cfg.image_size, 3))
    out = clip_vision_forward(params, cfg, jnp.asarray(img, jnp.float32))
    assert out.shape == (1, cfg.tokens, cfg.dim)
    # penultimate vs full depth must differ (use_31_block semantics)
    import dataclasses
    full = clip_vision_forward(params, dataclasses.replace(
        cfg, use_penultimate=False), jnp.asarray(img, jnp.float32))
    assert np.abs(np.asarray(out) - np.asarray(full)).max() > 1e-6


def test_clip_convert_key_layout():
    """Synthetic state dict with the official wan/modules/clip.py visual.*
    naming -> identical tree shapes to init."""
    cfg = CLIPVisionConfig.tiny()
    d, L, p = cfg.dim, cfg.layers, cfg.patch
    rng = np.random.default_rng(1)
    sd = {
        "visual.patch_embedding.weight": rng.normal(0, .05, (d, 3, p, p)).astype(np.float32),
        "visual.patch_embedding.bias": np.zeros(d, np.float32),
        "visual.cls_embedding": rng.normal(0, .02, (1, 1, d)).astype(np.float32),
        "visual.pos_embedding": rng.normal(0, .02, (1, cfg.tokens, d)).astype(np.float32),
        "visual.pre_norm.weight": np.ones(d, np.float32),
        "visual.pre_norm.bias": np.zeros(d, np.float32),
        "visual.post_norm.weight": np.ones(d, np.float32),
        "visual.post_norm.bias": np.zeros(d, np.float32),
    }
    for i in range(L):
        b = f"visual.transformer.{i}"
        for nm, (i_, o_) in {
            "attn.to_qkv": (d, 3 * d), "attn.proj": (d, d),
            "mlp.0": (d, cfg.mlp_ratio * d), "mlp.2": (cfg.mlp_ratio * d, d),
        }.items():
            sd[f"{b}.{nm}.weight"] = rng.normal(0, .05, (o_, i_)).astype(np.float32)
            sd[f"{b}.{nm}.bias"] = np.zeros(o_, np.float32)
        for nm in ("norm1", "norm2"):
            sd[f"{b}.{nm}.weight"] = np.ones(d, np.float32)
            sd[f"{b}.{nm}.bias"] = np.zeros(d, np.float32)
    params = convert_clip_vision_state_dict(sd, cfg)
    ref = init_clip_vision_params(jax.random.PRNGKey(0), cfg)
    jax.tree.map(lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
        AssertionError((a.shape, b.shape))), params, ref)
    img = preprocess_clip_image(
        np.random.default_rng(2).random((40, 52, 3)).astype(np.float32), cfg)
    out = clip_vision_forward(params, cfg, img)
    assert np.isfinite(np.asarray(out)).all()


def test_wan_i2v_encode_image_and_generate():
    """encode_image builds y = [mask(4); vae latent(16)] at the DiT latent
    grid with the first latent frame masked 1, and generate() consumes a raw
    image end-to-end."""
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig

    cfg = WanPipelineConfig(task="i2v", tiny=True, size=(64, 32), frame_num=9,
                            sample_steps=2, sample_solver="euler",
                            dtype="float32")
    pipe = WanPipeline(cfg)
    img = (np.random.default_rng(0).random((24, 40, 3)) * 255).astype(np.uint8)
    y, clip_fea = pipe.encode_image(img)
    lf, lh, lw, _ = pipe.latent_shape
    assert y.shape == (1, lf, lh, lw, 20)
    m = np.asarray(y[..., :4])
    assert (m[:, 0] == 1).all() and (m[:, 1:] == 0).all()
    assert clip_fea.shape[0] == 1 and clip_fea.shape[1] == pipe.model_cfg.clip_tokens

    out = pipe.generate("a corgi surfing", seed=0, image=img)
    assert np.isfinite(np.asarray(out.latents)).all()


def test_wan_flf2v_encode_and_generate():
    """flf2v (magcache_generate.py:1032-1090): y masks BOTH endpoint frames
    (first latent frame all 4 packed channels; last latent frame channel 3),
    clip tokens double up, and generate() consumes first+last images."""
    from magcache_tpu.pipelines.wan import WanPipeline, WanPipelineConfig

    cfg = WanPipelineConfig(task="flf2v", tiny=True, size=(64, 32),
                            frame_num=9, sample_steps=2,
                            sample_solver="euler", dtype="float32")
    pipe = WanPipeline(cfg)
    rng = np.random.default_rng(0)
    first = (rng.random((24, 40, 3)) * 255).astype(np.uint8)
    last = (rng.random((24, 40, 3)) * 255).astype(np.uint8)
    y, clip_fea = pipe.encode_flf(first, last)
    lf, lh, lw, _ = pipe.latent_shape
    assert y.shape == (1, lf, lh, lw, 20)
    m = np.asarray(y[..., :4])
    assert (m[:, 0] == 1).all()
    assert (m[:, -1, :, :, 3] == 1).all()
    assert (m[:, 1:-1] == 0).all()
    assert (m[:, -1, :, :, :3] == 0).all()
    assert clip_fea.shape[1] == pipe.model_cfg.clip_tokens  # 2x per-frame

    out = pipe.generate("sunrise to sunset", seed=0, image=first,
                        last_image=last)
    assert np.isfinite(np.asarray(out.latents)).all()
