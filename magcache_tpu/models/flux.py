"""FLUX-family DiT (double-stream MMDiT + single-stream blocks), TPU-native.

Covers FLUX.1-dev / FLUX.1-Kontext (the reference adapters
``MagCache4FLUX/magcache_flux.py`` and ``MagCache4FLUX_Kontext/…``): a
guidance-distilled rectified-flow image DiT with

- ``depth_double`` joint text/image blocks (separate streams, joint attention)
  followed by ``depth_single`` fused blocks on the concatenated sequence;
- AdaLN modulation from ``vec = time_emb + guidance_emb + pooled_text_emb``;
- per-head QK RMSNorm; 3-axis RoPE over (text, y, x) ids.

MagCache boundary (matching ``magcache_flux.py:196-197,425-426``): the cached
residual is measured on the **image tokens only** — text tokens ride through
the double blocks but the trunk's input/output contract is the image stream.

TPU design: blocks are stacked on a leading depth axis and scanned
(`common.scan_blocks`), attention runs through `ops.attention` (Pallas flash
kernel on TPU), trunk matmuls in a configurable dtype (bf16 for MXU) with f32
islands for modulation/norms/time embeddings.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.sampler import DiTCore
from magcache_tpu.models.common import (
    apply_mlp_embedder,
    linear,
    linear_params,
    mlp_embedder,
    scan_blocks,
    timestep_embedding,
)
from magcache_tpu.ops.attention import QKNORM_FIXED_MAX, attention
from magcache_tpu.ops.norms import layer_norm, rms_norm
from magcache_tpu.ops.rope import apply_rope, rope_freqs_1d
from magcache_tpu.parallel.mesh import maybe_shard

__all__ = ["FluxConfig", "init_flux_params", "make_flux_core", "flux_rope_tables"]


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64            # 16 latent ch x 2x2 patch pack
    hidden: int = 3072
    heads: int = 24
    depth_double: int = 19
    depth_single: int = 38
    mlp_ratio: int = 4
    text_dim: int = 4096             # T5-XXL states
    vec_dim: int = 768               # CLIP pooled
    axes_dims: Tuple[int, ...] = (16, 56, 56)
    theta: float = 10000.0
    guidance_embed: bool = True
    time_embed_dim: int = 256
    dtype: str = "float32"           # trunk compute/storage dtype
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def tiny(**kw):
        """A test-size config."""
        defaults = dict(in_channels=16, hidden=128, heads=4, depth_double=2,
                        depth_single=2, text_dim=32, vec_dim=16,
                        axes_dims=(8, 12, 12), time_embed_dim=32)
        defaults.update(kw)
        return FluxConfig(**defaults)

    tiny = staticmethod(tiny)


def init_flux_params(key: jax.Array, cfg: FluxConfig):
    d, dt = cfg.hidden, cfg.jdtype
    mlp_d = cfg.mlp_ratio * d
    ks = iter(jax.random.split(key, 32))
    nxt = lambda: next(ks)

    def stacked_linear(depth, d_in, d_out, bias=True):
        return linear_params(nxt(), d_in, d_out, depth=depth, dtype=dt, bias=bias)

    L2, L1 = cfg.depth_double, cfg.depth_single
    params = {
        "img_in": linear_params(nxt(), cfg.in_channels, d, dtype=dt),
        "txt_in": linear_params(nxt(), cfg.text_dim, d, dtype=dt),
        "time_in": mlp_embedder(nxt(), cfg.time_embed_dim, d),
        "vector_in": mlp_embedder(nxt(), cfg.vec_dim, d),
        "double": {
            "img_mod": stacked_linear(L2, d, 6 * d),
            "txt_mod": stacked_linear(L2, d, 6 * d),
            "img_qkv": stacked_linear(L2, d, 3 * d),
            "txt_qkv": stacked_linear(L2, d, 3 * d),
            # per-head q/k RMSNorm scales
            "img_qk_scale": jnp.ones((L2, 2, cfg.head_dim), jnp.float32),
            "txt_qk_scale": jnp.ones((L2, 2, cfg.head_dim), jnp.float32),
            "img_proj": stacked_linear(L2, d, d),
            "txt_proj": stacked_linear(L2, d, d),
            "img_mlp1": stacked_linear(L2, d, mlp_d),
            "img_mlp2": stacked_linear(L2, mlp_d, d),
            "txt_mlp1": stacked_linear(L2, d, mlp_d),
            "txt_mlp2": stacked_linear(L2, mlp_d, d),
        },
        "single": {
            "mod": stacked_linear(L1, d, 3 * d),
            "lin1": stacked_linear(L1, d, 3 * d + mlp_d),
            "qk_scale": jnp.ones((L1, 2, cfg.head_dim), jnp.float32),
            "lin2": stacked_linear(L1, d + mlp_d, d),
        },
        "final_mod": linear_params(nxt(), d, 2 * d),
        "final_out": linear_params(nxt(), d, cfg.in_channels),
    }
    if cfg.guidance_embed:
        params["guidance_in"] = mlp_embedder(nxt(), cfg.time_embed_dim, d)
    return params


def flux_rope_tables(cfg: FluxConfig, txt_len: int, grid_h: int, grid_w: int,
                     kontext: bool = False):
    """(cos, sin) over the [txt; img(; kontext)] sequence.

    Text ids are all-zero (identity rotation); image ids are (0, y, x) over the
    latent patch grid, each axis rotating its `axes_dims` channel segment —
    FLUX's pos_embed semantics. With ``kontext``, a second image-id block with
    first-axis position 1 follows (the Kontext conditioning-image tokens:
    diffusers offsets their ids on the index axis so they are positionally
    distinct from the noise tokens at the same (y, x)).
    """
    total = sum(cfg.axes_dims)
    assert total == cfg.head_dim
    img_cos, img_sin = flux_img_rope_block(cfg, grid_h, grid_w, 0)
    txt_cos = np.ones((txt_len, cfg.head_dim // 2), np.float32)
    txt_sin = np.zeros((txt_len, cfg.head_dim // 2), np.float32)
    cos = [txt_cos, img_cos]
    sin = [txt_sin, img_sin]
    if kontext:
        kc, ks_ = flux_img_rope_block(cfg, grid_h, grid_w, 1)
        cos.append(kc)
        sin.append(ks_)
    return np.concatenate(cos, 0), np.concatenate(sin, 0)


def flux_img_rope_block(cfg: FluxConfig, grid_h: int, grid_w: int,
                        t_pos: int):
    """(cos, sin) for one image's tokens at first-axis id ``t_pos`` —
    diffusers gives each image in a multi-image sequence its own index-axis
    position (Kontext cond = 1; Qwen-Edit ref k = k)."""
    img_len = grid_h * grid_w
    ys, xs = np.meshgrid(np.arange(grid_h), np.arange(grid_w), indexing="ij")
    cos_parts, sin_parts = [], []
    axis_pos = [np.full(img_len, t_pos), ys.reshape(-1), xs.reshape(-1)]
    for dim_a, pos in zip(cfg.axes_dims, axis_pos):
        c, s = rope_freqs_1d(pos, dim_a, cfg.theta)
        cos_parts.append(c)
        sin_parts.append(s)
    return (np.concatenate(cos_parts, -1), np.concatenate(sin_parts, -1))


def _mod(vec: jnp.ndarray, p, n: int):
    """Modulation: silu(vec) -> linear -> n chunks of [B, 1, D] (f32)."""
    out = linear(p, jax.nn.silu(vec.astype(p["w"].dtype)))
    return jnp.split(out[:, None, :].astype(jnp.float32), n, axis=-1)


def _double_block(cfg: FluxConfig, rope, p, carry):
    img, txt, vec = carry
    heads = cfg.heads
    cos, sin = rope
    txt_len = txt.shape[1]

    i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2 = _mod(vec, p["img_mod"], 6)
    t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2 = _mod(vec, p["txt_mod"], 6)

    # joint attention over [txt; img]
    img_n = layer_norm(img) * (1 + i_scale1) + i_shift1
    txt_n = layer_norm(txt) * (1 + t_scale1) + t_shift1
    from magcache_tpu.ops.fused_prologue import rms_norm_rope
    iqkv = linear(p["img_qkv"], img_n.astype(img.dtype))
    tqkv = linear(p["txt_qkv"], txt_n.astype(txt.dtype))
    iqf, ikf, iv3 = jnp.split(iqkv, 3, axis=-1)
    tqf, tkf, tv3 = jnp.split(tqkv, 3, axis=-1)
    # fused per-head RMSNorm + RoPE, per stream with that stream's slice of
    # the [txt; img] rope table (== norm-then-concat-then-rope unfused)
    c_txt, s_txt = cos[:txt_len], sin[:txt_len]
    c_img, s_img = cos[txt_len:], sin[txt_len:]
    iq = rms_norm_rope(iqf, p["img_qk_scale"][0], c_img, s_img, heads,
                       eps=1e-6, norm_scope="head")
    ik = rms_norm_rope(ikf, p["img_qk_scale"][1], c_img, s_img, heads,
                       eps=1e-6, norm_scope="head")
    tq = rms_norm_rope(tqf, p["txt_qk_scale"][0], c_txt, s_txt, heads,
                       eps=1e-6, norm_scope="head")
    tk = rms_norm_rope(tkf, p["txt_qk_scale"][1], c_txt, s_txt, heads,
                       eps=1e-6, norm_scope="head")
    rs = lambda t: t.reshape(t.shape[0], t.shape[1], heads, -1)
    q = jnp.concatenate([tq, iq], axis=1)
    k = jnp.concatenate([tk, ik], axis=1)
    v = jnp.concatenate([rs(tv3), rs(iv3)], axis=1)
    o = attention(q, k, v, fixed_max=QKNORM_FIXED_MAX)
    o = o.reshape(o.shape[0], o.shape[1], -1)
    t_attn, i_attn = o[:, :txt_len], o[:, txt_len:]

    img = img + (i_gate1 * linear(p["img_proj"], i_attn).astype(jnp.float32)).astype(img.dtype)
    txt = txt + (t_gate1 * linear(p["txt_proj"], t_attn).astype(jnp.float32)).astype(txt.dtype)

    img_m = layer_norm(img) * (1 + i_scale2) + i_shift2
    img_mlp = linear(p["img_mlp2"], jax.nn.gelu(
        linear(p["img_mlp1"], img_m.astype(img.dtype)), approximate=True))
    img = img + (i_gate2 * img_mlp.astype(jnp.float32)).astype(img.dtype)

    txt_m = layer_norm(txt) * (1 + t_scale2) + t_shift2
    txt_mlp = linear(p["txt_mlp2"], jax.nn.gelu(
        linear(p["txt_mlp1"], txt_m.astype(txt.dtype)), approximate=True))
    txt = txt + (t_gate2 * txt_mlp.astype(jnp.float32)).astype(txt.dtype)
    return img, txt, vec


def _single_block(cfg: FluxConfig, rope, p, carry):
    h, vec = carry
    heads, d = cfg.heads, cfg.hidden
    cos, sin = rope
    shift, scale, gate = _mod(vec, p["mod"], 3)
    h_n = (layer_norm(h) * (1 + scale) + shift).astype(h.dtype)
    proj = linear(p["lin1"], h_n)
    qkv, mlp = proj[..., : 3 * d], proj[..., 3 * d:]
    from magcache_tpu.ops.fused_prologue import rms_norm_rope
    qf, kf, vf = jnp.split(qkv, 3, axis=-1)
    q = rms_norm_rope(qf, p["qk_scale"][0], cos, sin, heads,
                      eps=1e-6, norm_scope="head")
    k = rms_norm_rope(kf, p["qk_scale"][1], cos, sin, heads,
                      eps=1e-6, norm_scope="head")
    v = vf.reshape(vf.shape[0], vf.shape[1], heads, -1)
    o = attention(q, k, v, fixed_max=QKNORM_FIXED_MAX).reshape(h.shape[0], h.shape[1], -1)
    out = linear(p["lin2"], jnp.concatenate([o, jax.nn.gelu(mlp, approximate=True)], -1))
    return h + (gate * out.astype(jnp.float32)).astype(h.dtype), vec


def first_block_modulated(params, img, ctx):
    """TeaCache decision signal for flux-core trunks (FLUX / HunyuanVideo /
    FramePack): the FIRST double block's AdaLN-modulated image-stream input —
    the published packed-transformer teacache hook
    (``transformer_blocks[0].norm1(hidden, emb=temb)``), i.e. the signal the
    shipped rescale polynomials were fitted to."""
    p0 = jax.tree.map(lambda a: a[0], params["double"]["img_mod"])
    shift1, scale1 = _mod(ctx["vec"], p0, 6)[:2]
    return layer_norm(img) * (1 + scale1) + shift1


def make_flux_core(cfg: FluxConfig, txt_len: int, grid_h: int, grid_w: int,
                   rope_tables=None, kontext: bool = False) -> DiTCore:
    """Build the (prepare, trunk, head) triple for a static (text, grid) shape.

    cond = {"txt": f[B, txt_len, text_dim], "vec": f[B, vec_dim],
            "guidance": f[B] (optional)}
    x    = packed latent patches f[B, grid_h*grid_w, in_channels]

    ``rope_tables`` overrides the (cos, sin) tables over the [txt; img]
    sequence — video MMDiTs (HunyuanVideo) pass 3-D tables here.
    """
    rope_np = rope_tables if rope_tables is not None else flux_rope_tables(
        cfg, txt_len, grid_h, grid_w, kontext=kontext)
    rope = (jnp.asarray(rope_np[0]), jnp.asarray(rope_np[1]))
    img_len = grid_h * grid_w

    def prepare(params, x, t, cond):
        dt_ = cfg.jdtype
        img = linear(params["img_in"], x.astype(dt_))
        if kontext:
            # Kontext: the conditioning image's packed latents join the
            # sequence AFTER the noise tokens (diffusers cat([latents,
            # image_latents], 1)); they share img_in and the trunk, and the
            # cached residual covers them (magcache_flux_kontext.py measures
            # on the full hidden_states)
            kt = linear(params["img_in"], cond["kontext"].astype(dt_))
            img = jnp.concatenate([img, kt], axis=1)
        if "img_pre_tokens" in cond:
            # already-embedded conditioning tokens (FramePack clean-latent
            # pyramid) join the image stream ahead of the noise window
            img = jnp.concatenate(
                [jnp.concatenate([p.astype(dt_) for p in cond["img_pre_tokens"]],
                                 axis=1), img], axis=1)
        txt = linear(params["txt_in"], cond["txt"].astype(dt_))
        # f32 modulation vector: timestep(*1000) + guidance + pooled text
        vec = apply_mlp_embedder(
            params["time_in"],
            timestep_embedding(t * 1000.0, cfg.time_embed_dim))
        if cfg.guidance_embed and "guidance" in cond:
            vec = vec + apply_mlp_embedder(
                params["guidance_in"],
                timestep_embedding(cond["guidance"] * 1000.0, cfg.time_embed_dim))
        if "vec" in cond:  # Qwen-Image has no pooled-text vector
            vec = vec + apply_mlp_embedder(params["vector_in"],
                                           cond["vec"].astype(jnp.float32))
        img = maybe_shard(img, "tokens")
        txt = maybe_shard(txt, "context")
        return img, {"txt": txt, "vec": vec}

    def trunk(params, img, ctx):
        txt, vec = ctx["txt"], ctx["vec"]
        dbl = functools.partial(_double_block, cfg, rope)

        def dbl_body(carry, p):
            return dbl(p, carry)[:3], None

        fn = jax.checkpoint(dbl_body) if cfg.remat else dbl_body
        (img, txt, _), _ = jax.lax.scan(fn, (img, txt, vec), params["double"])

        h = jnp.concatenate([txt, img], axis=1)
        sgl = functools.partial(_single_block, cfg, rope)

        def sgl_body(carry, p):
            return sgl(p, carry), None

        fn1 = jax.checkpoint(sgl_body) if cfg.remat else sgl_body
        (h, _), _ = jax.lax.scan(fn1, (h, vec), params["single"])
        return h[:, txt.shape[1]:]   # image tokens only — the cacheable stream

    def head(params, img, ctx):
        vec = ctx["vec"]
        if kontext:
            img = img[:, :img_len]   # drop the conditioning tokens
        shift, scale = _mod(vec, params["final_mod"], 2)
        h = layer_norm(img) * (1 + scale) + shift
        return linear(params["final_out"], h.astype(img.dtype)).astype(jnp.float32)

    return DiTCore(prepare, trunk, head)


def pack_latents(lat: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, (H/2)*(W/2), C*4] (FLUX 2x2 patch packing)."""
    b, h, w, c = lat.shape
    lat = lat.reshape(b, h // 2, 2, w // 2, 2, c)
    lat = lat.transpose(0, 1, 3, 2, 4, 5)
    return lat.reshape(b, (h // 2) * (w // 2), 4 * c)


def unpack_latents(x: jnp.ndarray, grid_h: int, grid_w: int) -> jnp.ndarray:
    """Inverse of `pack_latents`."""
    b, s, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, grid_h, grid_w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, grid_h * 2, grid_w * 2, c)
