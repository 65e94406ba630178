"""Open-Sora-Plan T2V DiT, TPU-native.

The reference ships three versions (``videosys/models/transformers/
open_sora_plan_transformer_3d.py`` and ``…_v110/_v120``, ~7.8k LoC combined):
v1.0/v1.1 are Latte-style factorized spatial/temporal stacks (covered
architecturally by `models.latte`), and **v1.2 switches to full 3-D joint
attention** over all T*H*W tokens with 3-D RoPE (``…_v120…:39-120``) — this
module implements the v1.2 design: single-stream DiT, full 3-D self-attention
with RoPE3D, cross-attention to T5 captions, PixArt-style AdaLN-single
(global timestep modulation + per-block tables).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.sampler import DiTCore
from magcache_tpu.models.common import linear, linear_params, timestep_embedding
from magcache_tpu.ops.attention import attention
from magcache_tpu.ops.norms import layer_norm
from magcache_tpu.ops.rope import apply_rope, rope_freqs_1d

__all__ = ["OpenSoraPlanConfig", "init_osp_params", "make_osp_core"]


@dataclasses.dataclass(frozen=True)
class OpenSoraPlanConfig:
    hidden: int = 1152
    heads: int = 16
    depth: int = 28
    mlp_ratio: int = 4
    in_channels: int = 4
    caption_dim: int = 4096
    patch: Tuple[int, int, int] = (1, 2, 2)
    time_embed_dim: int = 256
    eps: float = 1e-6
    dtype: str = "float32"

    @property
    def head_dim(self):
        return self.hidden // self.heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def tiny(**kw):
        d = dict(hidden=96, heads=4, depth=2, caption_dim=24, time_embed_dim=32)
        d.update(kw)
        return OpenSoraPlanConfig(**d)

    tiny = staticmethod(tiny)


def init_osp_params(key: jax.Array, cfg: OpenSoraPlanConfig):
    d, L = cfg.hidden, cfg.depth
    pt, ph, pw = cfg.patch
    ks = iter(jax.random.split(key, 16))
    nxt = lambda: next(ks)

    def st(i, o):
        return linear_params(nxt(), i, o, depth=L, dtype=cfg.jdtype)

    return {
        "patch_embed": linear_params(nxt(), cfg.in_channels * pt * ph * pw, d,
                                     dtype=cfg.jdtype),
        "caption": {"in": linear_params(nxt(), cfg.caption_dim, d),
                    "out": linear_params(nxt(), d, d)},
        "time": {"in": linear_params(nxt(), cfg.time_embed_dim, d),
                 "out": linear_params(nxt(), d, d)},
        "adaln_single": linear_params(nxt(), d, 6 * d),
        "blocks": {
            "scale_shift": jax.random.normal(nxt(), (L, 6, d), jnp.float32) / np.sqrt(d),
            "qkv": st(d, 3 * d), "proj": st(d, d),
            "cross_q": st(d, d), "cross_kv": st(d, 2 * d), "cross_o": st(d, d),
            "ff1": st(d, cfg.mlp_ratio * d), "ff2": st(cfg.mlp_ratio * d, d),
        },
        "final_mod": jax.random.normal(nxt(), (2, d), jnp.float32) / np.sqrt(d),
        "final_out": linear_params(nxt(), d, cfg.in_channels * pt * ph * pw),
    }


def osp_rope_tables(cfg: OpenSoraPlanConfig, grid: Tuple[int, int, int]):
    """RoPE3D: head_dim split (t, h, w) = (d-4*d6, 2*d6, 2*d6)."""
    d = cfg.head_dim
    d6 = d // 6
    dims = (d - 4 * d6, 2 * d6, 2 * d6)
    gt, gh, gw = grid
    coords = np.stack(np.meshgrid(np.arange(gt), np.arange(gh), np.arange(gw),
                                  indexing="ij"), -1).reshape(-1, 3)
    cos_p, sin_p = [], []
    for ax, dim_a in enumerate(dims):
        c, s = rope_freqs_1d(coords[:, ax], dim_a)
        cos_p.append(c)
        sin_p.append(s)
    return np.concatenate(cos_p, -1), np.concatenate(sin_p, -1)


def make_osp_core(cfg: OpenSoraPlanConfig, grid: Tuple[int, int, int],
                  caption_len: int) -> DiTCore:
    """cond = {"y": f[B, caption_len, caption_dim]}; x = latent video
    f[B, T*pt, H*ph, W*pw, C]."""
    from magcache_tpu.models.wan import patchify, unpatchify

    T, H, W = grid
    d = cfg.hidden
    rope_np = osp_rope_tables(cfg, grid)
    rope = (jnp.asarray(rope_np[0]), jnp.asarray(rope_np[1]))

    @dataclasses.dataclass(frozen=True)
    class _Shim:
        patch: Tuple[int, int, int]
        out_channels: int

    def prepare(params, x, t, cond):
        h = linear(params["patch_embed"],
                   patchify(_Shim(cfg.patch, cfg.in_channels), x.astype(cfg.jdtype)))
        te = linear(params["time"]["out"], jax.nn.silu(
            linear(params["time"]["in"], timestep_embedding(t, cfg.time_embed_dim))))
        t6 = linear(params["adaln_single"], jax.nn.silu(te)).reshape(-1, 6, d)
        y = jax.nn.gelu(linear(params["caption"]["in"],
                               cond["y"].astype(jnp.float32)), approximate=True)
        y = linear(params["caption"]["out"], y).astype(cfg.jdtype)
        return h, {"t6": t6, "te": te, "y": y}

    def _block(p, carry, ctx):
        h = carry
        e = (p["scale_shift"][None] + ctx["t6"]).astype(jnp.float32)
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = [e[:, i][:, None] for i in range(6)]

        # full 3-D self-attention over all T*H*W tokens, RoPE3D
        xn = (layer_norm(h, eps=cfg.eps) * (1 + sc_a) + sh_a).astype(h.dtype)
        q, k, v = jnp.split(linear(p["qkv"], xn), 3, axis=-1)
        rs = lambda x: x.reshape(x.shape[0], x.shape[1], cfg.heads, -1)
        q = apply_rope(rs(q), *rope)
        k = apply_rope(rs(k), *rope)
        a = attention(q, k, rs(v)).reshape(h.shape)
        h = h + (g_a * linear(p["proj"], a).astype(jnp.float32)).astype(h.dtype)

        # cross-attention to captions
        cq = rs(linear(p["cross_q"], h))
        ck, cv = jnp.split(linear(p["cross_kv"], ctx["y"]), 2, axis=-1)
        c = attention(cq, rs(ck), rs(cv)).reshape(h.shape)
        h = h + linear(p["cross_o"], c)

        xm = (layer_norm(h, eps=cfg.eps) * (1 + sc_m) + sh_m).astype(h.dtype)
        ff = linear(p["ff2"], jax.nn.gelu(linear(p["ff1"], xm), approximate=True))
        return h + (g_m * ff.astype(jnp.float32)).astype(h.dtype)

    def trunk(params, h, ctx):
        def body(carry, p):
            return _block(p, carry, ctx), None

        h, _ = jax.lax.scan(body, h, params["blocks"])
        return h

    def head(params, h, ctx):
        mod = params["final_mod"][None] + ctx["te"][:, None]
        shift, scale = mod[:, 0][:, None], mod[:, 1][:, None]
        out = layer_norm(h, eps=cfg.eps) * (1 + scale) + shift
        out = linear(params["final_out"], out.astype(h.dtype))
        return unpatchify(_Shim(cfg.patch, cfg.in_channels),
                          out.astype(jnp.float32), grid)

    return DiTCore(prepare, trunk, head)
