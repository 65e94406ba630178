"""Wan 2.1 / 2.2 video DiT, TPU-native.

The model behind the reference's flagship adapters
(``MagCache4Wan2.1/magcache_generate.py``, ``MagCache4Wan2.2/…``): a video DiT
with (behavioral spec, re-implemented functionally)

- 3D patch embedding, patch (1, 2, 2) over (F, H, W) latents — realized here
  as reshape+matmul (a stride==kernel conv is a linear patchify; keeps the op
  on the MXU instead of a conv kernel);
- fp32 time path: sinusoidal(freq_dim) -> MLP -> e, then 6-way projection e0
  (the reference wraps this in fp32 autocast, ``magcache_generate.py:249-253``);
- per-block learned modulation table added to e0 (6 chunks: shift/scale/gate
  for self-attn and FFN);
- self-attention with q/k RMSNorm and 3D RoPE (head_dim split t/h/w =
  (d-4d6, 2d6, 2d6), d6 = d//6), full (non-causal) attention;
- cross-attention to the padded 512-token T5 context (no masking — parity
  with ``context_lens=None``, ``magcache_generate.py:264-270``); the i2v
  variant adds a parallel CLIP-image cross-attention whose output is summed;
- head: LN + 2-way modulation from the *unprojected* e, linear to patch
  voxels, unpatchify.

MagCache boundary: residual over the whole block stack on the flattened token
sequence (``magcache_generate.py:294-301``), dual CFG lanes.

Wan2.2 reuses this module: the A14B MoE is **two full experts switched by a
timestep boundary** (not routed EP) — two param pytrees and a host-side step
split (``MagCache4Wan2.2/magcache_generate.py:294-303,697``); ti2v-5B is a
single model with a larger patch.
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
    linear,
    linear_params,
    scan_blocks,
    timestep_embedding,
)
from magcache_tpu.ops.attention import QKNORM_FIXED_MAX, attention
from magcache_tpu.ops.norms import layer_norm, rms_norm
from magcache_tpu.ops.rope import rope_freqs_1d
from magcache_tpu.parallel.mesh import maybe_shard

__all__ = ["WanConfig", "init_wan_params", "make_wan_core", "WAN_1_3B",
           "WAN_14B", "WAN_5B"]


@dataclasses.dataclass(frozen=True)
class WanConfig:
    dim: int = 1536
    ffn_dim: int = 8960
    heads: int = 12
    layers: int = 30
    freq_dim: int = 256
    text_dim: int = 4096
    text_len: int = 512
    in_channels: int = 16
    out_channels: int = 16
    patch: Tuple[int, int, int] = (1, 2, 2)
    eps: float = 1e-6
    model_type: str = "t2v"          # "t2v" | "i2v"
    clip_dim: int = 1280             # i2v CLIP feature dim
    clip_tokens: int = 257
    # VACE video editing (magcache_vace_forward, magcache_generate.py:439-560):
    # a parallel stack of vace blocks consumes the conditioning-video context
    # and emits per-layer hints added into the main trunk at `vace_layers`.
    vace_layers: Tuple[int, ...] = ()
    vace_in_channels: int = 96       # packed video+mask conditioning channels
    dtype: str = "float32"
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    @property
    def has_clip(self) -> bool:
        """Wan2.1-style i2v CLIP image branch. Wan2.2 drops it — the A14B
        i2v conditions via the ``y`` concat alone and the reference forward
        never consumes ``clip_fea`` (MagCache4Wan2.2
        magcache_generate.py:216-246); ``clip_tokens=0`` encodes that."""
        return self.model_type == "i2v" and self.clip_tokens > 0

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def patch_in(self) -> int:
        pt, ph, pw = self.patch
        return self.in_channels * pt * ph * pw

    @property
    def patch_out(self) -> int:
        pt, ph, pw = self.patch
        return self.out_channels * pt * ph * pw

    def tiny(**kw):
        defaults = dict(dim=96, ffn_dim=192, heads=4, layers=2, freq_dim=32,
                        text_dim=24, text_len=16)
        defaults.update(kw)
        return WanConfig(**defaults)

    tiny = staticmethod(tiny)


# Published Wan2.1 sizes (model family table; wan config files)
WAN_1_3B = WanConfig(dim=1536, ffn_dim=8960, heads=12, layers=30)
WAN_14B = WanConfig(dim=5120, ffn_dim=13824, heads=40, layers=40)
# Wan2.2 TI2V-5B (dense, no CLIP branch): the ti2v task consumes the
# Wan2.2-VAE's 48-channel 16x16x4 latents; i2v is latent replacement of
# frame 0, so in/out stay 48 (reference routes via the external wan pkg,
# MagCache4Wan2.2/magcache_generate.py:719-745)
WAN_5B = WanConfig(dim=3072, ffn_dim=14336, heads=24, layers=30,
                   in_channels=48, out_channels=48)


def init_wan_params(key: jax.Array, cfg: WanConfig):
    d, dt, L = cfg.dim, cfg.jdtype, cfg.layers
    ks = iter(jax.random.split(key, 64))
    nxt = lambda: next(ks)

    def st(d_in, d_out):
        return linear_params(nxt(), d_in, d_out, depth=L, dtype=dt)

    params = {
        "patch_embedding": linear_params(nxt(), cfg.patch_in, d, dtype=dt),
        "text_embedding": {
            "in": linear_params(nxt(), cfg.text_dim, d),
            "out": linear_params(nxt(), d, d),
        },
        "time_embedding": {
            "in": linear_params(nxt(), cfg.freq_dim, d),
            "out": linear_params(nxt(), d, d),
        },
        "time_projection": linear_params(nxt(), d, 6 * d),
        "blocks": {
            "modulation": jax.random.normal(nxt(), (L, 6, d), jnp.float32) / np.sqrt(d),
            "q": st(d, d), "k": st(d, d), "v": st(d, d), "o": st(d, d),
            "norm_q": jnp.ones((L, d), jnp.float32),
            "norm_k": jnp.ones((L, d), jnp.float32),
            "cross_q": st(d, d), "cross_k": st(d, d), "cross_v": st(d, d),
            "cross_o": st(d, d),
            "cross_norm_q": jnp.ones((L, d), jnp.float32),
            "cross_norm_k": jnp.ones((L, d), jnp.float32),
            "norm3_w": jnp.ones((L, d), jnp.float32),
            "norm3_b": jnp.zeros((L, d), jnp.float32),
            "ffn1": st(d, cfg.ffn_dim), "ffn2": st(cfg.ffn_dim, d),
        },
        "head": {
            "modulation": jax.random.normal(nxt(), (2, d), jnp.float32) / np.sqrt(d),
            "out": linear_params(nxt(), d, cfg.patch_out),
        },
    }
    if cfg.has_clip:
        params["img_emb"] = {
            "in": linear_params(nxt(), cfg.clip_dim, cfg.clip_dim),
            "out": linear_params(nxt(), cfg.clip_dim, d),
        }
        params["blocks"]["cross_k_img"] = st(d, d)
        params["blocks"]["cross_v_img"] = st(d, d)
        params["blocks"]["cross_norm_k_img"] = jnp.ones((L, d), jnp.float32)
    if cfg.vace_layers:
        Lv = len(cfg.vace_layers)
        pt, ph, pw = cfg.patch

        def stv(d_in, d_out):
            return linear_params(nxt(), d_in, d_out, depth=Lv, dtype=dt)

        params["vace"] = {
            "patch_embedding": linear_params(
                nxt(), cfg.vace_in_channels * pt * ph * pw, d, dtype=dt),
            "before_proj": linear_params(nxt(), d, d, dtype=dt),
            "after_proj": stv(d, d),
            "blocks": {
                "modulation": jax.random.normal(nxt(), (Lv, 6, d), jnp.float32) / np.sqrt(d),
                "q": stv(d, d), "k": stv(d, d), "v": stv(d, d), "o": stv(d, d),
                "norm_q": jnp.ones((Lv, d), jnp.float32),
                "norm_k": jnp.ones((Lv, d), jnp.float32),
                "cross_q": stv(d, d), "cross_k": stv(d, d),
                "cross_v": stv(d, d), "cross_o": stv(d, d),
                "cross_norm_q": jnp.ones((Lv, d), jnp.float32),
                "cross_norm_k": jnp.ones((Lv, d), jnp.float32),
                "norm3_w": jnp.ones((Lv, d), jnp.float32),
                "norm3_b": jnp.zeros((Lv, d), jnp.float32),
                "ffn1": stv(d, cfg.ffn_dim), "ffn2": stv(cfg.ffn_dim, d),
            },
        }
    return params


def wan_rope_tables(cfg: WanConfig, grid: Tuple[int, int, int]):
    """(cos, sin) over the flattened (F, H, W) patch grid, head-dim split
    (t, h, w) = (d-4*d6, 2*d6, 2*d6) with d6 = head_dim//6."""
    d = cfg.head_dim
    d6 = d // 6
    dims = (d - 4 * d6, 2 * d6, 2 * d6)
    f, h, w = grid
    coords = np.stack(np.meshgrid(np.arange(f), np.arange(h), np.arange(w),
                                  indexing="ij"), -1).reshape(-1, 3)
    cos_p, sin_p = [], []
    for ax, dim_a in enumerate(dims):
        c, s = rope_freqs_1d(coords[:, ax], dim_a, 10000.0)
        cos_p.append(c)
        sin_p.append(s)
    return np.concatenate(cos_p, -1), np.concatenate(sin_p, -1)


def _heads(x, n):
    b, s, _ = x.shape
    return x.reshape(b, s, n, -1)


def _apply_rope_pairs(x, cos, sin):
    from magcache_tpu.ops.rope import apply_rope
    return apply_rope(x, cos, sin)


def _wan_block(cfg: WanConfig, rope, ctx_split, n0, p, carry):
    """One WanAttentionBlock. carry = (x, e0f, context).

    ``e0`` is [B, 6, D] (uniform timestep) or [B, 2, 6, D] (Wan2.2 ti2v
    per-token timestep: row 0 = the step's t, row 1 = t=0 applied to the
    first ``n0`` tokens — the conditioned latent frame. The reference
    forward expands t over seq_len for exactly this, Wan2.2
    magcache_generate.py:261-268). Modulation/gating are elementwise, so the
    per-token split is two static-slice applications + concat — the matmuls
    and attention stay whole."""
    x, e0, context = carry
    cos, sin = rope
    seg = e0.ndim == 4
    from magcache_tpu.ops.fused_prologue import layer_norm_mod, rms_norm_rope
    # e: fp32; per-block modulation table added (fp32 island)
    e = (p["modulation"] + e0).astype(jnp.float32)
    if seg:
        mods = [e[:, 0, i][:, None, :] for i in range(6)]   # step's t
        mods0 = [e[:, 1, i][:, None, :] for i in range(6)]  # t=0 prefix
    else:
        mods = mods0 = [e[:, i][:, None, :] for i in range(6)]

    def ln_mod(x, i_shift, i_scale):
        # fused LayerNorm+AdaLN prologue (ops/fused_prologue.py)
        if not seg:
            return layer_norm_mod(x, scale=mods[i_scale], shift=mods[i_shift],
                                  eps=cfg.eps)
        return jnp.concatenate([
            layer_norm_mod(x[:, :n0], scale=mods0[i_scale],
                           shift=mods0[i_shift], eps=cfg.eps),
            layer_norm_mod(x[:, n0:], scale=mods[i_scale],
                           shift=mods[i_shift], eps=cfg.eps)], axis=1)

    def gate(x, y, i):
        if not seg:
            return x + (y.astype(jnp.float32) * mods[i]).astype(x.dtype)
        g = jnp.concatenate([y[:, :n0].astype(jnp.float32) * mods0[i],
                             y[:, n0:].astype(jnp.float32) * mods[i]], axis=1)
        return x + g.astype(x.dtype)

    # self-attention
    xn = ln_mod(x, 0, 1)
    q = rms_norm_rope(linear(p["q"], xn), p["norm_q"], cos, sin, cfg.heads,
                      eps=cfg.eps, norm_scope="token")
    k = rms_norm_rope(linear(p["k"], xn), p["norm_k"], cos, sin, cfg.heads,
                      eps=cfg.eps, norm_scope="token")
    v = _heads(linear(p["v"], xn), cfg.heads)
    a = attention(q, k, v, fixed_max=QKNORM_FIXED_MAX).reshape(x.shape)
    y = linear(p["o"], a)
    x = gate(x, y, 2)

    # cross-attention (text, plus parallel CLIP branch for i2v)
    xc = layer_norm_mod(x, weight=p["norm3_w"], bias=p["norm3_b"],
                        eps=cfg.eps)
    cq = _heads(rms_norm(linear(p["cross_q"], xc), p["cross_norm_q"], eps=cfg.eps), cfg.heads)
    if ctx_split is None:
        ctx_txt = context
    else:
        ctx_img, ctx_txt = context[:, :ctx_split], context[:, ctx_split:]
    ck = _heads(rms_norm(linear(p["cross_k"], ctx_txt), p["cross_norm_k"], eps=cfg.eps), cfg.heads)
    cv = _heads(linear(p["cross_v"], ctx_txt), cfg.heads)
    ca = attention(cq, ck, cv, fixed_max=QKNORM_FIXED_MAX).reshape(x.shape)
    if ctx_split is not None:
        ik = _heads(rms_norm(linear(p["cross_k_img"], ctx_img),
                             p["cross_norm_k_img"], eps=cfg.eps), cfg.heads)
        iv = _heads(linear(p["cross_v_img"], ctx_img), cfg.heads)
        ca = ca + attention(cq, ik, iv, fixed_max=QKNORM_FIXED_MAX).reshape(x.shape)
    x = x + linear(p["cross_o"], ca)

    # FFN
    xm = ln_mod(x, 3, 4)
    y = linear(p["ffn2"], jax.nn.gelu(linear(p["ffn1"], xm), approximate=True))
    x = gate(x, y, 5)
    return maybe_shard(x, "tokens"), e0, context


def patchify(cfg: WanConfig, lat: jnp.ndarray) -> jnp.ndarray:
    """[B, F, H, W, C] -> [B, (F/pt)(H/ph)(W/pw), C*pt*ph*pw]."""
    b, f, h, w, c = lat.shape
    pt, ph, pw = cfg.patch
    lat = lat.reshape(b, f // pt, pt, h // ph, ph, w // pw, pw, c)
    lat = lat.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return lat.reshape(b, (f // pt) * (h // ph) * (w // pw), c * pt * ph * pw)


def unpatchify(cfg: WanConfig, x: jnp.ndarray, grid: Tuple[int, int, int]) -> jnp.ndarray:
    b, s, _ = x.shape
    gf, gh, gw = grid
    pt, ph, pw = cfg.patch
    c = cfg.out_channels
    x = x.reshape(b, gf, gh, gw, c, pt, ph, pw)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, gf * pt, gh * ph, gw * pw, c)


def make_wan_core(cfg: WanConfig, grid: Tuple[int, int, int]) -> DiTCore:
    """Build (prepare, trunk, head) for a static latent patch grid (F, H, W).

    cond = {"context": f[B, text_len, text_dim], "clip_fea": f[B, 257, clip_dim]
            (i2v only), "y": f[B, F, H, W, C] conditioning latents (i2v only,
            concatenated on channels before patchify)}
    x    = latent video f[B, F*pt, H*ph, W*pw, C] (channel-last)
    """
    rope_np = wan_rope_tables(cfg, grid)
    rope = (jnp.asarray(rope_np[0]), jnp.asarray(rope_np[1]))
    ctx_split = cfg.clip_tokens if cfg.has_clip else None
    # first latent frame's token count — the per-token-timestep prefix
    # (Wan2.2 ti2v conditions frame 0 with t=0; patch pt=1 keeps latent
    # frame 0 = grid frame 0)
    n0_prefix = grid[1] * grid[2]

    def prepare(params, x, t, cond):
        dt_ = cfg.jdtype
        if cfg.model_type == "i2v" and "y" in cond:
            x = jnp.concatenate([x, cond["y"]], axis=-1)
        hidden = linear(params["patch_embedding"], patchify(cfg, x.astype(dt_)))

        # fp32 time path (reference: amp.autocast fp32, magcache_generate.py:249-253)
        def time_path(tv):
            e = linear(params["time_embedding"]["out"], jax.nn.silu(
                linear(params["time_embedding"]["in"],
                       timestep_embedding(tv, cfg.freq_dim))))
            e0 = linear(params["time_projection"], jax.nn.silu(e))
            return e, e0.reshape(e0.shape[0], 6, cfg.dim)

        e, e0 = time_path(t)
        if "ti2v_img" in cond:
            # Wan2.2 ti2v per-token timestep: the conditioned latent frame
            # (the first n0 tokens) runs at t=0 — the reference forward
            # expands t over seq_len for this (magcache_generate.py:261-268)
            assert cfg.patch[0] == 1, "ti2v t0-prefix needs pt=1"
            ez, e0z = time_path(jnp.zeros_like(t))
            e = jnp.stack([e, ez], axis=1)        # [B, 2, D]
            e0 = jnp.stack([e0, e0z], axis=1)     # [B, 2, 6, D]

        ctx = jax.nn.gelu(linear(params["text_embedding"]["in"],
                                 cond["context"].astype(jnp.float32)), approximate=True)
        ctx = linear(params["text_embedding"]["out"], ctx).astype(dt_)
        if cfg.has_clip:
            img = jax.nn.gelu(linear(params["img_emb"]["in"],
                                     cond["clip_fea"].astype(jnp.float32)), approximate=True)
            img = linear(params["img_emb"]["out"], img).astype(dt_)
            ctx = jnp.concatenate([img, ctx], axis=1)
        hidden = maybe_shard(hidden, "tokens")
        ctx = maybe_shard(ctx, "context")
        out_ctx = {"e": e, "e0": e0, "context": ctx}
        if cfg.vace_layers:
            out_ctx["vace_context"] = cond["vace_context"].astype(dt_)
            out_ctx["vace_scale"] = cond.get("vace_scale", 1.0)
        return hidden, out_ctx

    def trunk(params, hidden, ctx):
        block = functools.partial(_wan_block, cfg, rope, ctx_split, n0_prefix)

        if cfg.vace_layers:
            # VACE: run the hint stack over the conditioning-context tokens,
            # then inject each vace block's after_proj output into the main
            # trunk at its mapped layer (magcache_generate.py:543-548:
            # hints = forward_vace(...); blocks consume hints w/ context_scale)
            vp = params["vace"]
            c0 = linear(vp["patch_embedding"],
                        patchify(cfg, ctx["vace_context"]))
            c0 = linear(vp["before_proj"], c0) + hidden

            def vace_body(carry, ps):
                bp, ap = ps
                c, e0, context = block(bp, (carry[0], carry[1], carry[2]))
                hint = linear(ap, c)
                return (c, e0, context), hint

            (_, _, _), hints = jax.lax.scan(
                vace_body, (c0, ctx["e0"], ctx["context"]),
                (vp["blocks"], vp["after_proj"]))
            scale = ctx.get("vace_scale", 1.0)
            # scatter hints to their layers (zeros elsewhere)
            L = cfg.layers
            hint_full = jnp.zeros((L,) + hints.shape[1:], hints.dtype)
            hint_full = hint_full.at[jnp.asarray(cfg.vace_layers)].set(hints)

            def body(carry, ps):
                p, hint = ps
                h, e0, context = block(p, carry)
                h = h + (hint * scale).astype(h.dtype)
                return (h, e0, context), None

            (h, _, _), _ = jax.lax.scan(
                body, (hidden, ctx["e0"], ctx["context"]),
                (params["blocks"], hint_full))
            return h

        def body(carry, p):
            return block(p, carry), None

        fn = jax.checkpoint(body) if cfg.remat else body
        (h, _, _), _ = jax.lax.scan(fn, (hidden, ctx["e0"], ctx["context"]),
                                    params["blocks"])
        return h

    def head(params, hidden, ctx):
        e = ctx["e"]

        def mod_head(h, ev):
            mod = params["head"]["modulation"][None] + ev[:, None, :]
            shift, scale = mod[:, 0][:, None, :], mod[:, 1][:, None, :]
            return layer_norm(h, eps=cfg.eps) * (1 + scale) + shift

        if e.ndim == 3:        # ti2v per-token t: (t, t=0-prefix) pair
            h = jnp.concatenate([mod_head(hidden[:, :n0_prefix], e[:, 1]),
                                 mod_head(hidden[:, n0_prefix:], e[:, 0])],
                                axis=1)
        else:
            h = mod_head(hidden, e)
        out = linear(params["head"]["out"], h.astype(hidden.dtype))
        return unpatchify(cfg, out.astype(jnp.float32), grid)

    return DiTCore(prepare, trunk, head)
