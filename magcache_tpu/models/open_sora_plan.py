"""Open-Sora-Plan v1.2 T2V DiT, TPU-native and weight-mappable.

The reference ships three versions (``videosys/models/transformers/
open_sora_plan_transformer_3d.py`` and ``…_v110/_v120``, ~7.8k LoC combined):
v1.0/v1.1 are Latte-style factorized spatial/temporal stacks (the v110 product
rides `models.latte` — see `pipelines/open_sora_plan.py`), and **v1.2 switches
to full 3-D joint attention** over all T*H*W tokens
(``open_sora_plan_v120_transformer_3d.py``, OpenSoraT2V :1505): single-stream
PixArt-style blocks (ada_norm_single: global 6-way modulation + per-block
``scale_shift_table``), full 3-D self-attention with **RoPE3D** — head_dim
split into three equal parts for (t, y, x), half-split rotation
(``rotate_half``, :85-96) with per-axis position interpolation scaling
(:73-82) — cross-attention to T5 captions on the un-normed stream (PixArt
convention, :1400-1403), gelu-tanh FFN, and a 2-chunk final modulation
(:2077-2081). With ``use_rope`` the published config disables absolute
position embeddings (:1629). Unpatchify feature order is [pt, ph, pw, c]
("nthwopqc->nctohpwq", :2087-2098).

PAB gates the self/cross/mlp outputs per block exactly like the reference's
``if_broadcast_spatial/cross`` + ``if_skip_mlp`` hooks (:1353, :1390, :1447).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.sampler import DiTCore
from magcache_tpu.models.common import linear, linear_params, timestep_embedding
from magcache_tpu.ops.fused_prologue import layer_norm_mod
from magcache_tpu.ops.attention import attention
from magcache_tpu.ops.norms import layer_norm

__all__ = ["OpenSoraPlanConfig", "init_osp_params", "make_osp_core",
           "osp_rope_tables"]


@dataclasses.dataclass(frozen=True)
class OpenSoraPlanConfig:
    hidden: int = 1152
    heads: int = 16
    depth: int = 28
    mlp_ratio: int = 4
    in_channels: int = 4
    out_channels: int = 0            # 0 -> same as in_channels
    caption_dim: int = 4096
    patch: Tuple[int, int, int] = (1, 2, 2)
    time_embed_dim: int = 256
    interpolation_scale: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    rope_theta: float = 10000.0
    eps: float = 1e-6
    dtype: str = "float32"

    @property
    def head_dim(self):
        return self.hidden // self.heads

    @property
    def c_out(self):
        return self.out_channels or self.in_channels

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
        "final_out": linear_params(nxt(), d, cfg.c_out * pt * ph * pw),
    }


def osp_rope_tables(cfg: OpenSoraPlanConfig, grid: Tuple[int, int, int]):
    """RoPE3D tables, reference convention (``RoPE3D.get_cos_sin``): head_dim
    in three equal (t, y, x) parts, each with ``cat(freqs, freqs)`` half-split
    layout; positions divided by the per-axis interpolation scale."""
    hd = cfg.head_dim
    assert hd % 3 == 0 and (hd // 3) % 2 == 0, f"head_dim {hd} not RoPE3D-able"
    D = hd // 3
    coords = np.stack(np.meshgrid(*[np.arange(g) for g in grid],
                                  indexing="ij"), -1).reshape(-1, 3)
    cos_p, sin_p = [], []
    for ax in range(3):
        inv_freq = 1.0 / cfg.rope_theta ** (
            np.arange(0, D, 2, dtype=np.float64) / D)
        pos = coords[:, ax] / cfg.interpolation_scale[ax]
        f = pos[:, None] * inv_freq[None]
        f = np.concatenate([f, f], axis=-1)        # half-split layout
        cos_p.append(np.cos(f))
        sin_p.append(np.sin(f))
    return (np.concatenate(cos_p, -1).astype(np.float32),
            np.concatenate(sin_p, -1).astype(np.float32))


def _rope_half(x, cos, sin, D):
    """Per-third half-split rotation: x*cos + rotate_half(x)*sin, applied to
    each of the three D-wide segments (cos/sin are pre-concatenated)."""
    x32 = x.astype(jnp.float32)
    parts = []
    for i in range(3):
        seg = x32[..., i * D:(i + 1) * D]
        c = cos[:, None, i * D:(i + 1) * D]
        s = sin[:, None, i * D:(i + 1) * D]
        half = D // 2
        rot = jnp.concatenate([-seg[..., half:], seg[..., :half]], axis=-1)
        parts.append(seg * c + rot * s)
    return jnp.concatenate(parts, axis=-1).astype(x.dtype)


def _rope_half_matrix(D3: int, dp: int) -> np.ndarray:
    """`rotate_half` per D3-wide third as a [dp, dp] signed permutation, so
    the rotation runs as one aligned matmul on the 128-lane packed layout
    (x @ P: out[base+m] = -x[base+half+m], out[base+half+m] = x[base+m];
    zero rows/cols past the three thirds)."""
    P = np.zeros((dp, dp), np.float32)
    half = D3 // 2
    for i in range(3):
        base = i * D3
        for m in range(half):
            P[base + half + m, base + m] = -1.0
            P[base + m, base + half + m] = 1.0
    return P


def _rope_half_packed(x, cosp, sinp, P):
    """Half-split RoPE3D on the packed [B, N, H, dp] layout: identity past
    the true head dim (cos=1/sin=0 pad lanes; P zero there)."""
    x32 = x.astype(jnp.float32)
    rot = jnp.einsum("bnhd,de->bnhe", x32, P)
    return (x32 * cosp[:, None] + rot * sinp[:, None]).astype(x.dtype)


def make_osp_core(cfg: OpenSoraPlanConfig, grid: Tuple[int, int, int],
                  caption_len: int, *, pab=None, timesteps=None) -> DiTCore:
    """cond = {"y": f[B, caption_len, caption_dim]}; x = latent video
    f[B, T*pt, H*ph, W*pw, C]."""
    from magcache_tpu.models.wan import patchify

    T, H, W = grid
    N = T * H * W
    d = cfg.hidden
    D3 = cfg.head_dim // 3
    rope_np = osp_rope_tables(cfg, grid)
    rope = (jnp.asarray(rope_np[0]), jnp.asarray(rope_np[1]))
    # packed 128-lane execution (models/packed.py; same 16x72 geometry and
    # rationale as STDiT3 — sub-128 head dims relayout-copy on every
    # reshape): RoPE3D rides the aligned layout as cos/sin tables padded
    # with identity plus a signed-permutation matmul
    dp = -(-cfg.head_dim // 128) * 128
    if cfg.head_dim % 2 == 0:
        cosp_np = np.ones((N, dp), np.float32)
        sinp_np = np.zeros((N, dp), np.float32)
        cosp_np[:, :cfg.head_dim] = rope_np[0]
        sinp_np[:, :cfg.head_dim] = rope_np[1]
        rope_packed = (jnp.asarray(cosp_np), jnp.asarray(sinp_np),
                       jnp.asarray(_rope_half_matrix(D3, dp)))
    else:
        rope_packed = None

    def _plan():
        from magcache_tpu.parallel.mesh import _ACTIVE
        return _ACTIVE.get()

    def _use_packed():
        """Trace-time packed-path gate (see stdit3/latte _use_packed;
        MAGCACHE_STDIT3_PACKED governs all three)."""
        import os
        env = os.environ.get("MAGCACHE_STDIT3_PACKED", "1")
        if env == "0" or rope_packed is None:
            return False
        if jax.default_backend() not in ("tpu", "axon") and env != "interpret":
            return False
        return cfg.head_dim % 128 != 0

    def _interp():
        return jax.default_backend() not in ("tpu", "axon")

    masks = None
    if pab is not None:
        from magcache_tpu.core.pab import broadcast_masks
        assert timesteps is not None, "PAB needs the sampling timesteps"
        masks = {k: jnp.asarray(v) for k, v in
                 broadcast_masks(pab, timesteps).items()}

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

    def _block(p, h, ctx, cached=None, flags=None, packed=False):
        e = (p["scale_shift"][None] + ctx["t6"]).astype(jnp.float32)
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = [e[:, i][:, None] for i in range(6)]
        rs = lambda x: x.reshape(x.shape[0], x.shape[1], cfg.heads, -1)

        if packed:
            # plain-path fused pipeline on the 128-lane packed weights
            # (mirrors stdit3._block's fast path; PAB keeps the general
            # path below — its caches need pre-gate outputs)
            from magcache_tpu.ops.attention import (
                flash_attention_bshd, fused_cross_attention)
            from magcache_tpu.ops.fused_prologue import (
                lnmod_matmul, matmul_gated_residual)
            rows = h.shape[0]
            cosp, sinp, Pm = rope_packed
            sc_attn = 1.0 / float(np.sqrt(cfg.head_dim))
            qkv = lnmod_matmul(h, sc_a[:, 0], sh_a[:, 0], p["qkv"]["w"],
                               p["qkv"].get("b"), eps=cfg.eps,
                               interpret=_interp())
            qh, kh, vh = jnp.split(qkv, 3, axis=-1)
            rs4 = lambda t_: t_.reshape(rows, N, cfg.heads, dp)
            q = _rope_half_packed(rs4(qh), cosp, sinp, Pm)
            k = _rope_half_packed(rs4(kh), cosp, sinp, Pm)
            o = flash_attention_bshd(q, k, rs4(vh), scale=sc_attn,
                                     interpret=_interp())
            h = matmul_gated_residual(
                o.reshape(rows, N, cfg.heads * dp), p["proj"]["w"],
                p["proj"].get("b"), g_a[:, 0], h, interpret=_interp())
            kk, vv = jnp.split(linear(p["cross_kv"], ctx["y"]), 2, axis=-1)
            h = fused_cross_attention(
                h, p["cross_q"]["w"], p["cross_q"].get("b"), kk, vv,
                p["cross_o"]["w"], p["cross_o"].get("b"), cfg.heads,
                scale=sc_attn, true_d=cfg.head_dim, residual=True,
                interpret=_interp())
            y = lnmod_matmul(h, sc_m[:, 0], sh_m[:, 0], p["ff1"]["w"],
                             p["ff1"].get("b"), act="gelu", eps=cfg.eps,
                             interpret=_interp())
            h = matmul_gated_residual(y, p["ff2"]["w"], p["ff2"].get("b"),
                                      g_m[:, 0], h, interpret=_interp())
            return h, {}

        def compute_attn(h):
            # full 3-D self-attention over all T*H*W tokens, RoPE3D
            xn = layer_norm_mod(h, scale=sc_a[:, 0], shift=sh_a[:, 0],
                                eps=cfg.eps)
            q, k, v = jnp.split(linear(p["qkv"], xn), 3, axis=-1)
            q = _rope_half(rs(q), *rope, D3)
            k = _rope_half(rs(k), *rope, D3)
            a = attention(q, k, rs(v)).reshape(h.shape)
            return linear(p["proj"], a)

        def compute_cross(h):
            # PixArt convention: cross-attention on the un-normed stream
            cq = rs(linear(p["cross_q"], h))
            ck, cv = jnp.split(linear(p["cross_kv"], ctx["y"]), 2, axis=-1)
            c = attention(cq, rs(ck), rs(cv)).reshape(h.shape)
            return linear(p["cross_o"], c)

        def compute_mlp(h):
            xm = layer_norm_mod(h, scale=sc_m[:, 0], shift=sh_m[:, 0],
                                eps=cfg.eps)
            return linear(p["ff2"], jax.nn.gelu(linear(p["ff1"], xm),
                                                approximate=True))

        new_cached = {}
        if cached is not None:
            a = jax.lax.cond(flags["spatial"], lambda _: cached["attn"],
                             compute_attn, h)
            new_cached["attn"] = a
        else:
            a = compute_attn(h)
        h = h + (g_a * a.astype(jnp.float32)).astype(h.dtype)

        if cached is not None:
            c = jax.lax.cond(flags["cross"], lambda _: cached["cross"],
                             compute_cross, h)
            new_cached["cross"] = c
        else:
            c = compute_cross(h)
        h = h + c

        if cached is not None:
            m = jax.lax.cond(flags["mlp"], lambda _: cached["mlp"],
                             compute_mlp, h)
            new_cached["mlp"] = m
        else:
            m = compute_mlp(h)
        h = h + (g_m * m.astype(jnp.float32)).astype(h.dtype)
        return h, new_cached

    def trunk(params, h, ctx):
        blocks = params["blocks"]
        packed = _use_packed() and _plan() is None
        if packed:
            from magcache_tpu.models.packed import pack_block_group
            blocks = pack_block_group(blocks, cfg.heads, cfg.head_dim, dp)

        def body(carry, p):
            out, _ = _block(p, carry, ctx, packed=packed)
            return out, None

        h, _ = jax.lax.scan(body, h, blocks)
        return h

    def init_state(params, hidden_shape, ctx_shape):
        rows = hidden_shape.shape[0]
        z = lambda: jnp.zeros((cfg.depth, rows, N, d), hidden_shape.dtype)
        return {"attn": z(), "cross": z(), "mlp": z()}

    def trunk_pab(params, h, ctx, state, step_idx):
        flags = {k: masks[k][step_idx] for k in masks}

        def body(carry, ps):
            p, c_a, c_c, c_m = ps
            out, nc = _block(p, carry, ctx,
                             cached={"attn": c_a, "cross": c_c, "mlp": c_m},
                             flags=flags)
            return out, (nc["attn"], nc["cross"], nc["mlp"])

        h, ys = jax.lax.scan(body, h, (params["blocks"], state["attn"],
                                       state["cross"], state["mlp"]))
        return h, {"attn": ys[0], "cross": ys[1], "mlp": ys[2]}

    def head(params, h, ctx):
        mod = params["final_mod"][None] + ctx["te"][:, None]
        shift, scale = mod[:, 0][:, None], mod[:, 1][:, None]
        out = layer_norm(h, eps=cfg.eps) * (1 + scale) + shift
        out = linear(params["final_out"], out.astype(h.dtype)).astype(jnp.float32)
        b = out.shape[0]
        pt, ph, pw = cfg.patch
        c = cfg.c_out
        # proj_out features ordered [pt, ph, pw, c] ("nthwopqc->nctohpwq",
        # ref v120 :2087-2098) — matters for real checkpoints
        out = out.reshape(b, T, H, W, pt, ph, pw, c)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        out = out.reshape(b, T * pt, H * ph, W * pw, c)
        return out[..., :cfg.in_channels]

    if pab is not None:
        return DiTCore(prepare, trunk_pab, head, init_state=init_state)
    return DiTCore(prepare, trunk, head)
