"""Latte T2V DiT, TPU-native.

Behavioral spec from ``videosys/models/transformers/latte_transformer_3d.py``
(LatteT2V :895): alternating **spatial** transformer blocks (self-attention
over each frame's patches + cross-attention to the caption) and **temporal**
blocks (self-attention over frames at each location, temporal position
embedding, no cross-attention), PixArt-style AdaLN-single — one global 6-way
modulation from the timestep shared by all blocks, combined with a per-block
learned ``scale_shift_table`` — plus absolute 2-D sincos spatial position
embeddings. PAB hooks gate the spatial/temporal/cross attentions
(``:150, :521``); the trunk residual boundary serves MagCache as usual.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.sampler import DiTCore
from magcache_tpu.models.common import linear, linear_params, timestep_embedding
from magcache_tpu.models.packed import pack_block_group
from magcache_tpu.models.stdit3 import _pos_embed_2d
from magcache_tpu.ops.attention import (attention, fused_cross_attention,
                                        grouped_attention_fused_qkv)
from magcache_tpu.ops.fused_prologue import (layer_norm_mod, lnmod_matmul,
                                             matmul_gated_residual)
from magcache_tpu.ops.norms import layer_norm
from magcache_tpu.ops.tiny_attention import tiny_temporal_attention
from magcache_tpu.ops.rope import rope_freqs_1d

__all__ = ["LatteConfig", "init_latte_params", "make_latte_core"]


@dataclasses.dataclass(frozen=True)
class LatteConfig:
    hidden: int = 1152
    heads: int = 16
    depth: int = 28                 # pairs (spatial, temporal)
    mlp_ratio: int = 4
    in_channels: int = 4
    # published Latte-1 predicts epsilon+variance (out=8); the variance half is
    # dropped after CFG, as in the reference pipeline (pipeline_latte.py:870-871)
    out_channels: int = 0            # 0 -> same as in_channels
    caption_dim: int = 4096
    patch: int = 2                  # spatial patch
    time_embed_dim: int = 256
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
        d = dict(hidden=64, heads=4, depth=2, caption_dim=24, time_embed_dim=32)
        d.update(kw)
        return LatteConfig(**d)

    tiny = staticmethod(tiny)


def init_latte_params(key: jax.Array, cfg: LatteConfig):
    d, L = cfg.hidden, cfg.depth
    p2 = cfg.patch * cfg.patch
    ks = iter(jax.random.split(key, 32))
    nxt = lambda: next(ks)

    def st(i, o):
        return linear_params(nxt(), i, o, depth=L, dtype=cfg.jdtype)

    def group(cross: bool):
        g = {
            "scale_shift": jax.random.normal(nxt(), (L, 6, d), jnp.float32) / np.sqrt(d),
            "qkv": st(d, 3 * d), "proj": st(d, d),
            "ff1": st(d, cfg.mlp_ratio * d), "ff2": st(cfg.mlp_ratio * d, d),
        }
        if cross:
            g.update({"cross_q": st(d, d), "cross_kv": st(d, 2 * d),
                      "cross_o": st(d, d)})
        return g

    return {
        "patch_embed": linear_params(nxt(), cfg.in_channels * p2, d, dtype=cfg.jdtype),
        "caption": {"in": linear_params(nxt(), cfg.caption_dim, d),
                    "out": linear_params(nxt(), d, d)},
        "time": {"in": linear_params(nxt(), cfg.time_embed_dim, d),
                 "out": linear_params(nxt(), d, d)},
        "adaln_single": linear_params(nxt(), d, 6 * d),
        "temp_pos": None,   # built per grid (sincos), not learned here
        "spatial": group(cross=True),
        "temporal": group(cross=False),
        "final_mod": jax.random.normal(nxt(), (2, d), jnp.float32) / np.sqrt(d),
        "final_out": linear_params(nxt(), d, cfg.c_out * p2),
    }


def make_latte_core(cfg: LatteConfig, grid: Tuple[int, int, int],
                    caption_len: int, *, pab=None, timesteps=None) -> DiTCore:
    """cond = {"y": f[B, caption_len, caption_dim]}; x = latent video
    f[B, T, H*p, W*p, C].

    ``pab``: a `core.pab.PABConfig` + the sampling ``timesteps`` enables
    Pyramid Attention Broadcast on the spatial/temporal/cross attentions and
    MLPs, with cached per-block outputs threaded as sampler trunk state
    (the reference wires PAB into Latte's blocks,
    ``latte_transformer_3d.py:150,:521``).
    """
    T, H, W = grid
    S = H * W
    d = cfg.hidden
    # packed 128-lane execution geometry (models/packed.py; no qk-norm/RoPE
    # in Latte attention, so the fused kernels run gains/rope-free)
    d_head = d // cfg.heads
    dp = -(-d_head // 128) * 128
    Tp = max(8, 1 << (T - 1).bit_length())
    Sg = -(-S // 16) * 16

    def _plan():
        from magcache_tpu.parallel.mesh import _ACTIVE
        return _ACTIVE.get()

    def _use_packed():
        """Mesh-compatible packed path (see stdit3._use_packed): under an
        active plan the grouped kernels run inside shard_map with heads over
        tp; "interpret" forces them off-TPU for CPU-mesh parity tests."""
        import os
        env = os.environ.get("MAGCACHE_STDIT3_PACKED", "1")
        if env == "0":
            return False
        if jax.default_backend() not in ("tpu", "axon") and env != "interpret":
            return False
        plan = _plan()
        if plan is not None:
            if cfg.heads % dict(plan.mesh.shape).get("tp", 1) != 0:
                return False
            if Sg > 2048:
                return False
        return d_head % 128 != 0 and T <= 256

    def _interp():
        return jax.default_backend() not in ("tpu", "axon")

    pos2d = jnp.asarray(_pos_embed_2d(d, H, W))
    tcos, tsin = rope_freqs_1d(np.arange(T), d, 10000.0)
    # Latte adds an absolute temporal sincos embedding before temporal blocks;
    # [sin | cos] channel order per diffusers get_1d_sincos_pos_embed_from_grid
    # (ref latte_transformer_3d.py:1468-1471) — matters for real checkpoints.
    temp_pos = jnp.asarray(
        np.concatenate([tsin, tcos], axis=-1)[:, :d].astype(np.float32))

    def _patchify(x):
        b, t, hh, ww, c = x.shape
        p = cfg.patch
        x = x.reshape(b, t, hh // p, p, ww // p, p, c)
        x = x.transpose(0, 1, 2, 4, 6, 3, 5)
        return x.reshape(b, t * (hh // p) * (ww // p), c * p * p)

    def prepare(params, x, t, cond):
        h = linear(params["patch_embed"], _patchify(x.astype(cfg.jdtype)))
        # keep the trunk hidden in the compute dtype — the f32 sincos table
        # add would otherwise promote every downstream GEMM to f32
        h = (h.reshape(h.shape[0], T, S, d) + pos2d[None, None]).reshape(
            h.shape[0], T * S, d).astype(cfg.jdtype)
        te = linear(params["time"]["out"], jax.nn.silu(
            linear(params["time"]["in"], timestep_embedding(t, cfg.time_embed_dim))))
        t6 = linear(params["adaln_single"], jax.nn.silu(te)).reshape(-1, 6, d)
        y = jax.nn.gelu(linear(params["caption"]["in"],
                               cond["y"].astype(jnp.float32)), approximate=True)
        y = linear(params["caption"]["out"], y).astype(cfg.jdtype)
        return h, {"t6": t6, "te": te, "y": y}

    def _self_attn(p, xr):
        q, k, v = jnp.split(linear(p["qkv"], xr), 3, axis=-1)
        rs = lambda t_: t_.reshape(t_.shape[0], t_.shape[1], cfg.heads, -1)
        o = attention(rs(q), rs(k), rs(v)).reshape(xr.shape)
        return linear(p["proj"], o)

    masks = None
    if pab is not None:
        from magcache_tpu.core.pab import broadcast_masks, mlp_skip_masks
        assert timesteps is not None, "PAB needs the sampling timesteps"
        masks = {k: jnp.asarray(v) for k, v in
                 broadcast_masks(pab, timesteps).items()}
        # block-granular MLP gating (per-(step, block, branch) reuse/save
        # bits; pab_mgr.py:108-139) — the block axis is consumed by the
        # trunk's scan over blocks
        for branch, tmp in (("sp", False), ("tp", True)):
            mm = mlp_skip_masks(pab, timesteps, cfg.depth, temporal=tmp)
            masks[f"mlp_{branch}_reuse"] = jnp.asarray(mm["reuse"])
            masks[f"mlp_{branch}_save"] = jnp.asarray(mm["save"])

    def _block(p, h, ctx, temporal: bool, cached=None, flags=None,
               packed: bool = False):
        rows, N, _ = h.shape
        e = (p["scale_shift"][None] + ctx["t6"]).astype(jnp.float32)
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = [e[:, i][:, None] for i in range(6)]
        sc_attn = 1.0 / float(np.sqrt(d_head))

        def compute_attn(h):
            xn = layer_norm_mod(h, scale=sc_a[:, 0], shift=sh_a[:, 0],
                                eps=cfg.eps)
            if temporal:
                xr4 = xn.reshape(rows, T, S, d).transpose(0, 2, 1, 3)
                if packed:
                    # pad frames BEFORE the projection (fuses into the
                    # transpose copy; 1/5.3 the bytes of padding the output)
                    if Tp != T:
                        xr4 = jnp.pad(xr4,
                                      ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
                    xr = xr4.reshape(rows * S, Tp, d)
                    qkv = linear(p["qkv"], xr)    # [R, Tp, 3*H*dp]
                    plan = _plan()
                    if plan is None:
                        o = grouped_attention_fused_qkv(
                            qkv.reshape(1, rows * S * Tp, 3 * cfg.heads * dp),
                            cfg.heads, group=Tp, group_valid=T, scale=sc_attn,
                            true_d=d_head, interpret=_interp())
                    else:
                        from magcache_tpu.parallel.collectives import (
                            sharded_grouped_attention_fused_qkv)
                        o = sharded_grouped_attention_fused_qkv(
                            qkv.reshape(rows, S * Tp, 3 * cfg.heads * dp),
                            cfg.heads, plan.mesh, group=Tp, group_valid=T,
                            scale=sc_attn, true_d=d_head, shard_tokens=True,
                            interpret=_interp())
                    a = linear(p["proj"],
                               o.reshape(rows * S, Tp, cfg.heads * dp))[:, :T]
                else:
                    # tiny frame axis: fused VMEM attention over the qkv
                    # projection (no qk-norm/rope in Latte temporal blocks)
                    xr = xr4.reshape(rows * S, T, d)
                    qkv = linear(p["qkv"], xr)
                    o = tiny_temporal_attention(qkv, None, None, None, None,
                                                cfg.heads)
                    a = linear(p["proj"], o)
                return a.reshape(rows, S, T, d).transpose(0, 2, 1, 3).reshape(rows, N, d)
            xr = xn.reshape(rows * T, S, d)
            if packed and Sg <= 2048:
                qkv = linear(p["qkv"], xr)        # [rows*T, S, 3*H*dp]
                if Sg != S:
                    qkv = jnp.pad(qkv, ((0, 0), (0, Sg - S), (0, 0)))
                plan = _plan()
                if plan is None:
                    o = grouped_attention_fused_qkv(
                        qkv, cfg.heads, group=Sg, group_valid=S,
                        scale=sc_attn, true_d=d_head, interpret=_interp())
                else:
                    from magcache_tpu.parallel.collectives import (
                        sharded_grouped_attention_fused_qkv)
                    o = sharded_grouped_attention_fused_qkv(
                        qkv, cfg.heads, plan.mesh, group=Sg, group_valid=S,
                        scale=sc_attn, true_d=d_head, interpret=_interp())
                a = linear(p["proj"], o)
                if Sg != S:
                    a = a[:, :S]
                return a.reshape(rows, N, d)
            return _self_attn(p, xr).reshape(rows, N, d)

        def compute_cross(h):
            y = ctx["y"]
            q = linear(p["cross_q"], h)
            k, v = jnp.split(linear(p["cross_kv"], y), 2, axis=-1)
            hd_c = dp if packed else d_head
            rs = lambda t_: t_.reshape(t_.shape[0], t_.shape[1], cfg.heads, hd_c)
            c = attention(rs(q), rs(k), rs(v),
                          scale=(sc_attn if packed else None)
                          ).reshape(rows, N, cfg.heads * hd_c)
            return linear(p["cross_o"], c)

        def compute_mlp(h):
            xm = layer_norm_mod(h, scale=sc_m[:, 0], shift=sh_m[:, 0],
                                eps=cfg.eps)
            return linear(p["ff2"], jax.nn.gelu(linear(p["ff1"], xm),
                                                approximate=True))

        def attn_into(h):
            """Plain-path packed attention with the epilogue (out-proj +
            AdaLN gate [+ residual]) fused — see stdit3._block.attn_into."""
            if temporal:
                xn = layer_norm_mod(h, scale=sc_a[:, 0], shift=sh_a[:, 0],
                                    eps=cfg.eps)
                xr4 = xn.reshape(rows, T, S, d).transpose(0, 2, 1, 3)
                if Tp != T:
                    xr4 = jnp.pad(xr4, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
                qkv = linear(p["qkv"], xr4.reshape(rows * S, Tp, d))
                o = grouped_attention_fused_qkv(
                    qkv.reshape(1, rows * S * Tp, 3 * cfg.heads * dp),
                    cfg.heads, group=Tp, group_valid=T, scale=sc_attn,
                    true_d=d_head, interpret=_interp())
                a = matmul_gated_residual(
                    o.reshape(rows * S, Tp, cfg.heads * dp),
                    p["proj"]["w"], p["proj"].get("b"), g_a[:, 0], None,
                    rows_out=T, batch_repeat=S, interpret=_interp())
                a = (a.reshape(rows, S, T, d).transpose(0, 2, 1, 3)
                     .reshape(rows, N, d))
                return h + a
            qkv = lnmod_matmul(h.reshape(rows * T, S, d),
                               sc_a[:, 0], sh_a[:, 0],
                               p["qkv"]["w"], p["qkv"].get("b"), eps=cfg.eps,
                               rows_out=Sg, batch_repeat=T,
                               interpret=_interp())
            o = grouped_attention_fused_qkv(
                qkv, cfg.heads, group=Sg, group_valid=S, scale=sc_attn,
                true_d=d_head, interpret=_interp())
            return matmul_gated_residual(
                o, p["proj"]["w"], p["proj"].get("b"), g_a[:, 0],
                h.reshape(rows * T, S, d), rows_out=S, batch_repeat=T,
                interpret=_interp()).reshape(rows, N, d)

        def cross_into(h):
            y = ctx["y"]
            k, v = jnp.split(linear(p["cross_kv"], y), 2, axis=-1)
            return fused_cross_attention(
                h, p["cross_q"]["w"], p["cross_q"].get("b"), k, v,
                p["cross_o"]["w"], p["cross_o"].get("b"), cfg.heads,
                scale=sc_attn, true_d=d_head, residual=True,
                interpret=_interp())

        def mlp_into(h):
            yv = lnmod_matmul(h, sc_m[:, 0], sh_m[:, 0], p["ff1"]["w"],
                              p["ff1"].get("b"), act="gelu", eps=cfg.eps,
                              interpret=_interp())
            return matmul_gated_residual(yv, p["ff2"]["w"], p["ff2"].get("b"),
                                         g_m[:, 0], h, interpret=_interp())

        plan_b = _plan()
        if cached is None and packed and Sg <= 2048:
            if plan_b is None:
                h = attn_into(h)
                if not temporal:
                    h = cross_into(h)
                return mlp_into(h), {}
            axes_b = dict(plan_b.mesh.shape)
            if (axes_b.get("tp", 1) == 1
                    and rows % max(axes_b.get("dp", 1), 1) == 0):
                # mesh fused path for the per-token cross/MLP kernels
                # (see stdit3._block — same wrappers, same rationale)
                from magcache_tpu.parallel.collectives import (
                    sharded_fused_cross_attention, sharded_lnmod_matmul,
                    sharded_matmul_gated_residual)
                a = compute_attn(h)
                h = h + (g_a * a.astype(jnp.float32)).astype(h.dtype)
                if not temporal:
                    y = ctx["y"]
                    kk, vv = jnp.split(linear(p["cross_kv"], y), 2, axis=-1)
                    h = sharded_fused_cross_attention(
                        h, p["cross_q"]["w"], p["cross_q"].get("b"), kk, vv,
                        p["cross_o"]["w"], p["cross_o"].get("b"), cfg.heads,
                        plan_b.mesh, scale=sc_attn, true_d=d_head,
                        residual=True, interpret=_interp())
                yv = sharded_lnmod_matmul(
                    h, sc_m[:, 0], sh_m[:, 0], p["ff1"]["w"],
                    p["ff1"].get("b"), plan_b.mesh, act="gelu", eps=cfg.eps,
                    interpret=_interp())
                h = sharded_matmul_gated_residual(
                    yv, p["ff2"]["w"], p["ff2"].get("b"), g_m[:, 0], h,
                    plan_b.mesh, interpret=_interp())
                return h, {}

        new_cached = {}
        kind = "temporal" if temporal else "spatial"
        if cached is not None:
            a = jax.lax.cond(flags[kind], lambda _: cached["attn"],
                             compute_attn, h)
            new_cached["attn"] = a
        else:
            a = compute_attn(h)
        h = h + (g_a * a.astype(jnp.float32)).astype(h.dtype)

        if not temporal:
            if cached is not None:
                c = jax.lax.cond(flags["cross"], lambda _: cached["cross"],
                                 compute_cross, h)
                new_cached["cross"] = c
            else:
                c = compute_cross(h)
            h = h + c
        elif cached is not None:
            new_cached["cross"] = cached["cross"]  # unused slot for temporal

        if cached is not None:
            mo = jax.lax.cond(flags["mlp_reuse"], lambda _: cached["mlp"],
                              compute_mlp, h)
            # the cache refreshes only on save steps (block-granular anchors,
            # or every computed step under the window+stride fallback)
            new_cached["mlp"] = jnp.where(flags["mlp_save"], mo,
                                          cached["mlp"])
        else:
            mo = compute_mlp(h)
        h = h + (g_m * mo.astype(jnp.float32)).astype(h.dtype)
        return h, new_cached

    # the reference adds the absolute temporal sincos to the RESIDUAL
    # stream once, before the FIRST temporal block only
    # (latte_transformer_3d.py:1354-1355: ``if i == 0: hidden += temp_pos``)
    tp_tok = jnp.broadcast_to(temp_pos[:, None, :], (T, S, d)).reshape(
        T * S, d)

    def _add_temp_pos0(h, i):
        h1 = (h.astype(jnp.float32) + tp_tok[None]).astype(h.dtype)
        return jnp.where(i == 0, h1, h)

    def _exec_groups(params):
        sp_g, tp_g = params["spatial"], params["temporal"]
        packed = _use_packed()
        if packed:
            plan = _plan()
            hm = (plan is not None
                  and dict(plan.mesh.shape).get("tp", 1) > 1)
            sp_g = pack_block_group(sp_g, cfg.heads, d_head, dp,
                                    head_major=hm)
            tp_g = pack_block_group(tp_g, cfg.heads, d_head, dp,
                                    head_major=hm)
        return sp_g, tp_g, packed

    def trunk(params, h, ctx):
        sp_g, tp_g, packed = _exec_groups(params)

        def body(carry, ps):
            i, sp, tp_ = ps
            h, _ = _block(sp, carry, ctx, temporal=False, packed=packed)
            h = _add_temp_pos0(h, i)
            h, _ = _block(tp_, h, ctx, temporal=True, packed=packed)
            return h, None

        h, _ = jax.lax.scan(body, h, (jnp.arange(cfg.depth), sp_g, tp_g))
        return h

    def init_state(params, hidden_shape, ctx_shape):
        rows, N, _ = hidden_shape.shape
        z = lambda: jnp.zeros((cfg.depth, rows, N, d), hidden_shape.dtype)
        return {"sp_attn": z(), "sp_cross": z(), "sp_mlp": z(),
                "tp_attn": z(), "tp_cross": z(), "tp_mlp": z()}

    def trunk_pab(params, h, ctx, state, step_idx):
        flags = {k: masks[k][step_idx] for k in masks}
        sp_g, tp_g, packed = _exec_groups(params)

        def body(carry, ps):
            h = carry
            (i, sp, tp_, c_sa, c_sc, c_sm, c_ta, c_tc, c_tm,
             msr, mss, mtr, mts) = ps
            h, ns = _block(sp, h, ctx, temporal=False,
                           cached={"attn": c_sa, "cross": c_sc, "mlp": c_sm},
                           flags={**flags, "mlp_reuse": msr, "mlp_save": mss},
                           packed=packed)
            h = _add_temp_pos0(h, i)
            h, nt = _block(tp_, h, ctx, temporal=True,
                           cached={"attn": c_ta, "cross": c_tc, "mlp": c_tm},
                           flags={**flags, "mlp_reuse": mtr, "mlp_save": mts},
                           packed=packed)
            return h, (ns["attn"], ns["cross"], ns["mlp"],
                       nt["attn"], nt["cross"], nt["mlp"])

        h, ys = jax.lax.scan(
            body, h,
            (jnp.arange(cfg.depth),
             sp_g, tp_g, state["sp_attn"],
             state["sp_cross"], state["sp_mlp"], state["tp_attn"],
             state["tp_cross"], state["tp_mlp"],
             flags["mlp_sp_reuse"], flags["mlp_sp_save"],
             flags["mlp_tp_reuse"], flags["mlp_tp_save"]))
        new_state = {"sp_attn": ys[0], "sp_cross": ys[1], "sp_mlp": ys[2],
                     "tp_attn": ys[3], "tp_cross": ys[4], "tp_mlp": ys[5]}
        return h, new_state

    def head(params, h, ctx):
        mod = params["final_mod"][None] + ctx["te"][:, None]
        shift, scale = mod[:, 0][:, None], mod[:, 1][:, None]
        out = layer_norm(h, eps=cfg.eps) * (1 + scale) + shift
        out = linear(params["final_out"], out.astype(h.dtype)).astype(jnp.float32)
        b = out.shape[0]
        p, c = cfg.patch, cfg.c_out
        # proj_out features are ordered [p, q, c] ("nhwpqc", ref
        # latte_transformer_3d.py:1450-1453) — keep that layout for checkpoints
        out = out.reshape(b, T, H, W, p, p, c)
        out = out.transpose(0, 1, 2, 4, 3, 5, 6)
        out = out.reshape(b, T, H * p, W * p, c)
        # drop the learned-variance half (ref pipeline_latte.py:870-871)
        return out[..., :cfg.in_channels]

    if pab is not None:
        return DiTCore(prepare, trunk_pab, head, init_state=init_state)
    return DiTCore(prepare, trunk, head)
