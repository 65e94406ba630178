"""Vchitect-XL video DiT, TPU-native.

Behavioral spec from ``videosys/models/transformers/vchitect_transformer_3d.py``
(:237) and its attention processor (``attentions.py:537-844``): SD3-style
**joint text-video blocks** — per block, text and video streams are separately
AdaLN-modulated, then a joint attention runs over [text; video-frame] tokens
**per frame** (spatial), followed by a temporal self-attention over frames
(the processor's spatial+temporal split with the SP dynamic-switch a2a in the
reference; here the same factorization in one program, resharded by the mesh
layer when sp > 1), then per-stream FFNs. Pooled-text + timestep drive the
modulation vector.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.sampler import DiTCore
from magcache_tpu.models.common import (
    apply_mlp_embedder,
    linear,
    linear_params,
    mlp_embedder,
    timestep_embedding,
)
from magcache_tpu.ops.attention import attention
from magcache_tpu.ops.norms import layer_norm, rms_norm
from magcache_tpu.ops.rope import apply_rope, rope_freqs_1d

__all__ = ["VchitectConfig", "init_vchitect_params", "make_vchitect_core"]


@dataclasses.dataclass(frozen=True)
class VchitectConfig:
    hidden: int = 1536
    heads: int = 24
    depth: int = 24
    mlp_ratio: int = 4
    in_channels: int = 16
    text_dim: int = 4096
    vec_dim: int = 2048          # pooled text
    patch: int = 2
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
        d = dict(hidden=64, heads=4, depth=2, text_dim=24, vec_dim=16,
                 time_embed_dim=32)
        d.update(kw)
        return VchitectConfig(**d)

    tiny = staticmethod(tiny)


def init_vchitect_params(key: jax.Array, cfg: VchitectConfig):
    d, L = cfg.hidden, cfg.depth
    p2 = cfg.patch * cfg.patch
    ks = iter(jax.random.split(key, 24))
    nxt = lambda: next(ks)

    def st(i, o):
        return linear_params(nxt(), i, o, depth=L, dtype=cfg.jdtype)

    return {
        "patch_embed": linear_params(nxt(), cfg.in_channels * p2, d, dtype=cfg.jdtype),
        "txt_in": linear_params(nxt(), cfg.text_dim, d, dtype=cfg.jdtype),
        "time_in": mlp_embedder(nxt(), cfg.time_embed_dim, d),
        "vec_in": mlp_embedder(nxt(), cfg.vec_dim, d),
        "blocks": {
            "vid_mod": st(d, 6 * d),
            "txt_mod": st(d, 6 * d),
            "vid_qkv": st(d, 3 * d), "txt_qkv": st(d, 3 * d),
            "vid_proj": st(d, d), "txt_proj": st(d, d),
            "tmp_qkv": st(d, 3 * d), "tmp_proj": st(d, d),
            "vid_mlp1": st(d, cfg.mlp_ratio * d), "vid_mlp2": st(cfg.mlp_ratio * d, d),
            "txt_mlp1": st(d, cfg.mlp_ratio * d), "txt_mlp2": st(cfg.mlp_ratio * d, d),
        },
        "final_mod": linear_params(nxt(), d, 2 * d),
        "final_out": linear_params(nxt(), d, cfg.in_channels * p2),
    }


def make_vchitect_core(cfg: VchitectConfig, grid: Tuple[int, int, int],
                       txt_len: int, *, pab=None, timesteps=None) -> DiTCore:
    """cond = {"txt": f[B, txt_len, text_dim], "vec": f[B, vec_dim]};
    x = latent video f[B, T, H*p, W*p, C].

    ``pab`` + sampling ``timesteps``: Pyramid Attention Broadcast on the
    joint spatial attention, the temporal attention, and the FFNs — the
    reference's VchitectPABConfig surface (``pipeline_vchitect.py:32-44``),
    with per-block output caches threaded as sampler trunk state."""
    T, H, W = grid
    S = H * W
    d = cfg.hidden
    tcos, tsin = rope_freqs_1d(np.arange(T), cfg.head_dim)
    t_rope = (jnp.asarray(tcos), jnp.asarray(tsin))

    masks = None
    if pab is not None:
        from magcache_tpu.core.pab import broadcast_masks
        assert timesteps is not None, "PAB needs the sampling timesteps"
        masks = {k: jnp.asarray(v) for k, v in
                 broadcast_masks(pab, timesteps).items()}

    def _patchify(x):
        b, t, hh, ww, c = x.shape
        p = cfg.patch
        x = x.reshape(b, t, hh // p, p, ww // p, p, c)
        x = x.transpose(0, 1, 2, 4, 6, 3, 5)
        return x.reshape(b, t * (hh // p) * (ww // p), c * p * p)

    def prepare(params, x, t, cond):
        vid = linear(params["patch_embed"], _patchify(x.astype(cfg.jdtype)))
        txt = linear(params["txt_in"], cond["txt"].astype(cfg.jdtype))
        vec = apply_mlp_embedder(params["time_in"],
                                 timestep_embedding(t, cfg.time_embed_dim))
        vec = vec + apply_mlp_embedder(params["vec_in"],
                                       cond["vec"].astype(jnp.float32))
        return vid, {"txt": txt, "vec": vec}

    def _mod(vec, p):
        out = linear(p, jax.nn.silu(vec)).astype(jnp.float32)
        return [out[:, None, i * d:(i + 1) * d] for i in range(6)]

    def _block(p, carry, cached=None, flags=None):
        vid, txt, vec = carry
        b = vid.shape[0]
        vs1, vsc1, vg1, vs2, vsc2, vg2 = _mod(vec, p["vid_mod"])
        ts1, tsc1, tg1, ts2, tsc2, tg2 = _mod(vec, p["txt_mod"])

        # --- joint spatial attention: per frame, tokens = [txt; frame] -----
        def compute_joint(args):
            vid, txt = args
            vid_n = (layer_norm(vid, eps=cfg.eps) * (1 + vsc1) + vs1).astype(vid.dtype)
            txt_n = (layer_norm(txt, eps=cfg.eps) * (1 + tsc1) + ts1).astype(txt.dtype)
            vq, vk, vv = jnp.split(linear(p["vid_qkv"], vid_n), 3, axis=-1)
            tq, tk, tv = jnp.split(linear(p["txt_qkv"], txt_n), 3, axis=-1)

            def frames(x):  # [B, T*S, d] -> [B*T, S, h, hd]
                return x.reshape(b * T, S, cfg.heads, cfg.head_dim)

            def txt_rep(x):  # [B, L, d] -> [B*T, L, h, hd]
                x = x.reshape(b, 1, txt_len, cfg.heads, cfg.head_dim)
                return jnp.broadcast_to(
                    x, (b, T, txt_len, cfg.heads, cfg.head_dim)
                ).reshape(b * T, txt_len, cfg.heads, cfg.head_dim)

            q = jnp.concatenate([txt_rep(tq), frames(vq)], axis=1)
            k = jnp.concatenate([txt_rep(tk), frames(vk)], axis=1)
            v = jnp.concatenate([txt_rep(tv), frames(vv)], axis=1)
            o = attention(q, k, v).reshape(b * T, txt_len + S, d)
            t_attn = o[:, :txt_len].reshape(b, T, txt_len, d).mean(axis=1)
            v_attn = o[:, txt_len:].reshape(b, T * S, d)
            return (linear(p["vid_proj"], v_attn), linear(p["txt_proj"], t_attn))

        new_cached = {}
        if cached is not None:
            jo = jax.lax.cond(flags["spatial"], lambda _: cached["spatial"],
                              compute_joint, (vid, txt))
            new_cached["spatial"] = jo
        else:
            jo = compute_joint((vid, txt))
        v_o, t_o = jo
        vid = vid + (vg1 * v_o.astype(jnp.float32)).astype(vid.dtype)
        txt = txt + (tg1 * t_o.astype(jnp.float32)).astype(txt.dtype)

        # --- temporal self-attention over frames (RoPE on time) ------------
        def compute_temporal(vid):
            vid_t = vid.reshape(b, T, S, d).transpose(0, 2, 1, 3).reshape(b * S, T, d)
            q2, k2, v2 = jnp.split(linear(p["tmp_qkv"], vid_t), 3, axis=-1)
            rs = lambda x: x.reshape(b * S, T, cfg.heads, cfg.head_dim)
            q2 = apply_rope(rs(q2), *t_rope)
            k2 = apply_rope(rs(k2), *t_rope)
            o2 = attention(q2, k2, rs(v2)).reshape(b * S, T, d)
            o2 = linear(p["tmp_proj"], o2)
            return o2.reshape(b, S, T, d).transpose(0, 2, 1, 3).reshape(b, T * S, d)

        if cached is not None:
            o2 = jax.lax.cond(flags["temporal"], lambda _: cached["temporal"],
                              compute_temporal, vid)
            new_cached["temporal"] = o2
        else:
            o2 = compute_temporal(vid)
        vid = vid + o2

        # --- per-stream FFNs ------------------------------------------------
        def compute_mlp(args):
            vid, txt = args
            vid_m = (layer_norm(vid, eps=cfg.eps) * (1 + vsc2) + vs2).astype(vid.dtype)
            vm = linear(p["vid_mlp2"], jax.nn.gelu(
                linear(p["vid_mlp1"], vid_m), approximate=True))
            txt_m = (layer_norm(txt, eps=cfg.eps) * (1 + tsc2) + ts2).astype(txt.dtype)
            tm = linear(p["txt_mlp2"], jax.nn.gelu(
                linear(p["txt_mlp1"], txt_m), approximate=True))
            return vm, tm

        if cached is not None:
            mo = jax.lax.cond(flags["mlp"], lambda _: cached["mlp"],
                              compute_mlp, (vid, txt))
            new_cached["mlp"] = mo
        else:
            mo = compute_mlp((vid, txt))
        vm, tm = mo
        vid = vid + (vg2 * vm.astype(jnp.float32)).astype(vid.dtype)
        txt = txt + (tg2 * tm.astype(jnp.float32)).astype(txt.dtype)
        return (vid, txt, vec), new_cached

    def trunk(params, vid, ctx):
        def body(carry, p):
            out, _ = _block(p, carry)
            return out, None

        (vid, _, _), _ = jax.lax.scan(body, (vid, ctx["txt"], ctx["vec"]),
                                      params["blocks"])
        return vid

    def init_state(params, hidden_shape, ctx_shape):
        rows = hidden_shape.shape[0]
        dt_ = hidden_shape.dtype
        zv = lambda: jnp.zeros((cfg.depth, rows, T * S, d), dt_)
        zt = lambda: jnp.zeros((cfg.depth, rows, txt_len, d), dt_)
        return {"spatial": (zv(), zt()), "temporal": zv(),
                "mlp": (zv(), zt())}

    def trunk_pab(params, vid, ctx, state, step_idx):
        flags = {k: masks[k][step_idx] for k in masks}

        def body(carry, ps):
            p, c_s, c_t, c_m = ps
            out, nc = _block(p, carry,
                             cached={"spatial": c_s, "temporal": c_t,
                                     "mlp": c_m}, flags=flags)
            return out, (nc["spatial"], nc["temporal"], nc["mlp"])

        (vid_o, _, _), ys = jax.lax.scan(
            body, (vid, ctx["txt"], ctx["vec"]),
            (params["blocks"], state["spatial"], state["temporal"],
             state["mlp"]))
        return vid_o, {"spatial": ys[0], "temporal": ys[1], "mlp": ys[2]}

    def head(params, vid, ctx):
        mod = linear(params["final_mod"], jax.nn.silu(ctx["vec"])).astype(jnp.float32)
        shift, scale = mod[:, None, :d], mod[:, None, d:]
        h = layer_norm(vid, eps=cfg.eps) * (1 + scale) + shift
        out = linear(params["final_out"], h.astype(vid.dtype)).astype(jnp.float32)
        b = out.shape[0]
        p, c = cfg.patch, cfg.in_channels
        out = out.reshape(b, T, H, W, c, p, p)
        out = out.transpose(0, 1, 2, 5, 3, 6, 4)
        return out.reshape(b, T, H * p, W * p, c)

    if pab is not None:
        return DiTCore(prepare, trunk_pab, head, init_state=init_state)
    return DiTCore(prepare, trunk, head)
