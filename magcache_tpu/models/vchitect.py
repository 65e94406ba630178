"""Vchitect-XL video DiT, TPU-native and weight-mappable.

Behavioral transcription of ``videosys/models/transformers/
vchitect_transformer_3d.py`` (VchitectXLTransformerModel :260, JointTransformerBlock
:114) and its attention processor (``attentions.py:537-844``). Per block, three
attention paths share one AdaLN-Zero modulation pair (video + context streams):

1. **temporal** (``temporal_attention`` :602-661): per spatial position, self
   attention over frames with interleaved-pair RoPE (theta 1e6) on q/k; runs on
   the [frame tokens ; context tokens] concatenation, producing a video part
   (projected by ``to_out_temporal``) and a per-frame context part (projected
   later by ``to_add_out_temporal``).
2. **cross** (``cross_attention`` :663-698): every (S+L)*T token queries the
   frame-0 context tokens; output projected by ``to_out_context``.
3. **spatial** (``spatial_attn`` :563-600): per-frame joint attention over
   [frame ; context] tokens, kept RAW.

They combine exactly as the reference does (``__call__`` :795-821):
``to_out(spatial*1.1 + cross)`` + temporal for the video stream;
``to_add_out(spatial*1.1 + cross)`` + ``to_add_out_temporal(temporal_ctx)``
for the context stream — then gated residuals and per-stream gelu-tanh FFNs.
The context stream evolves **per frame** (the reference's AdaLN broadcast over
the frame-batch, :124-129). The final block is ``context_pre_only``: its
context norm is AdaLN-Continuous and the context output is discarded (:295-301).
The reference indexes context KV at batch row 0 in the cross path (only ever
run with one sample per rank); we generalize to per-sample frame-0 context.

Param names map 1:1 onto the published ``diffusion_pytorch_model.safetensors``
via `convert.convert_vchitect_state_dict`. ``to_out_temporal`` /
``to_add_out_temporal`` / ``to_out_context`` are zero-initialized exactly like
the reference (:405-416).

PAB gates the three paths per block (``VchitectPABConfig``), with cached
outputs threaded as sampler trunk state.
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
from magcache_tpu.ops.norms import layer_norm
from magcache_tpu.ops.rope import apply_rope, rope_freqs_1d

__all__ = ["VchitectConfig", "init_vchitect_params", "make_vchitect_core",
           "pos_embed_sd3"]


@dataclasses.dataclass(frozen=True)
class VchitectConfig:
    hidden: int = 1536
    heads: int = 24
    depth: int = 24
    mlp_ratio: int = 4
    in_channels: int = 16
    text_dim: int = 4096             # joint_attention_dim
    vec_dim: int = 2048              # pooled_projection_dim
    patch: int = 2
    time_embed_dim: int = 256
    pos_embed_max_size: int = 96     # SD3 cropped sincos table
    pos_embed_base_size: int = 64    # sample_size // patch_size
    rope_theta: float = 1e6
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
                 time_embed_dim=32, pos_embed_max_size=8, pos_embed_base_size=8)
        d.update(kw)
        return VchitectConfig(**d)

    tiny = staticmethod(tiny)


def pos_embed_sd3(d: int, H: int, W: int, max_size: int, base_size: int
                  ) -> np.ndarray:
    """Center-cropped 2-D sincos table (diffusers PatchEmbed w/
    ``pos_embed_max_size``: grid scaled by base/max, half channels per axis,
    [sin | cos] within each half; crop top=(max-H)//2, left=(max-W)//2)."""
    assert H <= max_size and W <= max_size, (H, W, max_size)

    def sincos_1d(dim, pos):
        omega = 1.0 / 10000.0 ** (np.arange(dim // 4, dtype=np.float64)
                                  / (dim // 4))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    scale = max_size / base_size
    coords = np.arange(max_size, dtype=np.float64) / scale
    gw, gh = np.meshgrid(coords, coords)   # xy indexing: gw varies along W
    emb = np.concatenate([sincos_1d(d, gw), sincos_1d(d, gh)], axis=1)
    emb = emb.reshape(max_size, max_size, d)
    top, left = (max_size - H) // 2, (max_size - W) // 2
    return emb[top:top + H, left:left + W].reshape(H * W, d).astype(np.float32)


def _block_params(key, cfg, *, pre_only: bool):
    d = cfg.hidden
    L = 1 if pre_only else cfg.depth - 1
    dep = None if pre_only else L
    ks = iter(jax.random.split(key, 32))
    nxt = lambda: next(ks)

    def st(i, o, zero=False):
        p = linear_params(nxt(), i, o, depth=dep, dtype=cfg.jdtype)
        if zero:
            p = jax.tree.map(jnp.zeros_like, p)
        return p

    p = {
        "mod_x": st(d, 6 * d),
        "q": st(d, d), "k": st(d, d), "v": st(d, d), "o": st(d, d),
        "qt": st(d, d), "kt": st(d, d), "vt": st(d, d),
        "ot": st(d, d, zero=True),                 # to_out_temporal (zero init)
        "qc": st(d, d), "oc": st(d, d, zero=True),  # to_out_context (zero init)
        "add_q": st(d, d), "add_k": st(d, d), "add_v": st(d, d),
        "ff1": st(d, cfg.mlp_ratio * d), "ff2": st(cfg.mlp_ratio * d, d),
    }
    if pre_only:
        p["mod_c2"] = st(d, 2 * d)                 # AdaLN-Continuous
    else:
        p["mod_c"] = st(d, 6 * d)
        p["add_out"] = st(d, d)
        p["add_out_t"] = st(d, d, zero=True)       # to_add_out_temporal
        p["ffc1"] = st(d, cfg.mlp_ratio * d)
        p["ffc2"] = st(cfg.mlp_ratio * d, d)
    return p


def init_vchitect_params(key: jax.Array, cfg: VchitectConfig):
    d = cfg.hidden
    p2 = cfg.patch * cfg.patch
    ks = iter(jax.random.split(key, 16))
    nxt = lambda: next(ks)
    return {
        "patch_embed": linear_params(nxt(), cfg.in_channels * p2, d,
                                     dtype=cfg.jdtype),
        "context_in": linear_params(nxt(), cfg.text_dim, d, dtype=cfg.jdtype),
        "time_in": mlp_embedder(nxt(), cfg.time_embed_dim, d),
        "pooled_in": mlp_embedder(nxt(), cfg.vec_dim, d),
        "blocks": _block_params(nxt(), cfg, pre_only=False),
        "last": _block_params(nxt(), cfg, pre_only=True),
        "norm_out_mod": linear_params(nxt(), d, 2 * d),
        "proj_out": linear_params(nxt(), d, cfg.in_channels * p2),
    }


def make_vchitect_core(cfg: VchitectConfig, grid: Tuple[int, int, int],
                       txt_len: int, *, pab=None, timesteps=None) -> DiTCore:
    """cond = {"txt": f[B, txt_len, text_dim], "vec": f[B, vec_dim]};
    x = latent video f[B, T, H*p, W*p, C]."""
    T, H, W = grid
    S = H * W
    d = cfg.hidden
    nh, hd = cfg.heads, cfg.head_dim
    pos2d = jnp.asarray(pos_embed_sd3(d, H, W, cfg.pos_embed_max_size,
                                      cfg.pos_embed_base_size))
    tcos, tsin = rope_freqs_1d(np.arange(T), hd, cfg.rope_theta)
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
        # cast after the f32 sincos add so the trunk GEMMs stay in the
        # compute dtype (f32 runs at 1/4 MXU rate)
        vid = (vid.reshape(vid.shape[0], T, S, d) + pos2d[None, None]
               ).reshape(vid.shape[0], T * S, d).astype(cfg.jdtype)
        # context evolves per frame from block 0 (AdaLN broadcast over the
        # frame batch in the reference, vchitect_transformer_3d.py:124-129)
        txt = linear(params["context_in"], cond["txt"].astype(cfg.jdtype))
        txt = jnp.broadcast_to(txt[:, None], (txt.shape[0], T) + txt.shape[1:])
        vec = apply_mlp_embedder(params["time_in"],
                                 timestep_embedding(t, cfg.time_embed_dim))
        vec = vec + apply_mlp_embedder(params["pooled_in"],
                                       cond["vec"].astype(jnp.float32))
        return vid, {"txt": txt, "vec": vec}

    def _mod6(vec, p):
        out = linear(p, jax.nn.silu(vec)).astype(jnp.float32)
        return [out[:, None, None, i * d:(i + 1) * d] for i in range(6)]

    def _heads(x):  # [..., tokens, d] -> [..., tokens, nh, hd]
        return x.reshape(x.shape[:-1] + (nh, hd))

    def _block(p, carry, *, pre_only, cached=None, flags=None):
        vid, txt, vec = carry                      # [B,TS,d], [B,T,L,d], [B,d]
        b = vid.shape[0]
        L = txt.shape[2]
        sx, scx, gx, sxm, scxm, gxm = _mod6(vec, p["mod_x"])
        if pre_only:
            mc = linear(p["mod_c2"], jax.nn.silu(vec)).astype(jnp.float32)
            # AdaLN-Continuous chunks (scale, shift) in that order
            cs, csh = mc[:, None, None, :d], mc[:, None, None, d:]
            txt_n = (layer_norm(txt, eps=cfg.eps) * (1 + cs) + csh
                     ).astype(txt.dtype)
        else:
            sc_, scc, gc, scm_, sccm, gcm = _mod6(vec, p["mod_c"])
            txt_n = (layer_norm(txt, eps=cfg.eps) * (1 + scc) + sc_
                     ).astype(txt.dtype)
        vid4 = vid.reshape(b, T, S, d)
        vid_n = (layer_norm(vid4, eps=cfg.eps) * (1 + scx) + sx
                 ).astype(vid.dtype)

        # context projections (shared by all three paths)
        eq = linear(p["add_q"], txt_n)             # [B, T, L, d]
        ek = linear(p["add_k"], txt_n)
        ev = linear(p["add_v"], txt_n)

        def compute_temporal(args):
            vid_n, eq, ek, ev = args
            qt = jnp.concatenate([linear(p["qt"], vid_n), eq], axis=2)
            kt = jnp.concatenate([linear(p["kt"], vid_n), ek], axis=2)
            vt = jnp.concatenate([linear(p["vt"], vid_n), ev], axis=2)
            # [B, T, S+L, d] -> [B*(S+L), T, nh, hd]
            r = lambda x: _heads(x.transpose(0, 2, 1, 3).reshape(
                b * (S + L), T, d))
            q, k = apply_rope(r(qt), *t_rope), apply_rope(r(kt), *t_rope)
            o = attention(q, k, r(vt)).reshape(b, S + L, T, d)
            o = o.transpose(0, 2, 1, 3)            # [B, T, S+L, d]
            vid_t = linear(p["ot"], o[:, :, :S]).reshape(b, T * S, d)
            return vid_t, o[:, :, S:]              # ctx part raw [B, T, L, d]

        def compute_cross(args):
            vid_n, eq, ek, ev = args
            qc = jnp.concatenate([linear(p["qc"], vid_n), eq], axis=2)
            # all (S+L)*T tokens query frame-0 context (ref :678-681)
            q = _heads(qc.reshape(b, T * (S + L), d))
            k, v = _heads(ek[:, 0]), _heads(ev[:, 0])
            o = attention(q, k, v).reshape(b, T, S + L, d)
            return linear(p["oc"], o)

        def compute_spatial(args):
            vid_n, eq, ek, ev = args
            q = _heads(jnp.concatenate([linear(p["q"], vid_n), eq], axis=2)
                       .reshape(b * T, S + L, d))
            k = _heads(jnp.concatenate([linear(p["k"], vid_n), ek], axis=2)
                       .reshape(b * T, S + L, d))
            v = _heads(jnp.concatenate([linear(p["v"], vid_n), ev], axis=2)
                       .reshape(b * T, S + L, d))
            return attention(q, k, v).reshape(b, T, S + L, d)  # RAW

        args = (vid_n, eq, ek, ev)
        new_cached = {}
        if cached is not None:
            tmp = jax.lax.cond(flags["temporal"], lambda _: cached["temporal"],
                               compute_temporal, args)
            crx = jax.lax.cond(flags["cross"], lambda _: cached["cross"],
                               compute_cross, args)
            spt = jax.lax.cond(flags["spatial"], lambda _: cached["spatial"],
                               compute_spatial, args)
            new_cached = {"temporal": tmp, "cross": crx, "spatial": spt}
        else:
            tmp = compute_temporal(args)
            crx = compute_cross(args)
            spt = compute_spatial(args)
        vid_t, ctx_t = tmp

        joint = spt * 1.1 + crx                    # ref __call__ :795
        vid_a = linear(p["o"], joint[:, :, :S]).reshape(b, T * S, d) + vid_t
        vid = vid + (gx[:, :, 0] * vid_a.astype(jnp.float32)).astype(vid.dtype)

        vid4 = vid.reshape(b, T, S, d)
        vid_m = (layer_norm(vid4, eps=cfg.eps) * (1 + scxm) + sxm
                 ).astype(vid.dtype)
        vm = linear(p["ff2"], jax.nn.gelu(linear(p["ff1"], vid_m),
                                          approximate=True))
        vid = vid + (gxm[:, :, 0] * vm.reshape(b, T * S, d).astype(jnp.float32)
                     ).astype(vid.dtype)

        if not pre_only:
            ctx_a = linear(p["add_out"], joint[:, :, S:]) \
                + linear(p["add_out_t"], ctx_t)
            txt = txt + (gc * ctx_a.astype(jnp.float32)).astype(txt.dtype)
            txt_m = (layer_norm(txt, eps=cfg.eps) * (1 + sccm) + scm_
                     ).astype(txt.dtype)
            tm = linear(p["ffc2"], jax.nn.gelu(linear(p["ffc1"], txt_m),
                                               approximate=True))
            txt = txt + (gcm * tm.astype(jnp.float32)).astype(txt.dtype)
        return (vid, txt, vec), new_cached

    def trunk(params, vid, ctx):
        def body(carry, p):
            out, _ = _block(p, carry, pre_only=False)
            return out, None

        carry, _ = jax.lax.scan(body, (vid, ctx["txt"], ctx["vec"]),
                                params["blocks"])
        (vid, _, _), _ = _block(params["last"], carry, pre_only=True)
        return vid

    def init_state(params, hidden_shape, ctx_shape):
        rows = hidden_shape.shape[0]
        dt_ = hidden_shape.dtype
        zj = lambda n: jnp.zeros((n, rows, T, S + txt_len, d), dt_)
        zv = lambda n: jnp.zeros((n, rows, T * S, d), dt_)
        zc = lambda n: jnp.zeros((n, rows, T, txt_len, d), dt_)
        Lm = cfg.depth - 1
        return {"spatial": zj(Lm), "cross": zj(Lm),
                "temporal": (zv(Lm), zc(Lm)),
                "last_spatial": zj(1)[0], "last_cross": zj(1)[0],
                "last_temporal": (zv(1)[0], zc(1)[0])}

    def trunk_pab(params, vid, ctx, state, step_idx):
        flags = {k: masks[k][step_idx] for k in masks}

        def body(carry, ps):
            p, c_s, c_c, c_t = ps
            out, nc = _block(p, carry, pre_only=False,
                             cached={"spatial": c_s, "cross": c_c,
                                     "temporal": c_t}, flags=flags)
            return out, (nc["spatial"], nc["cross"], nc["temporal"])

        carry, ys = jax.lax.scan(
            body, (vid, ctx["txt"], ctx["vec"]),
            (params["blocks"], state["spatial"], state["cross"],
             state["temporal"]))
        (vid_o, _, _), nl = _block(
            params["last"], carry, pre_only=True,
            cached={"spatial": state["last_spatial"],
                    "cross": state["last_cross"],
                    "temporal": state["last_temporal"]}, flags=flags)
        return vid_o, {"spatial": ys[0], "cross": ys[1], "temporal": ys[2],
                       "last_spatial": nl["spatial"],
                       "last_cross": nl["cross"],
                       "last_temporal": nl["temporal"]}

    def head(params, vid, ctx):
        mod = linear(params["norm_out_mod"],
                     jax.nn.silu(ctx["vec"])).astype(jnp.float32)
        # AdaLN-Continuous: (scale, shift) order
        scale, shift = mod[:, None, :d], mod[:, None, d:]
        h = layer_norm(vid, eps=cfg.eps) * (1 + scale) + shift
        out = linear(params["proj_out"], h.astype(vid.dtype)).astype(jnp.float32)
        b = out.shape[0]
        p, c = cfg.patch, cfg.in_channels
        # nhwpqc unpatchify (ref :577-582)
        out = out.reshape(b, T, H, W, p, p, c)
        out = out.transpose(0, 1, 2, 4, 3, 5, 6)
        return out.reshape(b, T, H * p, W * p, c)

    if pab is not None:
        return DiTCore(prepare, trunk_pab, head, init_state=init_state)
    return DiTCore(prepare, trunk, head)
