"""CogVideoX video DiT, TPU-native.

Behavioral spec from ``videosys/models/transformers/cogvideox_transformer_3d.py``:
a single-stream DiT where **text and video tokens share every block**
(joint attention + joint FFN), with "LayerNormZero" modulation — the timestep
embedding produces separate (shift, scale, gate) triplets for the video and
text segments at each of the two sub-layers (``CogVideoXBlock`` :179,
``CogVideoXLayerNormZero`` in normalization.py:25). Per-frame 2-D patch
embedding; 3-D RoPE on video tokens (``embeddings.py:get_3d_rotary_pos_embed``),
none on text; q/k LayerNorm per head; final AdaLN + projection over video
tokens only.

Pairs with `schedulers.ddim_cogvideo` (v-prediction, zero-terminal-SNR). PAB's
CogVideoX variant gates this model's attention reuse; the generic trunk
residual cache (MagCache) applies as-is with the video segment as the cached
stream.
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
from magcache_tpu.ops.attention import attention
from magcache_tpu.ops.norms import layer_norm
from magcache_tpu.ops.rope import apply_rope, rope_freqs_1d
from magcache_tpu.parallel.mesh import maybe_shard

__all__ = ["CogVideoXConfig", "init_cogvideox_params", "make_cogvideox_core"]


@dataclasses.dataclass(frozen=True)
class CogVideoXConfig:
    hidden: int = 3072             # 5B (2B: 1920)
    heads: int = 48                # 5B (2B: 30)
    layers: int = 42               # 5B (2B: 30)
    mlp_ratio: int = 4
    in_channels: int = 16
    text_dim: int = 4096
    patch: int = 2                 # spatial patch per frame
    axes_dims: Tuple[int, int, int] = (16, 24, 24)  # t/h/w rope split of head_dim
    time_embed_dim: int = 256      # sinusoid width (published ckpts: = hidden)
    temb_dim: int = 0              # conditioning width (published: 512); 0 = hidden
    eps: float = 1e-5
    dtype: str = "float32"
    remat: bool = False

    @property
    def head_dim(self):
        return self.hidden // self.heads

    @property
    def cond_dim(self):
        """Timestep-conditioning width (diffusers ``time_embed_dim``, 512 for
        published CogVideoX; the LayerNormZero/AdaLN linears read from it)."""
        return self.temb_dim or self.hidden

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def tiny(**kw):
        d = dict(hidden=96, heads=4, layers=2, text_dim=24,
                 axes_dims=(8, 8, 8), time_embed_dim=32)
        d.update(kw)
        return CogVideoXConfig(**d)

    tiny = staticmethod(tiny)


def init_cogvideox_params(key: jax.Array, cfg: CogVideoXConfig):
    d, L, ct = cfg.hidden, cfg.layers, cfg.cond_dim
    p2 = cfg.patch * cfg.patch
    ks = iter(jax.random.split(key, 16))
    nxt = lambda: next(ks)

    def st(i, o):
        return linear_params(nxt(), i, o, depth=L, dtype=cfg.jdtype)

    return {
        "patch_embed": linear_params(nxt(), cfg.in_channels * p2, d, dtype=cfg.jdtype),
        "text_proj": linear_params(nxt(), cfg.text_dim, d, dtype=cfg.jdtype),
        "time": {"in": linear_params(nxt(), cfg.time_embed_dim, ct),
                 "out": linear_params(nxt(), ct, ct)},
        "blocks": {
            "mod1": st(ct, 6 * d),         # LayerNormZero: vid(3) + txt(3)
            "mod2": st(ct, 6 * d),
            "ln1_w": jnp.ones((L, d), jnp.float32),   # norm1.norm affine
            "ln1_b": jnp.zeros((L, d), jnp.float32),
            "ln2_w": jnp.ones((L, d), jnp.float32),   # norm2.norm affine
            "ln2_b": jnp.zeros((L, d), jnp.float32),
            "qkv": st(d, 3 * d),
            "q_norm_w": jnp.ones((L, cfg.head_dim), jnp.float32),
            "q_norm_b": jnp.zeros((L, cfg.head_dim), jnp.float32),
            "k_norm_w": jnp.ones((L, cfg.head_dim), jnp.float32),
            "k_norm_b": jnp.zeros((L, cfg.head_dim), jnp.float32),
            "proj": st(d, d),
            "ff1": st(d, cfg.mlp_ratio * d),
            "ff2": st(cfg.mlp_ratio * d, d),
        },
        "norm_final_w": jnp.ones((d,), jnp.float32),  # norm_final affine
        "norm_final_b": jnp.zeros((d,), jnp.float32),
        "norm_out_w": jnp.ones((d,), jnp.float32),    # norm_out.norm affine
        "norm_out_b": jnp.zeros((d,), jnp.float32),
        "final_mod": linear_params(nxt(), ct, 2 * d),
        "final_out": linear_params(nxt(), d, cfg.in_channels * p2),
    }


def cogvideo_rope_tables(cfg: CogVideoXConfig, grid: Tuple[int, int, int]):
    gt, gh, gw = grid
    coords = np.stack(np.meshgrid(np.arange(gt), np.arange(gh), np.arange(gw),
                                  indexing="ij"), -1).reshape(-1, 3)
    cos_p, sin_p = [], []
    for ax, dim_a in enumerate(cfg.axes_dims):
        c, s = rope_freqs_1d(coords[:, ax], dim_a, 10000.0)
        cos_p.append(c)
        sin_p.append(s)
    return np.concatenate(cos_p, -1), np.concatenate(sin_p, -1)


def _mod3(vec, p, d):
    """silu(temb) -> 6 chunks: (v_shift, v_scale, v_gate, t_shift, t_scale,
    t_gate), each [B, 1, d] f32."""
    out = linear(p, jax.nn.silu(vec)).astype(jnp.float32)
    return [out[:, None, i * d:(i + 1) * d] for i in range(6)]


def make_cogvideox_core(cfg: CogVideoXConfig, txt_len: int,
                        grid: Tuple[int, int, int],
                        *, pab=None, timesteps=None) -> DiTCore:
    """cond = {"txt": f[B, txt_len, text_dim]}; x = latent video
    f[B, T, H*p, W*p, C] channel-last. Hidden stream = [txt; vid]; the
    MagCache residual is measured on the video segment.

    ``pab``: `core.pab.PABConfig` + sampling ``timesteps`` enable PAB on the
    joint attention ("spatial" mask) and FFN ("mlp" mask), caches threaded as
    sampler trunk state (the reference's PAB-aware CogVideoX attn processor,
    ``cogvideox_transformer_3d.py:35``).
    """
    T, H, W = grid
    S = T * H * W
    d = cfg.hidden
    rope_np = cogvideo_rope_tables(cfg, grid)
    # identity rotation rows for text
    txt_cos = np.ones((txt_len, cfg.head_dim // 2), np.float32)
    txt_sin = np.zeros((txt_len, cfg.head_dim // 2), np.float32)
    cos = jnp.asarray(np.concatenate([txt_cos, rope_np[0]], 0))
    sin = jnp.asarray(np.concatenate([txt_sin, rope_np[1]], 0))

    def _patchify(x):
        b, t, hh, ww, c = x.shape
        p = cfg.patch
        x = x.reshape(b, t, hh // p, p, ww // p, p, c)
        x = x.transpose(0, 1, 2, 4, 6, 3, 5)
        return x.reshape(b, t * (hh // p) * (ww // p), c * p * p)

    def _unpatchify(x):
        b, s, _ = x.shape
        p, c = cfg.patch, cfg.in_channels
        x = x.reshape(b, T, H, W, c, p, p)
        x = x.transpose(0, 1, 2, 5, 3, 6, 4)
        return x.reshape(b, T, H * p, W * p, c)

    def prepare(params, x, t, cond):
        vid = linear(params["patch_embed"], _patchify(x.astype(cfg.jdtype)))
        txt = linear(params["text_proj"], cond["txt"].astype(cfg.jdtype))
        temb = linear(params["time"]["out"], jax.nn.silu(
            linear(params["time"]["in"],
                   timestep_embedding(t, cfg.time_embed_dim))))
        vid = maybe_shard(vid, "tokens")
        # hidden stream carries video tokens; text rides in ctx and is
        # re-joined in each block (its final state is discarded by the head,
        # so the cacheable residual is exactly the video stream)
        return vid, {"txt": txt, "temb": temb}

    masks = None
    if pab is not None:
        from magcache_tpu.core.pab import broadcast_masks
        assert timesteps is not None, "PAB needs the sampling timesteps"
        masks = {k: jnp.asarray(v) for k, v in
                 broadcast_masks(pab, timesteps).items()}

    def _block(p, carry, cached=None, flags=None):
        vid, txt, temb = carry
        b = vid.shape[0]
        vs1, vsc1, vg1, ts1, tsc1, tg1 = _mod3(temb, p["mod1"], d)

        def compute_attn(args):
            vid, txt = args
            vid_n = layer_norm(vid, p["ln1_w"], p["ln1_b"], eps=cfg.eps) * (1 + vsc1) + vs1
            txt_n = layer_norm(txt, p["ln1_w"], p["ln1_b"], eps=cfg.eps) * (1 + tsc1) + ts1
            h = jnp.concatenate([txt_n, vid_n], axis=1).astype(vid.dtype)
            q, k, v = jnp.split(linear(p["qkv"], h), 3, axis=-1)
            rs = lambda x: x.reshape(b, x.shape[1], cfg.heads, -1)
            q, k, v = rs(q), rs(k), rs(v)
            q = layer_norm(q, p["q_norm_w"], p["q_norm_b"], eps=cfg.eps)
            k = layer_norm(k, p["k_norm_w"], p["k_norm_b"], eps=cfg.eps)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            o = attention(q, k, v).reshape(b, -1, d)
            return linear(p["proj"], o)

        new_cached = {}
        if cached is not None:
            o = jax.lax.cond(flags["spatial"], lambda _: cached["attn"],
                             compute_attn, (vid, txt))
            new_cached["attn"] = o
        else:
            o = compute_attn((vid, txt))
        t_attn, v_attn = o[:, :txt.shape[1]], o[:, txt.shape[1]:]
        vid = vid + (vg1 * v_attn.astype(jnp.float32)).astype(vid.dtype)
        txt = txt + (tg1 * t_attn.astype(jnp.float32)).astype(txt.dtype)

        vs2, vsc2, vg2, ts2, tsc2, tg2 = _mod3(temb, p["mod2"], d)

        def compute_ff(args):
            vid, txt = args
            vid_n = layer_norm(vid, p["ln2_w"], p["ln2_b"], eps=cfg.eps) * (1 + vsc2) + vs2
            txt_n = layer_norm(txt, p["ln2_w"], p["ln2_b"], eps=cfg.eps) * (1 + tsc2) + ts2
            h = jnp.concatenate([txt_n, vid_n], axis=1).astype(vid.dtype)
            return linear(p["ff2"], jax.nn.gelu(linear(p["ff1"], h),
                                                approximate=True))

        if cached is not None:
            ff = jax.lax.cond(flags["mlp"], lambda _: cached["mlp"],
                              compute_ff, (vid, txt))
            new_cached["mlp"] = ff
        else:
            ff = compute_ff((vid, txt))
        t_ff, v_ff = ff[:, :txt.shape[1]], ff[:, txt.shape[1]:]
        vid = vid + (vg2 * v_ff.astype(jnp.float32)).astype(vid.dtype)
        txt = txt + (tg2 * t_ff.astype(jnp.float32)).astype(txt.dtype)
        return (vid, txt, temb), new_cached

    def trunk(params, vid, ctx):
        def body(carry, p):
            out, _ = _block(p, carry)
            return out, None

        fn = jax.checkpoint(body) if cfg.remat else body
        (vid, _, _), _ = jax.lax.scan(fn, (vid, ctx["txt"], ctx["temb"]),
                                      params["blocks"])
        return vid

    def init_state(params, hidden_shape, ctx_shape):
        rows, s_vid, _ = hidden_shape.shape
        s_all = s_vid + txt_len
        z = lambda: jnp.zeros((cfg.layers, rows, s_all, d), hidden_shape.dtype)
        return {"attn": z(), "mlp": z()}

    def trunk_pab(params, vid, ctx, state, step_idx):
        flags = {k: masks[k][step_idx] for k in masks}

        def body(carry, ps):
            p, c_a, c_m = ps
            out, nc = _block(p, carry, cached={"attn": c_a, "mlp": c_m},
                             flags=flags)
            return out, (nc["attn"], nc["mlp"])

        (vid_o, _, _), ys = jax.lax.scan(
            body, (vid, ctx["txt"], ctx["temb"]),
            (params["blocks"], state["attn"], state["mlp"]))
        return vid_o, {"attn": ys[0], "mlp": ys[1]}

    def head(params, vid, ctx):
        # norm_final (affine LN; the 5B path concatenates [txt; vid], norms,
        # then slices the video tokens back out — affine LN is per-token, so
        # norming vid alone is identical), then AdaLayerNorm (norm_out) with
        # (shift, scale) chunk order, then proj_out
        # (cogvideox_transformer_3d.py:567-579, normalization.py:80-96).
        temb = ctx["temb"]
        h = layer_norm(vid, params["norm_final_w"], params["norm_final_b"],
                       eps=cfg.eps)
        mod = linear(params["final_mod"], jax.nn.silu(temb)).astype(jnp.float32)
        shift, scale = mod[:, None, :d], mod[:, None, d:]
        h = layer_norm(h, params["norm_out_w"], params["norm_out_b"],
                       eps=cfg.eps) * (1 + scale) + shift
        out = linear(params["final_out"], h.astype(vid.dtype))
        return _unpatchify(out.astype(jnp.float32))

    if pab is not None:
        return DiTCore(prepare, trunk_pab, head, init_state=init_state)
    return DiTCore(prepare, trunk, head)
