"""HunyuanVideo T2V DiT, TPU-native.

The model behind ``MagCache4HunyuanVideo/magcache_sample_video.py``: a video
MMDiT sharing FLUX's double-stream + single-stream topology (20 + 40 blocks at
hidden 3072 / 24 heads), with

- 3-D RoPE over the (t, y, x) latent patch grid, axes dims (16, 56, 56),
  theta 256;
- text conditioning from an LLM encoder passed through a 2-block
  "individual token refiner" (self-attention blocks gated by
  timestep+pooled-context modulation) instead of FLUX's plain linear;
- guidance-distilled single-lane MagCache: one forward per step, residual
  cached on the image tokens only (``magcache_sample_video.py:88-140``:
  skip adds ``previous_residual`` to ``img`` before the final layer).

The trunk/head reuse the FLUX block implementations (`models.flux`) — the
block math is identical; only the RoPE tables and the prepare stage differ.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.sampler import DiTCore
from magcache_tpu.models import flux as F
from magcache_tpu.models.common import (
    apply_mlp_embedder,
    linear,
    linear_params,
    mlp_embedder,
    timestep_embedding,
)
from magcache_tpu.ops.attention import attention
from magcache_tpu.ops.norms import layer_norm
from magcache_tpu.ops.rope import rope_freqs_1d
from magcache_tpu.parallel.mesh import maybe_shard

__all__ = ["HunyuanConfig", "init_hunyuan_params", "make_hunyuan_core"]


@dataclasses.dataclass(frozen=True)
class HunyuanConfig:
    in_channels: int = 16
    hidden: int = 3072
    heads: int = 24
    depth_double: int = 20
    depth_single: int = 40
    mlp_ratio: int = 4
    text_dim: int = 4096          # LLM hidden states
    vec_dim: int = 768            # CLIP pooled
    refiner_depth: int = 2
    patch: Tuple[int, int, int] = (1, 2, 2)
    axes_dims: Tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 256.0
    time_embed_dim: int = 256
    guidance_embed: bool = True
    framepack: bool = False       # FramePack packed variant: clean-latent
                                  # pyramid input projections (1x/2x/4x)
    dtype: str = "float32"
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def patch_in(self) -> int:
        pt, ph, pw = self.patch
        return self.in_channels * pt * ph * pw

    def to_flux(self) -> F.FluxConfig:
        """The MMDiT trunk's config view (for reusing FLUX blocks)."""
        return F.FluxConfig(
            in_channels=self.patch_in, hidden=self.hidden, heads=self.heads,
            depth_double=self.depth_double, depth_single=self.depth_single,
            mlp_ratio=self.mlp_ratio, text_dim=self.hidden,  # refiner output
            vec_dim=self.vec_dim, axes_dims=self.axes_dims,
            theta=self.rope_theta, guidance_embed=self.guidance_embed,
            time_embed_dim=self.time_embed_dim, dtype=self.dtype,
            remat=self.remat)

    def tiny(**kw):
        defaults = dict(in_channels=8, hidden=96, heads=4, depth_double=2,
                        depth_single=2, text_dim=32, vec_dim=16,
                        axes_dims=(8, 8, 8), refiner_depth=1,
                        time_embed_dim=32)
        defaults.update(kw)
        return HunyuanConfig(**defaults)

    tiny = staticmethod(tiny)


def init_hunyuan_params(key: jax.Array, cfg: HunyuanConfig):
    kf, kr, kp = jax.random.split(key, 3)
    params = F.init_flux_params(kf, cfg.to_flux())
    d = cfg.hidden
    ks = iter(jax.random.split(kr, 12))
    nxt = lambda: next(ks)
    L = cfg.refiner_depth
    params["refiner"] = {
        "in": linear_params(nxt(), cfg.text_dim, d),
        "t_embed": mlp_embedder(nxt(), cfg.time_embed_dim, d),
        "c_embed": mlp_embedder(nxt(), cfg.text_dim, d),
        "blocks": {
            "qkv": linear_params(nxt(), d, 3 * d, depth=L),
            "proj": linear_params(nxt(), d, d, depth=L),
            "mlp1": linear_params(nxt(), d, cfg.mlp_ratio * d, depth=L),
            "mlp2": linear_params(nxt(), cfg.mlp_ratio * d, d, depth=L),
            "mod": linear_params(nxt(), d, 2 * d, depth=L),
            "norm1_w": jnp.ones((L, d), jnp.float32),
            "norm1_b": jnp.zeros((L, d), jnp.float32),
            "norm2_w": jnp.ones((L, d), jnp.float32),
            "norm2_b": jnp.zeros((L, d), jnp.float32),
        },
    }
    if cfg.framepack:
        # clean-latent pyramid projections (FramePack packed model's
        # clean_x_embedder: kernels (1,2,2)/(2,4,4)/(4,8,8) over 16 latent ch)
        c = cfg.in_channels
        params["clean_proj"] = linear_params(nxt(), c * 1 * 2 * 2, d)
        params["clean_proj_2x"] = linear_params(nxt(), c * 2 * 4 * 4, d)
        params["clean_proj_4x"] = linear_params(nxt(), c * 4 * 8 * 8, d)
    return params


def _patchify_k(lat, pt, ph, pw):
    """Patchify with an arbitrary (pt, ph, pw) kernel (pyramid levels)."""
    b, f, h, w, c = lat.shape
    lat = lat.reshape(b, f // pt, pt, h // ph, ph, w // pw, pw, c)
    lat = lat.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return lat.reshape(b, (f // pt) * (h // ph) * (w // pw), c * pt * ph * pw)


def framepack_rope_tables(cfg: "HunyuanConfig", txt_len: int,
                          grid: Tuple[int, int, int], pad: int,
                          order: str = "padded"):
    """(cos, sin) over [txt; clean(2); 2x(1); 4x(4); window] for one section.

    ``order="padded"`` (FramePack, back-to-front): timeline split
    [pre 1][blank pad][window][post 1][2x 2][4x 16]
    (``magcache_demo_gradio.py:516-518``). ``order="f1"`` (FramePack-F1,
    forward): [start 1][4x 16][2x 2][1x 1][window]
    (``magcache_demo_gradio_f1.py:543-547``); ``pad`` is ignored. Pyramid
    groups compress (2, 4, 4)/(4, 8, 8) latents into single token-frames at
    coarser spatial grids; their rope positions use each group's first
    timeline index and stride-scaled spatial coordinates (the packed model's
    multi-scale rope, approximated on a shared frequency table)."""
    gt, gh, gw = grid                  # window token grid (patch 1,2,2)

    def coords_for(times, hh, ww, stride):
        ys, xs = np.meshgrid(np.arange(hh) * stride, np.arange(ww) * stride,
                             indexing="ij")
        out = []
        for t in times:
            out.append(np.stack([np.full(hh * ww, t), ys.reshape(-1),
                                 xs.reshape(-1)], axis=-1))
        return np.concatenate(out, axis=0)

    if order == "f1":
        # [start 1][4x 16][2x 2][1x 1][window gt]
        idx_clean = [0, 19]                            # start + 1x tail
        idx_2x = [17]                                  # 2 frames -> 1 token
        idx_4x = list(range(1, 17, 4))                 # 16 -> 4 tokens
        idx_window = list(range(20, 20 + gt))
    else:
        # [pre 1][blank pad][window gt][post 1][2x 2][4x 16]
        idx_clean = [0, 1 + pad + gt]                  # pre + post
        idx_2x = [1 + pad + gt + 1]
        idx_4x = list(range(1 + pad + gt + 3, 1 + pad + gt + 19, 4))
        idx_window = list(range(1 + pad, 1 + pad + gt))

    rows = [
        None,
        coords_for(idx_clean, gh, gw, 1),
        coords_for(idx_2x, gh // 2, gw // 2, 2),
        coords_for(idx_4x, gh // 4, gw // 4, 4),
        coords_for(idx_window, gh, gw, 1),
    ]
    coords = np.concatenate(rows[1:], axis=0)
    cos_p, sin_p = [], []
    for ax, dim_a in enumerate(cfg.axes_dims):
        c_, s_ = rope_freqs_1d(coords[:, ax], dim_a, cfg.rope_theta)
        cos_p.append(c_)
        sin_p.append(s_)
    img_cos = np.concatenate(cos_p, -1)
    img_sin = np.concatenate(sin_p, -1)
    txt_cos = np.ones((txt_len, cfg.head_dim // 2), np.float32)
    txt_sin = np.zeros((txt_len, cfg.head_dim // 2), np.float32)
    return (np.concatenate([txt_cos, img_cos], 0),
            np.concatenate([txt_sin, img_sin], 0))


def hunyuan_rope_tables(cfg: HunyuanConfig, txt_len: int,
                        grid: Tuple[int, int, int]):
    """[txt; img] (cos, sin): identity rotation on text, 3-D (t,y,x) on video
    patches."""
    gt, gh, gw = grid
    coords = np.stack(np.meshgrid(np.arange(gt), np.arange(gh), np.arange(gw),
                                  indexing="ij"), -1).reshape(-1, 3)
    cos_p, sin_p = [], []
    for ax, dim_a in enumerate(cfg.axes_dims):
        c, s = rope_freqs_1d(coords[:, ax], dim_a, cfg.rope_theta)
        cos_p.append(c)
        sin_p.append(s)
    img_cos = np.concatenate(cos_p, -1)
    img_sin = np.concatenate(sin_p, -1)
    txt_cos = np.ones((txt_len, cfg.head_dim // 2), np.float32)
    txt_sin = np.zeros((txt_len, cfg.head_dim // 2), np.float32)
    return (np.concatenate([txt_cos, img_cos], 0),
            np.concatenate([txt_sin, img_sin], 0))


def _refine_text(cfg: HunyuanConfig, params, txt_raw, t):
    """Individual token refiner: 2 self-attn blocks gated by c = t_emb +
    mean-pooled context embedding."""
    p = params["refiner"]
    c = apply_mlp_embedder(p["t_embed"], timestep_embedding(t, cfg.time_embed_dim))
    c = c + apply_mlp_embedder(p["c_embed"], jnp.mean(txt_raw, axis=1).astype(jnp.float32))
    h = linear(p["in"], txt_raw.astype(jnp.float32))

    def block(bp, h):
        gates = jax.nn.silu(c) @ bp["mod"]["w"] + bp["mod"]["b"]
        g1, g2 = jnp.split(gates[:, None, :], 2, axis=-1)
        hn = layer_norm(h, bp["norm1_w"], bp["norm1_b"])
        q, k, v = jnp.split(hn @ bp["qkv"]["w"] + bp["qkv"]["b"], 3, axis=-1)
        rs = lambda x: x.reshape(x.shape[0], x.shape[1], cfg.heads, -1)
        a = attention(rs(q), rs(k), rs(v)).reshape(h.shape)
        h = h + (a @ bp["proj"]["w"] + bp["proj"]["b"]) * g1
        hn = layer_norm(h, bp["norm2_w"], bp["norm2_b"])
        m = jax.nn.silu(hn @ bp["mlp1"]["w"] + bp["mlp1"]["b"])
        h = h + (m @ bp["mlp2"]["w"] + bp["mlp2"]["b"]) * g2
        return h

    def body(carry, bp):
        return block(bp, carry), None

    h, _ = jax.lax.scan(body, h, p["blocks"])
    return h


def make_hunyuan_core(cfg: HunyuanConfig, txt_len: int,
                      grid: Tuple[int, int, int],
                      history_frames: int = 0,
                      framepack_pad: Optional[int] = None,
                      framepack_order: str = "padded") -> DiTCore:
    """(prepare, trunk, head) for a static latent patch grid (T, H, W).

    cond = {"txt": f[B, txt_len, text_dim] (LLM states),
            "vec": f[B, vec_dim] (CLIP pooled), "guidance": f[B],
            "history": f[B, history_frames*pt, H*ph, W*pw, C] (FramePack
            clean-latent conditioning, optional)}
    x    = latent video f[B, T*pt, H*ph, W*pw, C] channel-last.

    ``history_frames``: FramePack-style conditioning — prior clean latents
    ride the image token sequence at the preceding temporal RoPE positions
    (the reference's clean_latents inputs, ``magcache_demo_gradio.py`` worker);
    the head returns only the current window. The cached MagCache residual
    covers [history; current] tokens, matching the reference's residual on
    the full image stream.
    """
    fcfg = cfg.to_flux()
    gt, gh, gw = grid
    if framepack_pad is not None:
        # FramePack pyramid section: [clean(2f); 2x(1f@/2); 4x(4f@/4); window]
        rope = framepack_rope_tables(cfg, txt_len, grid, framepack_pad,
                                     order=framepack_order)
    else:
        full_grid = (gt + history_frames, gh, gw)
        rope = hunyuan_rope_tables(cfg, txt_len, full_grid)
    mmdit = F.make_flux_core(fcfg, txt_len, gh, gw, rope_tables=rope)
    cur_tokens = gt * gh * gw

    def prepare(params, x, t, cond):
        tokens = patchify_video(cfg, x)
        if framepack_pad is not None:
            pre_tokens = [
                linear(params["clean_proj"],
                       patchify_video(cfg, cond["clean"].astype(x.dtype))),
                linear(params["clean_proj_2x"],
                       _patchify_k(cond["clean_2x"].astype(x.dtype), 2, 4, 4)),
                linear(params["clean_proj_4x"],
                       _patchify_k(cond["clean_4x"].astype(x.dtype), 4, 8, 8)),
            ]
        elif history_frames:
            hist = cond["history"]
            tokens = jnp.concatenate(
                [patchify_video(cfg, hist), tokens], axis=1)
        refined = _refine_text(cfg, params, cond["txt"], t)
        flux_cond = {"txt": refined, "vec": cond["vec"]}
        if cfg.guidance_embed and "guidance" in cond:
            flux_cond["guidance"] = cond["guidance"]
        if framepack_pad is not None:
            flux_cond["img_pre_tokens"] = pre_tokens
        return mmdit.prepare(params, tokens, t, flux_cond)

    def head(params, img, ctx):
        out = mmdit.head(params, img, ctx)  # [B, S_total, patch_in]
        out = out[:, -cur_tokens:]          # current window only
        return unpatchify_video(cfg, out, grid)

    return DiTCore(prepare, mmdit.trunk, head)


def patchify_video(cfg: HunyuanConfig, lat: jnp.ndarray) -> jnp.ndarray:
    b, f, h, w, c = lat.shape
    pt, ph, pw = cfg.patch
    lat = lat.reshape(b, f // pt, pt, h // ph, ph, w // pw, pw, c)
    lat = lat.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return lat.reshape(b, (f // pt) * (h // ph) * (w // pw), c * pt * ph * pw)


def unpatchify_video(cfg: HunyuanConfig, x: jnp.ndarray,
                     grid: Tuple[int, int, int]) -> jnp.ndarray:
    b, s, _ = x.shape
    gt, gh, gw = grid
    pt, ph, pw = cfg.patch
    c = cfg.in_channels
    x = x.reshape(b, gt, gh, gw, c, pt, ph, pw)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, gt * pt, gh * ph, gw * pw, c)
