"""Qwen-Image / Qwen-Image-Edit DiT, TPU-native.

The model behind ``MagCache4QwenImage/magcache_generate.py`` and the Edit
variant: a joint text-image MMDiT of **double-stream blocks only** (60 layers,
hidden 3072, heads 24; no single-stream stage), text states from a Qwen2.5-VL
LLM (RMS-normed then projected), no guidance distillation — **true CFG** with
two sequential forwards per step and the dual-lane cache
(``magcache_generate.py:63-91, 206-219``: ``num_steps = sample_steps*2``,
lane = ``cnt % 2``).

Implementation: reuses the FLUX double-stream block stack (`models.flux`) with
``depth_single = 0`` (the single-block scan over a zero-length axis is a
no-op), ``guidance_embed = False``, and an RMSNorm on the incoming text states
(Qwen's ``txt_norm``). Edit mode concatenates reference-image latents onto the
image token sequence — handled by the caller passing a longer grid.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from magcache_tpu.core.sampler import DiTCore
from magcache_tpu.models import flux as F
from magcache_tpu.ops.norms import rms_norm

__all__ = ["QwenImageConfig", "init_qwen_image_params", "make_qwen_image_core"]


@dataclasses.dataclass(frozen=True)
class QwenImageConfig:
    in_channels: int = 64            # 16 latent ch x 2x2 pack
    hidden: int = 3072
    heads: int = 24
    depth: int = 60
    mlp_ratio: int = 4
    text_dim: int = 3584             # Qwen2.5-VL hidden
    axes_dims: Tuple[int, ...] = (16, 56, 56)
    theta: float = 10000.0
    time_embed_dim: int = 256
    dtype: str = "float32"
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    def to_flux(self) -> F.FluxConfig:
        return F.FluxConfig(
            in_channels=self.in_channels, hidden=self.hidden, heads=self.heads,
            depth_double=self.depth, depth_single=0, mlp_ratio=self.mlp_ratio,
            text_dim=self.text_dim, vec_dim=8,  # unused (no pooled vector)
            axes_dims=self.axes_dims, theta=self.theta,
            guidance_embed=False, time_embed_dim=self.time_embed_dim,
            dtype=self.dtype, remat=self.remat)

    def tiny(**kw):
        defaults = dict(in_channels=16, hidden=96, heads=4, depth=2,
                        text_dim=24, axes_dims=(8, 8, 8), time_embed_dim=32)
        defaults.update(kw)
        return QwenImageConfig(**defaults)

    tiny = staticmethod(tiny)


def init_qwen_image_params(key: jax.Array, cfg: QwenImageConfig):
    params = F.init_flux_params(key, cfg.to_flux())
    params["txt_norm"] = jnp.ones((cfg.text_dim,), jnp.float32)
    return params


def make_qwen_image_core(cfg: QwenImageConfig, txt_len: int,
                         grid_h: int, grid_w: int,
                         ref_images: int = 0) -> DiTCore:
    """cond = {"txt": f[B, txt_len, text_dim], "ref": f[B, R*gh*gw, C]
    (edit mode)}; x = packed latents f[B, grid_h*grid_w, in_channels].

    ``ref_images``: Qwen-Image-Edit — reference-image tokens join the image
    sequence (each with its own 2-D RoPE grid, like diffusers' per-image
    img_shapes); the head returns only the primary image's tokens.
    """
    import numpy as np
    fcfg = cfg.to_flux()
    cur = grid_h * grid_w
    rope = None
    if ref_images:
        # each reference image gets its own first-axis rope id (k = its
        # index in img_shapes, main image = 0) — diffusers QwenEmbedRope
        # keys the frame axis on the image's list position, so refs are
        # positionally distinct from the target and from each other
        base = F.flux_rope_tables(fcfg, txt_len, grid_h, grid_w)
        refs = [F.flux_img_rope_block(fcfg, grid_h, grid_w, k)
                for k in range(1, ref_images + 1)]
        cos = np.concatenate([base[0]] + [r[0] for r in refs], axis=0)
        sin = np.concatenate([base[1]] + [r[1] for r in refs], axis=0)
        rope = (cos, sin)
    mmdit = F.make_flux_core(fcfg, txt_len, grid_h, grid_w, rope_tables=rope)

    def prepare(params, x, t, cond):
        txt = rms_norm(cond["txt"], params["txt_norm"], eps=1e-6)
        if ref_images:
            x = jnp.concatenate([x, cond["ref"]], axis=1)
        return mmdit.prepare(params, x, t, {"txt": txt})

    def head(params, img, ctx):
        out = mmdit.head(params, img, ctx)
        return out[:, :cur] if ref_images else out

    return DiTCore(prepare, mmdit.trunk, head)
