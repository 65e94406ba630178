"""CLIP vision tower for i2v conditioning, TPU-native.

Wan2.1 i2v conditions the DiT's image-cross-attention branch on CLIP visual
features of the input frame: the official stack runs
``CLIPModel.visual(videos, use_31_block=True)`` (wan/modules/clip.py, the
XLM-Roberta-CLIP ViT-H/14 tower) and feeds the **penultimate-block** token
states [B, 257, 1280] into the DiT's ``img_emb`` MLP
(``MagCache4Wan2.1/magcache_generate.py`` i2v path; model side
``magcache_generate.py:264-266``: ``context_clip = self.img_emb(clip_fea)``).

This module is that tower as a pure function: conv patchify + cls token +
learned position embedding + pre-LN + N residual attention blocks, returning
the block-(N-1) hidden states without the post-norm (``use_31_block``
semantics). A converter maps the official ``visual.*`` key layout.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.models.common import linear, linear_params
from magcache_tpu.ops.attention import attention
from magcache_tpu.ops.norms import layer_norm

__all__ = ["CLIPVisionConfig", "init_clip_vision_params", "clip_vision_forward",
           "convert_clip_vision_state_dict", "preprocess_clip_image",
           "CLIP_IMAGE_MEAN", "CLIP_IMAGE_STD"]

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    dim: int = 1280                 # ViT-H/14
    layers: int = 32
    heads: int = 16
    mlp_ratio: int = 4
    patch: int = 14
    image_size: int = 224
    use_penultimate: bool = True    # use_31_block: skip last block + post_norm
    quick_gelu: bool = False
    dtype: str = "float32"

    @property
    def tokens(self) -> int:
        return (self.image_size // self.patch) ** 2 + 1

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def tiny(**kw):
        d = dict(dim=32, layers=2, heads=4, patch=8, image_size=32)
        d.update(kw)
        return CLIPVisionConfig(**d)

    tiny = staticmethod(tiny)


def init_clip_vision_params(key: jax.Array, cfg: CLIPVisionConfig):
    d, L = cfg.dim, cfg.layers
    ks = iter(jax.random.split(key, 12))
    nxt = lambda: next(ks)

    def st(i, o):
        return linear_params(nxt(), i, o, depth=L, dtype=cfg.jdtype)

    return {
        "patch_embed": linear_params(nxt(), 3 * cfg.patch * cfg.patch, d,
                                     dtype=cfg.jdtype),
        "cls": jax.random.normal(nxt(), (d,), jnp.float32) * 0.02,
        "pos": jax.random.normal(nxt(), (cfg.tokens, d), jnp.float32) * 0.02,
        "pre_norm_w": jnp.ones((d,), jnp.float32),
        "pre_norm_b": jnp.zeros((d,), jnp.float32),
        "blocks": {
            "norm1_w": jnp.ones((L, d), jnp.float32),
            "norm1_b": jnp.zeros((L, d), jnp.float32),
            "qkv": st(d, 3 * d),
            "proj": st(d, d),
            "norm2_w": jnp.ones((L, d), jnp.float32),
            "norm2_b": jnp.zeros((L, d), jnp.float32),
            "mlp1": st(d, cfg.mlp_ratio * d),
            "mlp2": st(cfg.mlp_ratio * d, d),
        },
        "post_norm_w": jnp.ones((d,), jnp.float32),
        "post_norm_b": jnp.zeros((d,), jnp.float32),
    }


def clip_vision_forward(params, cfg: CLIPVisionConfig, images: jnp.ndarray
                        ) -> jnp.ndarray:
    """images: f[B, H, W, 3], already CLIP-normalized. Returns token hidden
    states f32[B, tokens, dim] — penultimate block when cfg.use_penultimate."""
    b, hh, ww, _ = images.shape
    p = cfg.patch
    x = images.reshape(b, hh // p, p, ww // p, p, 3)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, (hh // p) * (ww // p),
                                              3 * p * p)
    h = linear(params["patch_embed"], x.astype(cfg.jdtype))
    cls = jnp.broadcast_to(params["cls"].astype(h.dtype), (b, 1, cfg.dim))
    h = jnp.concatenate([cls, h], axis=1) + params["pos"].astype(h.dtype)
    h = layer_norm(h, params["pre_norm_w"], params["pre_norm_b"])

    act = ((lambda v: v * jax.nn.sigmoid(1.702 * v)) if cfg.quick_gelu
           else (lambda v: jax.nn.gelu(v, approximate=False)))

    def block(bp, h):
        n = layer_norm(h, bp["norm1_w"], bp["norm1_b"])
        q, k, v = jnp.split(linear(bp["qkv"], n), 3, axis=-1)
        rs = lambda t: t.reshape(b, t.shape[1], cfg.heads, -1)
        a = attention(rs(q), rs(k), rs(v)).reshape(h.shape)
        h = h + linear(bp["proj"], a)
        n = layer_norm(h, bp["norm2_w"], bp["norm2_b"])
        return h + linear(bp["mlp2"], act(linear(bp["mlp1"], n)))

    n_run = cfg.layers - 1 if cfg.use_penultimate else cfg.layers
    take = jax.tree.map(lambda a: a[:n_run], params["blocks"])
    h, _ = jax.lax.scan(lambda c, bp: (block(bp, c), None), h, take)
    if not cfg.use_penultimate:
        h = layer_norm(h, params["post_norm_w"], params["post_norm_b"])
    return h.astype(jnp.float32)


def convert_clip_vision_state_dict(sd: Dict[str, np.ndarray],
                                   cfg: CLIPVisionConfig) -> dict:
    """Map the official Wan CLIP visual tower keys (wan/modules/clip.py
    VisionTransformer under the ``visual.`` prefix) onto our tree:

      visual.patch_embedding (Conv2d k=p s=p); visual.cls_embedding [1,1,d];
      visual.pos_embedding [1, tokens, d]; visual.pre_norm;
      visual.transformer.{i}.{norm1, attn.to_qkv, attn.proj, norm2,
        mlp.0, mlp.2}; visual.post_norm.
    """
    if any(k.startswith("visual.") for k in sd):
        sd = {k[len("visual."):]: v for k, v in sd.items()
              if k.startswith("visual.")}
    dt = cfg.jdtype
    L, d, p = cfg.layers, cfg.dim, cfg.patch

    def _lin(name, dtype=dt):
        w = np.asarray(sd[f"{name}.weight"], np.float32).T
        out = {"w": jnp.asarray(w, dtype)}
        if f"{name}.bias" in sd:
            out["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32), dtype)
        return out

    def _stack(parts):
        return {k: jnp.stack([q[k] for q in parts]) for k in parts[0]}

    def _ln(fmt, part):
        return jnp.stack([jnp.asarray(sd[fmt.format(i=i) + f".{part}"], jnp.float32)
                          for i in range(L)])

    # conv2d [d, 3, p, p] -> linear [(3*p*p), d] with (c, ph, pw) feature order
    pw_ = np.asarray(sd["patch_embedding.weight"], np.float32)
    pe_w = pw_.transpose(1, 2, 3, 0).reshape(3 * p * p, d)
    pe = {"w": jnp.asarray(pe_w, dt)}
    if "patch_embedding.bias" in sd:
        pe["b"] = jnp.asarray(np.asarray(sd["patch_embedding.bias"], np.float32), dt)
    else:
        pe["b"] = jnp.zeros((d,), dt)

    return {
        "patch_embed": pe,
        "cls": jnp.asarray(np.asarray(sd["cls_embedding"], np.float32).reshape(d)),
        "pos": jnp.asarray(np.asarray(sd["pos_embedding"], np.float32).reshape(-1, d)),
        "pre_norm_w": jnp.asarray(sd["pre_norm.weight"], jnp.float32),
        "pre_norm_b": jnp.asarray(sd["pre_norm.bias"], jnp.float32),
        "blocks": {
            "norm1_w": _ln("transformer.{i}.norm1", "weight"),
            "norm1_b": _ln("transformer.{i}.norm1", "bias"),
            "qkv": _stack([_lin(f"transformer.{i}.attn.to_qkv") for i in range(L)]),
            "proj": _stack([_lin(f"transformer.{i}.attn.proj") for i in range(L)]),
            "norm2_w": _ln("transformer.{i}.norm2", "weight"),
            "norm2_b": _ln("transformer.{i}.norm2", "bias"),
            "mlp1": _stack([_lin(f"transformer.{i}.mlp.0") for i in range(L)]),
            "mlp2": _stack([_lin(f"transformer.{i}.mlp.2") for i in range(L)]),
        },
        "post_norm_w": jnp.asarray(sd["post_norm.weight"], jnp.float32),
        "post_norm_b": jnp.asarray(sd["post_norm.bias"], jnp.float32),
    }


def preprocess_clip_image(image: np.ndarray, cfg: CLIPVisionConfig
                          ) -> jnp.ndarray:
    """[H, W, 3] uint8/float [0,1] -> CLIP-normalized f32[1, S, S, 3]
    (bicubic resize to the tower's input size, CLIP mean/std)."""
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    img = jnp.asarray(img, jnp.float32)
    if img.ndim == 3:
        img = img[None]
    s = cfg.image_size
    img = jax.image.resize(img, (img.shape[0], s, s, 3), method="bicubic")
    img = jnp.clip(img, 0.0, 1.0)
    return (img - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
