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
           "convert_clip_vision_state_dict", "convert_hf_clip_vision_state_dict",
           "CLIPTextConfig", "init_clip_text_params", "clip_text_forward",
           "convert_clip_text_state_dict", "preprocess_clip_image",
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


def convert_hf_clip_vision_state_dict(sd: Dict[str, np.ndarray],
                                      cfg: CLIPVisionConfig) -> dict:
    """Map a ``transformers.CLIPVisionModel`` state dict (``vision_model.``
    prefix) onto our tree. HF keeps separate q/k/v projections; we fuse them.
    HF's ``last_hidden_state`` is NOT post-layernormed, so penultimate-state
    consumers should compare against ``hidden_states[-2]`` (tested in
    tests/test_text_encoders.py)."""
    if any(k.startswith("vision_model.") for k in sd):
        sd = {k[len("vision_model."):]: v for k, v in sd.items()
              if k.startswith("vision_model.")}
    dt = cfg.jdtype
    L, d, p = cfg.layers, cfg.dim, cfg.patch

    def _lin(name):
        w = np.asarray(sd[f"{name}.weight"], np.float32).T
        out = {"w": jnp.asarray(w, dt)}
        if f"{name}.bias" in sd:
            out["b"] = jnp.asarray(sd[f"{name}.bias"], dt)
        return out

    def _qkv(i):
        base = f"encoder.layers.{i}.self_attn"
        w = np.concatenate([np.asarray(sd[f"{base}.{n}_proj.weight"],
                                       np.float32).T for n in "qkv"], axis=-1)
        b = np.concatenate([np.asarray(sd[f"{base}.{n}_proj.bias"], np.float32)
                            for n in "qkv"])
        return {"w": jnp.asarray(w, dt), "b": jnp.asarray(b, dt)}

    def _stack(parts):
        return {k: jnp.stack([q[k] for q in parts]) for k in parts[0]}

    def _ln(fmt, part):
        return jnp.stack([jnp.asarray(sd[fmt.format(i=i) + f".{part}"],
                                      jnp.float32) for i in range(L)])

    pw_ = np.asarray(sd["embeddings.patch_embedding.weight"], np.float32)
    pe = {"w": jnp.asarray(pw_.transpose(1, 2, 3, 0).reshape(3 * p * p, d), dt),
          "b": (jnp.asarray(sd["embeddings.patch_embedding.bias"], dt)
                if "embeddings.patch_embedding.bias" in sd
                else jnp.zeros((d,), dt))}
    return {
        "patch_embed": pe,
        "cls": jnp.asarray(np.asarray(sd["embeddings.class_embedding"],
                                      np.float32).reshape(d)),
        "pos": jnp.asarray(sd["embeddings.position_embedding.weight"],
                           jnp.float32),
        "pre_norm_w": jnp.asarray(sd["pre_layrnorm.weight"], jnp.float32),
        "pre_norm_b": jnp.asarray(sd["pre_layrnorm.bias"], jnp.float32),
        "blocks": {
            "norm1_w": _ln("encoder.layers.{i}.layer_norm1", "weight"),
            "norm1_b": _ln("encoder.layers.{i}.layer_norm1", "bias"),
            "qkv": _stack([_qkv(i) for i in range(L)]),
            "proj": _stack([_lin(f"encoder.layers.{i}.self_attn.out_proj")
                            for i in range(L)]),
            "norm2_w": _ln("encoder.layers.{i}.layer_norm2", "weight"),
            "norm2_b": _ln("encoder.layers.{i}.layer_norm2", "bias"),
            "mlp1": _stack([_lin(f"encoder.layers.{i}.mlp.fc1")
                            for i in range(L)]),
            "mlp2": _stack([_lin(f"encoder.layers.{i}.mlp.fc2")
                            for i in range(L)]),
        },
        "post_norm_w": jnp.asarray(sd["post_layernorm.weight"], jnp.float32),
        "post_norm_b": jnp.asarray(sd["post_layernorm.bias"], jnp.float32),
    }


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP text tower (CLIP-L/14 defaults) — the pooled-vector conditioning
    encoder of FLUX (diffusers ``text_encoder``: CLIPTextModel pooled output)
    and HunyuanVideo/FramePack (hyvideo ``text_encoder_2``, CLIP-L)."""

    vocab_size: int = 49408
    dim: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    max_len: int = 77
    eos_token_id: int = 49407
    quick_gelu: bool = True          # released CLIP uses quick_gelu
    eps: float = 1e-5
    dtype: str = "float32"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def tiny(**kw):
        d = dict(vocab_size=96, dim=32, layers=2, heads=4, max_len=16,
                 eos_token_id=95)
        d.update(kw)
        return CLIPTextConfig(**d)

    tiny = staticmethod(tiny)


def init_clip_text_params(key: jax.Array, cfg: CLIPTextConfig):
    d, L = cfg.dim, cfg.layers
    ks = iter(jax.random.split(key, 10))
    nxt = lambda: next(ks)

    def st(i, o):
        return linear_params(nxt(), i, o, depth=L, dtype=cfg.jdtype)

    return {
        "tok": (jax.random.normal(nxt(), (cfg.vocab_size, d), jnp.float32)
                * 0.02).astype(cfg.jdtype),
        "pos": (jax.random.normal(nxt(), (cfg.max_len, d), jnp.float32)
                * 0.02).astype(cfg.jdtype),
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
        "final_norm_w": jnp.ones((d,), jnp.float32),
        "final_norm_b": jnp.zeros((d,), jnp.float32),
    }


def clip_text_forward(params, cfg: CLIPTextConfig, input_ids: jnp.ndarray,
                      attention_mask=None, hidden_skip: int = 0,
                      project: bool = False):
    """Causal-masked text tower. Returns ``(hidden f32[B, S, d],
    pooled f32[B, d])``.

    ``hidden_skip=0``: hidden is the final-normed last state, pooled the
    first-EOS row of it (``CLIPTextTransformer`` pooling). ``hidden_skip=k>0``
    returns the UN-normed state after ``layers-k`` blocks — diffusers'
    ``hidden_states[-(k+1)]``, e.g. the SD3/Vchitect recipe's penultimate
    states (k=1) — while pooled still comes from the full normed pass.

    ``project=True``: pooled goes through ``text_proj``
    (CLIPTextModelWithProjection ``text_embeds`` — the SD3/Vchitect recipe).
    Projection is explicit, NOT inferred from key presence: FLUX/hyvideo
    consume the un-projected pooler_output, and a full CLIP export (e.g.
    openai/clip-vit-large-patch14) carries text_projection.weight even when
    the consumer wants the plain pooled vector."""
    b, s = input_ids.shape
    h = params["tok"][input_ids] + params["pos"][:s]

    causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
    keep = causal
    if attention_mask is not None:
        keep = jnp.logical_and(
            keep, attention_mask[:, None, None, :].astype(bool))
    bias = jnp.where(keep, 0.0, -jnp.inf).astype(jnp.float32)

    act = ((lambda v: v * jax.nn.sigmoid(1.702 * v)) if cfg.quick_gelu
           else (lambda v: jax.nn.gelu(v, approximate=False)))
    heads = cfg.heads
    hd = cfg.dim // heads
    scale = 1.0 / float(np.sqrt(hd))

    def block(bp, h):
        n = layer_norm(h, bp["norm1_w"], bp["norm1_b"], eps=cfg.eps)
        q, k, v = jnp.split(linear(bp["qkv"], n), 3, axis=-1)
        rs = lambda t: t.reshape(b, s, heads, hd).astype(jnp.float32)
        sc = jnp.einsum("bqhd,bkhd->bhqk", rs(q), rs(k)) * scale + bias
        p = jax.nn.softmax(sc, axis=-1)
        a = jnp.einsum("bhqk,bkhd->bqhd", p, rs(v)).reshape(b, s, cfg.dim)
        h = h + linear(bp["proj"], a.astype(h.dtype))
        n = layer_norm(h, bp["norm2_w"], bp["norm2_b"], eps=cfg.eps)
        return h + linear(bp["mlp2"], act(linear(bp["mlp1"], n)))

    if hidden_skip:
        def step(c, bp):
            out = block(bp, c)
            return out, out
        h, hs = jax.lax.scan(step, h, params["blocks"])
    else:
        h, hs = jax.lax.scan(lambda c, bp: (block(bp, c), None), h,
                             params["blocks"])
    h = layer_norm(h, params["final_norm_w"], params["final_norm_b"],
                   eps=cfg.eps).astype(jnp.float32)
    if cfg.eos_token_id == 2:
        # legacy CLIP configs (openai/clip-vit-large-patch14 — the FLUX/
        # hyvideo text_encoder) declare eos_token_id=2, an id that never
        # appears in CLIP token streams; transformers special-cases this
        # with argmax over the raw ids (the true EOS 49407 is the largest)
        eos_pos = jnp.argmax(input_ids, axis=-1)
    else:
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32),
                             axis=-1)
    pooled = h[jnp.arange(b), eos_pos]
    if project:
        if "text_proj" not in params:
            raise KeyError(
                "project=True needs text_projection.weight in the checkpoint "
                "(CLIPTextModelWithProjection); this one has none")
        pooled = pooled @ params["text_proj"].astype(jnp.float32)
    hidden = h if hidden_skip == 0 else hs[-1 - hidden_skip].astype(jnp.float32)
    return hidden, pooled


def convert_clip_text_state_dict(sd: Dict[str, np.ndarray],
                                 cfg: CLIPTextConfig) -> dict:
    """Map a ``transformers.CLIPTextModel`` / ``CLIPTextModelWithProjection``
    state dict (``text_model.`` prefix) onto our tree (q/k/v fused;
    ``text_projection.weight`` -> ``text_proj`` when present — the SD3/
    Vchitect pooled projection)."""
    text_proj = None
    if "text_projection.weight" in sd:       # CLIPTextModelWithProjection
        text_proj = jnp.asarray(
            np.asarray(sd["text_projection.weight"], np.float32).T)
    if any(k.startswith("text_model.") for k in sd):
        sd = {k[len("text_model."):]: v for k, v in sd.items()
              if k.startswith("text_model.")}
    dt = cfg.jdtype
    L = cfg.layers

    def _lin(name):
        return {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"],
                                            np.float32).T, dt),
                "b": jnp.asarray(sd[f"{name}.bias"], dt)}

    def _qkv(i):
        base = f"encoder.layers.{i}.self_attn"
        w = np.concatenate([np.asarray(sd[f"{base}.{n}_proj.weight"],
                                       np.float32).T for n in "qkv"], axis=-1)
        b = np.concatenate([np.asarray(sd[f"{base}.{n}_proj.bias"], np.float32)
                            for n in "qkv"])
        return {"w": jnp.asarray(w, dt), "b": jnp.asarray(b, dt)}

    def _stack(parts):
        return {k: jnp.stack([q[k] for q in parts]) for k in parts[0]}

    def _ln(fmt, part):
        return jnp.stack([jnp.asarray(sd[fmt.format(i=i) + f".{part}"],
                                      jnp.float32) for i in range(L)])

    params = {
        "tok": jnp.asarray(np.asarray(
            sd["embeddings.token_embedding.weight"], np.float32), dt),
        "pos": jnp.asarray(np.asarray(
            sd["embeddings.position_embedding.weight"], np.float32), dt),
        "blocks": {
            "norm1_w": _ln("encoder.layers.{i}.layer_norm1", "weight"),
            "norm1_b": _ln("encoder.layers.{i}.layer_norm1", "bias"),
            "qkv": _stack([_qkv(i) for i in range(L)]),
            "proj": _stack([_lin(f"encoder.layers.{i}.self_attn.out_proj")
                            for i in range(L)]),
            "norm2_w": _ln("encoder.layers.{i}.layer_norm2", "weight"),
            "norm2_b": _ln("encoder.layers.{i}.layer_norm2", "bias"),
            "mlp1": _stack([_lin(f"encoder.layers.{i}.mlp.fc1")
                            for i in range(L)]),
            "mlp2": _stack([_lin(f"encoder.layers.{i}.mlp.fc2")
                            for i in range(L)]),
        },
        "final_norm_w": jnp.asarray(sd["final_layer_norm.weight"], jnp.float32),
        "final_norm_b": jnp.asarray(sd["final_layer_norm.bias"], jnp.float32),
    }
    if text_proj is not None:
        params["text_proj"] = text_proj
    return params


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
