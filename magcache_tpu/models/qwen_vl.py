"""Qwen2.5-VL vision tower — the image half of Qwen-Image-Edit's real
conditioning stack.

The reference Edit adapter (``MagCache4QwenImageEdit/magcache_generate.py``)
patches the diffusers ``QwenImageEditPipeline``, whose prompt encoder is
Qwen2.5-VL: the reference image rides the chat template through this vision
transformer, its merged tokens are spliced into the LM's input embeddings at
the ``<|image_pad|>`` positions, and the LM runs with 3-axis M-RoPE position
ids (``transformers`` ``Qwen2_5_VisionTransformerPretrainedModel`` /
``Qwen2_5_VLModel.get_rope_index``).

TPU-first design notes (vs the torch module):

- The torch block loop splits the sequence into variable-length windows and
  runs attention per chunk (``cu_seqlens`` + ``torch.split``). Here the
  window partition is computed ON HOST as integer segment ids (the image
  geometry is static per call), and every layer runs ONE dense attention over
  the whole sequence with an additive segment mask — no dynamic shapes, one
  XLA program, MXU-shaped matmuls.
- All 32 blocks are identical → stacked params + ``lax.scan``; the
  full-vs-window choice per layer is a scanned boolean selecting between two
  precomputed bias planes.
- The strided Conv3d patch embed (stride == kernel) is algebraically a
  matmul over the flattened patch vector — fed straight to the MXU.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.models.common import linear

# CLIP normalization constants used by the Qwen2VL image processor
OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class QwenVLVisionConfig:
    """Geometry of ``Qwen2_5_VLVisionConfig`` (transformers defaults)."""

    depth: int = 32
    hidden: int = 1280
    heads: int = 16
    intermediate: int = 3420
    out_hidden: int = 3584
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    merge_size: int = 2
    window_size: int = 112
    fullatt_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    eps: float = 1e-6
    dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @property
    def merge_unit(self) -> int:
        return self.merge_size * self.merge_size

    @property
    def patch_dim(self) -> int:
        return (self.in_channels * self.temporal_patch_size
                * self.patch_size * self.patch_size)

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def tiny(cls, **kw):
        d = dict(depth=4, hidden=32, heads=4, intermediate=48, out_hidden=24,
                 patch_size=2, temporal_patch_size=2, merge_size=2,
                 window_size=8, fullatt_indexes=(1, 3))
        d.update(kw)
        return cls(**d)


# ---------------------------------------------------------------------------
# Host-side geometry: rotary position ids + window partition (numpy; the
# image grid is static per call so none of this traces).
# ---------------------------------------------------------------------------


def vision_rot_pos_ids(grid_thw: Sequence[Tuple[int, int, int]],
                       merge_size: int) -> np.ndarray:
    """Per-token (h, w) position ids in the merge-block-major patch order
    (``rot_pos_emb``, modeling_qwen2_5_vl.py)."""
    out = []
    for t, h, w in grid_thw:
        hp = np.arange(h)[:, None].repeat(w, 1)
        hp = hp.reshape(h // merge_size, merge_size, w // merge_size,
                        merge_size).transpose(0, 2, 1, 3).reshape(-1)
        wp = np.arange(w)[None, :].repeat(h, 0)
        wp = wp.reshape(h // merge_size, merge_size, w // merge_size,
                        merge_size).transpose(0, 2, 1, 3).reshape(-1)
        out.append(np.tile(np.stack([hp, wp], -1), (t, 1)))
    return np.concatenate(out, 0)


def window_partition(grid_thw: Sequence[Tuple[int, int, int]],
                     cfg: QwenVLVisionConfig):
    """Window reorder + segment ids (``get_window_index``).

    Returns ``(window_index, seg_window, seg_full)``: ``window_index`` is the
    merge-unit permutation applied to tokens before the blocks; ``seg_*`` are
    per-token segment ids AFTER that reorder — same-id pairs may attend.
    ``seg_window`` partitions into window_size² pixel windows (the 28 of 32
    windowed layers); ``seg_full`` partitions per image (the full-attention
    layers; separate images in one batch never attend across)."""
    vw = cfg.window_size // cfg.merge_size // cfg.patch_size
    index_all: List[np.ndarray] = []
    seqlens_units: List[np.ndarray] = []
    unit_off = 0
    img_of_unit: List[np.ndarray] = []
    for n, (t, h, w) in enumerate(grid_thw):
        lh, lw = h // cfg.merge_size, w // cfg.merge_size
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h, pad_w = (-lh) % vw, (-lw) % vw
        idxp = np.pad(idx, ((0, 0), (0, pad_h), (0, pad_w)),
                      constant_values=-100)
        nh, nw = (lh + pad_h) // vw, (lw + pad_w) // vw
        idxp = idxp.reshape(t, nh, vw, nw, vw).transpose(0, 1, 3, 2, 4)
        idxp = idxp.reshape(t, nh * nw, vw, vw)
        seqlens_units.append((idxp != -100).sum((2, 3)).reshape(-1))
        flat = idxp.reshape(-1)
        keep = flat[flat != -100]
        index_all.append(keep + unit_off)
        img_of_unit.append(np.full(keep.shape, n, np.int32))
        unit_off += t * lh * lw
    window_index = np.concatenate(index_all)
    seqlens = np.concatenate(seqlens_units) * cfg.merge_unit   # token counts
    seqlens = seqlens[seqlens > 0]
    seg_window = np.repeat(np.arange(len(seqlens)), seqlens).astype(np.int32)
    seg_full = np.repeat(np.concatenate(img_of_unit), cfg.merge_unit)
    return window_index, seg_window, seg_full.astype(np.int32)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_qwen_vl_vision_params(key: jax.Array, cfg: QwenVLVisionConfig):
    d, it, hu = cfg.hidden, cfg.intermediate, cfg.hidden * cfg.merge_unit
    ks = iter(jax.random.split(key, 8 + cfg.depth))

    def mat(k, i, o):
        return jax.random.normal(k, (i, o), jnp.float32) * (i ** -0.5)

    def block(k):
        kk = jax.random.split(k, 6)
        return {
            "norm1": jnp.ones((d,), jnp.float32),
            "norm2": jnp.ones((d,), jnp.float32),
            "qkv": {"w": mat(kk[0], d, 3 * d), "b": jnp.zeros((3 * d,))},
            "proj": {"w": mat(kk[1], d, d), "b": jnp.zeros((d,))},
            "gate": {"w": mat(kk[2], d, it), "b": jnp.zeros((it,))},
            "up": {"w": mat(kk[3], d, it), "b": jnp.zeros((it,))},
            "down": {"w": mat(kk[4], it, d), "b": jnp.zeros((d,))},
        }

    blocks = [block(next(ks)) for _ in range(cfg.depth)]
    return {
        "patch": mat(next(ks), cfg.patch_dim, d),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "merger": {
            "ln": jnp.ones((d,), jnp.float32),
            "fc1": {"w": mat(next(ks), hu, hu), "b": jnp.zeros((hu,))},
            "fc2": {"w": mat(next(ks), hu, cfg.out_hidden),
                    "b": jnp.zeros((cfg.out_hidden,))},
        },
    }


def convert_qwen_vl_vision_state_dict(sd: Dict[str, np.ndarray],
                                      cfg: QwenVLVisionConfig) -> dict:
    """Map a ``Qwen2_5_VisionTransformerPretrainedModel`` state dict
    (``visual.`` or bare prefix) onto our tree. The strided Conv3d patch
    embed becomes a matmul: its [E, C, T, P, P] kernel flattens in exactly
    the processor's patch-vector order (C, T, P, P)."""
    if any(k.startswith("visual.") for k in sd):
        sd = {k[len("visual."):]: v for k, v in sd.items()
              if k.startswith("visual.")}

    def arr(k):
        return jnp.asarray(np.asarray(sd[k], np.float32))

    def lin(prefix):
        w = np.asarray(sd[prefix + ".weight"], np.float32).T
        p = {"w": jnp.asarray(w)}
        if prefix + ".bias" in sd:
            p["b"] = arr(prefix + ".bias")
        else:
            p["b"] = jnp.zeros((w.shape[1],), jnp.float32)
        return p

    def stack(fn):
        return jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[fn(i) for i in range(cfg.depth)])

    def block(i):
        p = f"blocks.{i}"
        return {
            "norm1": arr(p + ".norm1.weight"),
            "norm2": arr(p + ".norm2.weight"),
            "qkv": lin(p + ".attn.qkv"),
            "proj": lin(p + ".attn.proj"),
            "gate": lin(p + ".mlp.gate_proj"),
            "up": lin(p + ".mlp.up_proj"),
            "down": lin(p + ".mlp.down_proj"),
        }

    pe = np.asarray(sd["patch_embed.proj.weight"], np.float32)
    return {
        "patch": jnp.asarray(pe.reshape(pe.shape[0], -1).T),
        "blocks": stack(block),
        "merger": {
            "ln": arr("merger.ln_q.weight"),
            "fc1": lin("merger.mlp.0"),
            "fc2": lin("merger.mlp.2"),
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (n * w).astype(x.dtype)


def qwen_vl_vision_forward(params, cfg: QwenVLVisionConfig,
                           patches: jnp.ndarray,
                           grid_thw: Sequence[Tuple[int, int, int]]
                           ) -> jnp.ndarray:
    """``f32[S, patch_dim] -> f32[S/merge_unit, out_hidden]`` merged vision
    tokens in the processor's original (pre-window-reorder) order, matching
    the torch tower's output token order."""
    grid_thw = tuple(tuple(int(v) for v in g) for g in grid_thw)
    s = patches.shape[0]
    assert s == sum(t * h * w for t, h, w in grid_thw), "patch count mismatch"

    # host geometry
    pos = vision_rot_pos_ids(grid_thw, cfg.merge_size)            # [S, 2]
    window_index, seg_win, seg_full = window_partition(grid_thw, cfg)
    inv = (10000.0 ** (-np.arange(0, cfg.head_dim // 2, 2, np.float64)
                       / (cfg.head_dim // 2)))
    ang = (pos[:, :, None] * inv[None, None, :]).reshape(s, -1)   # [S, hd/2]
    # reorder tokens (and their rope angles) into window-major order
    reorder = (np.arange(s).reshape(-1, cfg.merge_unit)[window_index]
               .reshape(-1))
    ang = ang[reorder]
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)
    bias_win = jnp.asarray(np.where(seg_win[:, None] == seg_win[None, :],
                                    0.0, -np.inf), jnp.float32)
    bias_full = jnp.asarray(np.where(seg_full[:, None] == seg_full[None, :],
                                     0.0, -np.inf), jnp.float32)
    full_flag = jnp.asarray([i in cfg.fullatt_indexes
                             for i in range(cfg.depth)])

    dt = cfg.jdtype
    h = (patches.astype(dt) @ params["patch"].astype(dt))[jnp.asarray(reorder)]
    nh, hd = cfg.heads, cfg.head_dim
    scale = 1.0 / math.sqrt(hd)

    def rope(x):
        half = x[..., :hd // 2], x[..., hd // 2:]
        c, sn = cos[:, None, :], sin[:, None, :]
        return jnp.concatenate([half[0] * c - half[1] * sn,
                                half[1] * c + half[0] * sn], -1)

    def block(carry, xs):
        bp, is_full = xs
        x = carry
        n = _rms(x, bp["norm1"], cfg.eps)
        qkv = linear(bp["qkv"], n).reshape(s, 3, nh, hd)
        q = rope(qkv[:, 0].astype(jnp.float32))
        k = rope(qkv[:, 1].astype(jnp.float32))
        v = qkv[:, 2].astype(jnp.float32)
        bias = jnp.where(is_full, bias_full, bias_win)
        sc = jnp.einsum("qhd,khd->hqk", q, k) * scale + bias[None]
        p = jax.nn.softmax(sc, axis=-1)
        a = jnp.einsum("hqk,khd->qhd", p, v).reshape(s, nh * hd)
        x = x + linear(bp["proj"], a.astype(x.dtype))
        n = _rms(x, bp["norm2"], cfg.eps)
        f = linear(bp["down"],
                   jax.nn.silu(linear(bp["gate"], n)) * linear(bp["up"], n))
        return x + f, None

    h, _ = jax.lax.scan(block, h, (params["blocks"], full_flag))

    # merger: RMSNorm then 2-layer MLP over merge_unit-flattened blocks
    m = _rms(h, params["merger"]["ln"], cfg.eps)
    m = m.reshape(-1, cfg.hidden * cfg.merge_unit)
    m = linear(params["merger"]["fc2"],
               jax.nn.gelu(linear(params["merger"]["fc1"], m),
                           approximate=False))
    # undo the window reorder (merged-token granularity)
    return m[jnp.asarray(np.argsort(window_index))].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Image preprocessing (Qwen2VLImageProcessor transcription: smart_resize +
# CLIP normalize + merge-block-major patch flattening)
# ---------------------------------------------------------------------------


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> Tuple[int, int]:
    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio above 200")
    h = round(height / factor) * factor
    w = round(width / factor) * factor
    if h * w > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h = max(factor, math.floor(height / beta / factor) * factor)
        w = max(factor, math.floor(width / beta / factor) * factor)
    elif h * w < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h = math.ceil(height * beta / factor) * factor
        w = math.ceil(width * beta / factor) * factor
    return h, w


def preprocess_qwen_vl_image(image: np.ndarray, cfg: QwenVLVisionConfig,
                             min_pixels: int = 56 * 56,
                             max_pixels: int = 14 * 14 * 4 * 1280):
    """uint8/float HWC RGB -> ``(patches f32[S, patch_dim], grid_thw)``."""
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    hh, ww = smart_resize(img.shape[0], img.shape[1],
                          factor=cfg.patch_size * cfg.merge_size,
                          min_pixels=min_pixels, max_pixels=max_pixels)
    # bilinear resize on host
    yi = np.clip(np.linspace(0, img.shape[0] - 1, hh), 0, img.shape[0] - 1)
    xi = np.clip(np.linspace(0, img.shape[1] - 1, ww), 0, img.shape[1] - 1)
    y0, x0 = np.floor(yi).astype(int), np.floor(xi).astype(int)
    y1, x1 = np.minimum(y0 + 1, img.shape[0] - 1), np.minimum(x0 + 1, img.shape[1] - 1)
    fy, fx = (yi - y0)[:, None, None], (xi - x0)[None, :, None]
    img = ((img[y0][:, x0] * (1 - fy) + img[y1][:, x0] * fy) * (1 - fx)
           + (img[y0][:, x1] * (1 - fy) + img[y1][:, x1] * fy) * fx)
    img = (img - np.asarray(OPENAI_CLIP_MEAN)) / np.asarray(OPENAI_CLIP_STD)
    chw = img.transpose(2, 0, 1).astype(np.float32)
    frames = np.repeat(chw[None], cfg.temporal_patch_size, axis=0)
    return patchify_qwen_vl(frames, cfg)


def patchify_qwen_vl(frames: np.ndarray, cfg: QwenVLVisionConfig):
    """``f32[T, C, H, W]`` (T divisible by temporal_patch_size) -> flattened
    patches in the processor's merge-block-major order + grid_thw."""
    tp, ps, ms = cfg.temporal_patch_size, cfg.patch_size, cfg.merge_size
    t, c, hh, ww = frames.shape
    gt, gh, gw = t // tp, hh // ps, ww // ps
    p = frames.reshape(gt, tp, c, gh // ms, ms, ps, gw // ms, ms, ps)
    p = p.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return (p.reshape(gt * gh * gw, c * tp * ps * ps).astype(np.float32),
            (gt, gh, gw))


# ---------------------------------------------------------------------------
# M-RoPE position ids (Qwen2_5_VLModel.get_rope_index, image-only case)
# ---------------------------------------------------------------------------


def mrope_position_ids(input_ids: np.ndarray,
                       grid_thw: Sequence[Tuple[int, int, int]],
                       merge_size: int,
                       image_token_id: int,
                       attention_mask: np.ndarray = None) -> np.ndarray:
    """3-axis position ids ``i32[3, B, S]``: text runs sequentially on all
    axes; each image block gets (t, h, w) grid positions offset past the
    running max. Padding positions get 1 (masked anyway)."""
    b, s = input_ids.shape
    pos = np.ones((3, b, s), np.int64)
    img_i = 0
    for bi in range(b):
        ids = input_ids[bi]
        keep = (attention_mask[bi].astype(bool) if attention_mask is not None
                else np.ones(s, bool))
        ids_k = ids[keep]
        chunks = []
        st = 0
        tokens = ids_k.tolist()
        while img_i < len(grid_thw) and image_token_id in tokens[st:]:
            ed = tokens.index(image_token_id, st)
            t, h, w = grid_thw[img_i]
            lh, lw = h // merge_size, w // merge_size
            st_idx = chunks[-1].max() + 1 if chunks else 0
            if ed > st:
                chunks.append(np.arange(ed - st)[None].repeat(3, 0) + st_idx)
                st_idx = chunks[-1].max() + 1
            ti = np.arange(t)[:, None].repeat(lh * lw, 1).reshape(-1)
            hi = np.arange(lh)[None, :, None].repeat(t, 0).repeat(lw, 2).reshape(-1)
            wi = np.arange(lw)[None, None, :].repeat(t, 0).repeat(lh, 1).reshape(-1)
            chunks.append(np.stack([ti, hi, wi]) + st_idx)
            st = ed + t * lh * lw
            img_i += 1
        if st < len(tokens):
            st_idx = chunks[-1].max() + 1 if chunks else 0
            chunks.append(np.arange(len(tokens) - st)[None].repeat(3, 0)
                          + st_idx)
        full = np.concatenate(chunks, 1) if chunks else np.zeros((3, 0), np.int64)
        pos[:, bi, keep] = full
    return pos
