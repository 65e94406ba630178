"""Llama-architecture text encoder, TPU-native.

HunyuanVideo / FramePack condition the MMDiT's context stream on the hidden
states of a llava-llama-3-8b language model (the hyvideo ``text_encoder``
stack loaded by ``MagCache4HunyuanVideo/magcache_sample_video.py:284-328`` via
``HunyuanVideoSampler.from_pretrained``): the prompt rides a chat template,
the model runs as a causal LM, and conditioning takes an intermediate hidden
state (``hidden_states[-(skip+1)]``, hyvideo's ``hidden_state_skip_layer``,
default 2) with the template prefix cropped off (``crop_start``).

This module is that architecture as a pure function over a stacked-parameter
pytree: token embedding, N pre-norm blocks (RMSNorm -> GQA attention with
rotary embedding -> RMSNorm -> SwiGLU MLP), final RMSNorm — scanned with
`lax.scan` so the whole encoder is one compiled program. A converter maps the
``transformers.LlamaModel`` key layout; numeric parity against the real torch
module is tested in ``tests/test_text_encoders.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.models.common import linear, linear_params
from magcache_tpu.ops.norms import rms_norm

__all__ = ["LlamaConfig", "init_llama_params", "llama_hidden_states",
           "convert_llama_state_dict"]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128320           # llava-llama-3-8b
    hidden: int = 4096
    layers: int = 32
    heads: int = 32
    kv_heads: int = 8
    intermediate: int = 14336
    rope_theta: float = 500000.0
    eps: float = 1e-5
    qkv_bias: bool = False           # Qwen2 lineage (Qwen2.5-VL text tower)
    dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def tiny(**kw):
        d = dict(vocab_size=128, hidden=32, layers=2, heads=4, kv_heads=2,
                 intermediate=64, rope_theta=10000.0)
        d.update(kw)
        return LlamaConfig(**d)

    tiny = staticmethod(tiny)


def init_llama_params(key: jax.Array, cfg: LlamaConfig):
    d, L = cfg.hidden, cfg.layers
    hd = cfg.head_dim
    ks = iter(jax.random.split(key, 8))
    nxt = lambda: next(ks)

    def st(i, o, bias=False):
        return linear_params(nxt(), i, o, depth=L, bias=bias, dtype=cfg.jdtype)

    return {
        "embed": (jax.random.normal(nxt(), (cfg.vocab_size, d), jnp.float32)
                  * 0.02).astype(cfg.jdtype),
        "blocks": {
            "in_norm": jnp.ones((L, d), jnp.float32),
            "q": st(d, cfg.heads * hd, bias=cfg.qkv_bias),
            "k": st(d, cfg.kv_heads * hd, bias=cfg.qkv_bias),
            "v": st(d, cfg.kv_heads * hd, bias=cfg.qkv_bias),
            "o": st(cfg.heads * hd, d),
            "post_norm": jnp.ones((L, d), jnp.float32),
            "gate": st(d, cfg.intermediate),
            "up": st(d, cfg.intermediate),
            "down": st(cfg.intermediate, d),
        },
        "final_norm": jnp.ones((d,), jnp.float32),
    }


def _rope_llama(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """transformers-convention rotary: rotate_half over the half-split
    (NOT pair-interleaved), cos/sin [S, hd/2] (or per-batch [B, S, hd/2]
    for M-RoPE) broadcast to both halves."""
    h = x.shape[-1] // 2
    x1, x2 = x[..., :h], x[..., h:]
    if cos.ndim == 2:
        c, s = cos[None, :, None, :], sin[None, :, None, :]
    else:
        c, s = cos[:, :, None, :], sin[:, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def llama_hidden_states(params, cfg: LlamaConfig, input_ids: jnp.ndarray,
                        attention_mask: Optional[jnp.ndarray] = None,
                        skip_layers: int = 0,
                        final_norm: bool = False,
                        embeds_override: Optional[jnp.ndarray] = None,
                        override_mask: Optional[jnp.ndarray] = None,
                        position_ids: Optional[jnp.ndarray] = None,
                        mrope_section: Optional[tuple] = None) -> jnp.ndarray:
    """Causal forward returning the hidden state after layer ``L - skip_layers``
    (f32[B, S, d]) — hyvideo's ``hidden_states[-(hidden_state_skip_layer+1)]``
    with ``apply_final_norm=False`` semantics (pass final_norm=True only when
    skip_layers == 0 and the caller wants the normed last state).

    Qwen2.5-VL extensions (the Qwen-Image-Edit conditioning LM):
    ``embeds_override f32[B, S, d]`` + ``override_mask bool[B, S]`` splice
    vision-tower tokens over the ``<|image_pad|>`` embeddings;
    ``position_ids i32[3, B, S]`` + ``mrope_section`` apply 3-axis M-RoPE
    (``apply_multimodal_rotary_pos_emb``): frequency band i of the half-dim
    takes axis ``i % 3``'s position."""
    b, s = input_ids.shape
    h = params["embed"][input_ids].astype(cfg.jdtype)
    if embeds_override is not None:
        h = jnp.where(override_mask[..., None],
                      embeds_override.astype(cfg.jdtype), h)

    inv = cfg.rope_theta ** (-np.arange(0, cfg.head_dim, 2, np.float64)
                             / cfg.head_dim)
    if position_ids is None:
        ang = np.arange(s)[:, None] * inv[None, :]
        cos = jnp.asarray(np.cos(ang), jnp.float32)       # [S, hd/2]
        sin = jnp.asarray(np.sin(ang), jnp.float32)
    else:
        # [3, B, S, hd/2] angles; each section of the half-dim picks its axis
        ang = (jnp.asarray(position_ids, jnp.float32)[..., None]
               * jnp.asarray(inv, jnp.float32))
        sec = list(mrope_section or (cfg.head_dim // 2,))
        assert sum(sec) == cfg.head_dim // 2, "mrope_section must cover hd/2"
        take = np.repeat(np.arange(len(sec)) % 3, sec)    # axis per channel
        onehot = jnp.asarray(np.eye(3)[take].T, jnp.float32)   # [3, hd/2]
        ang = jnp.einsum("absc,ac->bsc", ang, onehot)      # [B, S, hd/2]
        cos, sin = jnp.cos(ang), jnp.sin(ang)

    # additive mask: causal + key padding, f32 [B, 1, S, S]
    causal = jnp.tril(jnp.ones((s, s), bool))
    keep = causal[None, None]
    if attention_mask is not None:
        keep = jnp.logical_and(keep, attention_mask[:, None, None, :].astype(bool))
    bias = jnp.where(keep, 0.0, -jnp.inf).astype(jnp.float32)

    hq, hk, hd = cfg.heads, cfg.kv_heads, cfg.head_dim
    scale = 1.0 / float(np.sqrt(hd))

    def block(bp, h):
        n = rms_norm(h, bp["in_norm"], eps=cfg.eps)
        q = linear(bp["q"], n).reshape(b, s, hq, hd)
        k = linear(bp["k"], n).reshape(b, s, hk, hd)
        v = linear(bp["v"], n).reshape(b, s, hk, hd)
        q = _rope_llama(q.astype(jnp.float32), cos, sin)
        k = _rope_llama(k.astype(jnp.float32), cos, sin)
        rep = hq // hk
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        sc = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale + bias
        p = jax.nn.softmax(sc, axis=-1)
        a = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
        h = h + linear(bp["o"], a.reshape(b, s, hq * hd).astype(h.dtype))
        n = rms_norm(h, bp["post_norm"], eps=cfg.eps)
        f = linear(bp["down"],
                   jax.nn.silu(linear(bp["gate"], n)) * linear(bp["up"], n))
        return h + f

    n_run = cfg.layers - skip_layers
    take = jax.tree.map(lambda a: a[:n_run], params["blocks"])
    h, _ = jax.lax.scan(lambda c, bp: (block(bp, c), None), h, take)
    if final_norm:
        h = rms_norm(h, params["final_norm"], eps=cfg.eps)
    return h.astype(jnp.float32)


def convert_llama_state_dict(sd: Dict[str, np.ndarray], cfg: LlamaConfig
                             ) -> dict:
    """Map a ``transformers.LlamaModel`` state dict (``model.`` prefix
    tolerated — LlamaForCausalLM checkpoints) onto our stacked tree."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}
    dt = cfg.jdtype
    L = cfg.layers

    def _w(name):
        return jnp.asarray(np.asarray(sd[name], np.float32).T, dt)

    def _stackw(fmt):
        p = {"w": jnp.stack([_w(fmt.format(i=i)) for i in range(L)])}
        bfmt = fmt[:-len(".weight")] + ".bias"
        if bfmt.format(i=0) in sd:   # Qwen2-lineage qkv biases
            p["b"] = jnp.stack([
                jnp.asarray(np.asarray(sd[bfmt.format(i=i)], np.float32), dt)
                for i in range(L)])
        return p

    def _stackn(fmt):
        return jnp.stack([jnp.asarray(sd[fmt.format(i=i)], jnp.float32)
                          for i in range(L)])

    return {
        "embed": jnp.asarray(np.asarray(sd["embed_tokens.weight"], np.float32), dt),
        "blocks": {
            "in_norm": _stackn("layers.{i}.input_layernorm.weight"),
            "q": _stackw("layers.{i}.self_attn.q_proj.weight"),
            "k": _stackw("layers.{i}.self_attn.k_proj.weight"),
            "v": _stackw("layers.{i}.self_attn.v_proj.weight"),
            "o": _stackw("layers.{i}.self_attn.o_proj.weight"),
            "post_norm": _stackn("layers.{i}.post_attention_layernorm.weight"),
            "gate": _stackw("layers.{i}.mlp.gate_proj.weight"),
            "up": _stackw("layers.{i}.mlp.up_proj.weight"),
            "down": _stackw("layers.{i}.mlp.down_proj.weight"),
        },
        "final_norm": jnp.asarray(sd["norm.weight"], jnp.float32),
    }
