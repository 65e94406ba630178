"""UMT5 text encoder, TPU-native — Wan's actual text-conditioning stack.

Wan2.1/2.2 condition on **umt5-xxl** (the external ``wan`` package loads
``models_t5_umt5-xxl-enc-bf16.pth`` via ``--ckpt_dir``;
``MagCache4Wan2.1/magcache_generate.py:884-893`` builds ``WanT2V`` which owns
the encoder).  UMT5 differs from classic T5 in one load-bearing way: **every
layer owns its own relative-attention-bias table** (classic T5 computes the
bias once in block 0 and reuses it).  ``FlaxT5EncoderModel`` — the classic-T5
tree `JaxT5Encoder` jits — silently applies only block 0's bias, so routing a
real umt5 checkpoint through it would produce wrong hidden states without any
error.  This module is the per-layer-bias architecture as a pure function
over a stacked-parameter pytree, scanned with ``lax.scan`` so the whole
encoder is one compiled program.

Numeric parity against the real installed ``transformers.UMT5EncoderModel``
is tested in ``tests/test_text_encoders.py`` (the established T5/CLIP/Llama
pattern).  The converter maps the HF key layout (``google/umt5-xxl`` and the
``text_encoder/`` dir of the published Wan diffusers repos); a best-effort
mapping for the wan-package-native naming (``token_embedding`` /
``blocks.N.attn`` / ``ffn.gate``) is sniffed from the keys — that layout
could not be verified in this zero-egress image and is flagged as such.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.models.common import lecun_normal
from magcache_tpu.ops.norms import rms_norm

__all__ = ["UMT5Config", "init_umt5_params", "umt5_encode",
           "convert_umt5_state_dict", "load_umt5_encoder", "UMT5Encoder",
           "relative_position_buckets"]


@dataclasses.dataclass(frozen=True)
class UMT5Config:
    vocab_size: int = 256384           # umt5-xxl
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    layers: int = 24
    heads: int = 64
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6
    dtype: str = "float32"

    @property
    def inner(self) -> int:
        return self.heads * self.d_kv

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def tiny(**kw):
        d = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=64, layers=3,
                 heads=4, rel_buckets=8, rel_max_distance=16)
        d.update(kw)
        return UMT5Config(**d)


def init_umt5_params(key: jax.Array, cfg: UMT5Config):
    ks = iter(jax.random.split(key, 16))
    L, d, inner, ff = cfg.layers, cfg.d_model, cfg.inner, cfg.d_ff
    dt = cfg.jdtype

    def w(k, i, o):
        return lecun_normal(k, (L, i, o), dt)

    return {
        "embed": jax.random.normal(next(ks), (cfg.vocab_size, d), dt) * 1.0,
        "blocks": {
            "ln1": jnp.ones((L, d), dt),
            "q": w(next(ks), d, inner),
            "k": w(next(ks), d, inner),
            "v": w(next(ks), d, inner),
            "o": w(next(ks), inner, d),
            "rel": jax.random.normal(next(ks), (L, cfg.rel_buckets, cfg.heads),
                                     dt) * 0.1,
            "ln2": jnp.ones((L, d), dt),
            "wi0": w(next(ks), d, ff),
            "wi1": w(next(ks), d, ff),
            "wo": w(next(ks), ff, d),
        },
        "final_ln": jnp.ones((d,), dt),
    }


def relative_position_buckets(q_len: int, k_len: int, num_buckets: int = 32,
                              max_distance: int = 128) -> np.ndarray:
    """T5 bidirectional relative-position bucketing, host-side (static given
    the sequence length; the per-layer bias is then one gather per layer)."""
    ctx = np.arange(q_len, dtype=np.int64)[:, None]
    mem = np.arange(k_len, dtype=np.int64)[None, :]
    rel = mem - ctx                                       # [q, k]
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return buckets + np.where(is_small, rel, large)       # [q, k]


def umt5_encode(params, cfg: UMT5Config, input_ids: jnp.ndarray,
                attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Encoder forward: [B, L] ids -> [B, L, d] final hidden states (padded
    positions zeroed, matching the reference's downstream usage)."""
    B, S = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    h = params["embed"][input_ids]                        # [B, S, d]
    # T5 attention has no 1/sqrt(d_kv) scaling (folded into init).
    mask_bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9
    buckets = jnp.asarray(relative_position_buckets(
        S, S, cfg.rel_buckets, cfg.rel_max_distance))     # [S, S]

    H, dk = cfg.heads, cfg.d_kv

    def block(h, p):
        x = rms_norm(h, p["ln1"], eps=cfg.eps)
        q = (x @ p["q"]).reshape(B, S, H, dk)
        k = (x @ p["k"]).reshape(B, S, H, dk)
        v = (x @ p["v"]).reshape(B, S, H, dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        bias = p["rel"][buckets]                          # [S, S, H]
        scores = scores + bias.transpose(2, 0, 1)[None].astype(jnp.float32)
        scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, H * dk)
        h = h + attn @ p["o"]
        x = rms_norm(h, p["ln2"], eps=cfg.eps)
        ff = jax.nn.gelu(x @ p["wi0"], approximate=True) * (x @ p["wi1"])
        h = h + ff @ p["wo"]
        return h, None

    h, _ = jax.lax.scan(block, h, params["blocks"])
    h = rms_norm(h, params["final_ln"], eps=cfg.eps)
    return h * attention_mask[..., None].astype(h.dtype)


# --------------------------------------------------------------------------
# Weight conversion
# --------------------------------------------------------------------------

def convert_umt5_state_dict(sd: Dict[str, np.ndarray], cfg: UMT5Config) -> dict:
    """Map a torch UMT5 encoder state dict onto `init_umt5_params`' tree.

    Two key layouts:
      * HF ``transformers.UMT5EncoderModel`` (``google/umt5-xxl``, the
        ``text_encoder/`` of Wan diffusers repos): ``shared.weight``,
        ``encoder.block.N.layer.0.SelfAttention.{q,k,v,o,
        relative_attention_bias}``, ``layer.1.DenseReluDense.{wi_0,wi_1,wo}``.
      * wan-package native (sniffed on ``token_embedding.weight``; layout
        from the public Wan2.1 sources — UNVERIFIED in this zero-egress
        image): ``blocks.N.{norm1,norm2}``, ``blocks.N.attn.{q,k,v,o}``,
        ``blocks.N.pos_embedding.embedding``, ``blocks.N.ffn.{gate.0,fc1,fc2}``
        where ``gate.0`` is the GELU-activated half (= HF ``wi_0``).
    """
    L = cfg.layers
    get = lambda k: np.asarray(sd[k], np.float32)

    def stack(fmt, transpose=False):
        ws = [get(fmt.format(i)) for i in range(L)]
        if transpose:
            ws = [w.T for w in ws]
        return jnp.asarray(np.stack(ws))

    if "token_embedding.weight" in sd:      # wan-package native naming
        return {
            "embed": jnp.asarray(get("token_embedding.weight")),
            "blocks": {
                "ln1": stack("blocks.{}.norm1.weight"),
                "q": stack("blocks.{}.attn.q.weight", transpose=True),
                "k": stack("blocks.{}.attn.k.weight", transpose=True),
                "v": stack("blocks.{}.attn.v.weight", transpose=True),
                "o": stack("blocks.{}.attn.o.weight", transpose=True),
                "rel": stack("blocks.{}.pos_embedding.embedding.weight"),
                "ln2": stack("blocks.{}.norm2.weight"),
                "wi0": stack("blocks.{}.ffn.gate.0.weight", transpose=True),
                "wi1": stack("blocks.{}.ffn.fc1.weight", transpose=True),
                "wo": stack("blocks.{}.ffn.fc2.weight", transpose=True),
            },
            "final_ln": jnp.asarray(get("norm.weight")),
        }

    base = "encoder.block.{}.layer."
    return {
        "embed": jnp.asarray(get("shared.weight")),
        "blocks": {
            "ln1": stack(base + "0.layer_norm.weight"),
            "q": stack(base + "0.SelfAttention.q.weight", transpose=True),
            "k": stack(base + "0.SelfAttention.k.weight", transpose=True),
            "v": stack(base + "0.SelfAttention.v.weight", transpose=True),
            "o": stack(base + "0.SelfAttention.o.weight", transpose=True),
            "rel": stack(base + "0.SelfAttention.relative_attention_bias.weight"),
            "ln2": stack(base + "1.layer_norm.weight"),
            "wi0": stack(base + "1.DenseReluDense.wi_0.weight", transpose=True),
            "wi1": stack(base + "1.DenseReluDense.wi_1.weight", transpose=True),
            "wo": stack(base + "1.DenseReluDense.wo.weight", transpose=True),
        },
        "final_ln": jnp.asarray(get("encoder.final_layer_norm.weight")),
    }


def sniff_umt5_config(sd: Dict[str, np.ndarray],
                      config_json: Optional[dict] = None) -> UMT5Config:
    """Build a UMT5Config from a checkpoint's config.json, cross-checked (or
    filled in) from weight shapes — first contact with real files should be a
    load, not a debugging session."""
    kw: dict = {}
    if config_json:
        for src, dst in [("vocab_size", "vocab_size"), ("d_model", "d_model"),
                         ("d_kv", "d_kv"), ("d_ff", "d_ff"),
                         ("num_layers", "layers"), ("num_heads", "heads"),
                         ("relative_attention_num_buckets", "rel_buckets"),
                         ("relative_attention_max_distance", "rel_max_distance")]:
            if src in config_json:
                kw[dst] = int(config_json[src])
    hf = "shared.weight" in sd
    emb_key = "shared.weight" if hf else "token_embedding.weight"
    if emb_key in sd:
        kw["vocab_size"], kw["d_model"] = map(int, np.shape(sd[emb_key]))
    rel0 = ("encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
            if hf else "blocks.0.pos_embedding.embedding.weight")
    if rel0 in sd:
        kw["rel_buckets"], kw["heads"] = map(int, np.shape(sd[rel0]))
    q0 = ("encoder.block.0.layer.0.SelfAttention.q.weight" if hf
          else "blocks.0.attn.q.weight")
    if q0 in sd and "heads" in kw:
        kw["d_kv"] = int(np.shape(sd[q0])[0]) // kw["heads"]
    ff0 = ("encoder.block.0.layer.1.DenseReluDense.wo.weight" if hf
           else "blocks.0.ffn.fc2.weight")
    if ff0 in sd:
        kw["d_ff"] = int(np.shape(sd[ff0])[1])
    pat = ("encoder.block.{}.layer.0.layer_norm.weight" if hf
           else "blocks.{}.norm1.weight")
    n = 0
    while pat.format(n) in sd:
        n += 1
    if n:
        kw["layers"] = n
    return UMT5Config(**kw)


def _load_state_dict_any(path: str) -> Dict[str, np.ndarray]:
    """Load a UMT5 state dict from safetensors (HF dirs) **or** torch .pth —
    the wan package ships the encoder as ``models_t5_umt5-xxl-enc-bf16.pth``
    inside ``--ckpt_dir``. When the dir holds several .pth files (DiT, VAE,
    CLIP live next to it), the ``*umt5*`` one is picked."""
    import glob
    import os

    if os.path.isdir(path):
        # a wan ckpt_dir holds the DiT as safetensors NEXT TO the umt5 .pth,
        # so the *umt5* name wins over the safetensors branch — otherwise the
        # DiT weights would load and conversion would KeyError on
        # shared.weight / token_embedding.weight
        named = sorted(glob.glob(os.path.join(path, "*umt5*.pth")))
        if named:
            path = named[0]
        elif glob.glob(os.path.join(path, "*.safetensors")):
            from magcache_tpu.models.convert import load_safetensors_dir
            return load_safetensors_dir(path)
        else:
            pths = sorted(glob.glob(os.path.join(path, "*.pth")))
            assert pths, f"no safetensors or .pth under {path}"
            path = pths[0]
    if path.endswith((".pth", ".pt", ".bin")):
        from magcache_tpu.models.convert import _torch_load_flat
        return _torch_load_flat(path)
    from magcache_tpu.models.convert import load_safetensors_dir
    return load_safetensors_dir(path)


def load_umt5_encoder(path: str):
    """Load a UMT5 encoder checkpoint (HF dir, wan ckpt_dir, or a single
    weights file) -> (cfg, params)."""
    import json
    import os

    sd = _load_state_dict_any(path)
    cfg_json = None
    base = path if os.path.isdir(path) else os.path.dirname(path)
    cj = os.path.join(base, "config.json")
    if os.path.exists(cj):
        with open(cj) as f:
            cfg_json = json.load(f)
    cfg = sniff_umt5_config(sd, cfg_json)
    return cfg, convert_umt5_state_dict(sd, cfg)


class UMT5Encoder:
    """Prompt -> [B, L, d] encoder with the `JaxT5Encoder` interface
    (tokenize to a fixed ``seq_len``, jitted encode, optional tp-sharded
    weights via the mesh's Megatron specs)."""

    def __init__(self, path_or_config, seq_len: int = 512, mesh=None,
                 tokenizer=None):
        if isinstance(path_or_config, str):
            self.cfg, params = load_umt5_encoder(path_or_config)
            if tokenizer is None:
                # best-effort: weights-only dirs still work via encode_ids.
                # wan ckpt_dirs keep the tokenizer under google/umt5-xxl/.
                import os
                base = (path_or_config if os.path.isdir(path_or_config)
                        else os.path.dirname(path_or_config))
                for cand in (base, os.path.join(base, "google", "umt5-xxl")):
                    try:
                        from transformers import AutoTokenizer
                        tokenizer = AutoTokenizer.from_pretrained(cand)
                        break
                    except Exception:
                        tokenizer = None
                if tokenizer is None:
                    # same degradation as JaxT5Encoder behind the shared
                    # make_t5_encoder entry point: weights-only dirs keep
                    # working for structural runs (loud warning inside)
                    from magcache_tpu.models.text import FallbackHashTokenizer
                    tokenizer = FallbackHashTokenizer(
                        self.cfg.vocab_size, eos_token_id=1, pad_token_id=0)
        else:
            self.cfg = path_or_config
            params = init_umt5_params(jax.random.PRNGKey(0), self.cfg)
        self.tokenizer = tokenizer
        self.seq_len = seq_len
        if mesh is not None:
            from magcache_tpu.parallel.mesh import shard_params
            params = shard_params(params, mesh)
        self.params = params
        cfg = self.cfg
        self._encode = jax.jit(
            lambda p, ids, m: umt5_encode(p, cfg, ids, m))

    def __call__(self, prompts: Sequence[str]) -> jnp.ndarray:
        assert self.tokenizer is not None, "tokenizer required for raw prompts"
        tok = self.tokenizer(list(prompts), padding="max_length",
                             truncation=True, max_length=self.seq_len,
                             return_tensors="np")
        return self._encode(self.params, jnp.asarray(tok["input_ids"]),
                            jnp.asarray(tok["attention_mask"]))

    def encode_ids(self, input_ids: np.ndarray,
                   attention_mask: Optional[np.ndarray] = None) -> jnp.ndarray:
        if attention_mask is None:
            attention_mask = np.ones_like(input_ids)
        return self._encode(self.params, jnp.asarray(input_ids),
                            jnp.asarray(attention_mask))
