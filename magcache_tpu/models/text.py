"""Text encoders: pluggable prompt -> embedding stage.

The reference loads external T5/CLIP encoders (wan's T5EncoderModel, diffusers
pipelines' text encoders; VideoSys shards T5 with a ColossalAI policy,
``videosys/core/shardformer/t5/policy.py``). Here the encoder is a pluggable
callable so pipelines run with:

- `HFTextEncoder` — any HuggingFace encoder with local weights (transformers
  is in the image; weights must be on disk — zero-egress environment);
- `MockTextEncoder` — deterministic prompt-hashed gaussian embeddings for
  tests/benchmarks without checkpoints. Same prompt -> same embedding, so
  cached-vs-full comparisons are meaningful.
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Optional, Protocol, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class TextEncoder(Protocol):
    def __call__(self, prompts: Sequence[str]) -> jnp.ndarray: ...


@dataclasses.dataclass(frozen=True)
class MockTextEncoder:
    """Deterministic stand-in: seq_len x dim gaussian embeddings seeded by the
    prompt's sha256."""

    seq_len: int
    dim: int
    scale: float = 1.0

    def __call__(self, prompts: Sequence[str]) -> jnp.ndarray:
        outs = []
        for p in prompts:
            seed = int.from_bytes(hashlib.sha256(p.encode()).digest()[:4], "little")
            rng = np.random.default_rng(seed)
            outs.append(rng.normal(0, self.scale, (self.seq_len, self.dim)))
        return jnp.asarray(np.stack(outs), jnp.float32)


@dataclasses.dataclass(frozen=True)
class MockPooledEncoder:
    """CLIP-pooled stand-in: a single vector per prompt."""

    dim: int

    def __call__(self, prompts: Sequence[str]) -> jnp.ndarray:
        outs = []
        for p in prompts:
            seed = int.from_bytes(hashlib.sha256(p.encode()).digest()[4:8], "little")
            outs.append(np.random.default_rng(seed).normal(0, 1.0, (self.dim,)))
        return jnp.asarray(np.stack(outs), jnp.float32)


class JaxT5Encoder:
    """T5 text encoder running natively in JAX (FlaxT5EncoderModel), jitted and
    optionally weight-sharded over the mesh.

    The TPU equivalent of the reference's ColossalAI T5 shardformer policy
    (``videosys/core/shardformer/t5/policy.py``): instead of a layer-rewrite
    policy + fused-norm swap, the whole encoder jits onto the device and its
    weight matrices shard over the ``tp`` mesh axis via NamedShardings.
    """

    def __init__(self, path_or_config, seq_len: int = 512, mesh=None,
                 tokenizer=None):
        from transformers import AutoTokenizer, FlaxT5EncoderModel, T5Config

        if isinstance(path_or_config, str):
            self.model = FlaxT5EncoderModel.from_pretrained(path_or_config)
            self.tokenizer = tokenizer or AutoTokenizer.from_pretrained(path_or_config)
        else:
            # config-only init (tests / structural runs)
            self.model = FlaxT5EncoderModel(path_or_config)
            self.tokenizer = tokenizer
        self.seq_len = seq_len
        params = self.model.params
        if mesh is not None:
            from magcache_tpu.parallel.mesh import shard_params
            params = shard_params(params, mesh)
        self.params = params

        import jax as _jax

        def encode(params, input_ids, attention_mask):
            out = self.model(input_ids=input_ids,
                             attention_mask=attention_mask, params=params)
            return out.last_hidden_state * attention_mask[..., None]

        self._encode = _jax.jit(encode)

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


class HFTextEncoder:
    """Wrap a local HuggingFace encoder (e.g. T5EncoderModel) on CPU torch.

    Mirrors the reference's T5 usage: pad/truncate to ``seq_len`` and return
    the final hidden states. Weights must already exist at ``path``.
    """

    def __init__(self, path: str, seq_len: int = 512, device: str = "cpu"):
        import torch  # local import: torch-cpu is in the image
        from transformers import AutoModel, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(path)
        self.model = AutoModel.from_pretrained(path).to(device).eval()
        self.seq_len = seq_len
        self.device = device
        self._torch = torch

    def __call__(self, prompts: Sequence[str]) -> jnp.ndarray:
        torch = self._torch
        tok = self.tokenizer(list(prompts), padding="max_length",
                             truncation=True, max_length=self.seq_len,
                             return_tensors="pt").to(self.device)
        with torch.no_grad():
            out = self.model(**tok).last_hidden_state
        return jnp.asarray(out.float().cpu().numpy())
