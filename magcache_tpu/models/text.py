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
