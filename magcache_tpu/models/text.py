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


class FallbackHashTokenizer:
    """Checkpoint-without-tokenizer-files stand-in: words hash into the
    model's vocab range, padded/EOS'd to ``max_length``. Deterministic, NOT a
    real tokenization — only for structural runs of converted weights when the
    dir lacks ``spiece.model``/``tokenizer.json``; real prompts need the real
    tokenizer. Construction prints a warning for that reason."""

    def __init__(self, vocab_size: int, eos_token_id: int = 1,
                 pad_token_id: int = 0):
        self.vocab_size, self.eos, self.pad = vocab_size, eos_token_id, pad_token_id
        print("WARNING: no tokenizer files found — falling back to a "
              "hash tokenizer (structural runs only; outputs are NOT "
              "prompt-faithful).")

    def __call__(self, texts, padding=None, truncation=None, max_length=77,
                 return_tensors=None):
        # hash into [2, vocab_size), stepping over eos/pad — ids must stay
        # in-table even when eos is the LAST vocab id (CLIP: eos=49407,
        # vocab=49408, where a "hash above eos" rule has an empty range)
        span = self.vocab_size - 2
        assert span >= 3, f"vocab_size {self.vocab_size} too small"

        def wid(w):
            v = 2 + (int.from_bytes(
                hashlib.sha256(w.encode()).digest()[:4], "little") % span)
            while v in (self.eos, self.pad):
                v = 2 + ((v - 1) % span)
            return v

        ids = np.full((len(texts), max_length), self.pad, np.int64)
        for i, t in enumerate(texts):
            toks = [wid(w) for w in t.split()][: max_length - 1]
            ids[i, :len(toks)] = toks
            ids[i, len(toks)] = self.eos
        return {"input_ids": ids,
                "attention_mask": (ids != self.pad).astype(np.int64)}


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
        from transformers import (AutoTokenizer, FlaxMT5EncoderModel,
                                  FlaxT5EncoderModel, MT5Config, T5Config)

        if isinstance(path_or_config, str):
            # mt5 checkpoints (Open-Sora-Plan v1.2's google/mt5-xxl,
            # pipeline_open_sora_plan.py:207,282) need the MT5 class so the
            # gated-act config fields load unmangled.
            import json as _json
            import os as _os
            model_type = None
            cj = _os.path.join(path_or_config, "config.json")
            if _os.path.exists(cj):
                with open(cj) as f:
                    model_type = _json.load(f).get("model_type")
            cls = FlaxMT5EncoderModel if model_type == "mt5" else FlaxT5EncoderModel
            try:
                self.model = cls.from_pretrained(path_or_config)
            except (OSError, EnvironmentError):
                # torch-only checkpoint dirs (the usual HF layout)
                self.model = cls.from_pretrained(path_or_config, from_pt=True)
            if tokenizer is None:
                try:
                    tokenizer = AutoTokenizer.from_pretrained(path_or_config)
                except Exception:
                    tokenizer = FallbackHashTokenizer(
                        self.model.config.vocab_size,
                        eos_token_id=self.model.config.eos_token_id or 1,
                        pad_token_id=self.model.config.pad_token_id or 0)
            self.tokenizer = tokenizer
        else:
            # config-only init (tests / structural runs)
            cls = (FlaxMT5EncoderModel if isinstance(path_or_config, MT5Config)
                   else FlaxT5EncoderModel)
            self.model = cls(path_or_config)
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


def make_t5_encoder(path_or_config, seq_len: int = 512, mesh=None,
                    tokenizer=None):
    """Route a T5-family checkpoint/config to the right encoder.

    Wan's real text stack is **umt5-xxl** (per-layer relative attention bias)
    — loading it through the classic-T5 `JaxT5Encoder` would silently apply
    only block 0's bias.  Detection: ``config.json`` ``model_type == "umt5"``
    (HF / Wan diffusers repos), or wan-package-native key names sniffed from
    the safetensors headers; everything else routes to `JaxT5Encoder`.
    """
    from magcache_tpu.models.umt5 import UMT5Config, UMT5Encoder

    if not isinstance(path_or_config, str):
        cls = (UMT5Encoder if isinstance(path_or_config, UMT5Config)
               else JaxT5Encoder)
        return cls(path_or_config, seq_len=seq_len, mesh=mesh,
                   tokenizer=tokenizer)

    import glob
    import json
    import os

    model_type = None
    cj = os.path.join(path_or_config, "config.json")
    if os.path.exists(cj):
        with open(cj) as f:
            model_type = json.load(f).get("model_type")
    is_umt5 = model_type == "umt5"
    if not is_umt5 and model_type not in ("t5", "mt5"):
        # wan ckpt_dirs ship the encoder as models_t5_umt5-xxl-enc-*.pth —
        # next to a config.json that describes the DiT (model_type "t2v"/
        # "i2v"/...), so the filename sniff must run for any non-T5
        # model_type, not only when config.json is absent
        cand = ([path_or_config] if path_or_config.endswith(".pth")
                else glob.glob(os.path.join(path_or_config, "*.pth")))
        is_umt5 = any("umt5" in os.path.basename(c) for c in cand)
    if model_type is None and not is_umt5:
        try:
            from safetensors import safe_open
            files = sorted(glob.glob(os.path.join(path_or_config,
                                                  "*.safetensors")))
            if not files and os.path.isfile(path_or_config):
                files = [path_or_config]
            for fname in files[:1]:
                with safe_open(fname, framework="numpy") as fp:
                    keys = set(fp.keys())
                is_umt5 = ("token_embedding.weight" in keys
                           or "blocks.0.pos_embedding.embedding.weight" in keys)
        except Exception:
            pass
    cls = UMT5Encoder if is_umt5 else JaxT5Encoder
    return cls(path_or_config, seq_len=seq_len, mesh=mesh, tokenizer=tokenizer)


# hyvideo's llava-llama prompt template for video description conditioning
# (hyvideo/constants.py PROMPT_TEMPLATE_ENCODE_VIDEO; magcache_sample_video.py
# conditions through it with crop_start=95 — the template prefix is removed
# from the hidden states before they reach the DiT).
HYVIDEO_PROMPT_TEMPLATE = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by "
    "detailing the following aspects: 1. The main content and theme of the "
    "video.2. The color, shape, size, texture, quantity, text, and spatial "
    "relationships of the objects.3. Actions, events, behaviors temporal "
    "relationships, physical movement changes of the objects.4. background "
    "environment, light, style and atmosphere.5. camera angles, movements, "
    "and transitions used in the video.<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>")
HYVIDEO_CROP_START = 95

# Qwen-Image's conditioning template (diffusers QwenImagePipeline: prompts
# ride a Qwen2.5-VL chat template; the encoder output drops the first
# ``drop_idx`` = 34 template-prefix tokens and takes the FINAL-NORMED last
# hidden state). The Edit variant's template embeds the reference image via
# the vision tower (``QwenVLTextEncoder`` below, drop_idx = 64).
QWEN_IMAGE_PROMPT_TEMPLATE = (
    "<|im_start|>system\nDescribe the image by detailing the color, shape, "
    "size, texture, quantity, text, spatial relationships of the objects "
    "and background:<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n"
    "<|im_start|>assistant\n")
QWEN_IMAGE_CROP_START = 34

# diffusers QwenImageEditPipeline template: the reference image rides the
# user turn through the Qwen2.5-VL vision tower.
QWEN_IMAGE_EDIT_PROMPT_TEMPLATE = (
    "<|im_start|>system\nDescribe the key features of the input image "
    "(color, shape, size, texture, objects, background), then explain how "
    "the user's text instruction should alter or modify the image. Generate "
    "a new image that meets the user's requirements while maintaining "
    "consistency with the original input where appropriate.<|im_end|>\n"
    "<|im_start|>user\n<|vision_start|><|image_pad|><|vision_end|>"
    "{}<|im_end|>\n<|im_start|>assistant\n")
QWEN_IMAGE_EDIT_CROP_START = 64


class ClipTextEncoder:
    """CLIP text tower running natively in JAX — the pooled-vector encoder of
    FLUX (diffusers CLIPTextModel ``pooler_output``) and HunyuanVideo/
    FramePack (hyvideo ``text_encoder_2``). Returns the pooled EOS-position
    vector per prompt; ``states=True`` returns the token states instead.

    ``path_or_config``: HF checkpoint dir (weights + tokenizer on disk) or a
    ``CLIPTextConfig`` for random-init structural runs/tests."""

    def __init__(self, path_or_config, seq_len: Optional[int] = None,
                 tokenizer=None, params=None, states: bool = False,
                 hidden_skip: int = 0, project: bool = False):
        from magcache_tpu.models.clip import (CLIPTextConfig,
                                              clip_text_forward,
                                              convert_clip_text_state_dict,
                                              init_clip_text_params)

        if isinstance(path_or_config, str):
            from transformers import AutoTokenizer

            from magcache_tpu.models.convert import load_safetensors_dir
            sd = load_safetensors_dir(path_or_config)
            import json
            import os
            with open(os.path.join(path_or_config, "config.json")) as f:
                hf = json.load(f)
            hf = hf.get("text_config", hf)
            self.cfg = CLIPTextConfig(
                vocab_size=hf["vocab_size"], dim=hf["hidden_size"],
                layers=hf["num_hidden_layers"],
                heads=hf["num_attention_heads"],
                mlp_ratio=hf["intermediate_size"] // hf["hidden_size"],
                max_len=hf["max_position_embeddings"],
                eos_token_id=hf.get("eos_token_id", 49407),
                quick_gelu=hf.get("hidden_act", "quick_gelu") == "quick_gelu")
            self.params = convert_clip_text_state_dict(sd, self.cfg)
            if tokenizer is None:
                try:
                    tokenizer = AutoTokenizer.from_pretrained(path_or_config)
                except Exception:
                    tokenizer = FallbackHashTokenizer(
                        self.cfg.vocab_size,
                        eos_token_id=self.cfg.eos_token_id)
            self.tokenizer = tokenizer
        else:
            self.cfg = path_or_config
            self.params = params if params is not None else (
                init_clip_text_params(jax.random.key(0), self.cfg))
            self.tokenizer = tokenizer
        self.seq_len = seq_len or self.cfg.max_len
        self.states = states
        self.project = project
        if project and "text_proj" not in self.params:
            raise ValueError(
                "project=True (the SD3/Vchitect text_embeds recipe) needs a "
                "CLIPTextModelWithProjection checkpoint carrying "
                "text_projection.weight; this one has none — the pooled "
                "vector would silently be the un-projected pooler_output")
        self._fwd = jax.jit(
            lambda p, ids, m: clip_text_forward(p, self.cfg, ids, m,
                                                hidden_skip=hidden_skip,
                                                project=project))

    def __call__(self, prompts: Sequence[str]) -> jnp.ndarray:
        assert self.tokenizer is not None, "tokenizer required for raw prompts"
        tok = self.tokenizer(list(prompts), padding="max_length",
                             truncation=True, max_length=self.seq_len,
                             return_tensors="np")
        h, pooled = self._fwd(self.params, jnp.asarray(tok["input_ids"]),
                              jnp.asarray(tok["attention_mask"]))
        return h if self.states else pooled

    def encode_ids(self, input_ids: np.ndarray, attention_mask=None):
        if attention_mask is None:
            attention_mask = np.ones_like(input_ids)
        return self._fwd(self.params, jnp.asarray(input_ids),
                         jnp.asarray(attention_mask))


class Sd3TextStack:
    """The SD3-lineage triple encoder Vchitect conditions on
    (``videosys/pipelines/vchitect/pipeline_vchitect.py``: CLIP-L +
    CLIP-bigG ``CLIPTextModelWithProjection`` + T5-XXL):

      context = concat_seq(pad_dim(concat_dim(clipL.h[-2], clipG.h[-2]),
                                   t5_dim), t5_states)
      pooled  = concat_dim(clipL.text_embeds, clipG.text_embeds)

    Exposes ``.context`` / ``.pooled`` callables matching the pipeline's
    (text_encoder, pooled_encoder) slots, with a one-entry memo so each
    prompt batch encodes once."""

    def __init__(self, clip_l: "ClipTextEncoder", clip_g: "ClipTextEncoder",
                 t5, t5_dim: Optional[int] = None):
        self.clip_l, self.clip_g, self.t5 = clip_l, clip_g, t5
        self.t5_dim = t5_dim
        self._memo: tuple = (None, None)

    def _encode(self, prompts: Sequence[str]):
        key = tuple(prompts)
        if self._memo[0] == key:
            return self._memo[1]
        t5_h = self.t5(list(prompts))
        t5_dim = self.t5_dim or t5_h.shape[-1]
        if self.clip_l.seq_len != self.clip_g.seq_len:
            raise ValueError(
                f"SD3 stack concatenates the two CLIP towers' penultimate "
                f"states on the channel axis, so their sequence lengths must "
                f"match: clip_l={self.clip_l.seq_len} "
                f"clip_g={self.clip_g.seq_len}")
        parts, pooled = [], []
        for enc in (self.clip_l, self.clip_g):
            tok = enc.tokenizer(list(prompts), padding="max_length",
                                truncation=True, max_length=enc.seq_len,
                                return_tensors="np")
            h, p = enc.encode_ids(tok["input_ids"], tok["attention_mask"])
            parts.append(h)
            pooled.append(p)
        clip_h = jnp.concatenate(parts, axis=-1)
        clip_h = jnp.pad(clip_h,
                         ((0, 0), (0, 0), (0, t5_dim - clip_h.shape[-1])))
        out = (jnp.concatenate([clip_h, t5_h], axis=1),
               jnp.concatenate(pooled, axis=-1))
        self._memo = (key, out)
        return out

    @property
    def context(self):
        return lambda prompts: self._encode(prompts)[0]

    @property
    def pooled(self):
        return lambda prompts: self._encode(prompts)[1]


class LlamaTextEncoder:
    """Llama-architecture LM as a text encoder — the hyvideo llava-llama
    conditioning stack (``magcache_sample_video.py`` text_encoder): prompts
    ride ``template``, the hidden state after ``layers - skip_layers`` blocks
    is taken, and the first ``crop_start`` (template-prefix) tokens are
    dropped. Output is zero-padded/truncated to ``out_len`` tokens with
    padding masked to zero (the DiT consumes fixed-shape context)."""

    def __init__(self, path_or_config, out_len: int = 256,
                 skip_layers: int = 2,
                 template: Optional[str] = HYVIDEO_PROMPT_TEMPLATE,
                 crop_start: int = HYVIDEO_CROP_START,
                 final_norm: Optional[bool] = None,
                 tokenizer=None, params=None):
        from magcache_tpu.models.llama import (LlamaConfig,
                                               convert_llama_state_dict,
                                               init_llama_params,
                                               llama_hidden_states)

        if isinstance(path_or_config, str):
            from transformers import AutoTokenizer

            from magcache_tpu.models.convert import load_safetensors_dir
            import json
            import os
            sd = load_safetensors_dir(path_or_config)
            with open(os.path.join(path_or_config, "config.json")) as f:
                hf = json.load(f)
            hf = hf.get("text_config", hf)
            # Qwen2-lineage checkpoints (Qwen2.5-VL text tower, Qwen-Image's
            # real encoder) carry q/k/v biases
            qkv_bias = (hf.get("attention_bias", False)
                        or hf.get("model_type", "") in
                        ("qwen2", "qwen2_vl", "qwen2_5_vl", "qwen2_5_vl_text"))
            self.cfg = LlamaConfig(
                vocab_size=hf["vocab_size"], hidden=hf["hidden_size"],
                layers=hf["num_hidden_layers"],
                heads=hf["num_attention_heads"],
                kv_heads=hf.get("num_key_value_heads",
                                hf["num_attention_heads"]),
                intermediate=hf["intermediate_size"],
                rope_theta=hf.get("rope_theta", 10000.0),
                eps=hf.get("rms_norm_eps", 1e-5), qkv_bias=qkv_bias)
            self.params = convert_llama_state_dict(sd, self.cfg)
            if tokenizer is None:
                try:
                    tokenizer = AutoTokenizer.from_pretrained(path_or_config)
                except Exception:
                    tokenizer = FallbackHashTokenizer(self.cfg.vocab_size)
            self.tokenizer = tokenizer
        else:
            self.cfg = path_or_config
            self.params = params if params is not None else (
                init_llama_params(jax.random.key(0), self.cfg))
            self.tokenizer = tokenizer
        self.out_len = out_len
        self.skip_layers = skip_layers
        self.template = template
        self.crop_start = crop_start if template else 0
        # hyvideo takes hidden_states[-(skip+1)] un-normed; the Qwen-Image
        # stack takes the final-normed last state (skip_layers == 0)
        if final_norm is None:
            final_norm = skip_layers == 0
        self._fwd = jax.jit(lambda p, ids, m: llama_hidden_states(
            p, self.cfg, ids, m, skip_layers=self.skip_layers,
            final_norm=final_norm))

    def __call__(self, prompts: Sequence[str]) -> jnp.ndarray:
        assert self.tokenizer is not None, "tokenizer required for raw prompts"
        texts = ([self.template.format(p) for p in prompts]
                 if self.template else list(prompts))
        tok = self.tokenizer(texts, padding="max_length", truncation=True,
                             max_length=self.out_len + self.crop_start,
                             return_tensors="np")
        h = self._fwd(self.params, jnp.asarray(tok["input_ids"]),
                      jnp.asarray(tok["attention_mask"]))
        mask = jnp.asarray(tok["attention_mask"])[..., None]
        h = (h * mask)[:, self.crop_start:self.crop_start + self.out_len]
        pad = self.out_len - h.shape[1]
        if pad > 0:
            h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        return h

    def encode_ids(self, input_ids: np.ndarray, attention_mask=None):
        if attention_mask is None:
            attention_mask = np.ones_like(input_ids)
        return self._fwd(self.params, jnp.asarray(input_ids),
                         jnp.asarray(attention_mask))


class QwenVLTextEncoder:
    """The full Qwen2.5-VL conditioning stack of Qwen-Image-Edit (diffusers
    ``QwenImageEditPipeline``): the reference image runs through the vision
    tower (``models/qwen_vl.py``), its merged tokens are spliced into the
    LM's embeddings at the ``<|image_pad|>`` positions, and the LM runs with
    3-axis M-RoPE position ids; the first ``drop_idx=64`` template tokens are
    cropped. Without an image (``set_image(None)``) it degrades to the
    text-only Qwen-Image recipe (drop_idx=34).

    Construction from a HF Qwen2.5-VL dir handles both checkpoint layouts:
    ``model.language_model./model.visual.`` (transformers >= 4.52 refactor)
    and ``model./visual.`` (original Qwen releases)."""

    def __init__(self, path_or_config, out_len: int = 256, tokenizer=None,
                 params=None, vision_params=None, vision_cfg=None,
                 mrope_section=(16, 24, 24),
                 image_token_id: int = 151655,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280):
        from magcache_tpu.models.llama import (LlamaConfig,
                                               convert_llama_state_dict,
                                               init_llama_params,
                                               llama_hidden_states)
        from magcache_tpu.models.qwen_vl import (
            QwenVLVisionConfig, convert_qwen_vl_vision_state_dict,
            init_qwen_vl_vision_params, mrope_position_ids,
            preprocess_qwen_vl_image, qwen_vl_vision_forward)

        self._llama_hidden_states = llama_hidden_states
        self._vision_forward = qwen_vl_vision_forward
        self._mrope_position_ids = mrope_position_ids
        self._preprocess = preprocess_qwen_vl_image

        if isinstance(path_or_config, str):
            import json
            import os

            from transformers import AutoTokenizer

            from magcache_tpu.models.convert import load_safetensors_dir
            sd = load_safetensors_dir(path_or_config)
            with open(os.path.join(path_or_config, "config.json")) as f:
                hf = json.load(f)
            txt = hf.get("text_config", hf)
            vis = hf.get("vision_config", {})
            rs = txt.get("rope_scaling") or {}
            self.mrope_section = tuple(rs.get("mrope_section", mrope_section))
            self.image_token_id = hf.get("image_token_id", image_token_id)
            # split the state dict into LM and visual halves
            lm_sd, vi_sd = {}, {}
            for k, v in sd.items():
                k2 = k[len("model."):] if k.startswith("model.") else k
                if k2.startswith("visual."):
                    vi_sd[k2[len("visual."):]] = v
                elif k2.startswith("language_model."):
                    lm_sd[k2[len("language_model."):]] = v
                else:
                    lm_sd[k2] = v
            self.cfg = LlamaConfig(
                vocab_size=txt["vocab_size"], hidden=txt["hidden_size"],
                layers=txt["num_hidden_layers"],
                heads=txt["num_attention_heads"],
                kv_heads=txt.get("num_key_value_heads",
                                 txt["num_attention_heads"]),
                intermediate=txt["intermediate_size"],
                rope_theta=txt.get("rope_theta", 1e6),
                eps=txt.get("rms_norm_eps", 1e-6), qkv_bias=True)
            self.params = convert_llama_state_dict(lm_sd, self.cfg)
            self.vision_cfg = QwenVLVisionConfig(
                depth=vis.get("depth", 32),
                hidden=vis.get("hidden_size", 1280),
                heads=vis.get("num_heads", 16),
                intermediate=vis.get("intermediate_size", 3420),
                out_hidden=vis.get("out_hidden_size", txt["hidden_size"]),
                patch_size=vis.get("patch_size", 14),
                temporal_patch_size=vis.get("temporal_patch_size", 2),
                merge_size=vis.get("spatial_merge_size", 2),
                window_size=vis.get("window_size", 112),
                fullatt_indexes=tuple(vis.get("fullatt_block_indexes",
                                              (7, 15, 23, 31))))
            self.vision_params = convert_qwen_vl_vision_state_dict(
                vi_sd, self.vision_cfg)
            if tokenizer is None:
                try:
                    tokenizer = AutoTokenizer.from_pretrained(path_or_config)
                except Exception:
                    tokenizer = FallbackHashTokenizer(self.cfg.vocab_size)
            self.tokenizer = tokenizer
        else:
            self.cfg = path_or_config
            self.params = params if params is not None else (
                init_llama_params(jax.random.key(0), self.cfg))
            self.vision_cfg = vision_cfg or QwenVLVisionConfig.tiny(
                out_hidden=self.cfg.hidden)
            self.vision_params = (vision_params if vision_params is not None
                                  else init_qwen_vl_vision_params(
                                      jax.random.key(1), self.vision_cfg))
            self.mrope_section = tuple(mrope_section)
            self.image_token_id = image_token_id
            self.tokenizer = tokenizer
        self.out_len = out_len
        self.min_pixels, self.max_pixels = min_pixels, max_pixels
        self._image = None

        def fwd(p, ids, m, ov, ov_mask, pos):
            return self._llama_hidden_states(
                p, self.cfg, ids, m, final_norm=True, embeds_override=ov,
                override_mask=ov_mask, position_ids=pos,
                mrope_section=self.mrope_section)

        self._fwd_vl = jax.jit(fwd)
        self._fwd_txt = jax.jit(lambda p, ids, m: self._llama_hidden_states(
            p, self.cfg, ids, m, final_norm=True))

    def set_image(self, image) -> "QwenVLTextEncoder":
        """Attach the Edit reference image (HWC uint8/float RGB numpy) for
        subsequent ``__call__``s; ``None`` reverts to text-only encoding."""
        self._image = image
        return self

    def __call__(self, prompts: Sequence[str]) -> jnp.ndarray:
        assert self.tokenizer is not None, "tokenizer required"
        if self._image is None:
            texts = [QWEN_IMAGE_PROMPT_TEMPLATE.format(p) for p in prompts]
            crop = QWEN_IMAGE_CROP_START
            tok = self.tokenizer(texts, padding="max_length", truncation=True,
                                 max_length=self.out_len + crop,
                                 return_tensors="np")
            h = self._fwd_txt(self.params, jnp.asarray(tok["input_ids"]),
                              jnp.asarray(tok["attention_mask"]))
            mask = jnp.asarray(tok["attention_mask"])[..., None]
        else:
            patches, grid = self._preprocess(np.asarray(self._image),
                                             self.vision_cfg,
                                             min_pixels=self.min_pixels,
                                             max_pixels=self.max_pixels)
            img_embeds = self._vision_forward(
                self.vision_params, self.vision_cfg, jnp.asarray(patches),
                (grid,))
            n_merged = img_embeds.shape[0]
            crop = QWEN_IMAGE_EDIT_CROP_START
            pad_tok = "<|image_pad|>"
            # expand the placeholder in the TEMPLATE before the prompt is
            # substituted — a literal "<|image_pad|>" inside the user prompt
            # must not become extra vision-splice positions
            template = QWEN_IMAGE_EDIT_PROMPT_TEMPLATE.replace(
                pad_tok, pad_tok * n_merged)
            texts = [template.format(p) for p in prompts]
            tok = self.tokenizer(
                texts, padding="max_length", truncation=True,
                max_length=self.out_len + crop, return_tensors="np")
            ids = np.asarray(tok["input_ids"])
            am = np.asarray(tok["attention_mask"])
            ov_mask = ids == self.image_token_id
            if int(ov_mask[0].sum()) > n_merged:
                raise ValueError(
                    f"prompt contains the reserved {pad_tok} token "
                    f"({int(ov_mask[0].sum())} image positions for "
                    f"{n_merged} vision embeddings)")
            if 0 < ov_mask[0].sum() < n_merged:
                raise ValueError(
                    f"image occupies {n_merged} tokens but only "
                    f"{int(ov_mask[0].sum())} fit in txt_len={self.out_len}; "
                    "raise txt_len or lower max_pixels")
            ov = np.zeros(ids.shape + (self.cfg.hidden,), np.float32)
            emb = np.asarray(img_embeds)
            for b in range(ids.shape[0]):
                ov[b, ov_mask[b]] = emb[:ov_mask[b].sum()]
            pos = self._mrope_position_ids(
                ids, (grid,) * ids.shape[0], self.vision_cfg.merge_size,
                self.image_token_id, am)
            h = self._fwd_vl(self.params, jnp.asarray(ids), jnp.asarray(am),
                             jnp.asarray(ov), jnp.asarray(ov_mask),
                             jnp.asarray(pos))
            mask = jnp.asarray(am)[..., None]
        h = (h * mask)[:, crop:crop + self.out_len]
        pad = self.out_len - h.shape[1]
        if pad > 0:
            h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        return h


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
