"""LoRA adapter merging for published checkpoints.

The reference exposes LoRA on two surfaces: OmniGen2's
``--transformer_lora_path`` loads adapter weights through diffusers
(``MagCache4OmniGen2/inference.py:36,204-206``), and the FLUX adapter's
patched forward carries the PEFT ``lora_scale`` runtime re-scaling
boilerplate (``MagCache4FLUX/magcache_flux.py:62-75``). Under XLA the
idiomatic translation is a **host-side merge**: fold ``scale * B @ A`` into
the base weights once, before conversion and jit — the compiled program sees
one dense matmul per layer, identical speed to the un-adapted model (PEFT's
runtime layer patching would force a second matmul per projection per step).

Supported key conventions (both produced by diffusers/PEFT exporters):
  - PEFT:  ``{base}.lora_A.weight`` [r, in], ``{base}.lora_B.weight``
    [out, r], optional ``{base}.alpha`` scalar (delta scaled by alpha/r)
  - kohya: ``{base}.lora_down.weight`` / ``{base}.lora_up.weight``
Leading ``transformer.`` / ``diffusion_model.`` prefixes are stripped so
adapters exported against the diffusers pipeline match the raw transformer
state dict keys.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

_PREFIXES = ("transformer.", "diffusion_model.", "model.")
_DOWN_TAGS = (".lora_A.weight", ".lora_down.weight")
_UP_TAGS = (".lora_B.weight", ".lora_up.weight")


def load_lora_file(path: str) -> Dict[str, np.ndarray]:
    """Read a LoRA adapter file (.safetensors / torch .pt|.bin / a directory
    containing one) into a flat numpy dict."""
    if os.path.isdir(path):
        cands = [f for f in sorted(os.listdir(path))
                 if f.endswith((".safetensors", ".pt", ".bin"))]
        assert cands, f"no adapter weights found under {path}"
        path = os.path.join(path, cands[0])
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = np.asarray(f.get_tensor(k))
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: np.asarray(v.float().numpy()) if hasattr(v, "numpy") else
            np.asarray(v) for k, v in sd.items()}


def _strip(key: str) -> str:
    for p in _PREFIXES:
        if key.startswith(p):
            return key[len(p):]
    return key


def merge_lora_state_dict(sd: Dict[str, np.ndarray],
                          lora_sd: Dict[str, np.ndarray],
                          scale: float = 1.0,
                          strict: bool = True,
                          ) -> Tuple[Dict[str, np.ndarray], int]:
    """Fold ``scale * (alpha/r) * B @ A`` into the matching base weights.

    ``sd`` is the raw torch-layout state dict (as fed to the
    ``convert_*_state_dict`` functions); returns (merged copy, #layers
    merged). Unknown base keys raise under ``strict`` (a silently ignored
    adapter is worse than an error), else are skipped.
    """
    lora = {_strip(k): np.asarray(v, np.float32) for k, v in lora_sd.items()}
    downs = {}
    for k in lora:
        for tag in _DOWN_TAGS:
            if k.endswith(tag):
                downs[k[: -len(tag)]] = k
    assert downs, "no lora_A/lora_down keys found in the adapter"

    merged = dict(sd)
    missing, n = [], 0
    for base, dk in sorted(downs.items()):
        uk = next((base + tag for tag in _UP_TAGS if base + tag in lora),
                  None)
        assert uk is not None, f"lora up-projection missing for {base}"
        down, up = lora[dk], lora[uk]              # [r, in], [out, r]
        r = down.shape[0]
        alpha = lora.get(base + ".alpha")
        eff = scale * (float(alpha) / r if alpha is not None else 1.0)
        wk = base + ".weight"
        if wk not in merged:
            missing.append(wk)
            continue
        w = np.asarray(merged[wk])
        assert w.shape == (up.shape[0], down.shape[1]), (
            f"lora shapes {up.shape}x{down.shape} do not match base "
            f"{wk} {w.shape}")
        merged[wk] = (w.astype(np.float32) + eff * (up @ down)).astype(w.dtype)
        n += 1
    if missing and strict:
        raise KeyError(
            f"LoRA adapter targets {len(missing)} keys absent from the "
            f"checkpoint (first: {missing[:3]}); pass strict=False to skip")
    return merged, n
