"""Reference-similarity metrics: PSNR / SSIM / LPIPS.

The reference's de-facto correctness test compares cached-run videos against
full-compute "golden" videos frame by frame
(``eval/magcache/common_metrics/calculate_{psnr,ssim,lpips}.py``). Semantics
reproduced here:

- PSNR per frame on [0, 1] floats: ``20*log10(1/sqrt(mse))``;
- SSIM per frame per channel with an 11x11 gaussian window (sigma 1.5),
  C1=(0.01*255)^2, C2=(0.03*255)^2 on [0, 255] scale (``calculate_ssim.py:
  gaussian window + [5:-5] crop``);
- LPIPS with an AlexNet feature backbone (``calculate_lpips.py``: lpips.LPIPS
  (net='alex', spatial=True) averaged). Implemented natively: AlexNet conv
  stack in JAX + per-layer linear heads; load real LPIPS weights via
  `load_lpips_weights` (torch checkpoint -> pytree) when available, else
  random init (useful only for relative comparisons; flagged in the result).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["psnr", "ssim", "lpips_distance", "LPIPSModel", "load_lpips_weights"]


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    """Per-frame PSNR averaged (frames [T, H, W, C] or a single frame)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 3:
        a, b = a[None], b[None]
    vals = []
    for fa, fb in zip(a, b):
        mse = np.mean((fa - fb) ** 2)
        vals.append(100.0 if mse < 1e-10 else 20 * np.log10(max_val / np.sqrt(mse)))
    return float(np.mean(vals))


def _gaussian_window(size=11, sigma=1.5):
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def _ssim_frame(img1, img2):
    """Single-channel SSIM, [0,255] scale, 11x11 gaussian, valid-crop —
    mirrors calculate_ssim.py's cv2.filter2D + [5:-5] crop."""
    from scipy.signal import convolve2d  # scipy ships with the image

    win = _gaussian_window()
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mu1 = convolve2d(img1, win, mode="valid")
    mu2 = convolve2d(img2, win, mode="valid")
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = convolve2d(img1 * img1, win, mode="valid") - mu1_sq
    s2 = convolve2d(img2 * img2, win, mode="valid") - mu2_sq
    s12 = convolve2d(img1 * img2, win, mode="valid") - mu12
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return m.mean()


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Frames [T, H, W, C] in [0, 1]; per-frame per-channel SSIM averaged."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.ndim == 3:
        a, b = a[None], b[None]
    vals = []
    for fa, fb in zip(a * 255.0, b * 255.0):
        ch = [_ssim_frame(fa[..., c], fb[..., c]) for c in range(fa.shape[-1])]
        vals.append(np.mean(ch))
    return float(np.mean(vals))


# --------------------------------------------------------------------------
# LPIPS (AlexNet backbone)
# --------------------------------------------------------------------------

_ALEX_CHANNELS = (64, 192, 384, 256, 256)
_ALEX_SPECS = [  # (kernel, stride, pad, out_ch) per conv; pools between
    (11, 4, 2, 64), (5, 1, 2, 192), (3, 1, 1, 384), (3, 1, 1, 256), (3, 1, 1, 256)
]
# ImageNet normalization used by LPIPS' scaling layer
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@dataclasses.dataclass
class LPIPSModel:
    params: dict
    pretrained: bool = False

    @staticmethod
    def init(key: Optional[jax.Array] = None) -> "LPIPSModel":
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 16)
        params = {"convs": [], "lins": []}
        cin = 3
        for i, (k, s, p, cout) in enumerate(_ALEX_SPECS):
            w = jax.random.normal(ks[i], (k, k, cin, cout)) * float(
                1.0 / np.sqrt(k * k * cin))
            params["convs"].append({"w": w, "b": jnp.zeros((cout,))})
            cin = cout
        for i, c in enumerate(_ALEX_CHANNELS):
            params["lins"].append(
                jnp.abs(jax.random.normal(ks[8 + i], (c,))) / c)
        return LPIPSModel(params, pretrained=False)

    @staticmethod
    def from_torch_state_dict(sd) -> "LPIPSModel":
        """Map an `lpips.LPIPS(net='alex')` torch state dict onto the pytree.

        Keys: ``net.slice{1..5}.<idx>.weight`` (alexnet convs, OIHW) and
        ``lin{0..4}.model.1.weight`` ([1, C, 1, 1] nonneg heads).
        """
        convs, lins = [], []
        conv_keys = [k for k in sd if k.endswith(".weight") and "net." in k]
        conv_keys.sort(key=lambda k: (int(k.split("slice")[1].split(".")[0]),
                                      int(k.split(".")[2])))
        for k in conv_keys:
            w = np.asarray(sd[k])          # [O, I, H, W]
            b = np.asarray(sd[k[:-len("weight")] + "bias"])
            convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                          "b": jnp.asarray(b)})
        for i in range(5):
            lw = np.asarray(sd[f"lin{i}.model.1.weight"]).reshape(-1)
            lins.append(jnp.asarray(lw))
        return LPIPSModel({"convs": convs, "lins": lins}, pretrained=True)

    def features(self, x: jnp.ndarray):
        """x: [B, H, W, 3] in [-1, 1]. Returns the 5 relu feature maps."""
        h = (x - _SHIFT) / _SCALE
        feats = []
        for i, (k, s, p, cout) in enumerate(_ALEX_SPECS):
            h = jnp.pad(h, ((0, 0), (p, p), (p, p), (0, 0)))
            h = jax.lax.conv_general_dilated(
                h, self.params["convs"][i]["w"], (s, s), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jax.nn.relu(h + self.params["convs"][i]["b"])
            feats.append(h)
            if i in (0, 1):  # maxpool after conv1, conv2
                h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                          (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        return feats

    def distance(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Per-image LPIPS distance; a, b [B, H, W, 3] in [-1, 1]."""
        fa, fb = self.features(a), self.features(b)
        total = 0.0
        for f1, f2, lin in zip(fa, fb, self.params["lins"]):
            n1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=-1, keepdims=True), 1e-10)
            n2 = f2 / jnp.maximum(jnp.linalg.norm(f2, axis=-1, keepdims=True), 1e-10)
            diff = (n1 - n2) ** 2
            total = total + jnp.mean(jnp.sum(diff * lin, axis=-1), axis=(1, 2))
        return total


_DEFAULT_LPIPS: Optional[LPIPSModel] = None


def load_lpips_weights(path: str) -> LPIPSModel:
    """Install pretrained LPIPS weights as the process-default model.

    ``path``: a torch ``lpips.LPIPS(net='alex')`` checkpoint (.pt/.pth via
    torch.load, or .safetensors). The reference's eval loads the same weights
    through the lpips package (``common_metrics/calculate_lpips.py``).
    """
    global _DEFAULT_LPIPS
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = load_file(path)
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
    _DEFAULT_LPIPS = LPIPSModel.from_torch_state_dict(sd)
    return _DEFAULT_LPIPS


def lpips_distance(a: np.ndarray, b: np.ndarray,
                   model: Optional[LPIPSModel] = None,
                   allow_random_backbone: bool = False) -> float:
    """Frames [T, H, W, 3] in [0, 1]; mean LPIPS over frames.

    Without pretrained weights (`load_lpips_weights` /
    `LPIPSModel.from_torch_state_dict`) the backbone is RANDOM: the number is
    a relative similarity signal only and **cannot gate the LPIPS<=0.1
    quality target** — a loud warning fires unless
    ``allow_random_backbone=True`` acknowledges that explicitly.
    """
    global _DEFAULT_LPIPS
    if model is None:
        if _DEFAULT_LPIPS is None:
            _DEFAULT_LPIPS = LPIPSModel.init()
        model = _DEFAULT_LPIPS
    if not model.pretrained and not allow_random_backbone:
        import warnings
        warnings.warn(
            "lpips_distance: RANDOM AlexNet backbone (no pretrained weights "
            "loaded) — value is relative-only and must not be reported as "
            "LPIPS. Call eval.metrics.load_lpips_weights(path) first, or pass "
            "allow_random_backbone=True to acknowledge.",
            UserWarning, stacklevel=2)
    a = jnp.asarray(np.asarray(a, np.float32) * 2.0 - 1.0)
    b = jnp.asarray(np.asarray(b, np.float32) * 2.0 - 1.0)
    if a.ndim == 3:
        a, b = a[None], b[None]
    return float(jnp.mean(model.distance(a, b)))
