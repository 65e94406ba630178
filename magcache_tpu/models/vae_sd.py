"""SD-lineage image VAE (diffusers ``AutoencoderKL``), weight-mappable.

Every image-family pipeline in the reference decodes through this exact
architecture from published checkpoints — FLUX/FLUX-Kontext (z=16, no quant
convs, shift factor: ``MagCache4FLUX/magcache_flux.py`` via
``DiffusionPipeline.from_pretrained``), Qwen-Image, Latte (sd-vae-ft-mse,
z=4: ``videosys/pipelines/latte/pipeline_latte.py:217``), Vchitect (SD3 VAE),
and Open-Sora's spatial stage. The compact ``vae.ImageVAE`` stays for
random-init tests; this module is the real-checkpoint path.

Faithful structure (diffusers `vae.py` Encoder/Decoder):
- encoder: conv_in -> per-level [2x ResnetBlock2D, Downsample2D(pad right/
  bottom, stride 2)] -> mid (resnet, single-head spatial attention, resnet)
  -> GN+silu -> conv_out (2*z) [-> quant_conv]
- decoder: [post_quant_conv ->] conv_in -> mid -> per-level [3x ResnetBlock2D,
  nearest-2x upsample + conv] -> GN+silu -> conv_out
All convs NHWC/HWIO for XLA; the mid attention is one [HW, C] matmul pair
(tiny vs the convs — no flash kernel needed).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.models.vae import _conv_params, _norm_params, conv2d, group_norm

__all__ = ["SDVAEConfig", "SDVAE", "init_sd_vae_params",
           "convert_sd_vae_state_dict", "load_sd_vae_checkpoint"]


@dataclasses.dataclass(frozen=True)
class SDVAEConfig:
    in_channels: int = 3
    z_channels: int = 4                 # 16 for FLUX/SD3-lineage
    base: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    blocks_per_level: int = 2
    groups: int = 32
    quant_conv: bool = True             # False for FLUX/SD3 checkpoints
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0           # FLUX: 0.1159

    @property
    def chs(self):
        return [self.base * m for m in self.ch_mult]

    @property
    def spatial_down(self):
        return 2 ** (len(self.ch_mult) - 1)

    def tiny(**kw):
        d = dict(base=8, ch_mult=(1, 2), blocks_per_level=1, z_channels=4,
                 groups=4)
        d.update(kw)
        return SDVAEConfig(**d)

    tiny = staticmethod(tiny)


def _res_params(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"norm1": _norm_params(cin), "conv1": _conv_params(k1, (3, 3, cin, cout)),
         "norm2": _norm_params(cout), "conv2": _conv_params(k2, (3, 3, cout, cout))}
    if cin != cout:
        p["shortcut"] = _conv_params(k3, (1, 1, cin, cout))
    return p


def _attn_params(key, c):
    ks = jax.random.split(key, 4)
    lin = lambda k: {"w": jax.random.normal(k, (c, c)) * 0.02,
                     "b": jnp.zeros((c,))}
    return {"norm": _norm_params(c), "q": lin(ks[0]), "k": lin(ks[1]),
            "v": lin(ks[2]), "o": lin(ks[3])}


def _mid_params(key, c):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"res1": _res_params(k1, c, c), "attn": _attn_params(k2, c),
            "res2": _res_params(k3, c, c)}


def init_sd_vae_params(key: jax.Array, cfg: SDVAEConfig):
    ks = iter(jax.random.split(key, 128))
    nxt = lambda: next(ks)
    chs = cfg.chs

    c = chs[0]
    enc = {"conv_in": _conv_params(nxt(), (3, 3, cfg.in_channels, c))}
    for li, ch in enumerate(chs):
        lv = {"res": [], "down": None}
        for _ in range(cfg.blocks_per_level):
            lv["res"].append(_res_params(nxt(), c, ch))
            c = ch
        if li < len(chs) - 1:
            lv["down"] = _conv_params(nxt(), (3, 3, c, c))
        enc[f"level{li}"] = lv
    enc["mid"] = _mid_params(nxt(), c)
    enc["norm_out"] = _norm_params(c)
    enc["conv_out"] = _conv_params(nxt(), (3, 3, c, 2 * cfg.z_channels))

    dec = {"conv_in": _conv_params(nxt(), (3, 3, cfg.z_channels, c)),
           "mid": _mid_params(nxt(), c)}
    for li, ch in enumerate(reversed(chs)):
        lv = {"res": [], "up": None}
        for _ in range(cfg.blocks_per_level + 1):
            lv["res"].append(_res_params(nxt(), c, ch))
            c = ch
        if li < len(chs) - 1:
            lv["up"] = _conv_params(nxt(), (3, 3, c, c))
        dec[f"level{li}"] = lv
    dec["norm_out"] = _norm_params(c)
    dec["conv_out"] = _conv_params(nxt(), (3, 3, c, cfg.in_channels))

    params = {"encoder": enc, "decoder": dec}
    if cfg.quant_conv:
        params["quant_conv"] = _conv_params(
            nxt(), (1, 1, 2 * cfg.z_channels, 2 * cfg.z_channels))
        params["post_quant_conv"] = _conv_params(
            nxt(), (1, 1, cfg.z_channels, cfg.z_channels))
    return params


def _res(p, x, groups):
    h = jax.nn.silu(group_norm(x, p["norm1"]["w"], p["norm1"]["b"], groups))
    h = conv2d(jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0))),
               p["conv1"]["w"], p["conv1"]["b"])
    h = jax.nn.silu(group_norm(h, p["norm2"]["w"], p["norm2"]["b"], groups))
    h = conv2d(jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0))),
               p["conv2"]["w"], p["conv2"]["b"])
    if "shortcut" in p:
        x = conv2d(x, p["shortcut"]["w"], p["shortcut"]["b"])
    return x + h


def _attn(p, x, groups):
    b, hh, ww, c = x.shape
    h = group_norm(x, p["norm"]["w"], p["norm"]["b"], groups)
    h = h.reshape(b, hh * ww, c)
    q = h @ p["q"]["w"].T + p["q"]["b"]
    k = h @ p["k"]["w"].T + p["k"]["b"]
    v = h @ p["v"]["w"].T + p["v"]["b"]
    # float(): a NumPy scalar is non-weak and would promote a bf16 h to f32,
    # poisoning every downstream conv's dtype (bf16 decode path)
    a = jax.nn.softmax((q @ k.transpose(0, 2, 1)) / float(np.sqrt(c)),
                       axis=-1)
    o = (a @ v) @ p["o"]["w"].T + p["o"]["b"]
    return x + o.reshape(b, hh, ww, c)


def _mid(p, x, groups):
    x = _res(p["res1"], x, groups)
    x = _attn(p["attn"], x, groups)
    return _res(p["res2"], x, groups)


class SDVAE:
    """Deterministic encode (returns mean, logvar) + decode, plus the
    reference's tiled decode memory cap."""

    def __init__(self, cfg: SDVAEConfig, params):
        self.cfg = cfg
        self.params = params

    def encode(self, x):
        cfg, p = self.cfg, self.params["encoder"]
        g = cfg.groups
        h = conv2d(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))),
                   p["conv_in"]["w"], p["conv_in"]["b"])
        for li in range(len(cfg.chs)):
            lv = p[f"level{li}"]
            for rp in lv["res"]:
                h = _res(rp, h, g)
            if lv["down"] is not None:
                # diffusers Downsample2D pads right/bottom only
                h = conv2d(jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0))),
                           lv["down"]["w"], lv["down"]["b"], stride=(2, 2))
        h = _mid(p["mid"], h, g)
        h = jax.nn.silu(group_norm(h, p["norm_out"]["w"], p["norm_out"]["b"], g))
        h = conv2d(jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0))),
                   p["conv_out"]["w"], p["conv_out"]["b"])
        if self.cfg.quant_conv:
            q = self.params["quant_conv"]
            h = conv2d(h, q["w"], q["b"])
        return jnp.split(h, 2, axis=-1)

    def to_latent(self, mean):
        return (mean - self.cfg.shift_factor) * self.cfg.scaling_factor

    def from_latent(self, z):
        return z / self.cfg.scaling_factor + self.cfg.shift_factor

    def decode(self, z):
        cfg, p = self.cfg, self.params["decoder"]
        g = cfg.groups
        if cfg.quant_conv:
            q = self.params["post_quant_conv"]
            z = conv2d(z, q["w"], q["b"])
        h = conv2d(jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0))),
                   p["conv_in"]["w"], p["conv_in"]["b"])
        h = _mid(p["mid"], h, g)
        for li in range(len(cfg.chs)):
            lv = p[f"level{li}"]
            for rp in lv["res"]:
                h = _res(rp, h, g)
            if lv["up"] is not None:
                b_, hh, ww, c = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)  # nearest 2x
                h = conv2d(jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0))),
                           lv["up"]["w"], lv["up"]["b"])
        h = jax.nn.silu(group_norm(h, p["norm_out"]["w"], p["norm_out"]["b"], g))
        return conv2d(jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0))),
                      p["conv_out"]["w"], p["conv_out"]["b"])

    def decode_tiled(self, z, tile: int = 64, overlap: int = 8):
        """Spatially tiled decode with linear overlap blending (diffusers
        `AutoencoderKL.tiled_decode` semantics — bounds peak HBM)."""
        b, zh, zw, _ = z.shape
        if zh <= tile and zw <= tile:
            return self.decode(z)
        scale = self.cfg.spatial_down
        step = tile - overlap
        out = weight = None
        for i0 in range(0, zh, step):
            for j0 in range(0, zw, step):
                yi = self.decode(z[:, i0:i0 + tile, j0:j0 + tile])
                ph, pw = yi.shape[1], yi.shape[2]
                if out is None:
                    out = jnp.zeros((b, zh * scale, zw * scale, yi.shape[-1]))
                    weight = jnp.zeros((1, zh * scale, zw * scale, 1))
                wy = np.ones((ph, pw), np.float32)
                ov = overlap * scale
                if ov > 0:
                    ramp = np.linspace(0, 1, ov, endpoint=False)
                    if i0 > 0:
                        wy[:ov] *= ramp[:, None]
                    if j0 > 0:
                        wy[:, :ov] *= ramp[None, :]
                wz = jnp.asarray(wy)[None, :, :, None]
                out = out.at[:, i0 * scale:i0 * scale + ph,
                             j0 * scale:j0 * scale + pw].add(yi * wz)
                weight = weight.at[:, i0 * scale:i0 * scale + ph,
                                   j0 * scale:j0 * scale + pw].add(wz)
        return out / jnp.maximum(weight, 1e-8)


# --------------------------------------------------------------------------
# diffusers AutoencoderKL state-dict -> SDVAE pytree
# --------------------------------------------------------------------------

def _cv(sd, name):
    # torch conv [out, in, kh, kw] -> HWIO
    w = np.asarray(sd[f"{name}.weight"], np.float32).transpose(2, 3, 1, 0)
    return {"w": jnp.asarray(w),
            "b": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))}


def _nm(sd, name):
    return {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"], np.float32)),
            "b": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))}


def _res_cv(sd, base):
    p = {"norm1": _nm(sd, f"{base}.norm1"), "conv1": _cv(sd, f"{base}.conv1"),
         "norm2": _nm(sd, f"{base}.norm2"), "conv2": _cv(sd, f"{base}.conv2")}
    if f"{base}.conv_shortcut.weight" in sd:
        p["shortcut"] = _cv(sd, f"{base}.conv_shortcut")
    return p


def _attn_cv(sd, base):
    def lin(n):
        w = np.asarray(sd[f"{base}.{n}.weight"], np.float32)
        if w.ndim == 4:  # very old checkpoints store 1x1 convs
            w = w[:, :, 0, 0]
        return {"w": jnp.asarray(w),
                "b": jnp.asarray(np.asarray(sd[f"{base}.{n}.bias"], np.float32))}

    return {"norm": _nm(sd, f"{base}.group_norm"), "q": lin("to_q"),
            "k": lin("to_k"), "v": lin("to_v"), "o": lin("to_out.0")}


def _mid_cv(sd, base):
    return {"res1": _res_cv(sd, f"{base}.resnets.0"),
            "attn": _attn_cv(sd, f"{base}.attentions.0"),
            "res2": _res_cv(sd, f"{base}.resnets.1")}


def convert_sd_vae_state_dict(sd, cfg: SDVAEConfig) -> dict:
    """Map a diffusers AutoencoderKL state dict (``encoder.down_blocks.*`` /
    ``decoder.up_blocks.*`` naming) onto `init_sd_vae_params`' tree."""
    nlv = len(cfg.ch_mult)
    enc = {"conv_in": _cv(sd, "encoder.conv_in"),
           "mid": _mid_cv(sd, "encoder.mid_block"),
           "norm_out": _nm(sd, "encoder.conv_norm_out"),
           "conv_out": _cv(sd, "encoder.conv_out")}
    for li in range(nlv):
        b = f"encoder.down_blocks.{li}"
        lv = {"res": [_res_cv(sd, f"{b}.resnets.{j}")
                      for j in range(cfg.blocks_per_level)],
              "down": None}
        if f"{b}.downsamplers.0.conv.weight" in sd:
            lv["down"] = _cv(sd, f"{b}.downsamplers.0.conv")
        enc[f"level{li}"] = lv

    dec = {"conv_in": _cv(sd, "decoder.conv_in"),
           "mid": _mid_cv(sd, "decoder.mid_block"),
           "norm_out": _nm(sd, "decoder.conv_norm_out"),
           "conv_out": _cv(sd, "decoder.conv_out")}
    for li in range(nlv):
        b = f"decoder.up_blocks.{li}"
        lv = {"res": [_res_cv(sd, f"{b}.resnets.{j}")
                      for j in range(cfg.blocks_per_level + 1)],
              "up": None}
        if f"{b}.upsamplers.0.conv.weight" in sd:
            lv["up"] = _cv(sd, f"{b}.upsamplers.0.conv")
        dec[f"level{li}"] = lv

    params = {"encoder": enc, "decoder": dec}
    if cfg.quant_conv:
        params["quant_conv"] = _cv(sd, "quant_conv")
        params["post_quant_conv"] = _cv(sd, "post_quant_conv")
    return params


def load_sd_vae_checkpoint(path: str, cfg: Optional[SDVAEConfig] = None):
    from magcache_tpu.models.convert import load_safetensors_dir

    sd = load_safetensors_dir(path)
    if cfg is None:
        cout = sd["encoder.conv_out.weight"].shape[0]
        nlv = 1 + max(int(k.split(".")[2]) for k in sd
                      if k.startswith("encoder.down_blocks."))
        base = sd["encoder.conv_in.weight"].shape[0]
        mult = tuple(
            sd[f"encoder.down_blocks.{i}.resnets.0.conv2.weight"].shape[0] // base
            for i in range(nlv))
        bpl = 1 + max(int(k.split(".")[4]) for k in sd
                      if k.startswith("encoder.down_blocks.0.resnets."))
        cfg = SDVAEConfig(z_channels=cout // 2, base=base, ch_mult=mult,
                          blocks_per_level=bpl,
                          quant_conv="quant_conv.weight" in sd)
    return cfg, convert_sd_vae_state_dict(sd, cfg)
