"""Open-Sora VAE_Temporal (MAGVIT-style causal 3-D VAE), weight-mappable.

The temporal stage of the Open-Sora v1.2 composite VAE
(``videosys/models/autoencoders/autoencoder_kl_open_sora.py``: ``VAE_Temporal``
:379, ``VAE_Temporal_SD`` :474 — filters 128, mults (1,2,2,4), 4 res blocks
per level, temporal_downsample (False, True, True), GroupNorm(32), SiLU,
bias-free res convs). The published OpenSora-VAE-v1.2 checkpoint stores it
under the ``temporal_vae.`` prefix (``VideoAutoencoderPipeline`` :621-641;
the ``spatial_vae.module.`` prefix is a diffusers AutoencoderKL — see
`models.vae_sd`).

Layout here is NTHWC; causal convs ZERO-pad time at the front with
``(kt-1) + (1-stride_t)`` (ref CausalConv3d :89-124 — note the strided
downsample conv pads only 1 frame) so frame t never sees the future; encode
front-pads the clip to a multiple of the temporal factor and decode slices
those frames back off (:442-463).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.models.vae import _conv_params, _norm_params, conv3d, group_norm

__all__ = ["VAETemporalConfig", "VAETemporal", "init_vae_temporal_params",
           "convert_vae_temporal_state_dict", "load_vae_temporal_checkpoint"]


@dataclasses.dataclass(frozen=True)
class VAETemporalConfig:
    in_out_channels: int = 4
    latent_embed_dim: int = 4
    embed_dim: int = 4
    filters: int = 128
    num_res_blocks: int = 4
    channel_multipliers: Tuple[int, ...] = (1, 2, 2, 4)
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    groups: int = 32

    @property
    def time_factor(self):
        return 2 ** sum(self.temporal_downsample)

    def tiny(**kw):
        d = dict(filters=8, num_res_blocks=1, channel_multipliers=(1, 2),
                 temporal_downsample=(True,), groups=4)
        d.update(kw)
        return VAETemporalConfig(**d)

    tiny = staticmethod(tiny)


def _res_params(key, cin, cout):
    ks = jax.random.split(key, 3)
    p = {"norm1": _norm_params(cin),
         "conv1": {"w": _conv_params(ks[0], (3, 3, 3, cin, cout))["w"]},
         "norm2": _norm_params(cout),
         "conv2": {"w": _conv_params(ks[1], (3, 3, 3, cout, cout))["w"]}}
    if cin != cout:
        p["conv3"] = {"w": _conv_params(ks[2], (1, 1, 1, cin, cout))["w"]}
    return p


def init_vae_temporal_params(key: jax.Array, cfg: VAETemporalConfig):
    ks = iter(jax.random.split(key, 128))
    nxt = lambda: next(ks)
    nb = len(cfg.channel_multipliers)
    f0 = cfg.filters

    # encoder
    c = f0
    enc = {"conv_in": {"w": _conv_params(
        nxt(), (3, 3, 3, cfg.in_out_channels, f0))["w"]}}
    blocks = []
    for i, m in enumerate(cfg.channel_multipliers):
        f = f0 * m
        lv = {"res": [], "down": None}
        for _ in range(cfg.num_res_blocks):
            lv["res"].append(_res_params(nxt(), c, f))
            c = f
        if i < nb - 1 and cfg.temporal_downsample[i]:
            lv["down"] = _conv_params(nxt(), (3, 3, 3, c, f))
        blocks.append(lv)
    enc["blocks"] = blocks
    enc["res_blocks"] = [_res_params(nxt(), c, c)
                         for _ in range(cfg.num_res_blocks)]
    enc["norm1"] = _norm_params(c)
    enc["conv2"] = _conv_params(nxt(), (1, 1, 1, c, 2 * cfg.latent_embed_dim))

    # decoder
    c = f0 * cfg.channel_multipliers[-1]
    dec = {"conv1": _conv_params(nxt(), (3, 3, 3, cfg.latent_embed_dim, c)),
           "res_blocks": [_res_params(nxt(), c, c)
                          for _ in range(cfg.num_res_blocks)]}
    dblocks = [None] * nb
    for i in reversed(range(nb)):
        f = f0 * cfg.channel_multipliers[i]
        lv = {"res": [], "up": None}
        for _ in range(cfg.num_res_blocks):
            lv["res"].append(_res_params(nxt(), c, f))
            c = f
        if i > 0 and cfg.temporal_downsample[i - 1]:
            lv["up"] = _conv_params(nxt(), (3, 3, 3, c, c * 2))
        dblocks[i] = lv
    dec["blocks"] = dblocks
    dec["norm1"] = _norm_params(c)
    dec["conv_out"] = _conv_params(nxt(), (3, 3, 3, c, cfg.in_out_channels))

    return {"encoder": enc, "decoder": dec,
            "quant_conv": _conv_params(
                nxt(), (1, 1, 1, 2 * cfg.latent_embed_dim, 2 * cfg.embed_dim)),
            "post_quant_conv": _conv_params(
                nxt(), (1, 1, 1, cfg.embed_dim, cfg.latent_embed_dim))}


def _cconv(x, w, b=None, stride=(1, 1, 1)):
    """Reference CausalConv3d: zero time-front pad (kt-1)+(1-stride_t),
    symmetric spatial pad."""
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    tp = (kt - 1) + (1 - stride[0])
    x = jnp.pad(x, ((0, 0), (tp, 0), (kh // 2, kh // 2),
                    (kw // 2, kw // 2), (0, 0)))
    return conv3d(x, w, b, stride)


def _res(p, x, groups):
    h = jax.nn.silu(group_norm(x, p["norm1"]["w"], p["norm1"]["b"], groups))
    h = _cconv(h, p["conv1"]["w"])
    h = jax.nn.silu(group_norm(h, p["norm2"]["w"], p["norm2"]["b"], groups))
    h = _cconv(h, p["conv2"]["w"])
    if "conv3" in p:
        x = _cconv(x, p["conv3"]["w"])
    return x + h


class VAETemporal:
    """Encode pixels-latents over time only (spatial stride 1)."""

    # decode consumes a num_frames hint and FRONT-pads latents:
    # ceil(micro_frame / ds) latents per chunk (MicroFrameVAE keys its
    # chunking on this declared invariant, not signature sniffing)
    front_padded_latents = True

    def __init__(self, cfg: VAETemporalConfig, params):
        self.cfg = cfg
        self.params = params

    def encode(self, x):
        """x: [B, T, H, W, C] -> (mean, logvar) at T' = ceil(T / factor);
        the clip front-pads to a factor multiple (ref :442-448)."""
        cfg, p = self.cfg, self.params["encoder"]
        g = cfg.groups
        tf = cfg.time_factor
        pad = (tf - x.shape[1] % tf) % tf
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0), (0, 0), (0, 0)))
        h = _cconv(x, p["conv_in"]["w"])
        nb = len(cfg.channel_multipliers)
        for i in range(nb):
            lv = p["blocks"][i]
            for rp in lv["res"]:
                h = _res(rp, h, g)
            if i < nb - 1 and lv["down"] is not None:
                h = _cconv(h, lv["down"]["w"], lv["down"]["b"],
                                  stride=(2, 1, 1))
        for rp in p["res_blocks"]:
            h = _res(rp, h, g)
        h = jax.nn.silu(group_norm(h, p["norm1"]["w"], p["norm1"]["b"], g))
        h = _cconv(h, p["conv2"]["w"], p["conv2"]["b"])
        q = self.params["quant_conv"]
        h = _cconv(h, q["w"], q["b"])
        return jnp.split(h, 2, axis=-1)

    def decode(self, z, num_frames: Optional[int] = None):
        """z: [B, T', H, W, E] -> pixels [B, num_frames, H, W, C] (front
        padding frames sliced off, ref :454-463)."""
        cfg, p = self.cfg, self.params["decoder"]
        g = cfg.groups
        q = self.params["post_quant_conv"]
        z = _cconv(z, q["w"], q["b"])
        h = _cconv(z, p["conv1"]["w"], p["conv1"]["b"])
        for rp in p["res_blocks"]:
            h = _res(rp, h, g)
        nb = len(cfg.channel_multipliers)
        for i in reversed(range(nb)):
            lv = p["blocks"][i]
            for rp in lv["res"]:
                h = _res(rp, h, g)
            if i > 0 and lv["up"] is not None:
                h = _cconv(h, lv["up"]["w"], lv["up"]["b"])
                # depth-to-time: channels (C ts) -> frames (T ts)  (ref :367-374)
                b, t, hh, ww, c2 = h.shape
                h = h.reshape(b, t, hh, ww, c2 // 2, 2)
                h = h.transpose(0, 1, 5, 2, 3, 4).reshape(
                    b, t * 2, hh, ww, c2 // 2)
        h = jax.nn.silu(group_norm(h, p["norm1"]["w"], p["norm1"]["b"], g))
        h = _cconv(h, p["conv_out"]["w"], p["conv_out"]["b"])
        if num_frames is not None:
            h = h[:, h.shape[1] - num_frames:]
        return h


# --------------------------------------------------------------------------
# temporal_vae.* state-dict -> pytree
# --------------------------------------------------------------------------

def _ccv(sd, name):
    """CausalConv3d: torch [out, in, kt, kh, kw] -> TKHWIO-style [kt,kh,kw,in,out]."""
    w = np.asarray(sd[f"{name}.conv.weight"], np.float32).transpose(2, 3, 4, 1, 0)
    p = {"w": jnp.asarray(w)}
    if f"{name}.conv.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[f"{name}.conv.bias"], np.float32))
    return p


def _nmt(sd, name):
    return {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"], np.float32)),
            "b": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))}


def _res_cv(sd, base):
    p = {"norm1": _nmt(sd, f"{base}.norm1"), "conv1": _ccv(sd, f"{base}.conv1"),
         "norm2": _nmt(sd, f"{base}.norm2"), "conv2": _ccv(sd, f"{base}.conv2")}
    if f"{base}.conv3.conv.weight" in sd:
        p["conv3"] = _ccv(sd, f"{base}.conv3")
    return p


def convert_vae_temporal_state_dict(sd, cfg: VAETemporalConfig,
                                    prefix: str = "") -> dict:
    """Map a VAE_Temporal state dict (optionally under ``temporal_vae.``)
    onto `init_vae_temporal_params`' tree. Identity conv_blocks (levels
    without temporal downsample) have no checkpoint entries — torch indexes
    them anyway, so conv_blocks indices match level indices."""
    P = prefix
    nb = len(cfg.channel_multipliers)

    enc = {"conv_in": _ccv(sd, f"{P}encoder.conv_in"), "blocks": []}
    for i in range(nb):
        lv = {"res": [_res_cv(sd, f"{P}encoder.block_res_blocks.{i}.{j}")
                      for j in range(cfg.num_res_blocks)], "down": None}
        if f"{P}encoder.conv_blocks.{i}.conv.weight" in sd:
            lv["down"] = _ccv(sd, f"{P}encoder.conv_blocks.{i}")
        enc["blocks"].append(lv)
    enc["res_blocks"] = [_res_cv(sd, f"{P}encoder.res_blocks.{j}")
                         for j in range(cfg.num_res_blocks)]
    enc["norm1"] = _nmt(sd, f"{P}encoder.norm1")
    enc["conv2"] = _ccv(sd, f"{P}encoder.conv2")

    dec = {"conv1": _ccv(sd, f"{P}decoder.conv1"),
           "res_blocks": [_res_cv(sd, f"{P}decoder.res_blocks.{j}")
                          for j in range(cfg.num_res_blocks)],
           "blocks": []}
    for i in range(nb):
        lv = {"res": [_res_cv(sd, f"{P}decoder.block_res_blocks.{i}.{j}")
                      for j in range(cfg.num_res_blocks)], "up": None}
        if i > 0 and f"{P}decoder.conv_blocks.{i - 1}.conv.weight" in sd:
            lv["up"] = _ccv(sd, f"{P}decoder.conv_blocks.{i - 1}")
        dec["blocks"].append(lv)
    dec["norm1"] = _nmt(sd, f"{P}decoder.norm1")
    dec["conv_out"] = _ccv(sd, f"{P}decoder.conv_out")

    return {"encoder": enc, "decoder": dec,
            "quant_conv": _ccv(sd, f"{P}quant_conv"),
            "post_quant_conv": _ccv(sd, f"{P}post_quant_conv")}


def load_vae_temporal_checkpoint(path: str,
                                 cfg: Optional[VAETemporalConfig] = None,
                                 prefix: str = "temporal_vae."):
    from magcache_tpu.models.convert import load_safetensors_dir

    sd = load_safetensors_dir(path)
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""
    cfg = cfg or VAETemporalConfig()
    return cfg, convert_vae_temporal_state_dict(sd, cfg, prefix)


def load_open_sora_vae(path: str, micro_frame_size: int = 17):
    """Build the full Open-Sora v1.2 composite VAE from the published
    OpenSora-VAE-v1.2 checkpoint: `spatial_vae.module.*` (diffusers
    AutoencoderKL) + `temporal_vae.*` (VAE_Temporal) wrapped in the
    micro-frame pipeline (`VideoAutoencoderPipeline`, ref :621-700)."""
    from magcache_tpu.models.convert import load_safetensors_dir
    from magcache_tpu.models.vae import MicroFrameVAE
    from magcache_tpu.models.vae_sd import (
        SDVAE, SDVAEConfig, convert_sd_vae_state_dict)

    sd = load_safetensors_dir(path)
    sp = {k[len("spatial_vae.module."):]: v for k, v in sd.items()
          if k.startswith("spatial_vae.module.")}
    cout = sp["encoder.conv_out.weight"].shape[0]
    nlv = 1 + max(int(k.split(".")[2]) for k in sp
                  if k.startswith("encoder.down_blocks."))
    base = sp["encoder.conv_in.weight"].shape[0]
    mult = tuple(
        sp[f"encoder.down_blocks.{i}.resnets.0.conv2.weight"].shape[0] // base
        for i in range(nlv))
    bpl = 1 + max(int(k.split(".")[4]) for k in sp
                  if k.startswith("encoder.down_blocks.0.resnets."))
    sd_cfg = SDVAEConfig(z_channels=cout // 2, base=base, ch_mult=mult,
                         blocks_per_level=bpl,
                         quant_conv="quant_conv.weight" in sp)
    spatial = SDVAE(sd_cfg, convert_sd_vae_state_dict(sp, sd_cfg))
    t_cfg = VAETemporalConfig()
    temporal = VAETemporal(
        t_cfg, convert_vae_temporal_state_dict(sd, t_cfg, "temporal_vae."))
    return MicroFrameVAE(spatial, temporal, micro_frame_size=micro_frame_size)
