"""CogVideoX causal 3D VAE, TPU-native and weight-mappable.

Architecture + semantics from
``videosys/models/autoencoders/autoencoder_kl_cogvideox.py``:

- CausalConv3d (:60): temporal pad = replicate-FIRST-frame x (kt-1) (or the
  carried conv cache during frame-sliced streaming, :113-131), spatial zero
  pad k//2, stride applies to time only;
- Down/Upsample (modules/downsampling.py:6, upsampling.py:6): spatial via
  Conv2d stride 2 after asymmetric (0,1,0,1) pad / nearest x2 then Conv2d;
  temporal via avg-pool-2 with the odd-first-frame carve-out / nearest x2
  with the first frame upsampled spatially only;
- Encoder (:598): conv_in + 4 down blocks (3 GN resnets each; downsample on
  non-final blocks, compress_time on the first log2(4)=2) + mid (2 resnets)
  + GN norm_out + conv_out -> 2*z channels;
- Decoder (:732): conv_in + mid + 4 up blocks (4 spatial-norm resnets each;
  upsample on non-final, compress_time on the first 2) + SpatialNorm3D
  norm_out + conv_out; every decoder norm is CogVideoXSpatialNorm3D (:139)
  conditioned on the raw latent z (nearest-resized, first frame split);
- tiled_decode (:1162): overlapping spatial latent tiles, each decoded in
  frame slices with conv caches carried (exact streaming), then blend_v/
  blend_h linear seam blending and crop-concat.

Layout here is channel-last ``[B, T, H, W, C]`` (TPU-native); the converter
transposes the published OIDHW weights.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.models.vae import group_norm

__all__ = ["CogVideoXVAEConfig", "init_cogvideox_vae_params", "CogVideoXVAE",
           "convert_cogvideox_vae_state_dict"]


@dataclasses.dataclass(frozen=True)
class CogVideoXVAEConfig:
    in_channels: int = 3
    z_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    temporal_compression: int = 4
    groups: int = 32
    eps: float = 1e-6
    scaling_factor: float = 1.15258426   # config.scaling_factor (2b)
    # tiling (decode): latent tile side + overlap fraction
    tile_latent: int = 32
    tile_overlap: float = 0.25
    frame_batch: int = 2                 # num_latent_frames_batch_size

    @property
    def temporal_levels(self) -> int:
        return int(np.log2(self.temporal_compression))

    def tiny(**kw):
        d = dict(block_out_channels=(8, 16), layers_per_block=1,
                 z_channels=4, groups=4, temporal_compression=2,
                 tile_latent=4, tile_overlap=0.25)
        d.update(kw)
        return CogVideoXVAEConfig(**d)

    tiny = staticmethod(tiny)


# --------------------------------------------------------------------------
# primitive layers (channel-last)
# --------------------------------------------------------------------------

def _conv3d_p(key, kt, kh, kw, cin, cout):
    w = jax.random.normal(key, (kt, kh, kw, cin, cout), jnp.float32)
    w = w / np.sqrt(kt * kh * kw * cin)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _conv2d_p(key, kh, kw, cin, cout):
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
    w = w / np.sqrt(kh * kw * cin)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _gn_p(c):
    return {"w": jnp.ones((c,), jnp.float32), "b": jnp.zeros((c,), jnp.float32)}


def causal_conv3d_cog(x, p, *, tstride: int = 1,
                      cache: Optional[jnp.ndarray] = None):
    """CausalConv3d: replicate-first temporal pad (kt-1) — or the carried
    cache — spatial zero pad k//2, temporal-only stride. Returns
    (out, new_cache) where new_cache is the last (kt-1) input frames."""
    w, b = p["w"], p["b"]
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    if kt > 1:
        front = (jnp.repeat(x[:, :1], kt - 1, axis=1) if cache is None
                 else cache.astype(x.dtype))
        x = jnp.concatenate([front, x], axis=1)
    new_cache = x[:, x.shape[1] - (kt - 1):] if kt > 1 else None
    ph, pw = kh // 2, kw // 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(tstride, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + b, new_cache


def _conv2d_frames(x, p, *, stride: int = 1, asym_pad: bool = False):
    """Per-frame Conv2d over [B, T, H, W, C]."""
    b_, t, h, w_, c = x.shape
    x2 = x.reshape(b_ * t, h, w_, c)
    if asym_pad:
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        padding = "VALID"
    else:
        padding = "SAME"
    out = jax.lax.conv_general_dilated(
        x2, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]
    return out.reshape(b_, t, out.shape[1], out.shape[2], out.shape[3])


def _time_avgpool2(x):
    """compress_time downsample: odd frame counts keep frame 0 untouched and
    avg-pool the rest (downsampling.py:41-60)."""
    t = x.shape[1]
    if t % 2 == 1:
        first, rest = x[:, :1], x[:, 1:]
        if rest.shape[1] > 0:
            rest = (rest[:, 0::2] + rest[:, 1::2]) / 2.0
        return jnp.concatenate([first, rest], axis=1)
    return (x[:, 0::2] + x[:, 1::2]) / 2.0


def _nearest_x2(x, axes):
    for ax in axes:
        x = jnp.repeat(x, 2, axis=ax)
    return x


def _time_upsample2(x):
    """compress_time upsample: odd frame counts upsample frame 0 spatially
    only (upsampling.py:40-54)."""
    t = x.shape[1]
    if t > 1 and t % 2 == 1:
        first = _nearest_x2(x[:, :1], (2, 3))
        rest = _nearest_x2(x[:, 1:], (1, 2, 3))
        return jnp.concatenate([first, rest], axis=1)
    if t > 1:
        return _nearest_x2(x, (1, 2, 3))
    return _nearest_x2(x, (2, 3))


def _spatial_norm(f, zq, p, groups, eps, caches, name):
    """SpatialNorm3D: GN(f) * conv_y(zq~) + conv_b(zq~) with zq nearest-resized
    to f's grid, first frame resized separately when T is odd (:166-180)."""
    ft, fh, fw = f.shape[1:4]

    def resize(z, shape):
        return jax.image.resize(z, (z.shape[0],) + shape + (z.shape[-1],),
                                method="nearest")

    if f.shape[1] > 1 and f.shape[1] % 2 == 1:
        z_first = resize(zq[:, :1], (1, fh, fw))
        z_rest = resize(zq[:, 1:], (ft - 1, fh, fw))
        zq = jnp.concatenate([z_first, z_rest], axis=1)
    else:
        zq = resize(zq, (ft, fh, fw))
    y, caches[name + "/y"] = causal_conv3d_cog(zq, p["conv_y"],
                                               cache=caches.get(name + "/y"))
    bb, caches[name + "/b"] = causal_conv3d_cog(zq, p["conv_b"],
                                                cache=caches.get(name + "/b"))
    nf = group_norm(f, p["norm"]["w"], p["norm"]["b"], groups=groups, eps=eps)
    return nf * y + bb


# --------------------------------------------------------------------------
# parameter tree
# --------------------------------------------------------------------------

def _resnet_p(key, cin, cout, spatial_norm):
    ks = iter(jax.random.split(key, 8))
    p = {
        "conv1": _conv3d_p(next(ks), 3, 3, 3, cin, cout),
        "conv2": _conv3d_p(next(ks), 3, 3, 3, cout, cout),
    }
    if spatial_norm:
        zc = spatial_norm
        p["norm1"] = {"norm": _gn_p(cin), "conv_y": _conv3d_p(next(ks), 1, 1, 1, zc, cin),
                      "conv_b": _conv3d_p(next(ks), 1, 1, 1, zc, cin)}
        p["norm2"] = {"norm": _gn_p(cout), "conv_y": _conv3d_p(next(ks), 1, 1, 1, zc, cout),
                      "conv_b": _conv3d_p(next(ks), 1, 1, 1, zc, cout)}
    else:
        p["norm1"] = _gn_p(cin)
        p["norm2"] = _gn_p(cout)
    if cin != cout:
        p["shortcut"] = _conv3d_p(next(ks), 1, 1, 1, cin, cout)
    return p


def init_cogvideox_vae_params(key: jax.Array, cfg: CogVideoXVAEConfig):
    chs = list(cfg.block_out_channels)
    ks = iter(jax.random.split(key, 64))
    nxt = lambda: next(ks)

    enc = {"conv_in": _conv3d_p(nxt(), 3, 3, 3, cfg.in_channels, chs[0])}
    cin = chs[0]
    for i, cout in enumerate(chs):
        blk = {"resnets": [], "down": None}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(_resnet_p(nxt(), cin if j == 0 else cout,
                                            cout, None))
        if i < len(chs) - 1:
            blk["down"] = _conv2d_p(nxt(), 3, 3, cout, cout)
        enc[f"down{i}"] = blk
        cin = cout
    enc["mid"] = [_resnet_p(nxt(), chs[-1], chs[-1], None) for _ in range(2)]
    enc["norm_out"] = _gn_p(chs[-1])
    enc["conv_out"] = _conv3d_p(nxt(), 3, 3, 3, chs[-1], 2 * cfg.z_channels)

    rev = list(reversed(chs))
    zc = cfg.z_channels
    dec = {"conv_in": _conv3d_p(nxt(), 3, 3, 3, zc, rev[0])}
    dec["mid"] = [_resnet_p(nxt(), rev[0], rev[0], zc) for _ in range(2)]
    cin = rev[0]
    for i, cout in enumerate(rev):
        blk = {"resnets": [], "up": None}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"].append(_resnet_p(nxt(), cin if j == 0 else cout,
                                            cout, zc))
        if i < len(rev) - 1:
            blk["up"] = _conv2d_p(nxt(), 3, 3, cout, cout)
        dec[f"up{i}"] = blk
        cin = cout
    dec["norm_out"] = {"norm": _gn_p(rev[-1]),
                       "conv_y": _conv3d_p(nxt(), 1, 1, 1, zc, rev[-1]),
                       "conv_b": _conv3d_p(nxt(), 1, 1, 1, zc, rev[-1])}
    dec["conv_out"] = _conv3d_p(nxt(), 3, 3, 3, rev[-1], cfg.in_channels)
    return {"encoder": enc, "decoder": dec}


# --------------------------------------------------------------------------
# model
# --------------------------------------------------------------------------

class CogVideoXVAE:
    """encode: pixels [B, F, H, W, 3] -> (mean, logvar) [B, F_lat, h, w, z];
    decode / decode_tiled: latents -> pixels. Unscaled latents (apply
    cfg.scaling_factor at the pipeline boundary, like diffusers)."""

    def __init__(self, cfg: CogVideoXVAEConfig, params):
        self.cfg = cfg
        self.params = params
        self._jit_dec = jax.jit(lambda p, z: self._decode_core(p, z, {})[0])
        # streaming variant: conv caches ride as a pytree argument so each
        # (tile shape, slice length) pair compiles once instead of the whole
        # decoder dispatching op-by-op per frame slice
        self._jit_dec_stream = jax.jit(self._decode_core)
        self._jit_enc = jax.jit(self._encode_core)

    # -- resnet ------------------------------------------------------------
    def _resnet(self, p, x, zq, caches, name):
        cfg = self.cfg
        if zq is not None:
            h = _spatial_norm(x, zq, p["norm1"], cfg.groups, cfg.eps, caches,
                              name + "/n1")
        else:
            h = group_norm(x, p["norm1"]["w"], p["norm1"]["b"],
                           groups=cfg.groups, eps=cfg.eps)
        h = jax.nn.silu(h)
        h, caches[name + "/c1"] = causal_conv3d_cog(
            h, p["conv1"], cache=caches.get(name + "/c1"))
        if zq is not None:
            h = _spatial_norm(h, zq, p["norm2"], cfg.groups, cfg.eps, caches,
                              name + "/n2")
        else:
            h = group_norm(h, p["norm2"]["w"], p["norm2"]["b"],
                           groups=cfg.groups, eps=cfg.eps)
        h = jax.nn.silu(h)
        h, caches[name + "/c2"] = causal_conv3d_cog(
            h, p["conv2"], cache=caches.get(name + "/c2"))
        if "shortcut" in p:
            x, _ = causal_conv3d_cog(x, p["shortcut"])
        return x + h

    # -- encoder -----------------------------------------------------------
    def _encode_core(self, params, x):
        cfg, p = self.cfg, params["encoder"]
        caches: Dict = {}
        h, _ = causal_conv3d_cog(x, p["conv_in"])
        for i in range(len(cfg.block_out_channels)):
            blk = p[f"down{i}"]
            for j, rp in enumerate(blk["resnets"]):
                h = self._resnet(rp, h, None, caches, f"e{i}{j}")
            if blk["down"] is not None:
                if i < cfg.temporal_levels:
                    h = _time_avgpool2(h)
                h = _conv2d_frames(h, blk["down"], stride=2, asym_pad=True)
        for j, rp in enumerate(p["mid"]):
            h = self._resnet(rp, h, None, caches, f"em{j}")
        h = jax.nn.silu(group_norm(h, p["norm_out"]["w"], p["norm_out"]["b"],
                                   groups=cfg.groups, eps=cfg.eps))
        h, _ = causal_conv3d_cog(h, p["conv_out"])
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, logvar

    def encode(self, x):
        return self._jit_enc(self.params, x)

    # -- decoder -----------------------------------------------------------
    def _decode_core(self, params, z, caches):
        cfg, p = self.cfg, params["decoder"]
        rev = list(reversed(cfg.block_out_channels))
        h, caches["d_in"] = causal_conv3d_cog(z, p["conv_in"],
                                              cache=caches.get("d_in"))
        for j, rp in enumerate(p["mid"]):
            h = self._resnet(rp, h, z, caches, f"dm{j}")
        for i in range(len(rev)):
            blk = p[f"up{i}"]
            for j, rp in enumerate(blk["resnets"]):
                h = self._resnet(rp, h, z, caches, f"d{i}{j}")
            if blk["up"] is not None:
                if i < cfg.temporal_levels:
                    h = _time_upsample2(h)
                else:
                    h = _nearest_x2(h, (2, 3))
                h = _conv2d_frames(h, blk["up"])
        h = _spatial_norm(h, z, p["norm_out"], cfg.groups, cfg.eps, caches,
                          "d_no")
        h = jax.nn.silu(h)
        h, caches["d_out"] = causal_conv3d_cog(h, p["conv_out"],
                                               cache=caches.get("d_out"))
        return h, caches

    def decode(self, z):
        return self._jit_dec(self.params, z)

    def _blend(self, a, b, extent, axis):
        """Linear seam blend over `extent` pixels (blend_v/blend_h)."""
        extent = min(extent, a.shape[axis], b.shape[axis])
        if extent <= 0:
            return b
        ramp = jnp.arange(extent, dtype=jnp.float32) / extent
        shape = [1] * b.ndim
        shape[axis] = extent
        ramp = ramp.reshape(shape)
        a_sl = jax.lax.slice_in_dim(a, a.shape[axis] - extent, a.shape[axis],
                                    axis=axis)
        b_sl = jax.lax.slice_in_dim(b, 0, extent, axis=axis)
        blended = a_sl * (1 - ramp) + b_sl * ramp
        rest = jax.lax.slice_in_dim(b, extent, b.shape[axis], axis=axis)
        return jnp.concatenate([blended, rest], axis=axis)

    def decode_tiled(self, z):
        """Memory-capped decode: overlapping spatial latent tiles, each
        decoded in `frame_batch` latent-frame slices with conv caches carried
        (bit-exact streaming), then seam-blended (tiled_decode, :1162-1240)."""
        cfg = self.cfg
        B, T, H, W, C = z.shape
        sp = 2 ** (len(cfg.block_out_channels) - 1)
        tile = cfg.tile_latent
        overlap = int(tile * (1 - cfg.tile_overlap))
        blend_px = int(tile * sp * cfg.tile_overlap)
        row_limit = tile * sp - blend_px

        def decode_sliced(tz):
            fb = cfg.frame_batch
            if T <= fb:
                return self._jit_dec(self.params, tz)
            caches: Dict = {}
            outs = []
            rem = T % fb
            first = fb + rem
            s0 = 0
            while s0 < T:
                sl = tz[:, s0:s0 + (first if s0 == 0 else fb)]
                s0 += sl.shape[1]
                out, caches = self._jit_dec_stream(self.params, sl, caches)
                outs.append(out)
            return jnp.concatenate(outs, axis=1)

        rows = []
        for i in range(0, H, overlap):
            row = []
            for j in range(0, W, overlap):
                row.append(decode_sliced(z[:, :, i:i + tile, j:j + tile]))
            rows.append(row)
        result_rows = []
        for i, row in enumerate(rows):
            result = []
            for j, t in enumerate(row):
                if i > 0:
                    t = self._blend(rows[i - 1][j], t, blend_px, axis=2)
                if j > 0:
                    t = self._blend(row[j - 1], t, blend_px, axis=3)
                result.append(t[:, :, :row_limit, :row_limit])
            result_rows.append(jnp.concatenate(result, axis=3))
        return jnp.concatenate(result_rows, axis=2)[:, :, :H * sp, :W * sp]


# --------------------------------------------------------------------------
# converter (diffusers AutoencoderKLCogVideoX naming)
# --------------------------------------------------------------------------

def convert_cogvideox_vae_state_dict(sd, cfg: CogVideoXVAEConfig) -> dict:
    """Map the published state dict onto `init_cogvideox_vae_params`' tree.

    Torch conv3d [O, I, kt, kh, kw] -> [kt, kh, kw, I, O]; conv2d
    [O, I, kh, kw] -> [kh, kw, I, O]. CausalConv3d wraps its conv as
    ``<name>.conv``; the 1x1 shortcut is a bare Conv3d."""
    def c3(name):
        w = np.asarray(sd[f"{name}.weight"], np.float32).transpose(2, 3, 4, 1, 0)
        return {"w": jnp.asarray(w),
                "b": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))}

    def c2(name):
        w = np.asarray(sd[f"{name}.weight"], np.float32).transpose(2, 3, 1, 0)
        return {"w": jnp.asarray(w),
                "b": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))}

    def gn(name):
        return {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"], np.float32)),
                "b": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))}

    def resnet(name, spatial):
        p = {"conv1": c3(f"{name}.conv1.conv"), "conv2": c3(f"{name}.conv2.conv")}
        if spatial:
            for nm in ("norm1", "norm2"):
                p[nm] = {"norm": gn(f"{name}.{nm}.norm_layer"),
                         "conv_y": c3(f"{name}.{nm}.conv_y.conv"),
                         "conv_b": c3(f"{name}.{nm}.conv_b.conv")}
        else:
            p["norm1"] = gn(f"{name}.norm1")
            p["norm2"] = gn(f"{name}.norm2")
        if f"{name}.conv_shortcut.weight" in sd:
            p["shortcut"] = c3(f"{name}.conv_shortcut")
        return p

    chs = cfg.block_out_channels
    enc = {"conv_in": c3("encoder.conv_in.conv")}
    for i in range(len(chs)):
        blk = {"resnets": [resnet(f"encoder.down_blocks.{i}.resnets.{j}", False)
                           for j in range(cfg.layers_per_block)],
               "down": None}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            blk["down"] = c2(f"encoder.down_blocks.{i}.downsamplers.0.conv")
        enc[f"down{i}"] = blk
    enc["mid"] = [resnet(f"encoder.mid_block.resnets.{j}", False)
                  for j in range(2)]
    enc["norm_out"] = gn("encoder.norm_out")
    enc["conv_out"] = c3("encoder.conv_out.conv")

    dec = {"conv_in": c3("decoder.conv_in.conv")}
    dec["mid"] = [resnet(f"decoder.mid_block.resnets.{j}", True)
                  for j in range(2)]
    for i in range(len(chs)):
        blk = {"resnets": [resnet(f"decoder.up_blocks.{i}.resnets.{j}", True)
                           for j in range(cfg.layers_per_block + 1)],
               "up": None}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            blk["up"] = c2(f"decoder.up_blocks.{i}.upsamplers.0.conv")
        dec[f"up{i}"] = blk
    dec["norm_out"] = {"norm": gn("decoder.norm_out.norm_layer"),
                       "conv_y": c3("decoder.norm_out.conv_y.conv"),
                       "conv_b": c3("decoder.norm_out.conv_b.conv")}
    dec["conv_out"] = c3("decoder.conv_out.conv")
    return {"encoder": enc, "decoder": dec}
