"""Open-Sora-Plan CausalVAE (v1.2 block set), weight-mappable.

Transcribes ``videosys/models/autoencoders/autoencoder_kl_open_sora_plan_v120.py``
(CausalVAEModel :741): SD-VAE topology (down levels -> mid w/ per-frame spatial
attention -> out; mirrored decoder) built from causal 3-D blocks —

- ``CausalConv3d`` (:40): REPLICATES the first frame (kt-1) at the clip front
  (unlike OpenSora's zero pad), symmetric spatial padding;
- ``ResnetBlock3D`` (:277): GN32 -> silu -> cconv3 -> GN -> silu -> cconv3,
  1x1x1 ``nin_shortcut`` on channel change;
- ``AttnBlock3DFix`` (:360): per-frame spatial self-attention with 1x1x1
  causal-conv projections, scale c^-0.5;
- ``Spatial2xTime2x3DDownsample`` (:418): right/bottom spatial zero pad + k3
  stride-(2,2,2) causal conv;
- ``Spatial2xTime2x3DUpsample`` (:344): first frame upsamples spatially only,
  the rest trilinearly in (t, h, w) — this is what makes T' = 1 + (T-1)/4;
- ``Downsample`` (:430) / ``SpatialUpsample2x`` (:318): the spatial-only 2-D
  variants used by earlier OSP configs (supported for those checkpoints).

The published v1.2 VAE config is hidden 128, mults (1,2,4,4), 2 res blocks,
``Spatial2xTime2x3DDownsample`` on levels 0-2, ``Spatial2xTime2x3DUpsample``
on levels 1-3, AttnBlock3DFix in the mid only, quant layers on.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.models.vae import _conv_params, _norm_params, conv3d, group_norm

__all__ = ["OSPVAEConfig", "OSPCausalVAE", "init_osp_vae_params",
           "convert_osp_vae_state_dict", "load_osp_vae_checkpoint"]


@dataclasses.dataclass(frozen=True)
class OSPVAEConfig:
    hidden: int = 128
    z_channels: int = 4
    embed_dim: int = 4
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    groups: int = 32
    use_quant_layer: bool = True
    # per-level block types; "" = none
    down_types: Tuple[str, ...] = ("s2t2", "s2t2", "s2t2", "")
    up_types: Tuple[str, ...] = ("", "s2t2", "s2t2", "s2t2")
    # separate per-level temporal slots (v1.0/1.1 configs pair
    # SpatialDownsample2x with a param-free TimeDownsample2x / TimeUpsample2x;
    # ref autoencoder_kl_open_sora_plan.py:1530-1552)
    time_down_types: Tuple[str, ...] = ("", "", "", "")
    time_up_types: Tuple[str, ...] = ("", "", "", "")

    @property
    def chs(self):
        return [self.hidden * m for m in self.ch_mult]

    def tiny(**kw):
        d = dict(hidden=8, ch_mult=(1, 2), num_res_blocks=1, groups=4,
                 down_types=("s2t2", ""), up_types=("", "s2t2"))
        d.update(kw)
        return OSPVAEConfig(**d)

    tiny = staticmethod(tiny)


def _cconv(x, w, b=None, stride=(1, 1, 1), spad=None):
    """OSP CausalConv3d: replicate-first-frame time pad (kt-1), symmetric
    spatial pad (or ``spad`` override, e.g. right/bottom for downsample)."""
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    if kt > 1:
        front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        x = jnp.concatenate([front, x], axis=1)
    if spad is None:
        spad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    x = jnp.pad(x, ((0, 0), (0, 0), spad[0], spad[1], (0, 0)))
    return conv3d(x, w, b, stride)


def _res_params(key, cin, cout):
    ks = jax.random.split(key, 3)
    p = {"norm1": _norm_params(cin), "conv1": _conv_params(ks[0], (3, 3, 3, cin, cout)),
         "norm2": _norm_params(cout), "conv2": _conv_params(ks[1], (3, 3, 3, cout, cout))}
    if cin != cout:
        p["nin_shortcut"] = _conv_params(ks[2], (1, 1, 1, cin, cout))
    return p


def _attn_params(key, c):
    ks = jax.random.split(key, 4)
    cv = lambda k: _conv_params(k, (1, 1, 1, c, c))
    return {"norm": _norm_params(c), "q": cv(ks[0]), "k": cv(ks[1]),
            "v": cv(ks[2]), "proj_out": cv(ks[3])}


def init_osp_vae_params(key: jax.Array, cfg: OSPVAEConfig):
    ks = iter(jax.random.split(key, 128))
    nxt = lambda: next(ks)
    chs = cfg.chs

    c = chs[0]
    enc = {"conv_in": _conv_params(nxt(), (3, 3, 3, 3, c)), "down": []}
    for i, ch in enumerate(chs):
        lv = {"block": [], "downsample": None}
        for _ in range(cfg.num_res_blocks):
            lv["block"].append(_res_params(nxt(), c, ch))
            c = ch
        if cfg.down_types[i] == "s2t2":
            lv["downsample"] = _conv_params(nxt(), (3, 3, 3, c, c))
        elif cfg.down_types[i] == "spatial":
            lv["downsample"] = _conv_params(nxt(), (1, 3, 3, c, c))
        enc["down"].append(lv)
    enc["mid"] = {"block_1": _res_params(nxt(), c, c),
                  "attn_1": _attn_params(nxt(), c),
                  "block_2": _res_params(nxt(), c, c)}
    enc["norm_out"] = _norm_params(c)
    enc["conv_out"] = _conv_params(nxt(), (3, 3, 3, c, 2 * cfg.z_channels))

    c = chs[-1]
    dec = {"conv_in": _conv_params(nxt(), (3, 3, 3, cfg.z_channels, c)),
           "mid": {"block_1": _res_params(nxt(), c, c),
                   "attn_1": _attn_params(nxt(), c),
                   "block_2": _res_params(nxt(), c, c)},
           "up": [None] * len(chs)}
    for i in reversed(range(len(chs))):
        ch = chs[i]
        lv = {"block": [], "upsample": None}
        for _ in range(cfg.num_res_blocks + 1):
            lv["block"].append(_res_params(nxt(), c, ch))
            c = ch
        if cfg.up_types[i] == "s2t2":
            lv["upsample"] = _conv_params(nxt(), (3, 3, 3, c, c))
        elif cfg.up_types[i] == "spatial":
            lv["upsample"] = _conv_params(nxt(), (1, 3, 3, c, c))
        dec["up"][i] = lv
    dec["norm_out"] = _norm_params(c)
    dec["conv_out"] = _conv_params(nxt(), (3, 3, 3, c, 3))

    params = {"encoder": enc, "decoder": dec}
    if cfg.use_quant_layer:
        params["quant_conv"] = _conv_params(
            nxt(), (1, 1, 1, 2 * cfg.z_channels, 2 * cfg.embed_dim))
        params["post_quant_conv"] = _conv_params(
            nxt(), (1, 1, 1, cfg.embed_dim, cfg.z_channels))
    return params


def _res(p, x, groups):
    h = jax.nn.silu(group_norm(x, p["norm1"]["w"], p["norm1"]["b"], groups))
    h = _cconv(h, p["conv1"]["w"], p["conv1"]["b"])
    h = jax.nn.silu(group_norm(h, p["norm2"]["w"], p["norm2"]["b"], groups))
    h = _cconv(h, p["conv2"]["w"], p["conv2"]["b"])
    if "nin_shortcut" in p:
        x = _cconv(x, p["nin_shortcut"]["w"], p["nin_shortcut"]["b"])
    return x + h


def _attn(p, x, groups):
    b, t, hh, ww, c = x.shape
    h = group_norm(x, p["norm"]["w"], p["norm"]["b"], groups)
    lin = lambda n: (h @ p[n]["w"].reshape(c, c) + p[n]["b"])
    q, k, v = lin("q"), lin("k"), lin("v")
    q = q.reshape(b * t, hh * ww, c)
    k = k.reshape(b * t, hh * ww, c)
    v = v.reshape(b * t, hh * ww, c)
    a = jax.nn.softmax(q @ k.transpose(0, 2, 1) * c ** -0.5, axis=-1)
    o = (a @ v).reshape(b, t, hh, ww, c)
    o = o @ p["proj_out"]["w"].reshape(c, c) + p["proj_out"]["b"]
    return x + o


def _down_s2t2(p, x):
    # right/bottom zero pad then k3 stride-(2,2,2) causal conv (ref :418-428)
    return _cconv(x, p["w"], p["b"], stride=(2, 2, 2),
                  spad=((0, 1), (0, 1)))


def _down_spatial(p, x):
    # 2-D right/bottom pad + stride-2 conv, per frame (ref Downsample :430)
    return _cconv(x, p["w"], p["b"], stride=(1, 2, 2), spad=((0, 1), (0, 1)))


def _up_s2t2(p, x):
    # frame 0 spatial-only; frames 1.. trilinear 2x in (t, h, w) (ref :344-358)
    b, t, hh, ww, c = x.shape
    if t > 1:
        x0, xr = x[:, :1], x[:, 1:]
        xr = jax.image.resize(xr, (b, (t - 1) * 2, hh * 2, ww * 2, c),
                              method="trilinear")
        x0 = jax.image.resize(x0, (b, 1, hh * 2, ww * 2, c),
                              method="trilinear")
        x = jnp.concatenate([x0, xr], axis=1)
    else:
        x = jax.image.resize(x, (b, t, hh * 2, ww * 2, c), method="trilinear")
    return _cconv(x, p["w"], p["b"])


def _up_spatial(p, x):
    # per-frame nearest 2x + (1,3,3) causal conv (ref SpatialUpsample2x :318)
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return _cconv(x, p["w"], p["b"])


def _time_down2x(x, k=3):
    """Param-free TimeDownsample2x: replicate-front pad + time avg-pool k3 s2
    (ref autoencoder_kl_open_sora_plan.py:1530-1539)."""
    front = jnp.repeat(x[:, :1], k - 1, axis=1)
    x = jnp.concatenate([front, x], axis=1)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, 1, 1, 1),
                              (1, 2, 1, 1, 1), "VALID")
    return s / k


def _time_up2x(x):
    """Param-free TimeUpsample2x: keep frame 0, trilinear-2x the rest over
    time only (ref :1542-1552)."""
    b, t, hh, ww, c = x.shape
    if t > 1:
        x0, xr = x[:, :1], x[:, 1:]
        xr = jax.image.resize(xr, (b, (t - 1) * 2, hh, ww, c),
                              method="trilinear")
        x = jnp.concatenate([x0, xr], axis=1)
    return x


def _blend_v(a, b, ext):
    """Linear top-blend of tile b's first ``ext`` rows with tile a's last
    (ref blend_v, autoencoder_kl_open_sora_plan_v120.py:902-909); [B,T,H,W,C]."""
    ext = min(a.shape[2], b.shape[2], ext)
    if ext <= 0:
        return b
    w = (jnp.arange(ext, dtype=jnp.float32) / ext).reshape(1, 1, ext, 1, 1)
    top = a[:, :, -ext:] * (1 - w) + b[:, :, :ext] * w
    return jnp.concatenate([top, b[:, :, ext:]], axis=2)


def _blend_h(a, b, ext):
    ext = min(a.shape[3], b.shape[3], ext)
    if ext <= 0:
        return b
    w = (jnp.arange(ext, dtype=jnp.float32) / ext).reshape(1, 1, 1, ext, 1)
    left = a[:, :, :, -ext:] * (1 - w) + b[:, :, :, :ext] * w
    return jnp.concatenate([left, b[:, :, :, ext:]], axis=3)


def _t_chunks(t, size):
    """[start, end) windows stepping ``size - 1`` with one-frame overlap
    (ref tiled_decode/tiled_encode :943-954)."""
    idx = list(range(0, t, size - 1))
    if len(idx) == 1:
        return [(0, t)]
    se = [[idx[i], idx[i + 1] + 1] for i in range(len(idx) - 1)]
    if se[-1][-1] > t:
        se[-1][-1] = t
    elif se[-1][-1] < t:
        se.append([idx[-1], t])
    return [tuple(p) for p in se]


class OSPCausalVAE:
    """Tiling thresholds/constants follow the reference
    (``autoencoder_kl_open_sora_plan_v120.py:798-805``): sample tiles 256 px
    (33 frames), latent tiles 256/2^(levels-1) (16 frames), overlap 0.125.
    `encode`/`decode` auto-tile past the thresholds — required to fit one
    chip's HBM at 480p+ clips — with the reference's linear seam blending.
    """

    def __init__(self, cfg: OSPVAEConfig, params):
        self.cfg = cfg
        self.params = params
        self.tile_sample_min_size = 256
        self.tile_sample_min_size_t = 33
        self.tile_latent_min_size = 256 // (2 ** (len(cfg.chs) - 1))
        self.tile_latent_min_size_t = 16
        self.tile_overlap_factor = 0.125

    def encode(self, x, use_tiling: Optional[bool] = None):
        if use_tiling is None:
            use_tiling = (x.shape[2] > self.tile_sample_min_size
                          or x.shape[3] > self.tile_sample_min_size
                          or x.shape[1] > self.tile_sample_min_size_t)
        if use_tiling:
            return self._tiled_encode(x)
        return self._encode_one(x)

    def _tiled_encode(self, x):
        moments = []
        for i, (s, e) in enumerate(_t_chunks(x.shape[1],
                                             self.tile_sample_min_size_t)):
            m = self._tiled_encode2d(x[:, s:e])
            moments.append(m[:, 1:] if i else m)
        mean, logvar = jnp.split(jnp.concatenate(moments, axis=1), 2, axis=-1)
        return mean, logvar

    def _tiled_encode2d(self, x):
        ov = int(self.tile_sample_min_size * (1 - self.tile_overlap_factor))
        ext = int(self.tile_latent_min_size * self.tile_overlap_factor)
        lim = self.tile_latent_min_size - ext
        rows = []
        for i in range(0, x.shape[2], ov):
            row = []
            for j in range(0, x.shape[3], ov):
                mean, logvar = self._encode_one(
                    x[:, :, i:i + self.tile_sample_min_size,
                      j:j + self.tile_sample_min_size])
                row.append(jnp.concatenate([mean, logvar], axis=-1))
            rows.append(row)
        out_rows = []
        for i, row in enumerate(rows):
            out = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = _blend_v(rows[i - 1][j], tile, ext)
                if j > 0:
                    tile = _blend_h(row[j - 1], tile, ext)
                out.append(tile[:, :, :lim, :lim])
            out_rows.append(jnp.concatenate(out, axis=3))
        return jnp.concatenate(out_rows, axis=2)

    def decode(self, z, use_tiling: Optional[bool] = None):
        if use_tiling is None:
            use_tiling = (z.shape[2] > self.tile_latent_min_size
                          or z.shape[3] > self.tile_latent_min_size
                          or z.shape[1] > self.tile_latent_min_size_t)
        if not use_tiling:
            return self._decode_one(z)
        outs = []
        for i, (s, e) in enumerate(_t_chunks(z.shape[1],
                                             self.tile_latent_min_size_t)):
            d = self._tiled_decode2d(z[:, s:e])
            outs.append(d[:, 1:] if i else d)
        return jnp.concatenate(outs, axis=1)

    def _tiled_decode2d(self, z):
        ov = int(self.tile_latent_min_size * (1 - self.tile_overlap_factor))
        ext = int(self.tile_sample_min_size * self.tile_overlap_factor)
        lim = self.tile_sample_min_size - ext
        rows = []
        for i in range(0, z.shape[2], ov):
            row = []
            for j in range(0, z.shape[3], ov):
                row.append(self._decode_one(
                    z[:, :, i:i + self.tile_latent_min_size,
                      j:j + self.tile_latent_min_size]))
            rows.append(row)
        out_rows = []
        for i, row in enumerate(rows):
            out = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = _blend_v(rows[i - 1][j], tile, ext)
                if j > 0:
                    tile = _blend_h(row[j - 1], tile, ext)
                out.append(tile[:, :, :lim, :lim])
            out_rows.append(jnp.concatenate(out, axis=3))
        return jnp.concatenate(out_rows, axis=2)

    def _encode_one(self, x):
        """pixels [B, T, H, W, 3] (T = 1 + 4k for the v1.2 config) ->
        (mean, logvar) at [B, 1+(T-1)/4, H/8, W/8, z]."""
        cfg, p = self.cfg, self.params["encoder"]
        g = cfg.groups
        h = _cconv(x, p["conv_in"]["w"], p["conv_in"]["b"])
        for i in range(len(cfg.chs)):
            lv = p["down"][i]
            for rp in lv["block"]:
                h = _res(rp, h, g)
            if lv["downsample"] is not None:
                fn = _down_s2t2 if cfg.down_types[i] == "s2t2" else _down_spatial
                h = fn(lv["downsample"], h)
            if cfg.time_down_types[i] == "time":
                h = _time_down2x(h)
        h = _res(p["mid"]["block_1"], h, g)
        h = _attn(p["mid"]["attn_1"], h, g)
        h = _res(p["mid"]["block_2"], h, g)
        h = jax.nn.silu(group_norm(h, p["norm_out"]["w"], p["norm_out"]["b"], g))
        h = _cconv(h, p["conv_out"]["w"], p["conv_out"]["b"])
        if cfg.use_quant_layer:
            q = self.params["quant_conv"]
            h = _cconv(h, q["w"], q["b"])
        return jnp.split(h, 2, axis=-1)

    def _decode_one(self, z):
        cfg, p = self.cfg, self.params["decoder"]
        g = cfg.groups
        if cfg.use_quant_layer:
            q = self.params["post_quant_conv"]
            z = _cconv(z, q["w"], q["b"])
        h = _cconv(z, p["conv_in"]["w"], p["conv_in"]["b"])
        h = _res(p["mid"]["block_1"], h, g)
        h = _attn(p["mid"]["attn_1"], h, g)
        h = _res(p["mid"]["block_2"], h, g)
        for i in reversed(range(len(cfg.chs))):
            lv = p["up"][i]
            for rp in lv["block"]:
                h = _res(rp, h, g)
            if lv["upsample"] is not None:
                fn = _up_s2t2 if cfg.up_types[i] == "s2t2" else _up_spatial
                h = fn(lv["upsample"], h)
            if cfg.time_up_types[i] == "time":
                h = _time_up2x(h)
        h = jax.nn.silu(group_norm(h, p["norm_out"]["w"], p["norm_out"]["b"], g))
        return _cconv(h, p["conv_out"]["w"], p["conv_out"]["b"])


# --------------------------------------------------------------------------
# state-dict -> pytree
# --------------------------------------------------------------------------

def _ccv(sd, name):
    w = np.asarray(sd[f"{name}.conv.weight"], np.float32).transpose(2, 3, 4, 1, 0)
    p = {"w": jnp.asarray(w)}
    if f"{name}.conv.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[f"{name}.conv.bias"], np.float32))
    return p


def _c2d(sd, name):
    """plain 2-D conv (Downsample) -> (1, kh, kw) causal-conv layout."""
    w = np.asarray(sd[f"{name}.weight"], np.float32)
    w = w.transpose(2, 3, 1, 0)[None]            # [1, kh, kw, in, out]
    return {"w": jnp.asarray(w),
            "b": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))}


def _nm(sd, name):
    return {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"], np.float32)),
            "b": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))}


def _res_cv(sd, base):
    p = {"norm1": _nm(sd, f"{base}.norm1"), "conv1": _ccv(sd, f"{base}.conv1"),
         "norm2": _nm(sd, f"{base}.norm2"), "conv2": _ccv(sd, f"{base}.conv2")}
    if f"{base}.nin_shortcut.conv.weight" in sd:
        p["nin_shortcut"] = _ccv(sd, f"{base}.nin_shortcut")
    return p


def _attn_cv(sd, base):
    return {"norm": _nm(sd, f"{base}.norm"), "q": _ccv(sd, f"{base}.q"),
            "k": _ccv(sd, f"{base}.k"), "v": _ccv(sd, f"{base}.v"),
            "proj_out": _ccv(sd, f"{base}.proj_out")}


def convert_osp_vae_state_dict(sd, cfg: OSPVAEConfig) -> dict:
    """Map a CausalVAEModel state dict onto `init_osp_vae_params`' tree.
    Down/upsample blocks wrap their conv as ``.conv`` (CausalConv3d) or are
    plain 2-D convs (old ``Downsample``)."""
    nlv = len(cfg.ch_mult)

    def updown(base, kind):
        if f"{base}.conv.conv.weight" in sd:       # CausalConv3d wrapper
            return _ccv(sd, f"{base}.conv")
        return _c2d(sd, f"{base}.conv")            # plain 2-D Downsample

    enc = {"conv_in": _ccv(sd, "encoder.conv_in"), "down": []}
    for i in range(nlv):
        lv = {"block": [_res_cv(sd, f"encoder.down.{i}.block.{j}")
                        for j in range(cfg.num_res_blocks)],
              "downsample": None}
        if cfg.down_types[i]:
            lv["downsample"] = updown(f"encoder.down.{i}.downsample",
                                      cfg.down_types[i])
        enc["down"].append(lv)
    enc["mid"] = {"block_1": _res_cv(sd, "encoder.mid.block_1"),
                  "attn_1": _attn_cv(sd, "encoder.mid.attn_1"),
                  "block_2": _res_cv(sd, "encoder.mid.block_2")}
    enc["norm_out"] = _nm(sd, "encoder.norm_out")
    enc["conv_out"] = _ccv(sd, "encoder.conv_out")

    dec = {"conv_in": _ccv(sd, "decoder.conv_in"),
           "mid": {"block_1": _res_cv(sd, "decoder.mid.block_1"),
                   "attn_1": _attn_cv(sd, "decoder.mid.attn_1"),
                   "block_2": _res_cv(sd, "decoder.mid.block_2")},
           "up": []}
    for i in range(nlv):
        lv = {"block": [_res_cv(sd, f"decoder.up.{i}.block.{j}")
                        for j in range(cfg.num_res_blocks + 1)],
              "upsample": None}
        if cfg.up_types[i]:
            lv["upsample"] = updown(f"decoder.up.{i}.upsample",
                                    cfg.up_types[i])
        dec["up"].append(lv)
    dec["norm_out"] = _nm(sd, "decoder.norm_out")
    dec["conv_out"] = _ccv(sd, "decoder.conv_out")

    params = {"encoder": enc, "decoder": dec}
    if cfg.use_quant_layer:
        params["quant_conv"] = _ccv(sd, "quant_conv")
        params["post_quant_conv"] = _ccv(sd, "post_quant_conv")
    return params


def load_osp_vae_checkpoint(path: str, cfg: Optional[OSPVAEConfig] = None):
    from magcache_tpu.models.convert import load_safetensors_dir

    sd = load_safetensors_dir(path)
    cfg = cfg or OSPVAEConfig()
    return cfg, convert_osp_vae_state_dict(sd, cfg)
