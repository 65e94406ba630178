"""Video/image VAEs: causal 3-D VAE (Wan/HunyuanVideo-class) and SD-style 2-D
VAE (FLUX/Qwen-class), with tiled decode.

The reference ships several multi-thousand-line VAE ports
(``videosys/models/autoencoders/…``, 6.4k LoC) whose performance tricks are
(a) causal temporal convs so frames stream, (b) micro-frame / micro-batch
tiling to cap memory (``autoencoder_kl_open_sora.py:621-730``), and
(c) memory-capped chunked conv (``SafeConv3d``, ``autoencoder_kl_cogvideox.py:31``).

TPU translation:

- convs stay NDHWC/NHWC (channel-last — XLA's native TPU conv layout);
- causal temporal padding = explicit left-pad, so a chunked decode with a
  carried boundary cache reproduces the full-clip result **exactly**
  (property-tested) — the streaming equivalent of (a)+(c);
- spatial tiling with overlap-blend mirrors the reference's tiled decode;
- GroupNorm statistics in f32.

Weight ingestion maps the corresponding reference checkpoints onto these
module trees; random init is used for tests/benches.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.models.common import lecun_normal

__all__ = ["CausalVAEConfig", "init_causal_vae_params", "CausalVAE",
           "ImageVAEConfig", "init_image_vae_params", "ImageVAE"]


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def group_norm(x, weight, bias, groups=32, eps=1e-6):
    """GroupNorm over channel-last x (f32 statistics)."""
    orig = x.dtype
    x = x.astype(jnp.float32)
    c = x.shape[-1]
    g = min(groups, c)
    while c % g:
        g -= 1
    xs = x.reshape(x.shape[:-1] + (g, c // g))
    red = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    mean = xs.mean(axis=red, keepdims=True)
    var = xs.var(axis=red, keepdims=True)
    xs = (xs - mean) * jax.lax.rsqrt(var + eps)
    x = xs.reshape(x.shape)
    return (x * weight + bias).astype(orig)


def channel_rms_norm(x, weight, bias, eps=1e-6):
    """Per-position RMS norm over the channel axis (f32 stats).

    This is the Wan-VAE norm choice: statistics are position-local, so
    chunked/streamed decoding is **bit-equal** to full-clip decoding — unlike
    GroupNorm, whose stats span the time axis."""
    orig = x.dtype
    x = x.astype(jnp.float32)
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(ms + eps)
    x = x * weight
    if bias is not None:
        x = x + bias
    return x.astype(orig)


def conv3d(x, w, b=None, stride=(1, 1, 1)):
    """NDHWC conv, weight [kt, kh, kw, cin, cout], 'same' spatial padding is
    caller-managed (we always pad explicitly)."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if b is not None:
        y = y + b
    return y


def conv2d(x, w, b=None, stride=(1, 1)):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b
    return y


def causal_conv3d(x, w, b=None, stride=(1, 1, 1), tcache: Optional[jnp.ndarray] = None):
    """Causal-in-time 3-D conv.

    Time axis left-pads with ``kt - 1`` frames: replicated first frame at clip
    start, or the carried ``tcache`` (the previous chunk's tail) when
    streaming — the mechanism that makes chunked == full decoding exact.
    Returns (y, new_tcache).
    """
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    ph, pw_ = (kh - 1) // 2, (kw - 1) // 2
    st = stride[0] if isinstance(stride, (tuple, list)) else stride
    if kt > 1:
        front = (jnp.repeat(x[:, :1], kt - 1, axis=1) if tcache is None
                 else tcache)
        stream = jnp.concatenate([front, x], axis=1)
        # the next chunk's first window starts right after the frames this
        # call consumed (n_out windows of step ``st``) — for stride 1 that's
        # the classic kt-1 tail; for strided convs it keeps the window phase
        # aligned across chunks
        n_out = (stream.shape[1] - kt) // st + 1
        new_cache = stream[:, n_out * st:]
    else:
        stream, new_cache = x, None
    x_sp = jnp.pad(stream, ((0, 0), (0, 0), (ph, ph), (pw_, pw_), (0, 0)))
    # (measured and rejected: decomposing the time axis into kt summed 2-D
    # convs is ~20% SLOWER than XLA's native 5-D conv at Wan-VAE 480p decoder
    # shapes, both f32 and bf16 — the 3-D conv tiling is already good)
    return conv3d(x_sp, w, b, stride), new_cache


def _conv_params(key, kshape, dtype=jnp.float32):
    kw_, kb = jax.random.split(key)
    fan_in = int(np.prod(kshape[:-1]))
    w = jax.random.normal(kw_, kshape, dtype) * float(1.0 / np.sqrt(fan_in))
    return {"w": w, "b": jnp.zeros((kshape[-1],), dtype)}


def _norm_params(c):
    return {"w": jnp.ones((c,), jnp.float32), "b": jnp.zeros((c,), jnp.float32)}


# --------------------------------------------------------------------------
# Causal 3-D VAE (Wan / Hunyuan class): stride (4, 8, 8), z 16ch
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CausalVAEConfig:
    in_channels: int = 3
    z_channels: int = 16
    base: int = 96
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    blocks_per_level: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True, False)
    groups: int = 32

    def tiny(**kw):
        d = dict(base=8, ch_mult=(1, 2), blocks_per_level=1,
                 temporal_downsample=(True, False), z_channels=4, groups=4)
        d.update(kw)
        return CausalVAEConfig(**d)

    tiny = staticmethod(tiny)


def _resblock3d_params(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _norm_params(cin), "conv1": _conv_params(k1, (3, 3, 3, cin, cout)),
        "norm2": _norm_params(cout), "conv2": _conv_params(k2, (3, 3, 3, cout, cout)),
    }
    if cin != cout:
        p["skip"] = _conv_params(k3, (1, 1, 1, cin, cout))
    return p


def _resblock3d(p, x, tc, groups):
    """tc: dict-slot feature cache (mutated copy returned)."""
    h = jax.nn.silu(channel_rms_norm(x, p["norm1"]["w"], p["norm1"]["b"]))
    h, c1 = causal_conv3d(h, p["conv1"]["w"], p["conv1"]["b"], tcache=tc.get("c1"))
    h = jax.nn.silu(channel_rms_norm(h, p["norm2"]["w"], p["norm2"]["b"]))
    h, c2 = causal_conv3d(h, p["conv2"]["w"], p["conv2"]["b"], tcache=tc.get("c2"))
    if "skip" in p:
        x = conv3d(x, p["skip"]["w"], p["skip"]["b"])
    return x + h, {"c1": c1, "c2": c2}


def init_causal_vae_params(key: jax.Array, cfg: CausalVAEConfig):
    ks = iter(jax.random.split(key, 128))
    nxt = lambda: next(ks)
    chs = [cfg.base * m for m in cfg.ch_mult]

    enc = {"stem": _conv_params(nxt(), (3, 3, 3, cfg.in_channels, chs[0]))}
    c = chs[0]
    for li, ch in enumerate(chs):
        level = {"blocks": [], "down": None}
        for _ in range(cfg.blocks_per_level):
            level["blocks"].append(_resblock3d_params(nxt(), c, ch))
            c = ch
        if li < len(chs) - 1:
            ts = 2 if cfg.temporal_downsample[li] else 1
            level["down"] = {"conv": _conv_params(nxt(), (ts + 1 if ts > 1 else 1, 3, 3, c, c)),
                             "tstride": ts}
        enc[f"level{li}"] = level
    enc["mid"] = _resblock3d_params(nxt(), c, c)
    enc["out_norm"] = _norm_params(c)
    enc["out"] = _conv_params(nxt(), (3, 3, 3, c, 2 * cfg.z_channels))

    dec = {"stem": _conv_params(nxt(), (3, 3, 3, cfg.z_channels, c))}
    dec["mid"] = _resblock3d_params(nxt(), c, c)
    for li, ch in enumerate(reversed(chs)):
        level = {"blocks": [], "up": None}
        for _ in range(cfg.blocks_per_level):
            level["blocks"].append(_resblock3d_params(nxt(), c, ch))
            c = ch
        if li < len(chs) - 1:
            # temporal upsample mirrors encoder's downsample schedule; the
            # pixel-shuffle (ts, 2, 2) from c*2*ts channels halves channels
            ts = 2 if cfg.temporal_downsample[len(chs) - 2 - li] else 1
            level["up"] = {"conv": _conv_params(nxt(), (1, 3, 3, c, c * 2 * ts)),
                           "tstride": ts}
            c = c // 2
        dec[f"level{li}"] = level
    dec["out_norm"] = _norm_params(c)
    dec["out"] = _conv_params(nxt(), (3, 3, 3, c, cfg.in_channels))
    return {"encoder": enc, "decoder": dec}


class CausalVAE:
    """Functional causal video VAE with exact chunked decode.

    encode: pixels [B, T, H, W, 3] -> latents [B, 1+(T-1)/4, H/8, W/8, z]
    decode: latents -> pixels. ``decode_chunked`` streams over latent-time in
    windows with a carried causal feature cache; equal to full decode.
    """

    # causal time compression keeps frame 1: 1 + (mf-1)//ds latents per
    # chunk, no num_frames hint (see MicroFrameVAE.decode)
    front_padded_latents = False

    def __init__(self, cfg: CausalVAEConfig, params):
        self.cfg = cfg
        self.params = params

    # -- encoder ---------------------------------------------------------
    def encode(self, x):
        cfg, p = self.cfg, self.params["encoder"]
        g = cfg.groups
        h, _ = causal_conv3d(x, p["stem"]["w"], p["stem"]["b"])
        chs = [cfg.base * m for m in cfg.ch_mult]
        for li in range(len(chs)):
            lv = p[f"level{li}"]
            for bp in lv["blocks"]:
                h, _ = _resblock3d(bp, h, {}, g)
            if lv["down"] is not None:
                ts = lv["down"]["tstride"]
                w = lv["down"]["conv"]["w"]
                kt = w.shape[0]
                # strided causal conv: left-pad kt-1 frames so the output keeps
                # frame 0 and every ts-th after (T -> (T-1)/ts + 1, the Wan
                # latent frame count convention)
                ph = 1
                hs = jnp.pad(h, ((0, 0), (0, 0), (ph, ph), (ph, ph), (0, 0)))
                if kt > 1:
                    front = jnp.repeat(hs[:, :1], kt - 1, axis=1)
                    hs = jnp.concatenate([front, hs], axis=1)
                h = conv3d(hs, w, lv["down"]["conv"]["b"], stride=(ts, 2, 2))
        h, _ = _resblock3d(p["mid"], h, {}, g)
        h = jax.nn.silu(channel_rms_norm(h, p["out_norm"]["w"], p["out_norm"]["b"]))
        h, _ = causal_conv3d(h, p["out"]["w"], p["out"]["b"])
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, logvar

    # -- decoder ---------------------------------------------------------
    def _decode_core(self, z, caches: Optional[dict]):
        """caches=None -> fresh clip; else carried feature cache (streaming)."""
        cfg, p = self.cfg, self.params["decoder"]
        g = cfg.groups
        new_caches = {}
        tc = (caches or {})

        def cc(name, x, w, b):
            y, nc = causal_conv3d(x, w, b, tcache=tc.get(name))
            new_caches[name] = nc
            return y

        h = cc("stem", z, p["stem"]["w"], p["stem"]["b"])

        def rb(name, bp, h):
            sub = tc.get(name, {})
            h2, nc = _resblock3d(bp, h, sub, g)
            new_caches[name] = nc
            return h2

        h = rb("mid", p["mid"], h)
        chs = [cfg.base * m for m in cfg.ch_mult]
        for li in range(len(chs)):
            lv = p[f"level{li}"]
            for bi, bp in enumerate(lv["blocks"]):
                h = rb(f"l{li}b{bi}", bp, h)
            if lv["up"] is not None:
                ts = lv["up"]["tstride"]
                h = cc(f"l{li}up", h, lv["up"]["conv"]["w"], lv["up"]["conv"]["b"])
                b_, t_, hh, ww, cc_ = h.shape
                cout = cc_ // (4 * ts)
                h = h.reshape(b_, t_, hh, ww, ts, 2, 2, cout)
                h = h.transpose(0, 1, 4, 2, 5, 3, 6, 7)
                h = h.reshape(b_, t_ * ts, hh * 2, ww * 2, cout)
                if caches is None and ts > 1 and tc.get(f"l{li}head") is None:
                    # first clip chunk: drop the duplicated leading frames the
                    # temporal upsample fabricates for frame 0
                    h = h[:, ts - 1:]
                new_caches[f"l{li}head"] = jnp.zeros((0,))  # mark level seen
        h = jax.nn.silu(channel_rms_norm(h, p["out_norm"]["w"], p["out_norm"]["b"]))
        h = cc("outc", h, p["out"]["w"], p["out"]["b"])
        return h, new_caches

    def decode(self, z):
        y, _ = self._decode_core(z, None)
        return y

    def decode_chunked(self, z, chunk: int = 2):
        """Stream decode over latent time in ``chunk``-size windows with the
        carried causal cache (reference streaming/micro-frame equivalent)."""
        caches = None
        outs = []
        for i in range(0, z.shape[1], chunk):
            y, caches = self._decode_core(z[:, i:i + chunk], caches)
            outs.append(y)
        return jnp.concatenate(outs, axis=1)


# --------------------------------------------------------------------------
# SD-style image VAE (FLUX / Qwen class): stride 8, z 16
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ImageVAEConfig:
    in_channels: int = 3
    z_channels: int = 16
    base: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    blocks_per_level: int = 2
    groups: int = 32

    def tiny(**kw):
        d = dict(base=8, ch_mult=(1, 2), blocks_per_level=1, z_channels=4, groups=4)
        d.update(kw)
        return ImageVAEConfig(**d)

    tiny = staticmethod(tiny)


def _resblock2d_params(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"norm1": _norm_params(cin), "conv1": _conv_params(k1, (3, 3, cin, cout)),
         "norm2": _norm_params(cout), "conv2": _conv_params(k2, (3, 3, cout, cout))}
    if cin != cout:
        p["skip"] = _conv_params(k3, (1, 1, cin, cout))
    return p


def _resblock2d(p, x, groups):
    h = jax.nn.silu(group_norm(x, p["norm1"]["w"], p["norm1"]["b"], groups))
    h = conv2d(jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0))), p["conv1"]["w"], p["conv1"]["b"])
    h = jax.nn.silu(group_norm(h, p["norm2"]["w"], p["norm2"]["b"], groups))
    h = conv2d(jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0))), p["conv2"]["w"], p["conv2"]["b"])
    if "skip" in p:
        x = conv2d(x, p["skip"]["w"], p["skip"]["b"])
    return x + h


def init_image_vae_params(key: jax.Array, cfg: ImageVAEConfig):
    ks = iter(jax.random.split(key, 64))
    nxt = lambda: next(ks)
    chs = [cfg.base * m for m in cfg.ch_mult]
    c = chs[0]
    enc = {"stem": _conv_params(nxt(), (3, 3, cfg.in_channels, c))}
    for li, ch in enumerate(chs):
        lv = {"blocks": [], "down": None}
        for _ in range(cfg.blocks_per_level):
            lv["blocks"].append(_resblock2d_params(nxt(), c, ch))
            c = ch
        if li < len(chs) - 1:
            lv["down"] = _conv_params(nxt(), (3, 3, c, c))
        enc[f"level{li}"] = lv
    enc["out_norm"] = _norm_params(c)
    enc["out"] = _conv_params(nxt(), (3, 3, c, 2 * cfg.z_channels))

    dec = {"stem": _conv_params(nxt(), (3, 3, cfg.z_channels, c)),
           "mid": _resblock2d_params(nxt(), c, c)}
    for li, ch in enumerate(reversed(chs)):
        lv = {"blocks": [], "up": None}
        for _ in range(cfg.blocks_per_level):
            lv["blocks"].append(_resblock2d_params(nxt(), c, ch))
            c = ch
        if li < len(chs) - 1:
            lv["up"] = _conv_params(nxt(), (3, 3, c, c * 4))
        dec[f"level{li}"] = lv
    dec["out_norm"] = _norm_params(c)
    dec["out"] = _conv_params(nxt(), (3, 3, c, cfg.in_channels))
    return {"encoder": enc, "decoder": dec}


class ImageVAE:
    def __init__(self, cfg: ImageVAEConfig, params):
        self.cfg = cfg
        self.params = params

    def encode(self, x):
        cfg, p = self.cfg, self.params["encoder"]
        g = cfg.groups
        chs = [cfg.base * m for m in cfg.ch_mult]
        h = conv2d(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))),
                   p["stem"]["w"], p["stem"]["b"])
        for li in range(len(chs)):
            lv = p[f"level{li}"]
            for bp in lv["blocks"]:
                h = _resblock2d(bp, h, g)
            if lv["down"] is not None:
                h = conv2d(jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0))),
                           lv["down"]["w"], lv["down"]["b"], stride=(2, 2))
        h = jax.nn.silu(group_norm(h, p["out_norm"]["w"], p["out_norm"]["b"], g))
        h = conv2d(jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0))),
                   p["out"]["w"], p["out"]["b"])
        return jnp.split(h, 2, axis=-1)

    def decode(self, z):
        cfg, p = self.cfg, self.params["decoder"]
        g = cfg.groups
        chs = [cfg.base * m for m in cfg.ch_mult]
        h = conv2d(jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0))),
                   p["stem"]["w"], p["stem"]["b"])
        h = _resblock2d(p["mid"], h, g)
        for li in range(len(chs)):
            lv = p[f"level{li}"]
            for bp in lv["blocks"]:
                h = _resblock2d(bp, h, g)
            if lv["up"] is not None:
                h = conv2d(jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0))),
                           lv["up"]["w"], lv["up"]["b"])
                b_, hh, ww, c4 = h.shape
                h = h.reshape(b_, hh, ww, 2, 2, c4 // 4)
                h = h.transpose(0, 1, 3, 2, 4, 5).reshape(b_, hh * 2, ww * 2, c4 // 4)
        h = jax.nn.silu(group_norm(h, p["out_norm"]["w"], p["out_norm"]["b"], g))
        return conv2d(jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0))),
                      p["out"]["w"], p["out"]["b"])

    def decode_tiled(self, z, tile: int = 32, overlap: int = 4):
        """Spatially tiled decode with linear overlap blending (the reference's
        tiled decode memory cap, ``autoencoder_kl_cogvideox.py`` tiling)."""
        b, zh, zw, c = z.shape
        if zh <= tile and zw <= tile:
            return self.decode(z)
        scale = 2 ** (len(self.cfg.ch_mult) - 1)  # spatial upsample factor
        step = tile - overlap
        out = None
        weight = None
        for i0 in range(0, zh, step):
            for j0 in range(0, zw, step):
                zi = z[:, i0:i0 + tile, j0:j0 + tile]
                yi = self.decode(zi)
                ph, pw_ = yi.shape[1], yi.shape[2]
                if out is None:
                    out = jnp.zeros((b, zh * scale, zw * scale, yi.shape[-1]))
                    weight = jnp.zeros((1, zh * scale, zw * scale, 1))
                wy = np.ones((ph, pw_), np.float32)
                ov = overlap * scale
                if ov > 0:
                    ramp = np.linspace(0, 1, ov, endpoint=False)
                    if i0 > 0:
                        wy[:ov] *= ramp[:, None]
                    if j0 > 0:
                        wy[:, :ov] *= ramp[None, :]
                wz = jnp.asarray(wy)[None, :, :, None]
                out = out.at[:, i0 * scale:i0 * scale + ph,
                             j0 * scale:j0 * scale + pw_].add(yi * wz)
                weight = weight.at[:, i0 * scale:i0 * scale + ph,
                                   j0 * scale:j0 * scale + pw_].add(wz)
        return out / jnp.maximum(weight, 1e-8)


# --------------------------------------------------------------------------
# Open-Sora V1.2 composite VAE: spatial 2-D VAE + temporal causal VAE over
# independent micro-frame chunks
# --------------------------------------------------------------------------

class MicroFrameVAE:
    """The Open-Sora VAE pipeline (``videosys/models/autoencoders/
    autoencoder_kl_open_sora.py:621-761``): a 2-D spatial VAE runs per frame,
    then a temporal causal VAE compresses time — processed in independent
    ``micro_frame_size`` (17-frame) chunks so memory stays bounded and chunks
    parallelize (``micro_frame_size`` splitting :640-664). Optional
    ``micro_batch`` splits the batch the same way.
    """

    def __init__(self, spatial: "ImageVAE", temporal: "CausalVAE",
                 micro_frame_size: int = 17, micro_batch: Optional[int] = None):
        self.spatial = spatial
        self.temporal = temporal
        self.micro_frame_size = micro_frame_size
        self.micro_batch = micro_batch

    def _spatial_encode(self, x):
        b, t = x.shape[:2]
        flat = x.reshape((b * t,) + x.shape[2:])
        mean, _ = self.spatial.encode(flat)
        return mean.reshape((b, t) + mean.shape[1:])

    def _spatial_decode(self, z):
        b, t = z.shape[:2]
        flat = z.reshape((b * t,) + z.shape[2:])
        y = self.spatial.decode(flat)
        return y.reshape((b, t) + y.shape[1:])

    def encode(self, x):
        """pixels [B, T, H, W, 3] -> latents [B, T', H/8s, W/8s, z]."""
        zs = self._spatial_encode(x)
        outs = []
        mf = self.micro_frame_size
        for i in range(0, zs.shape[1], mf):
            chunk = zs[:, i:i + mf]
            mean, _ = self.temporal.encode(chunk)
            outs.append(mean)
        return jnp.concatenate(outs, axis=1)

    def decode(self, z, latent_chunk: Optional[int] = None):
        """latents -> pixels; chunks decode independently (per-micro-frame
        reset, unlike `CausalVAE.decode_chunked`'s carried-cache streaming).

        Chunk sizing follows the temporal VAE's declared
        ``front_padded_latents`` invariant (VAE_Temporal front-pads and takes
        a num_frames hint; CausalVAE keeps frame 1 causally)."""
        want_nf = bool(getattr(self.temporal, "front_padded_latents", False))
        ds = 2 ** sum(self.temporal.cfg.temporal_downsample)
        if latent_chunk is None:
            if want_nf:        # VAE_Temporal front-pads: ceil(mf / ds) latents
                latent_chunk = -(-self.micro_frame_size // ds)
            else:              # CausalVAE keeps frame 1: 1 + (mf-1)//ds
                latent_chunk = 1 + (self.micro_frame_size - 1) // ds
        outs = []
        for i in range(0, z.shape[1], latent_chunk):
            zc = z[:, i:i + latent_chunk]
            if want_nf:
                y = self.temporal.decode(
                    zc, num_frames=min(self.micro_frame_size,
                                       zc.shape[1] * ds))
            else:
                y = self.temporal.decode(zc)
            outs.append(self._spatial_decode(y))
        return jnp.concatenate(outs, axis=1)
