"""Wan2.1 video VAE, weight-mappable, TPU-native (channel-last).

The Wan checkpoints (``--ckpt_dir``'s ``Wan2.1_VAE.pth``) come from the
official ``wan`` package's 3-D causal VAE (the reference repo drives it via
``wan.WanT2V``/``WanI2V`` from ``MagCache4Wan2.1/magcache_generate.py`` but
does not vendor the module). Architecture, transcribed from the public
Wan2.1 design:

- base 96, mults (1, 2, 4, 4), 2 residual blocks per level, z = 16;
  spatial /8, temporal /4 (3-D resamples on the middle two transitions);
- ResidualBlock: RMS-norm -> SiLU -> causal conv3d, twice, + 1x1x1 shortcut
  when channels change (sequential indices 0/2/3/6 in the state dict);
- middle: residual, single-head per-frame spatial attention
  (RMS-norm + 1x1 qkv/proj convs), residual;
- Resample down: ZeroPad(0,1,0,1)+Conv2d stride 2 (+ causal (3,1,1)
  stride-2 time conv for 3-D); up: nearest x2 + Conv2d halving channels
  (+ time conv doubling channels reshaped into 2x frames for 3-D);
- head: RMS-norm -> SiLU -> causal conv3d.

Provenance note: the zero-egress build image contains neither the ``wan``
package nor its checkpoints; the converter's key layout
(``encoder.downsamples.{k}.residual.{0,3}.gamma`` / ``.{2,6}.weight`` …) is
validated against synthetic state dicts here and should be spot-checked
against a real ``Wan2.1_VAE.pth`` on first availability.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.models.vae import causal_conv3d, channel_rms_norm

__all__ = ["WanVAEConfig", "init_wan_vae_params", "WanVAE",
           "convert_wan_vae_state_dict"]


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    base: int = 96
    z_channels: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_down: Tuple[bool, ...] = (False, True, True)  # per transition
    # Wan2.2-VAE (ti2v-5B): 2x2 pixel patchify in front of the same backbone
    # -> 16x16x4 total compression at 48 latent channels (base=160). 1 = the
    # Wan2.1 layout.
    patchify: int = 1
    eps: float = 1e-6
    # latent normalization (the published per-channel mean/std vectors are
    # hard-coded in the official wan/modules/vae.py source, NOT the .pth —
    # set them here when transcribing from the wan package; identity default)
    latent_scale: float = 1.0
    latent_mean: Optional[Tuple[float, ...]] = None   # len z_channels
    latent_std: Optional[Tuple[float, ...]] = None
    # compute dtype for the conv stack. float32 (default) matches the
    # official wan/modules/vae.py numerics; "bfloat16" runs convs on the
    # MXU's 4x-faster bf16 path (norm statistics stay f32) — measured 480p
    # x 81f streamed decode 5.9s -> see NOTES; opt in via --vae_dtype
    dtype: str = "float32"

    def tiny(**kw):
        d = dict(base=8, dim_mult=(1, 2), num_res_blocks=1,
                 temporal_down=(True,), z_channels=4)
        d.update(kw)
        return WanVAEConfig(**d)

    tiny = staticmethod(tiny)

    @property
    def pixel_channels(self) -> int:
        return 3 * self.patchify * self.patchify


# published Wan2.2-VAE geometry (the ti2v-5B latent space)
WAN22_VAE = WanVAEConfig(base=160, z_channels=48, patchify=2)


def _patchify_pixels(x, p):
    """[B,T,H,W,3] -> [B,T,H/p,W/p,3*p*p] (pixel-unshuffle; channel order
    (c, dh, dw) like torch's rearrange 'c (h p)(w q) -> (c p q) h w')."""
    if p == 1:
        return x
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // p, p, w // p, p, c)
    return x.transpose(0, 1, 2, 4, 6, 3, 5).reshape(
        b, t, h // p, w // p, c * p * p)


def _unpatchify_pixels(x, p):
    if p == 1:
        return x
    b, t, h, w, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, t, h, w, c, p, p)
    return x.transpose(0, 1, 2, 5, 3, 6, 4).reshape(b, t, h * p, w * p, c)


def _c3(key, kt, kh, kw, cin, cout):
    w = jax.random.normal(key, (kt, kh, kw, cin, cout), jnp.float32)
    return {"w": w / np.sqrt(kt * kh * kw * cin),
            "b": jnp.zeros((cout,), jnp.float32)}


def _c2(key, kh, kw, cin, cout):
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
    return {"w": w / np.sqrt(kh * kw * cin),
            "b": jnp.zeros((cout,), jnp.float32)}


def _res_p(key, cin, cout):
    ks = jax.random.split(key, 3)
    p = {"norm1": jnp.ones((cin,), jnp.float32),
         "conv1": _c3(ks[0], 3, 3, 3, cin, cout),
         "norm2": jnp.ones((cout,), jnp.float32),
         "conv2": _c3(ks[1], 3, 3, 3, cout, cout)}
    if cin != cout:
        p["shortcut"] = _c3(ks[2], 1, 1, 1, cin, cout)
    return p


def _attn_p(key, c):
    ks = jax.random.split(key, 2)
    return {"norm": jnp.ones((c,), jnp.float32),
            "qkv": _c2(ks[0], 1, 1, c, 3 * c),
            "proj": _c2(ks[1], 1, 1, c, c)}


def init_wan_vae_params(key: jax.Array, cfg: WanVAEConfig):
    dims = [cfg.base * m for m in cfg.dim_mult]
    ks = iter(jax.random.split(key, 96))
    nxt = lambda: next(ks)

    def stage(dims_seq, temporal, nblocks, down):
        """List of level dicts: blocks + optional resample conv(s)."""
        levels = []
        cin = dims_seq[0]
        for i, cout in enumerate(dims_seq):
            lv = {"blocks": [], "resample": None, "time_conv": None}
            for j in range(nblocks):
                lv["blocks"].append(_res_p(nxt(), cin if j == 0 else cout, cout))
            if i < len(dims_seq) - 1:
                c_out_rs = cout if down else cout // 2
                lv["resample"] = _c2(nxt(), 3, 3, cout, c_out_rs)
                if temporal[i]:
                    tc_out = cout * (1 if down else 2)
                    lv["time_conv"] = _c3(nxt(), 3, 1, 1, cout, tc_out)
                cin = c_out_rs
            levels.append(lv)
        return levels

    enc = {
        "conv1": _c3(nxt(), 3, 3, 3, cfg.pixel_channels, dims[0]),
        "levels": stage(dims, cfg.temporal_down, cfg.num_res_blocks, True),
        "mid": [_res_p(nxt(), dims[-1], dims[-1]),
                _res_p(nxt(), dims[-1], dims[-1])],
        "mid_attn": _attn_p(nxt(), dims[-1]),
        "head_norm": jnp.ones((dims[-1],), jnp.float32),
        "head": _c3(nxt(), 3, 3, 3, dims[-1], 2 * cfg.z_channels),
    }
    rdims = list(reversed(dims))
    # decoder channel flow: resample halves channels on 2-D/3-D up
    dec_levels = []
    cin = rdims[0]
    tups = list(reversed(cfg.temporal_down))
    for i, cout in enumerate(rdims):
        lv = {"blocks": [], "resample": None, "time_conv": None}
        for j in range(cfg.num_res_blocks + 1):
            lv["blocks"].append(_res_p(nxt(), cin if j == 0 else cout, cout))
        if i < len(rdims) - 1:
            lv["resample"] = _c2(nxt(), 3, 3, cout, cout // 2)
            if tups[i]:
                lv["time_conv"] = _c3(nxt(), 3, 1, 1, cout, cout * 2)
            cin = cout // 2
        dec_levels.append(lv)
    dec = {
        "conv1": _c3(nxt(), 3, 3, 3, cfg.z_channels, rdims[0]),
        "mid": [_res_p(nxt(), rdims[0], rdims[0]),
                _res_p(nxt(), rdims[0], rdims[0])],
        "mid_attn": _attn_p(nxt(), rdims[0]),
        "levels": dec_levels,
        "head_norm": jnp.ones((rdims[-1],), jnp.float32),
        "head": _c3(nxt(), 3, 3, 3, rdims[-1], cfg.pixel_channels),
    }
    return {
        "encoder": enc,
        "decoder": dec,
        # WanVAE_'s 1x1x1 pre/post-quant convs
        "quant": _c3(nxt(), 1, 1, 1, 2 * cfg.z_channels, 2 * cfg.z_channels),
        "post_quant": _c3(nxt(), 1, 1, 1, cfg.z_channels, cfg.z_channels),
    }


def _conv2d_frames(x, p, *, stride=1, asym_pad=False):
    b, t, h, w, c = x.shape
    x2 = x.reshape(b * t, h, w, c)
    if asym_pad:
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        pad = "VALID"
    else:
        pad = "SAME"
    y = jax.lax.conv_general_dilated(
        x2, p["w"], (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]
    return y.reshape(b, t, y.shape[1], y.shape[2], y.shape[3])


def _cast_conv_params(params, dtype):
    """Cast conv kernels/biases to ``dtype``; norm gammas stay f32 (the
    channel RMS norm computes in f32 regardless)."""
    def walk(node):
        if isinstance(node, dict):
            if "w" in node:
                return {k: (v.astype(dtype) if k in ("w", "b") else walk(v))
                        for k, v in node.items()}
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node
    return walk(params)


class WanVAE:
    """encode: [B, F, H, W, 3] -> (mean, logvar); decode: latents -> pixels."""

    def __init__(self, cfg: WanVAEConfig, params):
        self.cfg = cfg
        self.jdtype = jnp.dtype(getattr(cfg, "dtype", "float32"))
        if self.jdtype != jnp.float32:
            params = _cast_conv_params(params, self.jdtype)
        self.params = params
        self._jit_enc = jax.jit(self._encode_core)
        self._jit_dec = jax.jit(lambda p, z: self._decode_core(p, z, None))
        self._jit_dec_stream = jax.jit(self._decode_core)

    def _res(self, p, x, tc=None, out=None):
        """Residual block; ``tc``/``out`` thread the streaming conv caches
        (tc = this block's cache dict from the previous chunk, out = dict to
        collect the new ones). Cache-less call sites pass neither."""
        eps = self.cfg.eps
        tc = tc or {}
        nc = {}
        h = jax.nn.silu(channel_rms_norm(x, p["norm1"], None, eps=eps))
        h, nc["c1"] = causal_conv3d(h, p["conv1"]["w"], p["conv1"]["b"],
                                    tcache=tc.get("c1"))
        h = jax.nn.silu(channel_rms_norm(h, p["norm2"], None, eps=eps))
        h, nc["c2"] = causal_conv3d(h, p["conv2"]["w"], p["conv2"]["b"],
                                    tcache=tc.get("c2"))
        if "shortcut" in p:
            x, _ = causal_conv3d(x, p["shortcut"]["w"], p["shortcut"]["b"])
        if out is not None:
            out.update(nc)
        return x + h

    def _attn(self, p, x):
        """Single-head per-frame spatial self-attention (1x1 qkv/proj)."""
        b, t, h, w, c = x.shape
        n = channel_rms_norm(x, p["norm"], None, eps=self.cfg.eps)
        qkv = _conv2d_frames(n, p["qkv"])
        q, k, v = jnp.split(qkv.reshape(b * t, h * w, 3 * c), 3, axis=-1)
        # f32 softmax island (np scalar promotion), cast back for the conv
        s = jnp.einsum("bqc,bkc->bqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(c)
        a = jnp.einsum("bqk,bkc->bqc", jax.nn.softmax(s, axis=-1),
                       v.astype(jnp.float32))
        a = a.reshape(b, t, h, w, c).astype(x.dtype)
        return x + _conv2d_frames(a, p["proj"])

    def _encode_core(self, params, x, caches=None):
        """caches=None -> whole clip; else carried causal conv caches (the
        official wan VAE's chunked encode: 1 pixel frame, then 4-frame
        windows — strided time convs keep window phase via the stride-aware
        cache rule in `causal_conv3d`)."""
        cfg, p = self.cfg, params["encoder"]
        tc = caches or {}
        nc = {}

        def cc(name, x, cp, stride=(1, 1, 1)):
            y, c = causal_conv3d(x, cp["w"], cp["b"], stride=stride,
                                 tcache=tc.get(name))
            nc[name] = c
            return y

        def rb(name, bp, h):
            sub_out = {}
            h = self._res(bp, h, tc.get(name), sub_out)
            nc[name] = sub_out
            return h

        x = _patchify_pixels(x, cfg.patchify)
        h = cc("conv1", x.astype(self.jdtype), p["conv1"])
        for li, lv in enumerate(p["levels"]):
            for bi, bp in enumerate(lv["blocks"]):
                h = rb(f"l{li}b{bi}", bp, h)
            if lv["resample"] is not None:
                h = _conv2d_frames(h, lv["resample"], stride=2, asym_pad=True)
                if lv["time_conv"] is not None:
                    h = cc(f"l{li}t", h, lv["time_conv"], stride=(2, 1, 1))
        h = rb("mid0", p["mid"][0], h)
        h = self._attn(p["mid_attn"], h)
        h = rb("mid1", p["mid"][1], h)
        h = jax.nn.silu(channel_rms_norm(h, p["head_norm"], None, eps=cfg.eps))
        h = cc("head", h, p["head"])
        q = params["quant"]
        h, _ = causal_conv3d(h, q["w"], q["b"])
        mean, logvar = jnp.split(h.astype(jnp.float32), 2, axis=-1)
        return (mean, logvar), nc

    def encode(self, x, pixel_chunk: Optional[int] = 4):
        """Encode pixels to (mean, logvar). Default streams the official wan
        chunking — 1 frame, then ``pixel_chunk``-frame windows (each window a
        multiple of the total temporal stride keeps every strided conv's
        phase) — so 480p/720p clips fit HBM. ``pixel_chunk=None`` = one pass.
        """
        t_stride = 2 ** sum(self.cfg.temporal_down)
        if pixel_chunk is None or x.shape[1] <= 1:
            (mean, logvar), _ = self._jit_enc(self.params, x, None)
            return self._normalize(mean), logvar
        assert pixel_chunk % t_stride == 0, (pixel_chunk, t_stride)
        caches = None
        means, logvars = [], []
        for i in [0] + list(range(1, x.shape[1], pixel_chunk)):
            end = 1 if i == 0 else min(i + pixel_chunk, x.shape[1])
            (m, lv_), caches = self._jit_enc(
                self.params, x[:, i:end], caches)
            means.append(m)
            logvars.append(lv_)
        return (self._normalize(jnp.concatenate(means, axis=1)),
                jnp.concatenate(logvars, axis=1))

    def _normalize(self, z):
        """(z - mean) / std, the official wan latent normalization (vectors
        from the wan source; identity when unset)."""
        cfg = self.cfg
        if cfg.latent_mean is None and cfg.latent_std is None \
                and cfg.latent_scale == 1.0:
            return z
        mean = jnp.asarray(cfg.latent_mean or (0.0,) * z.shape[-1])
        std = jnp.asarray(cfg.latent_std or (1.0,) * z.shape[-1])
        return (z - mean) / (std * cfg.latent_scale)

    def _denormalize(self, z):
        cfg = self.cfg
        if cfg.latent_mean is None and cfg.latent_std is None \
                and cfg.latent_scale == 1.0:
            return z
        mean = jnp.asarray(cfg.latent_mean or (0.0,) * z.shape[-1])
        std = jnp.asarray(cfg.latent_std or (1.0,) * z.shape[-1])
        return z * (std * cfg.latent_scale) + mean

    def _decode_core(self, params, z, caches=None):
        """caches=None -> whole clip in one pass; else the carried causal
        feature cache dict (streamed decode — the official wan VAE decodes
        latent-frame-by-frame exactly this way with per-conv feat caches)."""
        cfg, p = self.cfg, params["decoder"]
        tc = caches or {}
        nc = {}

        def cc(name, x, cp):
            y, c = causal_conv3d(x, cp["w"], cp["b"], tcache=tc.get(name))
            nc[name] = c
            return y

        def rb(name, bp, h):
            sub_out = {}
            h = self._res(bp, h, tc.get(name), sub_out)
            nc[name] = sub_out
            return h

        pq = params["post_quant"]
        z = z.astype(self.jdtype)
        z, _ = causal_conv3d(z, pq["w"], pq["b"])       # 1x1x1, no state
        h = cc("conv1", z, p["conv1"])
        h = rb("mid0", p["mid"][0], h)
        h = self._attn(p["mid_attn"], h)                # per-frame spatial
        h = rb("mid1", p["mid"][1], h)
        for li, lv in enumerate(p["levels"]):
            for bi, bp in enumerate(lv["blocks"]):
                h = rb(f"l{li}b{bi}", bp, h)
            if lv["resample"] is not None:
                if lv["time_conv"] is not None:
                    # time conv doubles channels; reshape into 2x frames.
                    # The FIRST latent frame stays a single pixel frame (the
                    # causal T -> 2T-1 convention that yields the published
                    # (F_pix - 1)/4 + 1 latent frame count), so the leading
                    # duplicate is dropped — on the first chunk only when
                    # streaming.
                    y = cc(f"l{li}t", h, lv["time_conv"])
                    b, t, hh, ww, c2 = y.shape
                    y = y.reshape(b, t, hh, ww, 2, c2 // 2)
                    h = y.transpose(0, 1, 4, 2, 3, 5).reshape(
                        b, 2 * t, hh, ww, c2 // 2)
                    if f"l{li}seen" not in tc:
                        h = h[:, 1:]
                    nc[f"l{li}seen"] = jnp.zeros((0,))
                # nearest x2 spatial + channel-halving conv
                h = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
                h = _conv2d_frames(h, lv["resample"])
        h = jax.nn.silu(channel_rms_norm(h, p["head_norm"], None, eps=cfg.eps))
        h = cc("head", h, p["head"])
        h = _unpatchify_pixels(h, cfg.patchify)
        return h.astype(jnp.float32), nc

    def decode(self, z, latent_chunk: Optional[int] = 1):
        """Decode latents to pixels. Default streams one latent frame at a
        time with carried causal caches — exact (chunked == whole, tested)
        and the only way 480p x 81-frame decodes fit one chip's HBM (whole-
        clip decode allocates >17 GB). ``latent_chunk=None`` runs the single
        whole-clip program (small clips / tests)."""
        z = self._denormalize(z)
        if latent_chunk is None or z.shape[1] <= latent_chunk:
            y, _ = self._jit_dec(self.params, z)
            return y
        caches = None
        outs = []
        for i in range(0, z.shape[1], latent_chunk):
            y, caches = self._jit_dec_stream(
                self.params, z[:, i:i + latent_chunk], caches)
            outs.append(y)
        return jnp.concatenate(outs, axis=1)


# --------------------------------------------------------------------------
# converter (official wan/modules/vae.py naming)
# --------------------------------------------------------------------------

def convert_wan_vae_state_dict(sd: Dict[str, np.ndarray],
                               cfg: WanVAEConfig) -> dict:
    """Map a ``Wan2.1_VAE.pth`` state dict onto `init_wan_vae_params`.

    Keys are consumed structurally: ``{encoder|decoder}.{downsamples|
    upsamples}.{k}.…`` entries are bucketed by their flat sequential index
    and classified by leaf signature (``residual.*`` = ResidualBlock,
    ``resample.1`` / ``time_conv`` = Resample) — robust to the exact flat
    numbering. Torch conv3d [O, I, kt, kh, kw] -> [kt, kh, kw, I, O]."""
    def c3(name):
        w = np.asarray(sd[f"{name}.weight"], np.float32)
        return {"w": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
                "b": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))}

    def c2(name):
        w = np.asarray(sd[f"{name}.weight"], np.float32)
        if w.ndim == 5:  # some exports keep 1-frame conv3d for qkv/proj
            w = w[:, :, 0]
        return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "b": jnp.asarray(np.asarray(sd[f"{name}.bias"], np.float32))}

    def gamma(name):
        g = np.asarray(sd[f"{name}.gamma"], np.float32)
        return jnp.asarray(g.reshape(-1))

    def res(prefix):
        p = {"norm1": gamma(f"{prefix}.residual.0"),
             "conv1": c3(f"{prefix}.residual.2"),
             "norm2": gamma(f"{prefix}.residual.3"),
             "conv2": c3(f"{prefix}.residual.6")}
        if f"{prefix}.shortcut.weight" in sd:
            p["shortcut"] = c3(f"{prefix}.shortcut")
        return p

    def seq_units(side, seq):
        """Ordered unit list from encoder.downsamples.* / decoder.upsamples.*:
        each unit is ('res', prefix) or ('resample', prefix)."""
        idxs = sorted({int(k.split(".")[2]) for k in sd
                       if k.startswith(f"{side}.{seq}.")})
        units = []
        for i in idxs:
            pre = f"{side}.{seq}.{i}"
            if f"{pre}.residual.2.weight" in sd:
                units.append(("res", pre))
            else:
                units.append(("resample", pre))
        return units

    def stage(side, seq, nblocks, nlevels):
        units = seq_units(side, seq)
        levels = []
        u = 0
        for i in range(nlevels):
            lv = {"blocks": [], "resample": None, "time_conv": None}
            for _ in range(nblocks):
                kind, pre = units[u]; u += 1
                assert kind == "res", (side, seq, pre)
                lv["blocks"].append(res(pre))
            if i < nlevels - 1:
                kind, pre = units[u]; u += 1
                assert kind == "resample", (side, seq, pre)
                lv["resample"] = c2(f"{pre}.resample.1")
                if f"{pre}.time_conv.weight" in sd:
                    lv["time_conv"] = c3(f"{pre}.time_conv")
            levels.append(lv)
        assert u == len(units), f"unconsumed {seq} units: {units[u:]}"
        return levels

    n = len(cfg.dim_mult)
    enc = {
        "conv1": c3("encoder.conv1"),
        "levels": stage("encoder", "downsamples", cfg.num_res_blocks, n),
        "mid": [res("encoder.middle.0"), res("encoder.middle.2")],
        "mid_attn": {"norm": gamma("encoder.middle.1.norm"),
                     "qkv": c2("encoder.middle.1.to_qkv"),
                     "proj": c2("encoder.middle.1.proj")},
        "head_norm": gamma("encoder.head.0"),
        "head": c3("encoder.head.2"),
    }
    dec = {
        "conv1": c3("decoder.conv1"),
        "mid": [res("decoder.middle.0"), res("decoder.middle.2")],
        "mid_attn": {"norm": gamma("decoder.middle.1.norm"),
                     "qkv": c2("decoder.middle.1.to_qkv"),
                     "proj": c2("decoder.middle.1.proj")},
        "levels": stage("decoder", "upsamples", cfg.num_res_blocks + 1, n),
        "head_norm": gamma("decoder.head.0"),
        "head": c3("decoder.head.2"),
    }
    return {"encoder": enc, "decoder": dec,
            "quant": c3("conv1"), "post_quant": c3("conv2")}


def sniff_wan_vae_config(sd: Dict[str, np.ndarray],
                         dtype: str = "float32") -> WanVAEConfig:
    """Infer the WanVAEConfig from a checkpoint's own shapes — first contact
    with a real ``Wan2.1_VAE.pth`` should be a load, not a debugging session
    (NOTES.md "Known gaps" #1):

    - ``base``        = encoder.conv1 out-channels,
    - ``z_channels``  = decoder.conv1 in-channels,
    - ``dim_mult``    = per-level residual out-channels / base (levels split
                        at resample units in the flat downsamples sequence),
    - ``num_res_blocks`` = residual units in the first encoder level,
    - ``temporal_down``  = time_conv presence per encoder resample,
    - ``patchify``       = sqrt(encoder.conv1 in-channels / 3) — the
                           Wan2.2-VAE's 2x2 pixel-unshuffle front (in=12).
    """
    base = int(np.asarray(sd["encoder.conv1.weight"]).shape[0])
    cin = int(np.asarray(sd["encoder.conv1.weight"]).shape[1])
    patchify = int(round((cin // 3) ** 0.5))
    assert 3 * patchify * patchify == cin, f"odd conv1 in-channels {cin}"
    z = int(np.asarray(sd["decoder.conv1.weight"]).shape[1])
    idxs = sorted({int(k.split(".")[2]) for k in sd
                   if k.startswith("encoder.downsamples.")})
    levels, tdown = [[]], []
    for i in idxs:
        pre = f"encoder.downsamples.{i}"
        if f"{pre}.residual.2.weight" in sd:
            levels[-1].append(
                int(np.asarray(sd[f"{pre}.residual.2.weight"]).shape[0]))
        else:                                   # resample transition
            tdown.append(f"{pre}.time_conv.weight" in sd)
            levels.append([])
    num_res_blocks = len(levels[0])
    assert all(len(lv) == num_res_blocks for lv in levels), (
        f"uneven residual levels: {[len(lv) for lv in levels]}")
    dim_mult = tuple(lv[0] // base for lv in levels)
    return WanVAEConfig(base=base, z_channels=z, dim_mult=dim_mult,
                        num_res_blocks=num_res_blocks,
                        temporal_down=tuple(tdown), patchify=patchify,
                        dtype=dtype)


def load_wan_vae_checkpoint(path: str, cfg: Optional[WanVAEConfig] = None,
                            dtype: Optional[str] = None) -> WanVAE:
    """Build a WanVAE from a ``Wan2.1_VAE.pth`` torch checkpoint (or a
    .safetensors export). With ``cfg=None`` the geometry is shape-sniffed
    from the file itself (`sniff_wan_vae_config`). ``dtype`` overrides the
    conv compute dtype (e.g. "bfloat16" for the fast MXU path; see
    WanVAEConfig.dtype)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = load_file(path)
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: np.asarray(v) for k, v in sd.items()}
    cfg = cfg or sniff_wan_vae_config(sd)
    if dtype is not None:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, dtype=dtype)
    return WanVAE(cfg, convert_wan_vae_state_dict(sd, cfg))
