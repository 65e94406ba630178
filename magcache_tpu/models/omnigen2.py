"""OmniGen2 decoder DiT, TPU-native.

The architecture behind ``MagCache4OmniGen2/magcache/magcache_utils.py:247-392``
(its ``magcache_forward`` spells out the call structure): a Lumina2-lineage
single-stream transformer —

1. ``time_caption_embed``: timestep MLP -> temb; caption states RMS-normed and
   projected to the hidden width;
2. ``context_refiner``: text-only blocks (rotary over sequential ids, no
   temb modulation);
3. ``noise_refiner`` / ``ref_image_refiner``: image-only blocks WITH temb
   modulation, run on the patch-embedded noise / reference-image tokens
   (``img_patch_embed_and_refine``);
4. ``layers``: joint blocks over [text; ref images; noise] with 3-axis rotary
   (sequence-id, y, x) — THE trunk MagCache elides (the reference's residual
   is measured on this joint stream, ``magcache_utils.py:352-369``);
5. ``norm_out``: temb-conditioned final norm + projection, unpatchify of the
   noise segment only.

Block design (Lumina2/OmniGen2): sandwich RMSNorm with tanh-gated adaLN —

    s_msa, g_msa, s_mlp, g_mlp = Linear(silu(temb)) -> 4 chunks
    x = x + tanh(g_msa) * norm2(attn(norm1(x) * (1 + s_msa)))
    x = x + tanh(g_mlp) * ffn_norm2(swiglu(ffn_norm1(x) * (1 + s_mlp)))

with grouped-query attention (heads q, fewer kv heads) and RMS q/k norms.
Static shapes throughout (fixed text length / image grid) — the reference's
ragged per-sample padding loops become one padded layout chosen at trace time.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magcache_tpu.core.sampler import DiTCore
from magcache_tpu.models.common import linear, linear_params, timestep_embedding
from magcache_tpu.ops.attention import QKNORM_FIXED_MAX, attention
from magcache_tpu.ops.norms import layer_norm, rms_norm
from magcache_tpu.ops.rope import apply_rope, rope_freqs_1d
from magcache_tpu.parallel.mesh import maybe_shard

__all__ = ["OmniGen2Config", "init_omnigen2_params", "make_omnigen2_core"]


@dataclasses.dataclass(frozen=True)
class OmniGen2Config:
    hidden: int = 2520
    heads: int = 21
    kv_heads: int = 7                  # grouped-query attention
    layers: int = 32
    refiner_layers: int = 2            # context + noise + ref refiners
    ffn_mult: float = 8 / 3            # SwiGLU inner = mult * hidden (rounded)
    in_channels: int = 16
    text_dim: int = 2304               # Qwen2.5-VL-3B hidden states
    patch: int = 2
    axes_dims: Tuple[int, int, int] = (40, 40, 40)  # (seq-id, y, x) rope
    time_embed_dim: int = 256
    temb_dim: int = 1024               # modulation width (min(hidden, 1024))
    eps: float = 1e-5
    dtype: str = "float32"
    remat: bool = False

    @property
    def head_dim(self):
        return self.hidden // self.heads

    # exact SwiGLU inner width when known (checkpoint-sniffed); overrides the
    # ffn_mult rounding formula
    ffn_dim_override: Optional[int] = None

    @property
    def ffn_dim(self):
        if self.ffn_dim_override is not None:
            return self.ffn_dim_override
        # Llama-style rounding to a multiple of 256
        d = int(self.hidden * self.ffn_mult)
        return ((d + 255) // 256) * 256

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def tiny(**kw):
        d = dict(hidden=96, heads=4, kv_heads=2, layers=2, refiner_layers=1,
                 text_dim=24, axes_dims=(8, 8, 8), time_embed_dim=32,
                 temb_dim=48)
        d.update(kw)
        return OmniGen2Config(**d)

    tiny = staticmethod(tiny)


def _block_params(key, cfg: OmniGen2Config, depth: int, modulated: bool):
    d, dk = cfg.hidden, cfg.kv_heads * cfg.head_dim
    ks = iter(jax.random.split(key, 10))
    nxt = lambda: next(ks)

    def st(i, o):
        return linear_params(nxt(), i, o, depth=depth, dtype=cfg.jdtype,
                             bias=False)

    p = {
        "q": st(d, d),
        "kv": st(d, 2 * dk),
        "o": st(d, d),
        "q_norm": jnp.ones((depth, cfg.head_dim), jnp.float32),
        "k_norm": jnp.ones((depth, cfg.head_dim), jnp.float32),
        "norm1": jnp.ones((depth, d), jnp.float32),
        "norm2": jnp.ones((depth, d), jnp.float32),
        "ffn_norm1": jnp.ones((depth, d), jnp.float32),
        "ffn_norm2": jnp.ones((depth, d), jnp.float32),
        "w1": st(d, cfg.ffn_dim),
        "w3": st(d, cfg.ffn_dim),
        "w2": st(cfg.ffn_dim, d),
    }
    if modulated:
        p["mod"] = linear_params(nxt(), cfg.temb_dim, 4 * d, depth=depth)
    return p


def init_omnigen2_params(key: jax.Array, cfg: OmniGen2Config):
    d = cfg.hidden
    ks = iter(jax.random.split(key, 12))
    nxt = lambda: next(ks)
    pin = cfg.in_channels * cfg.patch * cfg.patch
    return {
        "t_embed": {"in": linear_params(nxt(), cfg.time_embed_dim, cfg.temb_dim),
                    "out": linear_params(nxt(), cfg.temb_dim, cfg.temb_dim)},
        "cap_norm": jnp.ones((cfg.text_dim,), jnp.float32),
        # embed projections carry the trunk dtype — an f32 kernel here would
        # promote every downstream GEMM to f32 (the STDiT3-class silent 4x
        # MXU-rate bug, tests/test_dtype_discipline.py)
        "cap_proj": linear_params(nxt(), cfg.text_dim, d, dtype=cfg.jdtype),
        "x_embed": linear_params(nxt(), pin, d, dtype=cfg.jdtype),
        "ref_embed": linear_params(nxt(), pin, d, dtype=cfg.jdtype),
        "context_refiner": _block_params(nxt(), cfg, cfg.refiner_layers, False),
        "noise_refiner": _block_params(nxt(), cfg, cfg.refiner_layers, True),
        "ref_refiner": _block_params(nxt(), cfg, cfg.refiner_layers, True),
        "layers": _block_params(nxt(), cfg, cfg.layers, True),
        "norm_out_mod": linear_params(nxt(), cfg.temb_dim, d),  # scale only
        "final_out": linear_params(nxt(), d, pin),
    }


def _rope_tables(cfg: OmniGen2Config, txt_len: int, grid: Tuple[int, int],
                 ref_images: int):
    """(cos, sin) over [text; ref_0..; noise]: text ids run 0..T-1 on the
    sequence axis; each image takes one sequence id (T+k) and a (y, x) grid —
    the rope_embedder's position assignment (magcache_utils.py:300-313)."""
    gh, gw = grid
    rows = []
    txt = np.stack([np.arange(txt_len), np.zeros(txt_len), np.zeros(txt_len)],
                   axis=-1)
    rows.append(txt)
    for k in range(ref_images + 1):            # refs then noise
        ys, xs = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        sid = np.full(gh * gw, txt_len + k)
        rows.append(np.stack([sid, ys.reshape(-1), xs.reshape(-1)], axis=-1))
    coords = np.concatenate(rows, axis=0)
    cos_p, sin_p = [], []
    for ax, dim_a in enumerate(cfg.axes_dims):
        c, s = rope_freqs_1d(coords[:, ax], dim_a)
        cos_p.append(c)
        sin_p.append(s)
    return np.concatenate(cos_p, -1), np.concatenate(sin_p, -1)


def _run_blocks(cfg: OmniGen2Config, p, x, temb, rope, remat=False):
    """Scan a stacked block group over x [B, S, d]; temb may be None."""
    cos, sin = rope
    b = x.shape[0]
    hq, hk, hd = cfg.heads, cfg.kv_heads, cfg.head_dim

    def block(bp, x):
        if temb is not None:
            # LuminaRMSNormZero: silu on temb before the 4-chunk projection
            mod = linear(bp["mod"], jax.nn.silu(temb)).astype(jnp.float32)
            s_msa, g_msa, s_mlp, g_mlp = [
                mod[:, None, i * cfg.hidden:(i + 1) * cfg.hidden]
                for i in range(4)]
        else:
            s_msa = g_msa = s_mlp = g_mlp = None

        n = rms_norm(x, bp["norm1"], eps=cfg.eps)
        if s_msa is not None:
            n = (n.astype(jnp.float32) * (1 + s_msa)).astype(x.dtype)
        from magcache_tpu.ops.fused_prologue import rms_norm_rope
        kv = linear(bp["kv"], n)
        kf, vf = jnp.split(kv, 2, axis=-1)
        q = rms_norm_rope(linear(bp["q"], n), bp["q_norm"], cos, sin, hq,
                          eps=cfg.eps, norm_scope="head")
        k = rms_norm_rope(kf, bp["k_norm"], cos, sin, hk,
                          eps=cfg.eps, norm_scope="head")
        v = vf.reshape(b, -1, hk, hd)
        # GQA: repeat kv heads to match q heads
        rep = hq // hk
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        a = attention(q, k, v, fixed_max=QKNORM_FIXED_MAX).reshape(x.shape)
        a = linear(bp["o"], a)
        a = rms_norm(a, bp["norm2"], eps=cfg.eps)
        if g_msa is not None:
            a = (jnp.tanh(g_msa) * a.astype(jnp.float32)).astype(x.dtype)
        x = x + a

        n = rms_norm(x, bp["ffn_norm1"], eps=cfg.eps)
        if s_mlp is not None:
            n = (n.astype(jnp.float32) * (1 + s_mlp)).astype(x.dtype)
        f = linear(bp["w2"], jax.nn.silu(linear(bp["w1"], n)) * linear(bp["w3"], n))
        f = rms_norm(f, bp["ffn_norm2"], eps=cfg.eps)
        if g_mlp is not None:
            f = (jnp.tanh(g_mlp) * f.astype(jnp.float32)).astype(x.dtype)
        return x + f

    def body(carry, bp):
        return block(bp, carry), None

    fn = jax.checkpoint(body) if remat else body
    x, _ = jax.lax.scan(fn, x, p)
    return x


def _patchify(cfg: OmniGen2Config, img):
    # feature order (p1, p2, c) — the checkpoint's '(h w) (p1 p2 c)' layout
    # (magcache_utils.py:222 output rearrange; x_embedder uses the same)
    b, hh, ww, c = img.shape
    pp = cfg.patch
    x = img.reshape(b, hh // pp, pp, ww // pp, pp, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (hh // pp) * (ww // pp), pp * pp * c)


def make_teacache_signal(cfg: OmniGen2Config):
    """TeaCache decision signal: the FIRST main layer's LuminaRMSNormZero-
    modulated attention input, ``norm1(x) * (1 + s_msa)`` — the hook the
    published Lumina-family teacache polynomials are fitted to (the raw trunk
    input has a different distribution and would shift skip decisions)."""

    def fn(params, hidden, ctx):
        bp = jax.tree.map(
            lambda a: a[0],
            {"mod": params["layers"]["mod"], "norm1": params["layers"]["norm1"]})
        mod = linear(bp["mod"], jax.nn.silu(ctx["temb"])).astype(jnp.float32)
        s_msa = mod[:, None, :cfg.hidden]
        n = rms_norm(hidden, bp["norm1"], eps=cfg.eps)
        return n.astype(jnp.float32) * (1 + s_msa)

    return fn


def make_omnigen2_core(cfg: OmniGen2Config, txt_len: int,
                       grid: Tuple[int, int], ref_images: int = 0) -> DiTCore:
    """cond = {"txt": f[B, txt_len, text_dim], "ref": f[B, R, H, W, C]
    (edit mode)}; x = noise latents f[B, H*p, W*p? no: H_pix_lat, W_lat, C].

    x: f[B, gh*p, gw*p, C] channel-last latent image. The MagCache residual
    rides the joint [text; refs; noise] stream (magcache_utils.py:352-369).
    """
    gh, gw = grid
    img_tokens = gh * gw
    rope_np = _rope_tables(cfg, txt_len, grid, ref_images)
    cos = jnp.asarray(rope_np[0])
    sin = jnp.asarray(rope_np[1])
    # per-segment rope slices for the refiners
    txt_rope = (cos[:txt_len], sin[:txt_len])
    seg = lambda k: slice(txt_len + k * img_tokens, txt_len + (k + 1) * img_tokens)
    noise_rope = (cos[seg(ref_images)], sin[seg(ref_images)])

    def prepare(params, x, t, cond):
        dt_ = cfg.jdtype
        temb = linear(params["t_embed"]["out"], jax.nn.silu(
            linear(params["t_embed"]["in"],
                   timestep_embedding(t, cfg.time_embed_dim))))

        txt = rms_norm(cond["txt"].astype(jnp.float32), params["cap_norm"],
                       eps=cfg.eps)
        txt = linear(params["cap_proj"], txt).astype(dt_)
        txt = _run_blocks(cfg, params["context_refiner"], txt, None, txt_rope)

        noise = linear(params["x_embed"], _patchify(cfg, x.astype(dt_)))
        noise = _run_blocks(cfg, params["noise_refiner"], noise, temb,
                            noise_rope)

        segs = [txt]
        for r in range(ref_images):
            ref = cond["ref"][:, r].astype(dt_)
            rt = linear(params["ref_embed"], _patchify(cfg, ref))
            rt = _run_blocks(cfg, params["ref_refiner"], rt, temb,
                             (cos[seg(r)], sin[seg(r)]))
            segs.append(rt)
        segs.append(noise)
        hidden = jnp.concatenate(segs, axis=1)
        hidden = maybe_shard(hidden, "tokens")
        return hidden, {"temb": temb}

    def trunk(params, hidden, ctx):
        return _run_blocks(cfg, params["layers"], hidden, ctx["temb"],
                           (cos, sin), remat=cfg.remat)

    def head(params, hidden, ctx):
        # norm_out: temb-conditioned scale (LuminaLayerNormContinuous) on the
        # noise segment, then projection + unpatchify.
        h = hidden[:, -img_tokens:]
        scale = linear(params["norm_out_mod"],
                       jax.nn.silu(ctx["temb"])).astype(jnp.float32)
        # LuminaLayerNormContinuous: affine-free layer norm, temb scale, then
        # the projection lives inside norm_out (linear_2)
        h = layer_norm(h, eps=cfg.eps)
        h = (h * (1 + scale[:, None])).astype(hidden.dtype)
        out = linear(params["final_out"], h)
        b = out.shape[0]
        pp, c = cfg.patch, cfg.in_channels
        # '(h w) (p1 p2 c)' unpatchify (magcache_utils.py:222)
        out = out.reshape(b, gh, gw, pp, pp, c)
        out = out.transpose(0, 1, 3, 2, 4, 5)
        return out.reshape(b, gh * pp, gw * pp, c).astype(jnp.float32)

    return DiTCore(prepare, trunk, head)
