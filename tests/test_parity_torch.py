"""Numerical golden tests: our JAX blocks vs independent torch transcriptions
of the documented math (built from the behavioral spec, with shared weights).

This is the per-module parity strategy SURVEY §7.4 calls for — since real
checkpoints aren't available offline, the torch side is transcribed from the
same spec and acts as an independent implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from magcache_tpu.models.wan import WanConfig, init_wan_params, make_wan_core  # noqa: E402


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


def torch_wan_block(p, x, e0, context, cos, sin, heads, eps=1e-6):
    """Independent torch transcription of one Wan attention block."""
    d = x.shape[-1]

    def lin(pp, h):
        w = _t(pp["w"])
        out = h @ w
        if "b" in pp:
            out = out + _t(pp["b"])
        return out

    def rms(h, w):
        return h * torch.rsqrt(h.pow(2).mean(-1, keepdim=True) + eps) * _t(w)

    def rope(h):  # [B, S, H, hd] interleaved pairs
        b, s, nh, hd = h.shape
        pairs = h.reshape(b, s, nh, hd // 2, 2)
        xe, xo = pairs[..., 0], pairs[..., 1]
        c = _t(cos)[None, :, None, :]
        sn = _t(sin)[None, :, None, :]
        re = xe * c - xo * sn
        im = xe * sn + xo * c
        return torch.stack([re, im], dim=-1).reshape(b, s, nh, hd)

    def attn(q, k, v):
        # [B, S, H, hd] -> torch sdpa
        q, k, v = (z.transpose(1, 2) for z in (q, k, v))
        o = F.scaled_dot_product_attention(q, k, v)
        return o.transpose(1, 2)

    e = _t(p["modulation"])[None] + _t(e0)
    ch = [e[:, i].unsqueeze(1) for i in range(6)]

    xn = F.layer_norm(x, (d,), eps=eps) * (1 + ch[1]) + ch[0]
    q = rms(lin(p["q"], xn), p["norm_q"])
    k = rms(lin(p["k"], xn), p["norm_k"])
    v = lin(p["v"], xn)
    b, s, _ = x.shape
    rs = lambda z: z.reshape(b, s, heads, -1)
    a = attn(rope(rs(q)), rope(rs(k)), rs(v)).reshape(b, s, d)
    x = x + lin(p["o"], a) * ch[2]

    xc = F.layer_norm(x, (d,), eps=eps) * _t(p["norm3_w"]) + _t(p["norm3_b"])
    cq = rms(lin(p["cross_q"], xc), p["cross_norm_q"])
    ck = rms(lin(p["cross_k"], context), p["cross_norm_k"])
    cv = lin(p["cross_v"], context)
    sc = context.shape[1]
    ca = attn(cq.reshape(b, s, heads, -1), ck.reshape(b, sc, heads, -1),
              cv.reshape(b, sc, heads, -1)).reshape(b, s, d)
    x = x + lin(p["cross_o"], ca)

    xm = F.layer_norm(x, (d,), eps=eps) * (1 + ch[4]) + ch[3]
    y = lin(p["ffn2"], F.gelu(lin(p["ffn1"], xm), approximate="tanh"))
    return x + y * ch[5]


def test_wan_block_matches_torch_transcription():
    cfg = WanConfig.tiny(layers=1)
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    grid = (2, 4, 4)
    core = make_wan_core(cfg, grid)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 8, cfg.in_channels)), jnp.float32)
    cond = {"context": jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)), jnp.float32)}
    t = jnp.full((1,), 500.0, jnp.float32)
    hidden, ctx = core.prepare(params, x, t, cond)
    ours = np.asarray(core.trunk(params, hidden, ctx))

    # torch side: same weights (layer 0 slices), same embedded inputs
    from magcache_tpu.models.wan import wan_rope_tables
    cos, sin = wan_rope_tables(cfg, grid)
    bp = jax.tree.map(lambda a: np.asarray(a[0]), params["blocks"])
    theirs = torch_wan_block(
        bp, _t(hidden), np.asarray(ctx["e0"]), _t(np.asarray(ctx["context"])),
        cos, sin, cfg.heads)
    np.testing.assert_allclose(ours, theirs.numpy(), atol=2e-4, rtol=2e-4)


def torch_flux_double_block(p, img, txt, vec, cos, sin, heads, eps=1e-6):
    """Independent torch transcription of one FLUX double-stream block."""
    d = img.shape[-1]

    def lin(pp, h):
        out = h @ _t(pp["w"])
        if "b" in pp:
            out = out + _t(pp["b"])
        return out

    def mod(pp, n):
        out = lin(pp, F.silu(vec))
        return out.unsqueeze(1).chunk(n, dim=-1)

    def rms_head(h, w):
        return h * torch.rsqrt(h.pow(2).mean(-1, keepdim=True) + eps) * _t(w)

    def rope(h):
        b, s, nh, hd = h.shape
        pairs = h.reshape(b, s, nh, hd // 2, 2)
        xe, xo = pairs[..., 0], pairs[..., 1]
        c = _t(cos)[None, :, None, :]
        sn = _t(sin)[None, :, None, :]
        return torch.stack([xe * c - xo * sn, xe * sn + xo * c],
                           dim=-1).reshape(b, s, nh, hd)

    i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = mod(p["img_mod"], 6)
    t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = mod(p["txt_mod"], 6)

    b, si, _ = img.shape
    st = txt.shape[1]
    img_n = F.layer_norm(img, (d,), eps=1e-6) * (1 + i_sc1) + i_sh1
    txt_n = F.layer_norm(txt, (d,), eps=1e-6) * (1 + t_sc1) + t_sh1
    iq, ik, iv = lin(p["img_qkv"], img_n).chunk(3, dim=-1)
    tq, tk, tv = lin(p["txt_qkv"], txt_n).chunk(3, dim=-1)
    rs = lambda z, s: z.reshape(b, s, heads, -1)
    iq, ik = (rms_head(rs(z, si), p["img_qk_scale"][i]) for i, z in enumerate((iq, ik)))
    tq, tk = (rms_head(rs(z, st), p["txt_qk_scale"][i]) for i, z in enumerate((tq, tk)))
    # build [txt; img] with rope applied
    q = rope(torch.cat([tq, iq], dim=1))
    k = rope(torch.cat([tk, ik], dim=1))
    v = torch.cat([rs(tv, st), rs(iv, si)], dim=1)
    o = F.scaled_dot_product_attention(q.transpose(1, 2), k.transpose(1, 2),
                                       v.transpose(1, 2)).transpose(1, 2)
    o = o.reshape(b, st + si, d)
    t_attn, i_attn = o[:, :st], o[:, st:]
    img = img + i_g1 * lin(p["img_proj"], i_attn)
    txt = txt + t_g1 * lin(p["txt_proj"], t_attn)

    img_m = F.layer_norm(img, (d,), eps=1e-6) * (1 + i_sc2) + i_sh2
    img = img + i_g2 * lin(p["img_mlp2"], F.gelu(lin(p["img_mlp1"], img_m),
                                                 approximate="tanh"))
    txt_m = F.layer_norm(txt, (d,), eps=1e-6) * (1 + t_sc2) + t_sh2
    txt = txt + t_g2 * lin(p["txt_mlp2"], F.gelu(lin(p["txt_mlp1"], txt_m),
                                                 approximate="tanh"))
    return img, txt


def test_flux_double_block_matches_torch_transcription():
    from magcache_tpu.models.flux import (
        FluxConfig, _double_block, flux_rope_tables, init_flux_params)
    cfg = FluxConfig.tiny(depth_double=1, depth_single=0)
    params = init_flux_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    txt_len, gh, gw = 8, 4, 4
    cos, sin = flux_rope_tables(cfg, txt_len, gh, gw)
    img = jnp.asarray(rng.normal(size=(1, gh * gw, cfg.hidden)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(1, txt_len, cfg.hidden)), jnp.float32)
    vec = jnp.asarray(rng.normal(size=(1, cfg.hidden)), jnp.float32)

    bp = jax.tree.map(lambda a: a[0], params["double"])
    img_j, txt_j, _ = _double_block(cfg, (jnp.asarray(cos), jnp.asarray(sin)),
                                    bp, (img, txt, vec))

    bp_np = jax.tree.map(lambda a: np.asarray(a), bp)
    img_t, txt_t = torch_flux_double_block(bp_np, _t(img), _t(txt), _t(vec),
                                           cos, sin, cfg.heads)
    np.testing.assert_allclose(np.asarray(img_j), img_t.numpy(), atol=2e-4,
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(txt_j), txt_t.numpy(), atol=2e-4,
                               rtol=2e-4)
