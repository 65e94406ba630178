"""In-context implementation shootout for the three slow STDiT3 components.

Same single-jit 28-pair trunk as profile_stdit3_knockout.py, but instead of
ablating a component, swaps its implementation:

- temporal attention: grouped block-diag flash / fused VPU kernel / unfused XLA
- spatial attention:  padded bshd flash / XLA einsum path / no-qk-norm flash
- cross attention:    padded bshd flash / XLA einsum path

Usage: python tools/profile_stdit3_variants.py   (TPU)
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from magcache_tpu.models.stdit3 import (  # noqa: E402
    STDiT3Config, init_stdit3_params)
from magcache_tpu.ops.attention import QKNORM_FIXED_MAX, attention  # noqa: E402
from magcache_tpu.ops.fused_prologue import layer_norm_mod  # noqa: E402
from magcache_tpu.ops.norms import rms_norm  # noqa: E402
from magcache_tpu.ops.rope import rope_freqs_1d  # noqa: E402
from magcache_tpu.ops.tiny_attention import tiny_temporal_attention  # noqa: E402
from magcache_tpu.models.common import linear  # noqa: E402


def make_trunk(cfg, T, S, t_rope, *, tattn="grouped", sattn="pallas",
               cattn="pallas"):
    d, heads = cfg.hidden, cfg.heads

    def _attn_spatial(p, xr):
        q, k, v = jnp.split(linear(p["qkv"], xr), 3, axis=-1)
        rs = lambda t: t.reshape(t.shape[0], t.shape[1], heads, -1)
        q, k, v = rs(q), rs(k), rs(v)
        q = rms_norm(q, p["q_norm"], eps=1e-6)
        k = rms_norm(k, p["k_norm"], eps=1e-6)
        fm = QKNORM_FIXED_MAX if sattn == "pallas" else None
        o = attention(q, k, v, fixed_max=fm,
                      impl=("pallas" if sattn in ("pallas", "pallas_nofm")
                            else sattn))
        return linear(p["proj"], o.reshape(xr.shape))

    def _attn_temporal(p, xr):
        qkv = linear(p["qkv"], xr)
        os.environ["MAGCACHE_TINY_ATTN"] = tattn
        o = tiny_temporal_attention(qkv, p["q_norm"], p["k_norm"],
                                    t_rope[0], t_rope[1], heads, eps=1e-6)
        return linear(p["proj"], o)

    def block(p, h, ctx, temporal):
        rows, N, _ = h.shape
        e = (p["scale_shift"][None] + ctx["t6"]).astype(jnp.float32)
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = [e[:, i][:, None] for i in range(6)]
        mod = lambda h, sh, sc: layer_norm_mod(h, scale=sc[:, 0],
                                               shift=sh[:, 0], eps=cfg.eps)
        xn = mod(h, sh_a, sc_a).astype(h.dtype)
        if temporal:
            xr = xn.reshape(rows, T, S, d).transpose(0, 2, 1, 3).reshape(
                rows * S, T, d)
            a = _attn_temporal(p, xr)
            a = a.reshape(rows, S, T, d).transpose(0, 2, 1, 3).reshape(
                rows, N, d)
        else:
            a = _attn_spatial(p, xn.reshape(rows * T, S, d)).reshape(
                rows, N, d)
        h = h + (g_a * a.astype(jnp.float32)).astype(h.dtype)

        y = ctx["y"]
        q = linear(p["cross_q"], h)
        kv = linear(p["cross_kv"], y)
        k, v = jnp.split(kv, 2, axis=-1)
        rs = lambda t_: t_.reshape(t_.shape[0], t_.shape[1], heads, -1)
        o = attention(rs(q), rs(k), rs(v), impl=cattn).reshape(h.shape)
        h = h + linear(p["cross_o"], o)

        xm = mod(h, sh_m, sc_m).astype(h.dtype)
        mo = linear(p["mlp2"], jax.nn.gelu(linear(p["mlp1"], xm),
                                           approximate=True))
        return h + (g_m * mo.astype(jnp.float32)).astype(h.dtype)

    def trunk(params, h, ctx):
        def body(carry, ps):
            sp, tp_ = ps
            h = block(sp, carry, ctx, temporal=False)
            h = block(tp_, h, ctx, temporal=True)
            return h, None

        h, _ = jax.lax.scan(body, h, (params["spatial"], params["temporal"]))
        return h

    return trunk


def main():
    cfg = STDiT3Config(dtype="bfloat16")
    T, H, W = 15, 30, 53
    S, d = H * W, cfg.hidden
    N, rows, L = T * S, 2, cfg.caption_max_len
    k0 = jax.random.PRNGKey(0)
    params = init_stdit3_params(k0, cfg)
    h = jax.random.normal(k0, (rows, N, d), jnp.bfloat16) * 0.1
    ctx = {"t6": jax.random.normal(k0, (rows, 6, d), jnp.float32) * 0.1,
           "y": jax.random.normal(k0, (rows, L, d), jnp.bfloat16) * 0.1}
    t_cos, t_sin = rope_freqs_1d(np.arange(T), cfg.head_dim)
    t_rope = (jnp.asarray(t_cos), jnp.asarray(t_sin))

    def timeit(name, **kw):
        fn = jax.jit(make_trunk(cfg, T, S, t_rope, **kw))
        jax.block_until_ready(fn(params, h, ctx))
        best = 1e9
        for _ in range(4):
            t0 = time.time()
            jax.block_until_ready(fn(params, h, ctx))
            best = min(best, time.time() - t0)
        print(f"{name:44s} {best*1e3:9.1f} ms")
        return best

    base = timeit("base: tattn=grouped sattn=pallas c=pallas")
    timeit("tattn=vpu", tattn="vpu")
    timeit("tattn=0 (unfused XLA)", tattn="0")
    timeit("sattn=xla", sattn="xla")
    timeit("sattn=pallas no fixed_max", sattn="pallas_nofm")
    timeit("cattn=xla", cattn="xla")


if __name__ == "__main__":
    main()
