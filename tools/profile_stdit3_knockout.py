"""Knockout attribution of the STDiT3-480p forward: one jitted 28-pair trunk
per variant, each with exactly ONE component ablated.

Why: per-op microbenchmarks through the axon tunnel carry ~23 ms of dispatch
overhead per call (tools/profile_stdit3_ops.py measures even a bare residual
add at ~25 ms), so op deltas there are noise-level. Here every variant is a
single jit over all 28 (spatial, temporal) pairs at the bench shapes
(N=23850, d=1152, 16x72 heads), so `baseline - variant` is the component's
true in-context cost, fusion effects included.

Ablations keep the dataflow shape (residual adds still happen) and only
remove the targeted compute. The trunk here mirrors models/stdit3.py::_block
(no PAB, no x_mask) — drift between the two shows up as a baseline mismatch
against the real `make_stdit3_core` forward, which is printed for control.

Usage: python tools/profile_stdit3_knockout.py   (TPU)
"""
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
from magcache_tpu.ops.norms import layer_norm, rms_norm  # noqa: E402
from magcache_tpu.ops.rope import apply_rope, rope_freqs_1d  # noqa: E402
from magcache_tpu.ops.tiny_attention import tiny_temporal_attention  # noqa: E402
from magcache_tpu.models.common import linear  # noqa: E402


def make_trunk(cfg, T, S, t_rope, knock=frozenset()):
    d, heads, hd = cfg.hidden, cfg.heads, cfg.head_dim

    def _attn_spatial(p, xr):
        q, k, v = jnp.split(linear(p["qkv"], xr), 3, axis=-1)
        rs = lambda t: t.reshape(t.shape[0], t.shape[1], heads, -1)
        q, k, v = rs(q), rs(k), rs(v)
        if "sattn_kernel" not in knock:
            q = rms_norm(q, p["q_norm"], eps=1e-6)
            k = rms_norm(k, p["k_norm"], eps=1e-6)
            o = attention(q, k, v, fixed_max=QKNORM_FIXED_MAX)
        else:
            o = q
        return linear(p["proj"], o.reshape(xr.shape))

    def _attn_temporal(p, xr):
        qkv = linear(p["qkv"], xr)
        if "tattn_kernel" not in knock:
            o = tiny_temporal_attention(qkv, p["q_norm"], p["k_norm"],
                                        t_rope[0], t_rope[1], heads, eps=1e-6)
        else:
            o = qkv[..., :d]
        return linear(p["proj"], o)

    def block(p, h, ctx, temporal):
        rows, N, _ = h.shape
        e = (p["scale_shift"][None] + ctx["t6"]).astype(jnp.float32)
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = [e[:, i][:, None] for i in range(6)]

        def mod(h, sh, sc):
            if "mod" in knock:
                return h.astype(jnp.float32)
            return layer_norm_mod(h, scale=sc[:, 0], shift=sh[:, 0], eps=cfg.eps)

        def gated(res, g):
            if "gate" in knock:
                return res
            return g * res

        xn = mod(h, sh_a, sc_a).astype(h.dtype)
        if temporal:
            if "transpose" in knock:
                xr = xn.reshape(rows * S, T, d)   # wrong semantics, same cost
            else:
                xr = xn.reshape(rows, T, S, d).transpose(0, 2, 1, 3).reshape(
                    rows * S, T, d)
            a = _attn_temporal(p, xr)
            if "transpose" in knock:
                a = a.reshape(rows, N, d)
            else:
                a = a.reshape(rows, S, T, d).transpose(0, 2, 1, 3).reshape(
                    rows, N, d)
        else:
            a = _attn_spatial(p, xn.reshape(rows * T, S, d)).reshape(rows, N, d)
        h = h + gated(a.astype(jnp.float32), g_a).astype(h.dtype)

        if "cross" not in knock:
            y = ctx["y"]
            q = linear(p["cross_q"], h)
            kv = linear(p["cross_kv"], y)
            k, v = jnp.split(kv, 2, axis=-1)
            rs = lambda t_: t_.reshape(t_.shape[0], t_.shape[1], heads, -1)
            o = attention(rs(q), rs(k), rs(v)).reshape(h.shape)
            h = h + linear(p["cross_o"], o)

        if "mlp" not in knock:
            xm = mod(h, sh_m, sc_m).astype(h.dtype)
            mo = linear(p["mlp2"], jax.nn.gelu(linear(p["mlp1"], xm),
                                               approximate=True))
            h = h + gated(mo.astype(jnp.float32), g_m).astype(h.dtype)
        return h

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
    t6 = jax.random.normal(k0, (rows, 6, d), jnp.float32) * 0.1
    y = jax.random.normal(k0, (rows, L, d), jnp.bfloat16) * 0.1
    ctx = {"t6": t6, "y": y}
    t_cos, t_sin = rope_freqs_1d(np.arange(T), cfg.head_dim)
    t_rope = (jnp.asarray(t_cos), jnp.asarray(t_sin))

    def timeit(fn, *args, reps=4):
        fn = jax.jit(fn)
        jax.block_until_ready(fn(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            best = min(best, time.time() - t0)
        return best

    base = timeit(make_trunk(cfg, T, S, t_rope), params, h, ctx)
    print(f"{'baseline trunk (28 pairs)':34s} {base*1e3:9.1f} ms")

    knocks = ["sattn_kernel", "tattn_kernel", "cross", "mlp", "mod", "gate",
              "transpose"]
    for kn in knocks:
        t = timeit(make_trunk(cfg, T, S, t_rope, knock=frozenset({kn})),
                   params, h, ctx)
        print(f"{'-'+kn:34s} {t*1e3:9.1f} ms   delta {1e3*(base-t):8.1f} ms")

    from magcache_tpu.utils.flops import stdit3_forward_flops
    fl = stdit3_forward_flops(cfg, (T, H, W), L, rows=rows)
    print(f"\nanalytic trunk floor @197TF: {fl/197e12*1e3:.0f} ms "
          f"(whole fwd incl prepare/head)")


if __name__ == "__main__":
    main()
