"""Op-level cost breakdown of one STDiT3 forward at the bench shapes.

Times each component at its exact in-model shape (480p x 51f -> grid
(15,30,53), N=23850 tokens, d=1152, 16 heads x 72 head_dim, rows=2) and
compares 28 x (spatial + temporal) block sums against the measured whole
forward — identifying where the 35.7%-MFU forward (BENCH_r03: 1.606 s/step
vs a 0.574 s analytic floor) loses its time.

Usage: python tools/profile_stdit3_ops.py   (TPU)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from magcache_tpu.models.stdit3 import (  # noqa: E402
    STDiT3Config, init_stdit3_params, make_stdit3_core)
from magcache_tpu.ops.attention import QKNORM_FIXED_MAX, attention  # noqa: E402
from magcache_tpu.ops.fused_prologue import layer_norm_mod  # noqa: E402
from magcache_tpu.ops.rope import rope_freqs_1d  # noqa: E402
from magcache_tpu.ops.tiny_attention import tiny_temporal_attention  # noqa: E402


def timeit(name, fn, *args, reps=5):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{name:42s} {best*1e3:9.3f} ms")
    return best


def main():
    cfg = STDiT3Config(dtype="bfloat16")
    T, H, W = 15, 30, 53
    S, d, hds, hd = H * W, cfg.hidden, cfg.heads, cfg.head_dim
    N, rows, L = T * S, 2, cfg.caption_max_len
    k0 = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    h = jax.random.normal(k0, (rows, N, d), bf) * 0.1
    w_qkv = jax.random.normal(k0, (d, 3 * d), bf) * 0.02
    w_mlp1 = jax.random.normal(k0, (d, 4 * d), bf) * 0.02
    w_mlp2 = jax.random.normal(k0, (4 * d, d), bf) * 0.02
    qs = jax.random.normal(k0, (rows * T, S, hds, hd), bf) * 0.1
    qt_ = jax.random.normal(k0, (rows * S, T, hds, hd), bf) * 0.1
    qc = jax.random.normal(k0, (rows, N, hds, hd), bf) * 0.1
    kvc = jax.random.normal(k0, (rows, L, hds, hd), bf) * 0.1
    qkv_t = jax.random.normal(k0, (rows * S, T, 3 * d), bf) * 0.1
    gnorm = jnp.ones((hd,), jnp.float32)
    tc, ts_ = rope_freqs_1d(np.arange(T), hd)
    tc, ts_ = jnp.asarray(tc), jnp.asarray(ts_)
    sc = jax.random.normal(k0, (rows, d), jnp.float32) * 0.1
    sh = jax.random.normal(k0, (rows, d), jnp.float32) * 0.1
    g = jax.random.normal(k0, (rows, 1, d), jnp.float32) * 0.1

    print(f"shapes: N={N} d={d} heads={hds}x{hd} S={S} T={T} rows={rows}")

    t_qkv = timeit("qkv matmul [rows*N,d]->[.,3d]",
                   lambda h: (h.reshape(-1, d) @ w_qkv), h)
    t_proj = timeit("proj matmul [rows*N,d]->[.,d]",
                    lambda h: (h.reshape(-1, d) @ w_qkv[:, :d]), h)
    t_sattn = timeit("spatial attn [30,1590,16,72] fm",
                     lambda q: attention(q, q, q, fixed_max=QKNORM_FIXED_MAX),
                     qs)
    t_sattn_nofm = timeit("spatial attn (running max)",
                          lambda q: attention(q, q, q), qs)
    t_tattn = timeit("temporal tiny attn [3180,15,.]",
                     lambda qkv: tiny_temporal_attention(
                         qkv, gnorm, gnorm, tc, ts_, hds, eps=1e-6), qkv_t)
    t_cattn = timeit("cross attn q=[2,23850] kv=[2,300]",
                     lambda q, kv: attention(q, kv, kv), qc, kvc)
    t_mlp = timeit("mlp fc1+gelu+fc2",
                   lambda h: (jax.nn.gelu((h.reshape(-1, d) @ w_mlp1),
                                          approximate=True) @ w_mlp2), h)
    t_lnmod = timeit("layer_norm_mod [2,N,d]",
                     lambda h: layer_norm_mod(h, scale=sc, shift=sh, eps=1e-6),
                     h)
    t_gate = timeit("gated residual f32 cast",
                    lambda h: (h + (g * h.astype(jnp.float32)).astype(bf)), h)
    t_tr = timeit("temporal transpose (both ways)",
                  lambda h: h.reshape(rows, T, S, d).transpose(0, 2, 1, 3)
                  .reshape(rows * S, T, d).reshape(rows, S, T, d)
                  .transpose(0, 2, 1, 3).reshape(rows, N, d), h)

    # per-block sums (spatial: qkv+proj+attn+cross(q,kv,attn sized via qkv/4)
    # + mlp + 2 lnmod + 2 gates; temporal adds transposes, swaps attn)
    cross_cost = t_cattn + t_proj * 2  # q + out projections approx by proj
    sp = t_qkv + t_proj + t_sattn + cross_cost + t_mlp + 2 * t_lnmod + 2 * t_gate
    tp = t_qkv + t_proj + t_tattn + cross_cost + t_mlp + 2 * t_lnmod + 2 * t_gate + t_tr
    print(f"\nper-block sums: spatial {sp*1e3:.1f} ms, temporal {tp*1e3:.1f} ms")
    print(f"28 pairs = {28*(sp+tp):.3f} s")

    # whole forward for comparison
    core = make_stdit3_core(cfg, (T, H, W), L, pixel_size=(480, 854))
    params = init_stdit3_params(k0, cfg)
    x = jax.random.normal(k0, (rows, T, H * 2, W * 2, cfg.in_channels),
                          jnp.float32) * 0.1
    t = jnp.full((rows,), 500.0, jnp.float32)
    cond = {"y": jax.random.normal(k0, (rows, L, cfg.caption_dim),
                                   jnp.float32) * 0.1,
            "fps": jnp.full((rows,), 24.0, jnp.float32)}

    def fwd(params, x, t, cond):
        hidden, ctx = core.prepare(params, x, t, cond)
        return core.head(params, core.trunk(params, hidden, ctx), ctx)

    t_fwd = timeit("WHOLE forward", fwd, params, x, t, cond, reps=3)
    from magcache_tpu.utils.flops import mfu_pct, stdit3_forward_flops
    fl = stdit3_forward_flops(cfg, (T, H, W), L, rows=rows)
    print(f"whole-forward MFU {mfu_pct(fl, t_fwd):.1f}% "
          f"(floor {fl/197e12:.3f} s)")


if __name__ == "__main__":
    main()
