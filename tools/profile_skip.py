"""Attribute the cost of a MagCache SKIP step at bench shapes (Wan-1.3B 480p).

A skip step still runs prepare (patch/time/text embed), the residual add, the
head, and the UniPC P-C solver update (``core/sampler.py`` body). This probe
times 5-step all-skip scan segments for ablated bodies to find where the
~10-13ms/skip goes (BENCH_r03 t_skip_step_s) and what hoisting would buy.

Usage: python tools/profile_skip.py            (TPU; ~5 compiles)
       MAGCACHE_PROBE_STEPS=... MAGCACHE_PROBE_QUICK=1 for CPU smoke
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    quick = os.environ.get("MAGCACHE_PROBE_QUICK") == "1"
    if quick:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from magcache_tpu.models.wan import WanConfig, init_wan_params, make_wan_core
    from magcache_tpu.schedulers.unipc import UniPCSchedule

    if quick:
        cfg = WanConfig.tiny(dtype="float32")
        grid = (2, 4, 4)
    else:
        cfg = WanConfig(dtype="bfloat16")
        grid = (21, 30, 52)          # 832x480x81f -> 32760 tokens
    core = make_wan_core(cfg, grid)
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    f, h, w = grid
    pt, ph, pw = cfg.patch
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, f * pt, h * ph, w * pw, cfg.in_channels),
                          jnp.float32)
    cond = {"context": (jax.random.normal(
        jax.random.PRNGKey(2), (2, cfg.text_len, cfg.text_dim), jnp.float32)
        * 0.5).astype(cfg.jdtype)}
    steps = int(os.environ.get("MAGCACHE_PROBE_STEPS", 5))
    sch = UniPCSchedule.create(50, shift=8.0)
    g = 6.0

    # hidden/cache at trunk shapes
    x2 = jnp.concatenate([x, x], axis=0)
    t0v = jnp.full((2,), 500.0, jnp.float32)
    hidden0, ctx0 = jax.jit(core.prepare)(params, x2, t0v, cond)
    cache = jnp.zeros(hidden0.shape, hidden0.dtype)

    # per-step solver coefficient stand-ins (shapes match the real executor)
    ts = jnp.asarray(sch.timesteps[:steps])
    sig = jnp.asarray(sch.sigmas[:steps])
    coef = jnp.ones((steps, 4), jnp.float32) * 0.1

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        reps = []
        for _ in range(3):
            t0 = time.time()
            out = fn(*args)
            jax.block_until_ready(out)
            reps.append(time.time() - t0)
        dt = min(reps) / steps
        print(f"{name:28s} {dt*1e3:8.2f} ms/step  (segment {min(reps):.3f}s)")
        return dt

    def scan_body(use_prepare, use_text, use_head, use_solver):
        def seg(params, x, cond, cache):
            ctx_pre = None
            if not use_text:
                # hoisted text embed: prepare once outside, reuse ctx pieces
                _, ctx_pre = core.prepare(params, jnp.concatenate([x, x], 0),
                                          jnp.full((2,), 500.0, jnp.float32),
                                          cond)

            def body(carry, inp):
                xc, m_hist, cache = carry
                t, s, c = inp
                x2 = jnp.concatenate([xc, xc], axis=0)
                if use_prepare:
                    tvec = jnp.full((2,), t, jnp.float32)
                    hidden, ctx = core.prepare(params, x2, tvec, cond)
                else:
                    hidden, ctx = cache, ctx_pre or ctx0
                h_out = hidden + cache
                if use_head:
                    out = core.head(params, h_out, ctx)
                else:
                    out = jnp.zeros((2,) + x.shape[1:], jnp.float32)
                v = out[1:] + g * (out[:1] - out[1:])
                if use_solver:
                    m = xc - s.astype(xc.dtype) * v.astype(xc.dtype)
                    x_corr = (c[0] * xc + c[1] * m_hist[0] + c[2] * m
                              + c[3] * m_hist[1])
                    x_next = c[0] * x_corr + c[1] * m + c[2] * m_hist[0]
                    m_hist = jnp.stack([m, m_hist[0]])
                    return (x_next, m_hist, cache), None
                return (xc + 1e-6 * v.astype(xc.dtype), m_hist, cache), None
            m0 = jnp.stack([jnp.zeros_like(x)] * 2)
            (xf, _, _), _ = jax.lax.scan(body, (x, m0, cache), (ts, sig, coef))
            return xf
        return jax.jit(seg)

    t_full = timeit("skip: full body", scan_body(True, True, True, True),
                    params, x, cond, cache)
    t_nohead = timeit("skip: no head", scan_body(True, True, False, True),
                      params, x, cond, cache)
    t_noprep = timeit("skip: no prepare", scan_body(False, True, True, True),
                      params, x, cond, cache)
    t_nosolver = timeit("skip: no solver", scan_body(True, True, True, False),
                        params, x, cond, cache)

    print(f"\nattribution (ms/step): head ~{(t_full-t_nohead)*1e3:.2f}, "
          f"prepare ~{(t_full-t_noprep)*1e3:.2f}, "
          f"solver ~{(t_full-t_nosolver)*1e3:.2f}, "
          f"residual-add+overhead ~{(t_nohead+t_noprep+t_nosolver-2*t_full)*1e3:.2f}")


if __name__ == "__main__":
    main()
