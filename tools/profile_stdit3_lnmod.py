"""A/B the fused LN+modulate+matmul prologue (ops/fused_prologue.lnmod_matmul)
in the packed STDiT3 forward at the bench shapes.

Timing protocol for the tunnel backend: `jax.block_until_ready` does NOT
block there (measured: a 1.1 TFLOP matmul "completes" in 44 us), so each
variant runs REPS forwards CHAINED through a data dependency (the head
output feeds the next input) inside one dispatch burst, with a single
scalar readback at the end; the ~28 ms scalar round-trip is subtracted.

Usage: python tools/profile_stdit3_lnmod.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from magcache_tpu.models.stdit3 import (  # noqa: E402
    STDiT3Config, init_stdit3_params, make_stdit3_core)

REPS = 8


def main():
    cfg = STDiT3Config(dtype="bfloat16")
    T, H, W = 15, 30, 53
    rows, L = 2, cfg.caption_max_len
    k0 = jax.random.PRNGKey(0)
    params = init_stdit3_params(k0, cfg)
    x = jax.random.normal(k0, (rows, T, H * 2, W * 2, cfg.in_channels),
                          jnp.float32) * 0.1
    t = jnp.full((rows,), 500.0, jnp.float32)
    cond = {"y": jax.random.normal(k0, (rows, L, cfg.caption_dim),
                                   jnp.float32) * 0.1,
            "fps": jnp.full((rows,), 24.0, jnp.float32)}

    os.environ["MAGCACHE_STDIT3_PACKED"] = "1"
    results = {}
    for mode in ("0", "1"):
        os.environ["MAGCACHE_LNMOD_MM"] = mode
        core = make_stdit3_core(cfg, (T, H, W), L, pixel_size=(480, 854))

        def fwd(params, x, t, cond, core=core):
            hidden, ctx = core.prepare(params, x, t, cond)
            out = core.head(params, core.trunk(params, hidden, ctx), ctx)
            # chain: feed the mean-channel prediction back as the next input
            return out[..., :cfg.in_channels] * 0.1

        fn = jax.jit(fwd)
        probe = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
        xx = fn(params, x, t, cond)
        float(probe(xx))                       # compile + drain
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            xx = x
            for _ in range(REPS):
                xx = fn(params, xx, t, cond)
            s = float(probe(xx))
            dt = (time.perf_counter() - t0 - 0.028) / REPS
            best = min(best, dt)
        results[mode] = best
        print(f"lnmod_mm={mode}: {best*1e3:8.1f} ms/forward  (probe {s:.4f})")
    print(f"delta: {(results['0'] - results['1'])*1e3:+.1f} ms/forward")


if __name__ == "__main__":
    main()
