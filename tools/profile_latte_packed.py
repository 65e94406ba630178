"""A/B the Latte packed-weight attention path (MAGCACHE_STDIT3_PACKED) at
the published Latte-1 shape (512x512, 16 frames -> T=16, 32x32 patches):
whole forward, one jit each, real TPU.

Usage: python tools/profile_latte_packed.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from magcache_tpu.models.latte import (  # noqa: E402
    LatteConfig, init_latte_params, make_latte_core)


def main():
    cfg = LatteConfig(dtype="bfloat16")
    T, H, W = 16, 32, 32
    rows, L = 2, 120
    k0 = jax.random.PRNGKey(0)
    params = init_latte_params(k0, cfg)
    x = jax.random.normal(k0, (rows, T, H * 2, W * 2, cfg.in_channels),
                          jnp.float32) * 0.1
    t = jnp.full((rows,), 500.0, jnp.float32)
    cond = {"y": jax.random.normal(k0, (rows, L, cfg.caption_dim),
                                   jnp.float32) * 0.1}

    outs = {}
    for mode in ("0", "1"):
        os.environ["MAGCACHE_STDIT3_PACKED"] = mode
        core = make_latte_core(cfg, (T, H, W), caption_len=L)

        def fwd(params, x, t, cond, core=core):
            hidden, ctx = core.prepare(params, x, t, cond)
            return core.head(params, core.trunk(params, hidden, ctx), ctx)

        # chained-forward protocol, one scalar readback per timing
        # (block_until_ready does NOT block through the axon tunnel)
        REPS = 8

        def step(params, x, t, cond, core=core):
            out = fwd(params, x, t, cond, core)
            return out[..., : x.shape[-1]] * 0.1

        fn = jax.jit(step)
        probe = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
        out = jax.jit(fwd)(params, x, t, cond)
        xx = fn(params, x, t, cond)
        float(probe(xx))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            xx = x
            for _ in range(REPS):
                xx = fn(params, xx, t, cond)
            float(probe(xx))
            best = min(best, (time.time() - t0 - 0.028) / REPS)
        outs[mode] = np.asarray(
            jax.tree.leaves(out)[0], np.float32).reshape(-1)[:256]
        print(f"packed={mode}: {best*1e3:9.1f} ms/forward")
    err = np.abs(outs["0"] - outs["1"]).max()
    print(f"max |packed - unpacked| on output probe: {err:.4f}")


if __name__ == "__main__":
    main()
