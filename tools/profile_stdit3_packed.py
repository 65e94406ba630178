"""A/B the STDiT3 packed-weight attention path (MAGCACHE_STDIT3_PACKED) at
the bench shapes: whole forward, one jit each, real TPU.

Usage: python tools/profile_stdit3_packed.py
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
    STDiT3Config, init_stdit3_params, make_stdit3_core)


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

    outs = {}
    for mode in ("0", "1"):
        os.environ["MAGCACHE_STDIT3_PACKED"] = mode
        core = make_stdit3_core(cfg, (T, H, W), L, pixel_size=(480, 854))

        def fwd(params, x, t, cond, core=core):
            hidden, ctx = core.prepare(params, x, t, cond)
            return core.head(params, core.trunk(params, hidden, ctx), ctx)

        # chained-forward protocol with a single scalar readback per
        # timing: block_until_ready does NOT block through the axon tunnel
        # (see tools/profile_stdit3_lnmod.py); ~28 ms round trip subtracted
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
        outs[mode] = np.asarray(out[:, :1, :4, :4, 0], np.float32)
        print(f"packed={mode}: {best*1e3:9.1f} ms/forward")
    err = np.abs(outs["0"] - outs["1"]).max()
    print(f"max |packed - unpacked| on output probe: {err:.4f}")


if __name__ == "__main__":
    main()
