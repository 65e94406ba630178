"""Profile one STDiT3 480p forward on the TPU (the Open-Sora trunk).

Usage: python tools/profile_stdit3.py [outdir]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from magcache_tpu.models.stdit3 import (  # noqa: E402
    STDiT3Config,
    init_stdit3_params,
    make_stdit3_core,
)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stdit3_profile"
    cfg = STDiT3Config(dtype="bfloat16")
    grid = (12, 30, 53)          # 854x480x51f -> 19080 tokens
    core = make_stdit3_core(cfg, grid, cfg.caption_max_len,
                            pixel_size=(480, 854))
    key = jax.random.PRNGKey(0)
    params = init_stdit3_params(key, cfg)
    x = jax.random.normal(
        key, (2, 12, 60, 106, cfg.in_channels), jnp.float32) * 0.1
    t = jnp.full((2,), 500.0, jnp.float32)
    cond = {"y": jax.random.normal(
        key, (2, cfg.caption_max_len, cfg.caption_dim), jnp.float32) * 0.1,
        "fps": jnp.full((2,), 24.0, jnp.float32)}

    def fwd(params, x, t, cond):
        hidden, ctx = core.prepare(params, x, t, cond)
        return core.head(params, core.trunk(params, hidden, ctx), ctx)

    jfwd = jax.jit(fwd)
    out = jfwd(params, x, t, cond)
    out.block_until_ready()
    print("compiled; out", out.shape, out.dtype)
    for i in range(2):
        t0 = time.time()
        out = jfwd(params, x, t, cond)
        out.block_until_ready()
        print(f"rep {i}: {time.time() - t0:.3f}s")
    with jax.profiler.trace(outdir):
        out = jfwd(params, x, t, cond)
        out.block_until_ready()
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
