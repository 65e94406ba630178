"""Profile one Wan-1.3B 480p forward on the TPU and dump a per-op breakdown.

Usage:  python tools/profile_step.py [outdir]

Produces a jax profiler trace (outdir/plugins/profile/...) and prints the
coarse timing (2 reps, dispatch-level). Keep each dispatch under ~35s (tunnel
constraint — see NOTES.md).
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from magcache_tpu.models.wan import WanConfig, init_wan_params, make_wan_core


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wan_profile"
    cfg = WanConfig(dtype="bfloat16")
    grid = (21, 30, 52)          # 832x480x81f -> 32760 tokens
    txt_len = 512
    key = jax.random.PRNGKey(0)
    params = init_wan_params(key, cfg)
    core = make_wan_core(cfg, grid)

    f, h, w = grid
    pt, ph, pw = cfg.patch
    x = jax.random.normal(
        key, (2, f * pt, h * ph, w * pw, cfg.in_channels), jnp.bfloat16) * 0.1
    ctx_in = jax.random.normal(
        key, (2, txt_len, cfg.text_dim), jnp.float32) * 0.1
    t = jnp.full((2,), 500.0, jnp.float32)
    cond = {"context": ctx_in}

    def fwd(params, x, t, cond):
        hidden, ctx = core.prepare(params, x, t, cond)
        hid = core.trunk(params, hidden, ctx)
        return core.head(params, hid, ctx)

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
