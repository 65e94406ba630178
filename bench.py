"""Benchmark: Wan2.1-T2V-1.3B 480p x 81 frames, 50 UniPC steps, dual-lane CFG.

Measures wall-clock of the full-compute run vs the MagCache run
(E=0.12, K=2, R=0.2 — the reference's published E012K2R02 config, which it
reports at 2.2x on A800: ``MagCache4Wan2.1/README.md:101-103``). Compile is
excluded via AOT lowering. Prints ONE JSON line:
  {"metric": ..., "value": speedup_x, "unit": "x", "vs_baseline": value/2.2}

Env knobs: BENCH_QUICK=1 -> small grid + few steps (dev smoke);
MAGCACHE_BENCH_FRAMES / _STEPS to override.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from magcache_tpu.core.presets import make_config
    from magcache_tpu.core.sampler import sample_unipc
    from magcache_tpu.models.wan import WAN_1_3B, init_wan_params, make_wan_core
    from magcache_tpu.schedulers.unipc import UniPCSchedule

    quick = os.environ.get("BENCH_QUICK") == "1"
    frames = int(os.environ.get("MAGCACHE_BENCH_FRAMES", 21 if quick else 81))
    steps = int(os.environ.get("MAGCACHE_BENCH_STEPS", 8 if quick else 50))
    h_pix, w_pix = (192, 320) if quick else (480, 832)

    cfg = dataclasses.replace(WAN_1_3B, dtype="bfloat16")
    lat_f = (frames - 1) // 4 + 1
    lat_h, lat_w = h_pix // 8, w_pix // 8
    grid = (lat_f, lat_h // 2, lat_w // 2)
    core = make_wan_core(cfg, grid)
    log(f"bench: Wan2.1-1.3B {w_pix}x{h_pix}x{frames}f, {steps} UniPC steps, "
        f"grid {grid} = {np.prod(grid)} tokens, backend={jax.default_backend()}")

    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    sch = UniPCSchedule.create(steps, shift=8.0)
    cache_cfg = make_config("wan2.1-t2v-1.3B", steps, thresh=0.12, K=2,
                            retention_ratio=0.2)
    from magcache_tpu.core.magcache import compute_skip_schedule
    n_skip = int(compute_skip_schedule(cache_cfg).sum())
    log(f"skip schedule: {n_skip}/{steps * 2} forwards elided")

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, lat_f, lat_h, lat_w, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, cfg.text_len, cfg.text_dim), jnp.float32) * 0.5
    cond = {"context": ctx.astype(jnp.bfloat16)}

    def run_full(params, x, cond):
        return sample_unipc(core, params, x, cond, sch, guidance_scale=6.0)

    def run_cached(params, x, cond):
        return sample_unipc(core, params, x, cond, sch, cache_cfg=cache_cfg,
                            guidance_scale=6.0)

    t0 = time.time()
    full_c = jax.jit(run_full).lower(params, x, cond).compile()
    cached_c = jax.jit(run_cached).lower(params, x, cond).compile()
    log(f"compiled both programs in {time.time() - t0:.0f}s")

    t0 = time.time()
    out_full = full_c(params, x, cond)
    out_full.block_until_ready()
    t_full = time.time() - t0

    t0 = time.time()
    out_cached = cached_c(params, x, cond)
    out_cached.block_until_ready()
    t_cached = time.time() - t0

    rel = float(jnp.linalg.norm((out_cached - out_full).astype(jnp.float32))
                / jnp.linalg.norm(out_full.astype(jnp.float32)))
    speedup = t_full / t_cached
    log(f"full {t_full:.1f}s  magcache {t_cached:.1f}s  speedup {speedup:.2f}x  "
        f"latent rel-err {rel:.3f}")

    print(json.dumps({
        "metric": "Wan2.1-T2V-1.3B 480p MagCache E012K2R02 speedup (50-step UniPC, 1 chip)",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 2.2, 3),
        "detail": {
            "t_full_s": round(t_full, 2),
            "t_magcache_s": round(t_cached, 2),
            "skipped_forwards": n_skip,
            "total_forwards": steps * 2,
            "latent_rel_err": round(rel, 4),
            "quick": quick,
        },
    }))


if __name__ == "__main__":
    main()
