"""Benchmark: Wan2.1-T2V-1.3B 480p x 81 frames, 50 UniPC steps, dual-lane CFG.

Measures wall-clock of the full-compute run vs the MagCache run
(E=0.12, K=2, R=0.2 — the reference's published E012K2R02 config, reported at
2.2x on A800: ``MagCache4Wan2.1/README.md:101-103``). Prints ONE JSON line:
  {"metric": ..., "value": speedup_x, "unit": "x", "vs_baseline": value/2.2}

Implementation notes:
- ONE compiled program (a 10-step scan segment with the skip mask as a runtime
  argument) serves both runs; segmented host dispatch keeps each device call
  under the tunnel's RPC deadline.
- the persistent compilation cache is enabled so repeat runs skip the slow
  remote compile.

Env knobs: BENCH_QUICK=1 -> small grid + few steps;
MAGCACHE_BENCH_FRAMES / _STEPS / _SEG to override.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp

    from magcache_tpu.core.magcache import compute_skip_schedule
    from magcache_tpu.core.presets import make_config
    from magcache_tpu.core.sampler import unipc_executor
    from magcache_tpu.models.wan import WAN_1_3B, init_wan_params, make_wan_core
    from magcache_tpu.schedulers.unipc import UniPCSchedule

    quick = os.environ.get("BENCH_QUICK") == "1"
    frames = int(os.environ.get("MAGCACHE_BENCH_FRAMES", 21 if quick else 81))
    steps = int(os.environ.get("MAGCACHE_BENCH_STEPS", 8 if quick else 50))
    # dispatches >~60s crash the tunnel worker; 5 steps ~= 33s stays safe
    seg = int(os.environ.get("MAGCACHE_BENCH_SEG", 4 if quick else 5))
    h_pix, w_pix = (192, 320) if quick else (480, 832)

    cfg = dataclasses.replace(WAN_1_3B, dtype="bfloat16")
    lat_f = (frames - 1) // 4 + 1
    lat_h, lat_w = h_pix // 8, w_pix // 8
    grid = (lat_f, lat_h // 2, lat_w // 2)
    core = make_wan_core(cfg, grid)
    log(f"bench: Wan2.1-1.3B {w_pix}x{h_pix}x{frames}f, {steps} UniPC steps, "
        f"grid {grid} = {int(np.prod(grid))} tokens, backend={jax.default_backend()}")

    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    sch = UniPCSchedule.create(steps, shift=8.0)
    cache_cfg = make_config("wan2.1-t2v-1.3B", steps, thresh=0.12, K=2,
                            retention_ratio=0.2)
    mask = compute_skip_schedule(cache_cfg).reshape(steps, 2)
    n_skip = int(mask.sum())
    log(f"skip schedule: {n_skip}/{steps * 2} forwards elided")

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, lat_f, lat_h, lat_w, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, cfg.text_len, cfg.text_dim), jnp.float32) * 0.5
    cond = {"context": ctx.astype(jnp.bfloat16)}

    # executor with runtime skip mask; the mask rides step_inputs[2]
    init_carry, step_in, body = unipc_executor(
        core, sch, cache_cfg=cache_cfg, guidance_scale=6.0,
        skip_mask_override=jnp.asarray(mask), batch=1)

    assert steps % seg == 0, (steps, seg)

    @jax.jit
    def run_segment(params, cond, carry, seg_in):
        return jax.lax.scan(body(params, cond), carry, seg_in)[0]

    def run(skips_np):
        si = list(step_in)
        si[2] = jnp.asarray(skips_np)
        carry = init_carry(params, x, cond)
        for s0 in range(0, steps, seg):
            seg_in = tuple(a[s0:s0 + seg] for a in si)
            carry = run_segment(params, cond, carry, seg_in)
        jax.block_until_ready(carry)
        return carry[0]

    no_skips = np.zeros_like(mask)
    t0 = time.time()
    run(no_skips)[0]  # compile + warm
    log(f"compile+warm {time.time() - t0:.0f}s")

    t0 = time.time()
    out_full = run(no_skips)
    t_full = time.time() - t0

    t0 = time.time()
    out_cached = run(mask)
    t_cached = time.time() - t0

    rel = float(jnp.linalg.norm((out_cached - out_full).astype(jnp.float32))
                / jnp.linalg.norm(out_full.astype(jnp.float32)))
    speedup = t_full / t_cached
    log(f"full {t_full:.1f}s  magcache {t_cached:.1f}s  speedup {speedup:.2f}x  "
        f"latent rel-err {rel:.3f} (random weights; uncalibrated)")

    print(json.dumps({
        "metric": "Wan2.1-T2V-1.3B 480p MagCache E012K2R02 speedup (50-step UniPC, 1 chip)",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 2.2, 3),
        "detail": {
            "t_full_s": round(t_full, 2),
            "t_magcache_s": round(t_cached, 2),
            "sec_per_video_full": round(t_full, 2),
            "sec_per_video_magcache": round(t_cached, 2),
            "skipped_forwards": n_skip,
            "total_forwards": steps * 2,
            "quick": quick,
        },
    }))


if __name__ == "__main__":
    main()
