"""Benchmark: Wan2.1-T2V-1.3B 480p x 81 frames, 50 UniPC steps, dual-lane CFG.

Compares full compute vs MagCache E=0.12/K=2/R=0.2 (the reference's
E012K2R02 config, reported 2.2x on A800: ``MagCache4Wan2.1/README.md:101-103``)
and prints ONE JSON line:
  {"metric": ..., "value": speedup_x, "unit": "x", "vs_baseline": value/2.2}

Method: the denoise loop runs as bounded scan segments (the serving tunnel
crashes dispatches >~60s and occasionally wedges long dispatch streams), so
the bench measures the per-step cost of (a) compute steps and (b) skip steps
directly from timed segments, then reconstructs both runs' wall-clock from
the real 100-forward schedule:
    t_full   = N_steps * t_compute
    t_cached = n_compute * t_compute + n_skip * t_skip
This is exact for the scanned loop (its cost is step-additive; verified
against whole-run timings when the tunnel cooperates — BENCH_FULL_RUNS=1
forces the whole-run mode).
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

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    import jax.numpy as jnp

    from magcache_tpu.core.magcache import compute_skip_schedule
    from magcache_tpu.core.presets import make_config
    from magcache_tpu.core.sampler import unipc_executor
    from magcache_tpu.models.wan import WAN_1_3B, init_wan_params, make_wan_core
    from magcache_tpu.schedulers.unipc import UniPCSchedule

    quick = os.environ.get("BENCH_QUICK") == "1"
    full_runs = os.environ.get("BENCH_FULL_RUNS") == "1"
    frames = int(os.environ.get("MAGCACHE_BENCH_FRAMES", 21 if quick else 81))
    steps = int(os.environ.get("MAGCACHE_BENCH_STEPS", 8 if quick else 50))
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
    # a scheduler step is elided only when BOTH CFG lanes skip (batched lanes)
    step_skips = mask.all(axis=1)
    n_skip = int(step_skips.sum())
    n_compute = steps - n_skip
    log(f"skip schedule: {int(mask.sum())}/{steps*2} forwards, "
        f"{n_skip}/{steps} whole steps elided")

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, lat_f, lat_h, lat_w, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, cfg.text_len, cfg.text_dim), jnp.float32) * 0.5
    cond = {"context": ctx.astype(jnp.bfloat16)}

    init_carry, step_in, body = unipc_executor(
        core, sch, cache_cfg=cache_cfg, guidance_scale=6.0,
        skip_mask_override=jnp.asarray(mask), batch=1)

    @jax.jit
    def run_segment(params, cond, carry, seg_in):
        return jax.lax.scan(body(params, cond), carry, seg_in)[0]

    def seg_inputs(skips_np, s0, s1):
        si = list(step_in)
        si[2] = jnp.asarray(skips_np)
        return tuple(a[s0:s1] for a in si)

    no_skips = np.zeros_like(mask)
    all_skips = np.ones_like(mask)
    carry0 = init_carry(params, x, cond)

    def timed_segment(skips_np, tag):
        t0 = time.time()
        c = run_segment(params, cond, carry0, seg_inputs(skips_np, seg, 2 * seg))
        jax.block_until_ready(c)
        dt = time.time() - t0
        log(f"  segment[{tag}] {dt:.2f}s ({dt/seg:.3f}s/step)")
        return dt / seg

    t0 = time.time()
    jax.block_until_ready(run_segment(params, cond, carry0,
                                      seg_inputs(no_skips, 0, seg)))
    log(f"compile+warm {time.time() - t0:.0f}s")

    t_compute = min(timed_segment(no_skips, "compute-1"),
                    timed_segment(no_skips, "compute-2"))
    t_skip = min(timed_segment(all_skips, "skip-1"),
                 timed_segment(all_skips, "skip-2"))

    t_full = steps * t_compute
    t_cached = n_compute * t_compute + n_skip * t_skip

    if full_runs:
        def whole(skips_np):
            carry = init_carry(params, x, cond)
            t0 = time.time()
            for s0 in range(0, steps, seg):
                carry = run_segment(params, cond, carry,
                                    seg_inputs(skips_np, s0, s0 + seg))
                jax.block_until_ready(carry)
                log(f"  step {s0 + seg}/{steps}")
            return time.time() - t0, carry[0]

        t_full, _ = whole(no_skips)
        t_cached, _ = whole(mask)

    speedup = t_full / t_cached
    log(f"full {t_full:.1f}s  magcache {t_cached:.1f}s  speedup {speedup:.2f}x  "
        f"(t_compute {t_compute:.2f}s/step, t_skip {t_skip:.2f}s/step)")

    # other published Wan1.3B configs, reconstructed from the same step costs
    extra = {}
    for name, E, K in [("E012K4R02", 0.12, 4), ("E024K6R02", 0.24, 6)]:
        cfgx = make_config("wan2.1-t2v-1.3B", steps, thresh=E, K=K,
                           retention_ratio=0.2)
        mx = compute_skip_schedule(cfgx).reshape(steps, 2)
        ns = int(mx.all(axis=1).sum())
        tc = (steps - ns) * t_compute + ns * t_skip
        extra[name] = {"speedup": round(t_full / tc, 3),
                       "sec_per_video": round(tc, 2), "steps_elided": ns}
        log(f"  config {name}: {t_full/tc:.2f}x ({tc:.1f}s, {ns} steps elided)")

    print(json.dumps({
        "metric": "Wan2.1-T2V-1.3B 480p MagCache E012K2R02 speedup (50-step UniPC, 1 chip)",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 2.2, 3),
        "detail": {
            "sec_per_video_full": round(t_full, 2),
            "sec_per_video_magcache": round(t_cached, 2),
            "t_compute_step_s": round(t_compute, 3),
            "t_skip_step_s": round(t_skip, 3),
            "steps_elided": n_skip,
            "forwards_elided": int(mask.sum()),
            "total_forwards": steps * 2,
            "method": "whole-run" if full_runs else "per-step-reconstruction",
            "other_configs": extra,
            "quick": quick,
        },
    }))


if __name__ == "__main__":
    main()
