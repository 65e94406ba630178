"""Benchmark: Wan2.2 TI2V-5B 720p (1280x704 x 121 frames), 50 UniPC steps.

The reference's published headline for this config is ~10min39s full /
~5min24s MagCache E006K2R02 on one L20 (``MagCache4Wan2.2/README.md:66-72``).
Method mirrors bench.py: measured whole runs in bounded scan segments
(tunnel-safe dispatch sizes), then a whole-generate e2e span (mock-T5 encode
+ denoise + streamed f32 Wan2.2-VAE decode — the reference times the whole
generate call).

Prints ONE JSON line and (with BENCH_TI2V_OUT set) writes it to a file.
Env: BENCH_QUICK=1 tiny smoke; MAGCACHE_BENCH_STEPS/FRAMES/SEG overrides.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

V5E_PEAK_TFLOPS = 197.0
L20_PEAK_TFLOPS = 119.5   # L20 dense bf16 peak (the reference's hardware)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _init_backend_or_die(timeout_s: int = 240):
    from magcache_tpu.utils.backend import init_backend_or_die
    return init_backend_or_die(timeout_s, log=log)


def main():
    import jax

    log(f"devices: {_init_backend_or_die()}")
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    import jax.numpy as jnp

    from magcache_tpu.core.magcache import compute_skip_schedule
    from magcache_tpu.core.presets import make_config
    from magcache_tpu.core.sampler import unipc_executor
    from magcache_tpu.models.wan import WAN_5B, init_wan_params, make_wan_core
    from magcache_tpu.schedulers.unipc import UniPCSchedule

    quick = os.environ.get("BENCH_QUICK") == "1"
    steps = int(os.environ.get("MAGCACHE_BENCH_STEPS", 8 if quick else 50))
    frames = int(os.environ.get("MAGCACHE_BENCH_FRAMES", 9 if quick else 121))
    seg = int(os.environ.get("MAGCACHE_BENCH_SEG", 4 if quick else 5))
    h_pix, w_pix = (64, 128) if quick else (704, 1280)

    if quick:
        from magcache_tpu.models.wan import WanConfig
        cfg = dataclasses.replace(WanConfig.tiny(dtype="float32"),
                                  in_channels=48, out_channels=48)
    else:
        cfg = dataclasses.replace(WAN_5B, dtype="bfloat16")

    # Wan2.2-VAE stride (4, 16, 16) at 48 latent channels
    lat_f = (frames - 1) // 4 + 1
    lat_h, lat_w = h_pix // 16, w_pix // 16
    grid = (lat_f // cfg.patch[0], lat_h // cfg.patch[1], lat_w // cfg.patch[2])
    core = make_wan_core(cfg, grid)
    log(f"bench: Wan2.2-TI2V-5B {w_pix}x{h_pix}x{frames}f, {steps} UniPC "
        f"steps, grid {grid} = {int(np.prod(grid))} tokens, "
        f"backend={jax.default_backend()}")

    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    sch = UniPCSchedule.create(steps, shift=5.0)    # ti2v_5B sample_shift
    cache_cfg = make_config("wan2.2-ti2v-5B-t2v", steps, thresh=0.06, K=2,
                            retention_ratio=0.2)    # E006K2R02 (README)
    mask = compute_skip_schedule(cache_cfg).reshape(steps, 2)
    step_skips = mask.all(axis=1)
    n_skip = int(step_skips.sum())
    n_compute = steps - n_skip
    log(f"skip schedule: {int(mask.sum())}/{steps*2} forwards, "
        f"{n_skip}/{steps} whole steps elided")

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, lat_f, lat_h, lat_w, cfg.in_channels),
                          jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, cfg.text_len, cfg.text_dim), jnp.float32) * 0.5
    cond = {"context": ctx.astype(cfg.jdtype)}

    init_carry, step_in, body = unipc_executor(
        core, sch, cache_cfg=cache_cfg, guidance_scale=5.0,
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

    t0 = time.time()
    jax.block_until_ready(run_segment(params, cond, carry0,
                                      seg_inputs(no_skips, 0, seg)))
    log(f"compile+warm {time.time() - t0:.0f}s")

    def timed_segment(skips_np, tag):
        t0 = time.time()
        c = run_segment(params, cond, carry0,
                        seg_inputs(skips_np, seg, 2 * seg))
        jax.block_until_ready(c)
        dt = time.time() - t0
        log(f"  segment[{tag}] {dt:.2f}s ({dt/seg:.3f}s/step)")
        return dt / seg

    t_compute = min(timed_segment(no_skips, "compute-1"),
                    timed_segment(no_skips, "compute-2"))
    t_skip = min(timed_segment(all_skips, "skip-1"),
                 timed_segment(all_skips, "skip-2"))

    def whole(skips_np, tag):
        carry = init_carry(params, x, cond)
        t0 = time.time()
        for s0 in range(0, steps, seg):
            carry = run_segment(params, cond, carry,
                                seg_inputs(skips_np, s0, s0 + seg))
            jax.block_until_ready(carry)
        dt = time.time() - t0
        log(f"  whole[{tag}] {dt:.1f}s")
        return dt

    t_cached = whole(mask, "magcache")
    t_full = whole(no_skips, "full")

    # e2e span: mock-T5 encode + denoise + streamed Wan2.2-VAE decode
    from magcache_tpu.models.text import MockTextEncoder
    from magcache_tpu.models.vae_wan import (WAN22_VAE, WanVAE, WanVAEConfig,
                                             init_wan_vae_params)

    enc = MockTextEncoder(cfg.text_len, cfg.text_dim, scale=0.5)
    prompts = ["two anthropomorphic cats in boxing gear fight on a stage",
               "low quality, blurry"]
    jax.block_until_ready(enc(prompts))
    t0 = time.time()
    jax.block_until_ready(enc(prompts))
    t_text = time.time() - t0

    vcfg = (WanVAEConfig.tiny(z_channels=48) if quick else WAN22_VAE)
    vae = WanVAE(vcfg, init_wan_vae_params(jax.random.PRNGKey(3), vcfg))
    lat_fin = jax.random.normal(jax.random.PRNGKey(4),
                                (1, lat_f, lat_h, lat_w, cfg.in_channels),
                                jnp.float32)
    jax.block_until_ready(vae.decode(lat_fin))      # compile
    t0 = time.time()
    dec = vae.decode(lat_fin)
    jax.block_until_ready(dec)
    t_dec = time.time() - t0
    log(f"e2e extras: text {t_text:.2f}s, VAE decode {t_dec:.2f}s "
        f"({tuple(dec.shape)})")

    full_e2e = t_text + t_full + t_dec
    cached_e2e = t_text + t_cached + t_dec
    speedup = full_e2e / cached_e2e
    ceiling = steps / n_compute
    result = {
        "metric": "wan2.2_ti2v5b_720p_e2e_speedup",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / ceiling, 3),
        "detail": {
            "sec_per_video_full_e2e": round(full_e2e, 2),
            "sec_per_video_magcache_e2e": round(cached_e2e, 2),
            "sec_denoise_full": round(t_full, 2),
            "sec_denoise_magcache": round(t_cached, 2),
            "t_compute_step_s": round(t_compute, 3),
            "t_skip_step_s": round(t_skip, 3),
            "t_text_encode_s": round(t_text, 3),
            "t_vae_decode_s": round(t_dec, 3),
            "steps_elided": n_skip,
            "schedule_ceiling": round(ceiling, 3),
            "config": "E006K2R02 (MagCache4Wan2.2/README.md recommended)",
            "cross_hw": {
                "reference_full_s_L20": 639.0,     # ~10min39s
                "reference_magcache_s_L20": 324.0,  # ~5min24s
                "peak_tflops": {"v5e": V5E_PEAK_TFLOPS,
                                "L20": L20_PEAK_TFLOPS},
                "speed_vs_reference_absolute": {
                    "full": round(639.0 / full_e2e, 3),
                    "magcache_E006K2R02": round(324.0 / cached_e2e, 3),
                },
            },
            "quick_mode": quick,
        },
    }
    line = json.dumps(result)
    print(line)
    out = os.environ.get("BENCH_TI2V_OUT")
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
