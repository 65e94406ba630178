"""Benchmark: Wan2.1-T2V-1.3B 480p x 81 frames, 50 UniPC steps, dual-lane CFG.

Compares full compute vs MagCache E=0.12/K=2/R=0.2 (the reference's
E012K2R02 config, reported 2.2x on A800: ``MagCache4Wan2.1/README.md:101-103``)
and prints ONE JSON line:
  {"metric": ..., "value": speedup_x, "unit": "x", "vs_baseline": ...}

Method (default): BOTH runs are **measured end-to-end** — the denoise loop
executes in bounded scan segments (the serving tunnel crashes dispatches
>~60s) and the wall-clock spans all segments including host dispatch gaps.
Per-step costs are also measured separately and used to (a) cross-check the
whole-run numbers and (b) reconstruct the other published configs.
``BENCH_RECON=1`` skips the whole runs (fast mode, reconstruction only).

Baseline semantics: `tests/test_schedule_parity_reference.py` proves our skip
schedule is bit-identical to the reference's (50/100 forwards skipped at
E012K2R02), so a fair wall-clock ratio is bounded by 100/50 = 2.00x; the
reference's published 2.2x exceeds its own schedule's arithmetic ceiling
(its A800 full-compute baseline ran slower per forward than its cached run).
``vs_baseline`` therefore normalizes by the schedule ceiling (value/2.00 —
"fraction of the theoretically available speedup realized"); the raw ratio
to the published claim and a hardware-normalized sec/video comparison are in
``detail``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

# v5e peak bf16 TFLOP/s vs A800 (the reference's hardware)
V5E_PEAK_TFLOPS = 197.0
A800_PEAK_TFLOPS = 312.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _init_backend_or_die(timeout_s: int = 300):
    from magcache_tpu.utils.backend import init_backend_or_die
    return init_backend_or_die(timeout_s, log=log)


def main():
    import jax

    log(f"devices: {_init_backend_or_die()}")
    if jax.default_backend() != "cpu":
        # persistent cache only helps (and is only portable) on the TPU
        # backend; CPU AOT entries are machine-feature-pinned and loading one
        # compiled on a different host stalls or SIGILLs
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    import jax.numpy as jnp

    from magcache_tpu.core.magcache import compute_skip_schedule
    from magcache_tpu.core.presets import make_config
    from magcache_tpu.core.sampler import unipc_executor
    from magcache_tpu.models.wan import WAN_1_3B, init_wan_params, make_wan_core
    from magcache_tpu.schedulers.unipc import UniPCSchedule

    quick = os.environ.get("BENCH_QUICK") == "1"
    recon_only = os.environ.get("BENCH_RECON") == "1" or quick
    frames = int(os.environ.get("MAGCACHE_BENCH_FRAMES", 21 if quick else 81))
    steps = int(os.environ.get("MAGCACHE_BENCH_STEPS", 8 if quick else 50))
    seg = int(os.environ.get("MAGCACHE_BENCH_SEG", 4 if quick else 5))
    if os.environ.get("MAGCACHE_BENCH_RES") == "720":
        # 1280x720x81f -> 75.6k tokens; measured 13.79 s/step (NOTES.md #19)
        h_pix, w_pix = 720, 1280
    else:
        h_pix, w_pix = (192, 320) if quick else (480, 832)

    # quick mode is a code-path smoke check (usually on CPU, where bf16 is
    # emulated ~50x slower); the measured runs are always bf16.
    # MAGCACHE_BENCH_TINY=1 additionally shrinks the model to the toy config —
    # CI-only validation that every bench code path executes; numbers from it
    # are meaningless and the JSON is tagged accordingly.
    tiny = os.environ.get("MAGCACHE_BENCH_TINY") == "1"
    if tiny:
        from magcache_tpu.models.wan import WanConfig
        cfg = WanConfig.tiny(dtype="float32")
    else:
        cfg = dataclasses.replace(WAN_1_3B,
                                  dtype="float32" if quick else "bfloat16")
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
    # a scheduler step is elided only when BOTH CFG lanes skip (batched lanes;
    # at every published Wan config the lanes skip in pairs — property-tested)
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

    t_full_recon = steps * t_compute
    t_cached_recon = n_compute * t_compute + n_skip * t_skip

    if recon_only:
        t_full, t_cached = t_full_recon, t_cached_recon
        method = "per-step-reconstruction"
    else:
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
        method = "measured-whole-run"

    # ---- whole-generate (apples-to-apples with the reference's timing span,
    # wan_magcache.py:1157-1180: text encode + denoise + VAE decode) ---------
    e2e = None
    if not recon_only or os.environ.get("BENCH_E2E") == "1":
        from magcache_tpu.models.text import MockTextEncoder
        from magcache_tpu.models.vae_wan import (WanVAEConfig,
                                                 init_wan_vae_params, WanVAE)

        enc = MockTextEncoder(cfg.text_len, cfg.text_dim, scale=0.5)
        prompts = ["a cinematic shot of a calico cat on a windowsill",
                   "low quality, blurry"]
        jax.block_until_ready(enc(prompts))     # compile/warm (steady-state
        t0 = time.time()                        # serving amortizes this)
        txt = enc(prompts)
        jax.block_until_ready(txt)
        t_text = time.time() - t0

        vcfg = (WanVAEConfig.tiny(z_channels=16) if tiny else WanVAEConfig())
        vae = WanVAE(vcfg, init_wan_vae_params(jax.random.PRNGKey(3), vcfg))
        lat_fin = jax.random.normal(jax.random.PRNGKey(4),
                                    (1, lat_f, lat_h, lat_w, 16), jnp.float32)
        dec = vae.decode(lat_fin)            # compile
        jax.block_until_ready(dec)
        t0 = time.time()
        dec = vae.decode(lat_fin)
        jax.block_until_ready(dec)
        t_dec = time.time() - t0
        log(f"e2e extras: text encode {t_text:.2f}s, "
            f"VAE decode {t_dec:.2f}s ({tuple(dec.shape)})")
        e2e = {
            "sec_per_video_full_e2e": round(t_text + t_full + t_dec, 2),
            "sec_per_video_magcache_e2e": round(t_text + t_cached + t_dec, 2),
            "t_text_encode_s": round(t_text, 3),
            "t_vae_decode_s": round(t_dec, 3),
            "speedup_e2e": round((t_text + t_full + t_dec)
                                 / (t_text + t_cached + t_dec), 3),
            "span": "mock-T5 encode + denoise loop + streamed f32 VAE decode "
                    "(one process, sequential, same seed inputs)",
        }

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
        extra[name] = {"speedup": round(t_full_recon / tc, 3),
                       "sec_per_video": round(tc, 2), "steps_elided": ns,
                       "ceiling": round(steps / (steps - ns), 3)}
        log(f"  config {name}: {t_full_recon/tc:.2f}x ({tc:.1f}s, {ns} steps elided)")

    # hardware-normalized comparison vs the reference's published A800 numbers
    # (per-step FLOPs identical by construction: same model, same schedule)
    ceiling = steps / n_compute
    detail = {
        "sec_per_video_full": round(t_full, 2),
        "sec_per_video_magcache": round(t_cached, 2),
        "t_compute_step_s": round(t_compute, 3),
        "t_skip_step_s": round(t_skip, 3),
        "steps_elided": n_skip,
        "forwards_elided": int(mask.sum()),
        "total_forwards": steps * 2,
        "method": method,
        "reconstruction_crosscheck": {
            "sec_full": round(t_full_recon, 2),
            "sec_magcache": round(t_cached_recon, 2)},
        "schedule_ceiling": round(ceiling, 3),
        "vs_published_claim_2p2x": round(speedup / 2.2, 3),
        "schedule_parity": "bit-identical to reference decision loop "
                           "(tests/test_schedule_parity_reference.py); the "
                           "published 2.2x exceeds this schedule's own "
                           f"{ceiling:.2f}x wall-clock ceiling",
        "cross_hw": {
            "reference_full_s_A800": 189.0,
            "reference_magcache_s_A800": 87.0,
            "peak_tflops": {"v5e": V5E_PEAK_TFLOPS, "A800": A800_PEAK_TFLOPS},
            # absolute wall-clock vs the reference's published A800 numbers
            # (>1 = this framework is faster on strictly weaker-peak silicon);
            # the reference's span is whole-generate, so compare e2e when
            # available; only meaningful on the full-size run
            "speed_vs_reference_absolute": {
                "full": round(189.0 / (e2e["sec_per_video_full_e2e"]
                                       if e2e else t_full), 3),
                "magcache_E012K2R02": round(
                    87.0 / (e2e["sec_per_video_magcache_e2e"]
                            if e2e else t_cached), 3),
            },
            # sec/video x chip peak TFLOPs (lower = better use of silicon)
            "peak_normalized_full_ours": round(t_full * V5E_PEAK_TFLOPS, 0),
            "peak_normalized_full_ref": round(189.0 * A800_PEAK_TFLOPS, 0),
        },
        "other_configs": extra,
        "e2e": e2e,
        "quick": quick,
        "tiny_smoke": tiny,
    }

    # ---- second headline: Open-Sora 1.2 STDiT3 480p 30-step RFLOW ---------
    # (the reference's VideoSys-path numbers, eval/magcache/README.md:66).
    # Attached to detail so the round artifact carries both headliners; any
    # failure here must not break the main metric. MAGCACHE_BENCH_OPENSORA=0
    # disables; tiny/quick runs use the tiny smoke variant.
    if os.environ.get("MAGCACHE_BENCH_OPENSORA", "1") != "0":
        try:
            from magcache_tpu.eval.bench_opensora import run as run_opensora
            detail["opensora_headline"] = run_opensora(tiny=tiny or quick)
        except Exception as exc:  # noqa: BLE001 — bench must still report
            log(f"opensora headline bench failed: {exc!r}")
            detail["opensora_headline"] = {"error": repr(exc)}

    print(json.dumps({
        "metric": "Wan2.1-T2V-1.3B 480p MagCache E012K2R02 speedup (50-step UniPC, 1 chip)",
        "value": round(speedup, 3),
        "unit": "x",
        # fraction of the schedule's arithmetic ceiling realized (see module
        # docstring; raw value/2.2 is detail.vs_published_claim_2p2x)
        "vs_baseline": round(speedup / ceiling, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
