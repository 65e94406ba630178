"""Second headline benchmark: Open-Sora 1.2 (STDiT3) 480p x 51f, 30-step
RFLOW, full vs MagCache E012K3R02 — the reference's VideoSys-path numbers
(A800-class: 44.56 s full, 21.21 s MagCache => 2.1x,
``eval/magcache/README.md:66``; config from
``eval/magcache/experiments/opensora.py:375-440``: default OpenSoraConfig
(480p / 9:16 / 51 frames / 30 steps / cfg 7.0), E=0.12 K=3 skip_time=6).

Importable as ``run(tiny=...) -> dict`` so the driver-run ``bench.py`` can
attach it to the round artifact; ``tools/bench_opensora.py`` is the
standalone CLI wrapper.

The denoise loop runs in bounded scan segments (tunnel dispatch limit); the
cache carry crosses segments, so the measured whole runs are exact cached
generation. Joint CFG batch-of-2 on the row axis = single cache lane, like
the reference eval.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(tiny: bool = False) -> dict:
    """Measure full vs MagCache whole runs; returns the metric dict."""
    import jax
    import jax.numpy as jnp

    from magcache_tpu.core.magcache import compute_skip_schedule
    from magcache_tpu.core.presets import make_config
    from magcache_tpu.models.stdit3 import (STDiT3Config, init_stdit3_params,
                                            make_stdit3_core)
    from magcache_tpu.schedulers.rflow import RFlowSchedule

    steps, frames, h_pix, w_pix = 30, 51, 480, 854   # 480p 9:16 bucket
    seg = 6
    if tiny:                                         # CPU smoke of the path
        steps, frames, h_pix, w_pix, seg = 6, 8, 32, 32, 3
        cfg = STDiT3Config.tiny()
    else:
        cfg = STDiT3Config(dtype="bfloat16")
    # per-17-frame-chunk ceil/4 (OpenSoraVAE_V1_2.get_latent_size): 51
    # frames -> 15 latents — the geometry the reference's 44.56 s was
    # measured at (frames//4 = 12 under-counted the sequence by 20%)
    from magcache_tpu.pipelines.open_sora_cond import get_latent_t
    lat = (get_latent_t(frames), h_pix // 8, w_pix // 8)
    pt, ph, pw = cfg.patch
    grid = (lat[0] // pt, lat[1] // ph, lat[2] // pw)
    ntok = int(np.prod(grid))
    cap_len = 6 if tiny else cfg.caption_max_len
    core = make_stdit3_core(cfg, grid, cap_len, pixel_size=(h_pix, w_pix))
    log(f"bench: OpenSora-1.2 STDiT3 {w_pix}x{h_pix}x{frames}f, {steps} "
        f"RFLOW steps, grid {grid} = {ntok} tokens, "
        f"backend={jax.default_backend()}")

    params = init_stdit3_params(jax.random.PRNGKey(0), cfg)
    sch = RFlowSchedule.create(steps, use_timestep_transform=True,
                               height=h_pix, width=w_pix, num_frames=frames)
    dts = np.array([sch.dt(i) for i in range(steps)], np.float32)
    mc = make_config("opensora-v1.2", steps)
    skip_bits = np.asarray(compute_skip_schedule(mc)).ravel()
    n_skip = int(skip_bits.sum())
    log(f"skip schedule: {n_skip}/{steps} steps elided "
        f"(ceiling {steps/(steps-n_skip):.2f}x)")

    C = cfg.in_channels
    g = 7.0
    x0 = jax.random.normal(jax.random.PRNGKey(1),
                           (1,) + (lat[0], lat[1], lat[2], C), jnp.float32)
    cond = {"y": jax.random.normal(
        jax.random.PRNGKey(2), (2, cap_len, cfg.caption_dim),
        jnp.float32) * 0.5,
        "fps": jnp.full((2,), 24.0, jnp.float32)}

    @functools.partial(jax.jit, static_argnames=())
    def run_segment(params, cond, x, cache, seg_ts, seg_dts, seg_skips):
        def body(carry, step_in):
            x, cache = carry
            t, dt, skip = step_in
            x2 = jnp.concatenate([x, x], axis=0)
            tvec = jnp.full((2,), t, jnp.float32)
            hidden, ctx = core.prepare(params, x2, tvec, cond)

            def do_skip(_):
                return hidden + cache, cache

            def do_compute(_):
                h = core.trunk(params, hidden, ctx)
                return h, h - hidden

            h_out, cache = jax.lax.cond(skip, do_skip, do_compute, None)
            out = core.head(params, h_out, ctx)
            co, uo = out[:1][..., :C], out[1:][..., :C]
            v = uo + g * (co - uo)
            x = x + dt.astype(x.dtype) * v.astype(x.dtype)
            return (x, cache), None

        (x, cache), _ = jax.lax.scan(body, (x, cache),
                                     (seg_ts, seg_dts, seg_skips))
        return x, cache

    hshape = jax.eval_shape(lambda p, x, t, c: core.prepare(p, x, t, c)[0],
                            params, jnp.concatenate([x0, x0], 0),
                            jnp.zeros((2,), jnp.float32), cond)
    cache0 = jnp.zeros(hshape.shape, hshape.dtype)
    ts = jnp.asarray(sch.timesteps)
    dts_a = jnp.asarray(dts)

    def whole(bits, tag):
        x, cache = x0, cache0
        t0 = time.time()
        for s0 in range(0, steps, seg):
            x, cache = run_segment(
                params, cond, x, cache, ts[s0:s0 + seg], dts_a[s0:s0 + seg],
                jnp.asarray(bits[s0:s0 + seg]))
            jax.block_until_ready(x)
        dt = time.time() - t0
        log(f"  whole[{tag}] {dt:.1f}s")
        return dt

    t0 = time.time()
    whole(np.zeros(steps, bool), "warmup/compile")
    log(f"compile+warm {time.time()-t0:.0f}s")
    whole(skip_bits, "warm-cached")          # compile the skip branch too
    t_full = whole(np.zeros(steps, bool), "full")
    t_cached = whole(skip_bits, "magcache")

    speedup = t_full / t_cached
    ceiling = steps / (steps - n_skip)
    from magcache_tpu.utils.flops import mfu_pct, stdit3_forward_flops
    step_flops = stdit3_forward_flops(cfg, grid, cap_len, rows=2)
    mfu = mfu_pct(step_flops, t_full / steps)
    log(f"compute-step MFU {mfu:.1f}% ({step_flops/1e12:.1f} TFLOP/step)")
    return {
        "metric": "OpenSora-1.2 480p MagCache E012K3R02 speedup "
                  "(30-step RFLOW, 1 chip)",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 2.1, 3),   # reference's measured 2.1x
        "detail": {
            "sec_per_video_full": round(t_full, 2),
            "sec_per_video_magcache": round(t_cached, 2),
            "mfu_pct_compute_step": round(mfu, 1),
            "forward_tflops_analytic": round(step_flops / 1e12, 1),
            "steps_elided": n_skip,
            "schedule_ceiling": round(ceiling, 3),
            "tokens": ntok,
            "reference_A800_full_s": 44.56,
            "reference_A800_magcache_s": 21.21,
            "speed_vs_reference_absolute": {
                "full": round(44.56 / t_full, 3),
                "magcache": round(21.21 / t_cached, 3)},
            "tiny_smoke": tiny,
            "note": ("denoise loop only (matches the schedule arithmetic); "
                     "the reference number spans generate() incl. T5/VAE — "
                     "see the Wan e2e span for that"),
        }}


def run_pab(tiny: bool = False) -> dict:
    """Measure the PAB strategy (full vs PAB-broadcast whole runs).

    Evidence for the "other cache" (VERDICT r3 #4): OPEN_SORA_PAB
    window+stride reuse of spatial/temporal/cross attention outputs
    (``videosys/core/pab_mgr.py:54-91``). Runs at the 240p 9:16 bucket
    (240x432x51f): PAB's per-block output caches are 6 x depth x [2, N, d]
    bf16 — 18.5 GB at 480p's N=23850, which exceeds one v5e's 16 GB HBM
    (the reference measured PAB on 80 GB A800s), while 240p's N=6075 fits.
    Speedup is geometry-comparable: PAB's win is forward-work elision.
    """
    import jax
    import jax.numpy as jnp

    from magcache_tpu.core.pab import OPEN_SORA_PAB
    from magcache_tpu.models.stdit3 import (STDiT3Config, init_stdit3_params,
                                            make_stdit3_core)
    from magcache_tpu.schedulers.rflow import RFlowSchedule

    steps, frames, h_pix, w_pix, seg = 30, 51, 240, 432, 6
    if tiny:
        steps, frames, h_pix, w_pix, seg = 6, 8, 32, 32, 3
        cfg = STDiT3Config.tiny()
    else:
        cfg = STDiT3Config(dtype="bfloat16")
    from magcache_tpu.pipelines.open_sora_cond import get_latent_t
    lat = (get_latent_t(frames), h_pix // 8, w_pix // 8)
    pt, ph, pw = cfg.patch
    grid = (lat[0] // pt, lat[1] // ph, lat[2] // pw)
    ntok = int(np.prod(grid))
    cap_len = 6 if tiny else cfg.caption_max_len
    sch = RFlowSchedule.create(steps, use_timestep_transform=True,
                               height=h_pix, width=w_pix, num_frames=frames)
    core = make_stdit3_core(cfg, grid, cap_len, pixel_size=(h_pix, w_pix),
                            pab=OPEN_SORA_PAB,
                            timesteps=np.asarray(sch.timesteps))
    core_plain = make_stdit3_core(cfg, grid, cap_len,
                                  pixel_size=(h_pix, w_pix))
    log(f"bench[pab]: OpenSora-1.2 STDiT3 {w_pix}x{h_pix}x{frames}f, "
        f"{steps} RFLOW steps, grid {grid} = {ntok} tokens")

    params = init_stdit3_params(jax.random.PRNGKey(0), cfg)
    dts_a = jnp.asarray([sch.dt(i) for i in range(steps)])
    ts = jnp.asarray(sch.timesteps)
    C = cfg.in_channels
    g = 7.0
    x0 = jax.random.normal(jax.random.PRNGKey(1),
                           (1,) + lat + (C,), jnp.float32)
    cond = {"y": jax.random.normal(
        jax.random.PRNGKey(2), (2, cap_len, cfg.caption_dim),
        jnp.float32) * 0.5,
        "fps": jnp.full((2,), 24.0, jnp.float32)}

    # donate x+state: the 6 x depth x [2,N,d] PAB caches are ~4.7 GB at 240p
    # and an undonated while-carry double-buffers them past one v5e's HBM
    @functools.partial(jax.jit, static_argnames=("use_pab",),
                       donate_argnums=(2, 3))
    def run_segment(params, cond, x, state, seg_ts, seg_dts, seg_idx,
                    use_pab=True):
        def body(carry, step_in):
            x, state = carry
            t, dt, idx = step_in
            x2 = jnp.concatenate([x, x], axis=0)
            tvec = jnp.full((2,), t, jnp.float32)
            hidden, ctx = core.prepare(params, x2, tvec, cond)
            if use_pab:
                h_out, state = core.trunk(params, hidden, ctx, state, idx)
            else:       # full compute: all-False reuse via the same trunk
                h_out, state = core.trunk(params, hidden, ctx, state,
                                          jnp.asarray(-1))
            out = core.head(params, h_out, ctx)
            co, uo = out[:1][..., :C], out[1:][..., :C]
            v = uo + g * (co - uo)
            x = x + dt.astype(x.dtype) * v.astype(x.dtype)
            return (x, state), None

        (x, state), _ = jax.lax.scan(body, (x, state),
                                     (seg_ts, seg_dts, seg_idx))
        return x, state

    hshape = jax.eval_shape(lambda p, x, t, c: core.prepare(p, x, t, c)[0],
                            params, jnp.concatenate([x0, x0], 0),
                            jnp.zeros((2,), jnp.float32), cond)
    def whole(tag, use_pab):
        # fresh carries per run: run_segment donates them (HBM), so the
        # originals would be invalidated after the first segment
        x = x0 + 0.0
        state = core.init_state(params, hshape, None)
        t0 = time.time()
        for s0 in range(0, steps, seg):
            x, state = run_segment(
                params, cond, x, state, ts[s0:s0 + seg], dts_a[s0:s0 + seg],
                jnp.arange(s0, s0 + seg), use_pab=use_pab)
            jax.block_until_ready(x)
        dt = time.time() - t0
        log(f"  whole[{tag}] {dt:.1f}s")
        return dt

    whole("warmup/compile-full", False)
    whole("warmup/compile-pab", True)
    t_full = whole("full", False)
    t_pab = whole("pab", True)
    speedup = t_full / t_pab
    return {
        "metric": "OpenSora-1.2 240p PAB speedup (30-step RFLOW, 1 chip)",
        "value": round(speedup, 3),
        "unit": "x",
        "detail": {
            "sec_per_video_full": round(t_full, 2),
            "sec_per_video_pab": round(t_pab, 2),
            "tokens": ntok,
            "geometry": f"{w_pix}x{h_pix}x{frames}f",
            "tiny_smoke": tiny,
            "note": ("240p bucket: 480p PAB caches (6 x 28 x [2,23850,1152] "
                     "bf16 = 18.5 GB) exceed one v5e's 16 GB HBM; the "
                     "reference measured PAB on 80 GB A800s"),
        }}
