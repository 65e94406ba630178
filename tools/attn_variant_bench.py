"""Model-level attention-variant timing on the real TPU (one variant per
process — the flash env knobs are read at trace time and jit caches would
otherwise mask a change).

Times ONE full Wan-1.3B forward (prepare+trunk+head, 2 CFG rows batched) at
the bench shape; per the tunnel gotchas, standalone kernel timings lie, so
everything is measured at model level with a forced host transfer.

Usage:
  python tools/attn_variant_bench.py                 # baseline
  MAGCACHE_FLASH_FIXED_MAX=16 python tools/attn_variant_bench.py
  MAGCACHE_FLASH_BQ=2048 python tools/attn_variant_bench.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from magcache_tpu.models.wan import WAN_1_3B, init_wan_params, make_wan_core

    frames = int(os.environ.get("FRAMES", 81))
    reps = int(os.environ.get("REPS", 3))
    cfg = dataclasses.replace(WAN_1_3B, dtype="bfloat16")
    lat_f = (frames - 1) // 4 + 1
    grid = (lat_f, 30, 52)          # 480x832
    core = make_wan_core(cfg, grid)
    tokens = int(np.prod(grid))
    knobs = {k: os.environ.get(k, "") for k in
             ("MAGCACHE_FLASH_FIXED_MAX", "MAGCACHE_FLASH_BQ",
              "MAGCACHE_FLASH_BK")}
    print(f"variant knobs: {knobs}  tokens={tokens} backend={jax.default_backend()}",
          flush=True)

    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, lat_f * 1, 30 * 2, 52 * 2, 16), jnp.float32)
    ctx = (jax.random.normal(jax.random.PRNGKey(2),
                             (2, cfg.text_len, cfg.text_dim), jnp.float32)
           * 0.5).astype(jnp.bfloat16)
    cond = {"context": ctx}

    @jax.jit
    def fwd(params, x, cond):
        tvec = jnp.full((2,), 500.0, jnp.float32)
        hidden, c = core.prepare(params, x, tvec, cond)
        h = core.trunk(params, hidden, c)
        return core.head(params, h, c)

    t0 = time.time()
    out = fwd(params, x, cond)
    print(f"checksum {float(jnp.sum(out.astype(jnp.float32))):.4f}  "
          f"compile+warm {time.time()-t0:.1f}s", flush=True)
    times = []
    for i in range(reps):
        t0 = time.time()
        out = fwd(params, x, cond)
        _ = float(jnp.sum(out.astype(jnp.float32)))   # force host transfer
        times.append(time.time() - t0)
        print(f"  rep[{i}] {times[-1]:.3f}s", flush=True)
    print(f"RESULT {knobs} best {min(times):.3f}s median {sorted(times)[len(times)//2]:.3f}s",
          flush=True)


if __name__ == "__main__":
    main()
