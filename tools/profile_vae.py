"""Profile the Wan VAE streamed decode at 480p81f on the TPU.

Usage: python tools/profile_vae.py [outdir]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from magcache_tpu.models.vae_wan import WanVAE, WanVAEConfig, init_wan_vae_params


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vae_profile"
    cfg = WanVAEConfig()
    key = jax.random.PRNGKey(0)
    params = init_wan_vae_params(key, cfg)
    vae = WanVAE(cfg, params)
    z = jax.random.normal(key, (1, 21, 60, 104, 16), jnp.float32) * 0.5

    t0 = time.time()
    y = vae.decode(z)
    y.block_until_ready()
    print(f"decode+compile: {time.time()-t0:.2f}s out {y.shape} {y.dtype}")

    for i in range(2):
        t0 = time.time()
        y = vae.decode(z)
        y.block_until_ready()
        print(f"rep {i}: {time.time()-t0:.3f}s")

    # single stream step timing (dispatch granularity)
    caches = None
    y1, caches = vae._jit_dec_stream(vae.params, z[:, :1], caches)
    y1.block_until_ready()
    t0 = time.time()
    y1, c2 = vae._jit_dec_stream(vae.params, z[:, 1:2], caches)
    y1.block_until_ready()
    print(f"one stream step: {time.time()-t0:.3f}s")

    with jax.profiler.trace(outdir):
        y1, _ = vae._jit_dec_stream(vae.params, z[:, 2:3], c2)
        y1.block_until_ready()
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
