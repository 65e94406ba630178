"""Experiment: VPU-cost variants of the one-shot spatial softmax kernel at
STDiT3-480p shapes ([30 frames, 1600, 6144] fused qkv, 16 heads x 128 lanes).

The production kernel (`ops.attention._grouped_kernel`) measures ~9.3 ms vs
a ~3.2 ms MXU floor — softmax VPU passes over the [1600,1600] f32 score tile
dominate. Each variant isolates one candidate cost. Chained-scan timing with
scalar readback (block_until_ready does not block on the axon tunnel).

Usage: python tools/exp_oneshot_variants.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from magcache_tpu.ops.attention import (  # noqa: E402
    QKNORM_FIXED_MAX, _LOG2E, _NEG_INF, _rms_head)

R, G, H, D = 30, 1600, 16, 128
TRUE_D, GV = 72, 1590
REPS = 16


def kernel(q_ref, k_ref, v_ref, qg_ref, kg_ref, o_ref, *, variant: str):
    v = v_ref[...]
    if variant == "nonorm":
        q = q_ref[...].astype(jnp.float32)
        k = k_ref[...].astype(jnp.float32)
    else:
        q = _rms_head(q_ref, qg_ref, TRUE_D, 1e-6)
        k = _rms_head(k_ref, kg_ref, TRUE_D, 1e-6)
    scale_log2e = (1.0 / np.sqrt(TRUE_D)) * _LOG2E
    q = (q * scale_log2e).astype(v.dtype)
    k = k.astype(v.dtype)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    fm = QKNORM_FIXED_MAX
    k_loc = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = k_loc < GV
    if variant == "rowmax":
        s = jnp.where(mask, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
    elif variant == "noguard":
        # no min-overflow guard; mask folded into one where AFTER exp2
        # (exp2 of masked cols is finite garbage -> zeroed)
        p = jnp.where(mask, jnp.exp2(s - fm), 0.0)
    elif variant == "bf16p":
        s = jnp.where(mask, s, _NEG_INF)
        p = jnp.exp2((jnp.minimum(s, fm + 126.0) - fm).astype(jnp.bfloat16))
    else:
        s = jnp.where(mask, s, _NEG_INF)
        p = jnp.exp2(jnp.minimum(s, fm + 126.0) - fm)
    if variant == "dotsonly":
        o = jax.lax.dot(s.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
        o_ref[...] = o.astype(o_ref.dtype)
        return
    if variant == "passthru":
        o_ref[...] = v + q.astype(o_ref.dtype)
        return
    if variant == "mxusum":
        pb = p.astype(v.dtype)
        ones = jnp.ones((p.shape[1], 128), v.dtype)
        l = jax.lax.dot(pb, ones, preferred_element_type=jnp.float32)[:, :1]
        o = jax.lax.dot(pb, v, preferred_element_type=jnp.float32)
    elif variant == "bf16p":
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
    else:
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def build(variant):
    spec_off = lambda off: pl.BlockSpec(
        (None, G, D), lambda g, i, off=off: (g // H, i, off + g % H),
        memory_space=pltpu.VMEM)
    gain_spec = pl.BlockSpec((None, 1, D), lambda g, i: (g % H, 0, 0),
                             memory_space=pltpu.VMEM)

    def call(qkv, qg, kg):
        return pl.pallas_call(
            functools.partial(kernel, variant=variant),
            grid=(R * H, 1),
            in_specs=[spec_off(0), spec_off(H), spec_off(2 * H),
                      gain_spec, gain_spec],
            out_specs=pl.BlockSpec((None, G, D),
                                   lambda g, i: (g // H, i, g % H),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, G, H * D), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * R * H * G * G * D,
                bytes_accessed=3 * R * G * H * D * qkv.dtype.itemsize,
                transcendentals=R * H * G * G,
            ),
        )(qkv, qkv, qkv, qg, kg)

    return call


def main():
    k0 = jax.random.PRNGKey(0)
    qkv = jax.random.normal(k0, (R, G, 3 * H * D), jnp.bfloat16) * 0.3
    qg = jnp.ones((H, 1, D), jnp.float32)
    kg = jnp.ones((H, 1, D), jnp.float32)

    base_out = None
    for variant in ("base", "nonorm", "rowmax", "noguard", "bf16p", "mxusum",
                    "dotsonly", "passthru"):
        call = build(variant)

        def step(c, _):
            o = call(c.reshape(R, G, 3 * H * D)[..., : 3 * H * D], qg, kg)
            # data dependency: fold output back into the qkv carry
            return c + 1e-6 * jnp.tile(o, (1, 1, 3)).astype(c.dtype), None

        fn = jax.jit(lambda x0: jnp.sum(
            jax.lax.scan(step, x0, None, length=REPS)[0].astype(jnp.float32)))
        s = float(fn(qkv))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(fn(qkv))
            best = min(best, time.time() - t0 - 0.028)
        one = build(variant)(qkv, qg, kg)
        if variant == "base":
            base_out = one
        err = float(jnp.max(jnp.abs((one - base_out).astype(jnp.float32))))
        print(f"{variant:10s} {best/REPS*1e3:7.2f} ms/call   "
              f"(probe {s:.1f}, max|d-base| {err:.2e})")


if __name__ == "__main__":
    main()
