"""Amortized per-op costs of the packed STDiT3 block at bench shapes: each
candidate op runs 28x inside one lax.scan with a data dependency, so the
~23 ms axon dispatch overhead amortizes to <1 ms and per-op deltas are real.

Usage: python tools/profile_stdit3_opscan.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from magcache_tpu.models.common import linear  # noqa: E402
from magcache_tpu.models.stdit3 import (  # noqa: E402
    STDiT3Config, _grouped_rope_tables, _pack_block_group, init_stdit3_params)
from magcache_tpu.ops.attention import (  # noqa: E402
    QKNORM_FIXED_MAX, attention, flash_attention_bshd,
    grouped_attention_fused_qkv, grouped_flash_attention_bshd)
from magcache_tpu.ops.fused_prologue import layer_norm_mod  # noqa: E402

REPS = 28


def scan_time(name, f, x, reps=REPS):
    """Time reps x f inside one jit; f: x -> tensor broadcastable to x."""
    def body(c, _):
        y = f(c)
        # cheap data dependency back into the carry
        return c + 1e-6 * y.reshape(c.shape).astype(c.dtype), None

    # one scalar readback per timing (block_until_ready does NOT block on
    # the axon tunnel — see .claude/skills/verify); ~28 ms round-trip
    # subtracted, amortized over reps anyway
    fn = jax.jit(lambda x0: jnp.sum(
        jax.lax.scan(body, x0, None, length=reps)[0].astype(jnp.float32)))
    float(fn(x))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(fn(x))
        best = min(best, time.time() - t0 - 0.028)
    print(f"{name:46s} {best/reps*1e3:8.2f} ms/op   ({best*1e3:7.1f} total)")
    return best / reps


def main():
    cfg = STDiT3Config(dtype="bfloat16")
    T, H, W = 15, 30, 53
    S, d, heads, td = H * W, cfg.hidden, cfg.heads, cfg.head_dim
    dp, Tp = 128, 16
    rows, N, L = 2, T * S, cfg.caption_max_len
    k0 = jax.random.PRNGKey(0)
    params = init_stdit3_params(k0, cfg)
    gp = _pack_block_group(params["spatial"], heads, td, dp)
    p = jax.tree.map(lambda a: a[0], gp)   # one layer slice
    rope = _grouped_rope_tables(T, Tp, td, dp)
    gains = (jnp.broadcast_to(p["q_norm_p"], (heads, dp)),
             jnp.broadcast_to(p["k_norm_p"], (heads, dp)))
    sc = 1.0 / float(np.sqrt(td))
    bf = jnp.bfloat16
    h = jax.random.normal(k0, (rows, N, d), bf) * 0.1
    y = jax.random.normal(k0, (rows, L, d), bf) * 0.1

    Sg = -(-S // 16) * 16

    def spatial_chain(h):
        xr = h.reshape(rows * T, S, d)
        qkv = linear(p["qkv"], xr)
        if Sg != S:
            qkv = jnp.pad(qkv, ((0, 0), (0, Sg - S), (0, 0)))
        o = grouped_attention_fused_qkv(qkv, heads, group=Sg, group_valid=S,
                                        scale=sc, qk_gains=gains, fixed_max=QKNORM_FIXED_MAX, true_d=td,
                                        eps=1e-6)
        a = linear(p["proj"], o)
        return a[:, :S].reshape(rows, N, d)

    def spatial_oneshot_only(h):
        xr = h.reshape(rows * T, S, d)
        qkv = jnp.concatenate([xr[..., :heads * dp]] * 3, axis=-1) \
            if d >= heads * dp else None
        # build a [rows*T, Sg, 3*H*dp] input from h without a matmul
        base = jnp.pad(xr, ((0, 0), (0, Sg - S), (0, 0)))
        qkv = jnp.tile(jnp.pad(base, ((0, 0), (0, 0),
                                      (0, heads * dp - d))), (1, 1, 3))
        o = grouped_attention_fused_qkv(qkv, heads, group=Sg, group_valid=S,
                                        scale=sc, qk_gains=gains, fixed_max=QKNORM_FIXED_MAX, true_d=td,
                                        eps=1e-6)
        return o[:, :S, :d].reshape(rows, N, d)

    def spatial_flash_only(h):
        xr = h.reshape(rows * T, S, d)
        q = xr[..., :d].reshape(rows * T, S, heads, td)
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, dp - td)))
        o = flash_attention_bshd(qp, qp, qp, scale=sc,
                                 fixed_max=QKNORM_FIXED_MAX, qk_gains=gains,
                                 true_d=td, eps=1e-6)
        return o.reshape(rows, N, heads * dp)[..., :d]

    def temporal_chain(h):
        xr = h.reshape(rows, T, S, d).transpose(0, 2, 1, 3).reshape(
            rows * S, T, d)
        qkv = linear(p["qkv"], xr)
        qkv = jnp.pad(qkv, ((0, 0), (0, Tp - T), (0, 0)))
        o = grouped_attention_fused_qkv(
            qkv.reshape(1, rows * S * Tp, 3 * heads * dp), heads,
            group=Tp, group_valid=T, scale=sc,
            qk_gains=gains, fixed_max=QKNORM_FIXED_MAX, rope_tables=rope, true_d=td, eps=1e-6)
        o = o.reshape(rows * S, Tp, heads * dp)
        a = linear(p["proj"], o)[:, :T]
        return a.reshape(rows, S, T, d).transpose(0, 2, 1, 3).reshape(
            rows, N, d)

    def temporal_grouped_only(h):
        xr = h.reshape(rows, T, S, d).transpose(0, 2, 1, 3).reshape(
            rows * S, T, d)
        q = jnp.pad(xr.reshape(rows * S, T, heads, td),
                    ((0, 0), (0, Tp - T), (0, 0), (0, dp - td)))
        q4 = q.reshape(1, rows * S * Tp, heads, dp)
        o = grouped_flash_attention_bshd(
            q4, q4, q4, group=Tp, group_valid=T, scale=sc,
            qk_gains=gains, fixed_max=QKNORM_FIXED_MAX, rope_tables=rope, true_d=td, eps=1e-6)
        o = o.reshape(rows * S, Tp, heads, dp)[:, :T, :, :td]
        return o.reshape(rows, S, T, d).transpose(0, 2, 1, 3).reshape(
            rows, N, d)

    def cross_chain(h):
        q = linear(p["cross_q"], h).reshape(rows, N, heads, dp)
        kv = linear(p["cross_kv"], y)
        kc, vc = jnp.split(kv, 2, axis=-1)
        rs4 = lambda t_: t_.reshape(rows, L, heads, dp)
        o = attention(q, rs4(kc), rs4(vc), scale=sc)
        return linear(p["cross_o"], o.reshape(rows, N, heads * dp))

    def mlp_chain(h):
        return linear(p["mlp2"], jax.nn.gelu(linear(p["mlp1"], h),
                                             approximate=True))

    def qkv_only(h):
        return linear(p["qkv"], h.reshape(rows * T, S, d)
                      ).reshape(rows, N, 3 * heads * dp)[..., :d]

    def lnmod_only(h):
        sc_ = jnp.zeros((rows, d), jnp.float32)
        return layer_norm_mod(h, scale=sc_, shift=sc_, eps=1e-6)

    from magcache_tpu.ops.fused_prologue import lnmod_matmul

    sc0 = jnp.zeros((rows, d), jnp.float32)

    def spatial_chain_fused(h):
        qkv = lnmod_matmul(h, sc0, sc0, p["qkv"]["w"], p["qkv"].get("b"),
                           eps=1e-6)
        qkv = qkv.reshape(rows * T, S, 3 * heads * dp)
        if Sg != S:
            qkv = jnp.pad(qkv, ((0, 0), (0, Sg - S), (0, 0)))
        o = grouped_attention_fused_qkv(qkv, heads, group=Sg, group_valid=S,
                                        scale=sc, qk_gains=gains,
                                        fixed_max=QKNORM_FIXED_MAX, true_d=td,
                                        eps=1e-6)
        a = linear(p["proj"], o)
        return a[:, :S].reshape(rows, N, d)

    def mlp_chain_fused(h):
        yy = lnmod_matmul(h, sc0, sc0, p["mlp1"]["w"], p["mlp1"].get("b"),
                          act="gelu", eps=1e-6)
        return linear(p["mlp2"], yy)

    def cross_unpacked(h):
        # packed cross projections burn (128-72)/72 = 78% extra MXU columns;
        # the attention itself is tiny (L=300 keys) — candidate: keep cross
        # at the checkpoint head_dim
        pu = jax.tree.map(lambda a: a[0], params["spatial"])
        q = linear(pu["cross_q"], h).reshape(rows, N, heads, td)
        kv = linear(pu["cross_kv"], y[..., :d])
        kc, vc = jnp.split(kv, 2, axis=-1)
        rs4 = lambda t_: t_.reshape(rows, L, heads, td)
        o = attention(q, rs4(kc), rs4(vc))
        return linear(pu["cross_o"], o.reshape(rows, N, d))

    def head_chain(h):
        n = layer_norm_mod(h, scale=sc0, shift=sc0, eps=1e-6)
        out = linear({"w": jnp.zeros((d, 32), bf)}, n)
        return jnp.broadcast_to(jnp.pad(out, ((0, 0), (0, 0), (0, d - 32))),
                                h.shape)

    scan_time("mlp (control, ~88% MFU known)", mlp_chain, h)
    scan_time("qkv matmul packed [.,1152]->[.,6144]", qkv_only, h)
    scan_time("spatial chain (qkv+oneshot+proj)", spatial_chain, h)
    scan_time("spatial chain FUSED (lnmod_mm+oneshot+proj)", spatial_chain_fused, h)
    scan_time("spatial oneshot kernel only", spatial_oneshot_only, h)
    scan_time("temporal chain (tr+qkv+pad+fqkv+proj+tr)", temporal_chain, h)
    scan_time("cross chain packed (q+kv+attn+o)", cross_chain, h)
    scan_time("cross chain UNPACKED 72-lane", cross_unpacked, h)
    scan_time("mlp chain FUSED (lnmod_mm gelu + mlp2)", mlp_chain_fused, h)
    scan_time("layer_norm_mod", lnmod_only, h)
    scan_time("final-head (ln+mod+thin proj)", head_chain, h)


if __name__ == "__main__":
    main()
