"""Fused attention-prologue kernel: RMSNorm + interleaved-pair RoPE.

At Wan-480p the unfused lowering of ``rms_norm -> heads -> apply_rope`` costs
~4 ms/block in relayout copies and standalone VPU passes (profiled; see
NOTES.md): XLA picks {1,3,2,0}/{3,1,2,0} layouts around the per-head rope
matmul and inserts full-tensor copies back to {2,1,0} for the attention
kernel. This Pallas kernel does norm + rotation in one VMEM-resident pass
over the fused ``[B, S, H*D]`` projection output — one HBM read, one write,
all layouts standard.

Math parity: replicates ``ops.norms.rms_norm`` (f32 statistics,
``reciprocal(sqrt(var+eps))``, gain multiply, round to input dtype) followed
by ``ops.rope.apply_rope`` (f32 rotation of the *rounded* normed value, the
same intermediate rounding the unfused path has), with the rotation partner
computed per head as an in-kernel ``[d, d]`` pair-swap matmul (single ±1
contraction term per output -> exact).

Two norm scopes:
- ``norm_scope="token"``: RMS over the full H*D dim (Wan's WanRMSNorm —
  norm before head split, magcache_generate.py:236-246).
- ``norm_scope="head"``: RMS per head over D (FLUX/Hunyuan/Qwen-style
  per-head qk norm applied after head split).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magcache_tpu.ops.norms import rms_norm
from magcache_tpu.ops.rope import _pair_swap_matrix, apply_rope

__all__ = ["rms_norm_rope", "layer_norm_mod", "lnmod_matmul",
           "matmul_gated_residual"]


def _mm_gate_res_kernel(x_ref, w_ref, bias_ref, g_ref, r_ref, o_ref, *,
                        has_res: bool, valid_s, block_s: int):
    """matmul + AdaLN gate + residual epilogue in one pass.

    out = [resid +] gate * (x @ w + bias). Parity with the unfused trunk
    composition: the matmul result is rounded to the activation dtype
    BEFORE the f32 gate multiply (the trunk converts the projection output
    with .astype(f32) around the gate), and the residual add happens on
    the f32 gated value like `h + _gated(...)` after its astype."""
    acc = jax.lax.dot(x_ref[...], w_ref[...],
                      preferred_element_type=jnp.float32)
    acc = acc + bias_ref[...]
    y = acc.astype(o_ref.dtype).astype(jnp.float32)
    y = y * g_ref[...]
    if has_res:
        y = y.astype(o_ref.dtype).astype(jnp.float32) + r_ref[...].astype(jnp.float32)
    if valid_s is not None:
        row = (pl.program_id(1) * block_s
               + jax.lax.broadcasted_iota(jnp.int32, y.shape, 0))
        y = jnp.where(row < valid_s, y, 0.0)
    o_ref[...] = y.astype(o_ref.dtype)


def matmul_gated_residual(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    gate: jnp.ndarray,
    resid: Optional[jnp.ndarray] = None,
    *,
    rows_out: Optional[int] = None,
    batch_repeat: int = 1,
    block_s: int = 128,
    force: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """``[resid +] gate * (x @ w + bias)`` — the DiT block epilogue
    (out-projection or MLP-down matmul, AdaLN gate, trunk residual) as one
    kernel, so the projection output never round-trips HBM for the gate
    multiply and the residual add.

    x: [B, S_in, d_in]; gate: [B/batch_repeat, d_out]; resid: [B, rows_out,
    d_out] or None. ``rows_out`` < S_in drops trailing input rows (the
    attention-group padding) for free via the write grid; > S_in zero-fills
    (symmetric to `lnmod_matmul`). Falls back to the unfused composition
    off-TPU, under a mesh plan, or for non-128-aligned dims."""
    import os

    from magcache_tpu.parallel.mesh import _ACTIVE

    b, s_in, d_in = x.shape
    d_out = w.shape[-1]
    rows_out = s_in if rows_out is None else rows_out
    on_tpu = jax.default_backend() in ("tpu", "axon")
    enabled = (os.environ.get("MAGCACHE_FUSED_PROLOGUE", "1") != "0"
               and os.environ.get("MAGCACHE_LNMOD_MM", "1") != "0")
    if not interpret and not force and (
            not on_tpu or not enabled or d_in % 128 != 0
            or d_out % 128 != 0 or _ACTIVE.get() is not None):
        y = x[:, :rows_out] if rows_out < s_in else x
        out = jnp.einsum("bsd,df->bsf", y.astype(w.dtype), w)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        g2 = (jnp.repeat(gate, batch_repeat, axis=0)
              if batch_repeat > 1 else gate)
        out = (out.astype(x.dtype).astype(jnp.float32)
               * g2[:, None].astype(jnp.float32))
        if resid is not None:
            out = (out.astype(x.dtype).astype(jnp.float32)
                   + resid[:, :out.shape[1]].astype(jnp.float32))
        out = out.astype(x.dtype)
        if rows_out > s_in:   # zero pad rows, matching the kernel's write
            out = jnp.pad(out, ((0, 0), (0, rows_out - s_in), (0, 0)))
        return out

    nb = b // batch_repeat
    g2 = gate.reshape(nb, 1, d_out).astype(jnp.float32)
    bias2 = (jnp.asarray(bias, jnp.float32).reshape(1, d_out)
             if bias is not None else jnp.zeros((1, d_out), jnp.float32))
    rep = batch_repeat
    block_s = min(block_s, max(8, 1 << (rows_out - 1).bit_length()))
    ns = -(-rows_out // block_s)
    ns_in_max = (s_in - 1) // block_s
    has_res = resid is not None
    r_arr = resid if has_res else jnp.zeros((b, 1, d_out), x.dtype)
    r_spec = (pl.BlockSpec((None, block_s, d_out), lambda bi, i: (bi, i, 0),
                           memory_space=pltpu.VMEM)
              if has_res else
              pl.BlockSpec((None, 1, d_out), lambda bi, i: (bi, 0, 0),
                           memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(
            _mm_gate_res_kernel, has_res=has_res,
            valid_s=(s_in if rows_out > s_in else None), block_s=block_s),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((None, block_s, d_in),
                         lambda bi, i: (bi, jnp.minimum(i, ns_in_max), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d_out), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, d_out), lambda bi, i: (bi // rep, 0, 0),
                         memory_space=pltpu.VMEM),
            r_spec,
        ],
        out_specs=pl.BlockSpec((None, block_s, d_out),
                               lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows_out, d_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * min(rows_out, s_in) * d_in * d_out,
            bytes_accessed=((x.size + (r_arr.size if has_res else 0)) * x.dtype.itemsize
                            + b * rows_out * d_out * x.dtype.itemsize
                            + w.size * w.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w, bias2, g2, r_arr)
    return out


def _lnmod_mm_kernel(x_ref, a_ref, b_ref, w_ref, bias_ref, o_ref, *,
                     eps: float, act: Optional[str], valid_s: int,
                     block_s: int):
    """(LayerNorm + AdaLN modulate + matmul [+ bias] [+ gelu]) in one pass.

    The separate LN+mod pass is VPU-compute-bound (~1.5 ms at STDiT3-480p,
    insensitive to block size — measured round 5) and costs a full HBM
    round-trip of the activation; inside the matmul kernel its VPU work
    overlaps the MXU and the round-trip disappears.

    ``valid_s``: rows >= valid_s of the (possibly longer) output are
    zero-filled — emitting attention-group row padding directly instead of
    a separate full-width pad copy of the projection output."""
    x32 = x_ref[...].astype(jnp.float32)                  # [bs, d_in]
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    cent = x32 - mean
    var = jnp.mean(cent * cent, axis=-1, keepdims=True)
    y = cent * jax.lax.rsqrt(var + eps)
    # the unfused path rounds ln(x) to the activation dtype before the f32
    # modulation (ops.norms.layer_norm returns x.dtype) — replicate, then
    # round again to the matmul operand dtype like the unfused qkv input
    y = y.astype(o_ref.dtype).astype(jnp.float32)
    y = y * (1.0 + a_ref[...]) + b_ref[...]
    acc = jax.lax.dot(y.astype(w_ref.dtype), w_ref[...],
                      preferred_element_type=jnp.float32)
    acc = acc + bias_ref[...]
    if act == "gelu":
        acc = jax.nn.gelu(acc, approximate=True)
    if valid_s is not None:  # static: output carries zero-filled pad rows
        row = (pl.program_id(1) * block_s
               + jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0))
        acc = jnp.where(row < valid_s, acc, 0.0)
    o_ref[...] = acc.astype(o_ref.dtype)


def lnmod_matmul(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    act: Optional[str] = None,
    eps: float = 1e-6,
    block_s: int = 128,
    rows_out: Optional[int] = None,
    batch_repeat: int = 1,
    force: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """``(layer_norm(x) * (1+scale) + shift) @ w [+ bias]`` fused, with an
    optional gelu epilogue (the MLP-in projection).

    x: [B, S, d_in]; scale/shift: [B/batch_repeat, d_in] (per-sample AdaLN
    rows; ``batch_repeat`` > 1 maps consecutive groups of x batch rows to
    one modulation row — the per-frame view of a [rows, T*S, d] trunk
    hidden); w: [d_in, d_out]; bias: [d_out]. Returns [B, rows_out, d_out]
    in x.dtype, where ``rows_out >= S`` appends ZERO-filled rows per batch
    row — attention-group padding emitted directly by the kernel's write
    instead of a separate full-width pad copy of the projection output.
    The weight stays VMEM-resident across the token grid (d_in*d_out*2B —
    14 MB at STDiT3's qkv), so the LN/mod VPU work runs under the MXU.
    Falls back to the unfused composition off-TPU, under a mesh plan, or
    for non-128-aligned dims."""
    import os

    from magcache_tpu.parallel.mesh import _ACTIVE

    b, s, d_in = x.shape
    d_out = w.shape[-1]
    rows_out = s if rows_out is None else rows_out
    on_tpu = jax.default_backend() in ("tpu", "axon")
    enabled = (os.environ.get("MAGCACHE_FUSED_PROLOGUE", "1") != "0"
               and os.environ.get("MAGCACHE_LNMOD_MM", "1") != "0")
    # ``force``: called from inside a shard_map wrapper (parallel.
    # collectives) — the per-shard call must take the kernel even though
    # the mesh plan contextvar is set
    if not interpret and not force and (
            not on_tpu or not enabled or d_in % 128 != 0
            or d_out % 128 != 0 or _ACTIVE.get() is not None):
        sc2 = (jnp.repeat(scale, batch_repeat, axis=0)
               if batch_repeat > 1 else scale)
        sh2 = (jnp.repeat(shift, batch_repeat, axis=0)
               if batch_repeat > 1 else shift)
        y = layer_norm_mod(x, scale=sc2, shift=sh2, eps=eps,
                           interpret=interpret)
        out = jnp.einsum("bsd,df->bsf", y.astype(w.dtype), w)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        if act == "gelu":
            out = jax.nn.gelu(out, approximate=True)
        out = out.astype(x.dtype)
        if rows_out != s:
            out = jnp.pad(out, ((0, 0), (0, rows_out - s), (0, 0)))
        return out

    nb = b // batch_repeat
    a2 = scale.reshape(nb, 1, d_in).astype(jnp.float32)
    b2 = shift.reshape(nb, 1, d_in).astype(jnp.float32)
    bias2 = (jnp.asarray(bias, jnp.float32).reshape(1, d_out)
             if bias is not None else jnp.zeros((1, d_out), jnp.float32))
    rep = batch_repeat
    a_spec = pl.BlockSpec((None, 1, d_in), lambda bi, i: (bi // rep, 0, 0),
                          memory_space=pltpu.VMEM)
    block_s = min(block_s, max(8, 1 << (s - 1).bit_length()))
    ns = -(-rows_out // block_s)
    # the grid covers rows_out; clamp input fetches of fully-padded tail
    # blocks into range (an OOB block index is an OOB DMA — worker crash)
    ns_in_max = (s - 1) // block_s
    out = pl.pallas_call(
        functools.partial(_lnmod_mm_kernel, eps=eps, act=act,
                          valid_s=(s if rows_out != s else None),
                          block_s=block_s),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((None, block_s, d_in),
                         lambda bi, i: (bi, jnp.minimum(i, ns_in_max), 0),
                         memory_space=pltpu.VMEM),
            a_spec,
            a_spec,
            pl.BlockSpec((d_in, d_out), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_s, d_out),
                               lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows_out, d_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * d_in * d_out,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + b * rows_out * d_out * x.dtype.itemsize
                            + w.size * w.dtype.itemsize),
            transcendentals=b * s * (d_out if act else 0),
        ),
        interpret=interpret,
    )(x, a2, b2, w, bias2)
    return out


def _kernel(x_ref, g_ref, cos_ref, sin_ref, p_ref, o_ref, *, heads: int,
            d: int, eps: float, scope: str):
    x32 = x_ref[...].astype(jnp.float32)            # [bs, H*D]
    if scope == "token":
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jnp.reciprocal(jnp.sqrt(var + eps))
    else:                                           # per-head RMS
        parts = []
        for h in range(heads):
            seg = x32[:, h * d:(h + 1) * d]
            var = jnp.mean(seg * seg, axis=-1, keepdims=True)
            parts.append(seg * jnp.reciprocal(jnp.sqrt(var + eps)))
        y = jnp.concatenate(parts, axis=-1)
    y = y * g_ref[...].astype(jnp.float32)
    # the unfused path rounds the normed value to the activation dtype before
    # rotating in f32 — replicate for bit parity with rms_norm + apply_rope
    yb = y.astype(o_ref.dtype).astype(jnp.float32)
    cos_t = jnp.tile(cos_ref[...], (1, heads))      # [bs, d] -> [bs, H*D]
    sin_t = jnp.tile(sin_ref[...], (1, heads))
    P = p_ref[...]
    partner = jnp.concatenate(
        [jax.lax.dot(yb[:, h * d:(h + 1) * d], P,
                     preferred_element_type=jnp.float32)
         for h in range(heads)], axis=-1)
    o_ref[...] = (yb * cos_t + partner * sin_t).astype(o_ref.dtype)


def rms_norm_rope(
    x: jnp.ndarray,
    gain: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    heads: int,
    *,
    eps: float = 1e-5,
    norm_scope: str = "token",
    block_s: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """``rms_norm(x, gain) -> split heads -> apply_rope`` in one fused pass.

    x: [B, S, H*D] projection output; gain: [H*D]; cos/sin: [S, D/2] tables
    (the apply_rope convention). Returns [B, S, H, D].

    Falls back to the unfused composition off-TPU, for ragged head dims the
    kernel can't tile (D % 128 != 0), and under ``MAGCACHE_FUSED_PROLOGUE=0``.
    """
    import os

    from magcache_tpu.parallel.mesh import _ACTIVE

    b, s, hd = x.shape
    d = hd // heads
    on_tpu = jax.default_backend() in ("tpu", "axon")
    enabled = os.environ.get("MAGCACHE_FUSED_PROLOGUE", "1") != "0"
    # under an active mesh plan the trunk is declaratively sharded — a raw
    # pallas_call would not partition; take the jnp composition (XLA shards it)
    if not interpret and (not on_tpu or not enabled or d % 128 != 0
                          or hd % 128 != 0 or _ACTIVE.get() is not None):
        if norm_scope == "token":
            yh = rms_norm(x, gain, eps=eps).reshape(b, s, heads, d)
        else:
            g = gain if gain.size == d else gain.reshape(heads, d)
            yh = rms_norm(x.reshape(b, s, heads, d), g, eps=eps)
        return apply_rope(yh, cos, sin)

    cos2 = jnp.repeat(jnp.asarray(cos, jnp.float32), 2, axis=-1)   # [S, d]
    sin2 = jnp.repeat(jnp.asarray(sin, jnp.float32), 2, axis=-1)
    P = jnp.asarray(_pair_swap_matrix(d))
    g_full = jnp.tile(jnp.asarray(gain).reshape(-1),
                      heads if gain.size == d else 1)
    g2 = g_full.reshape(1, hd)
    block_s = min(block_s, max(8, 1 << (s - 1).bit_length()))
    ns = -(-s // block_s)
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, d=d, eps=eps,
                          scope=norm_scope),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((None, block_s, hd), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), lambda bi, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), lambda bi, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_s, hd), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, hd), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, g2, cos2, sin2, P)
    return out.reshape(b, s, heads, d)


def _ln_mod_kernel(x_ref, a_ref, b_ref, o_ref, *, eps: float, mode: str):
    """LayerNorm + (AdaLN modulate | affine) in one VMEM pass.

    mode="mod":    out = ln(x) * (1 + a) + b   (a/b = scale/shift rows)
    mode="affine": out = ln(x) * a + b         (a/b = weight/bias, row 0)
    mode="plain":  out = ln(x)
    Two-pass mean/var in f32, matching ops.norms.layer_norm.
    """
    x32 = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    cent = x32 - mean
    var = jnp.mean(cent * cent, axis=-1, keepdims=True)
    y = cent * jnp.reciprocal(jnp.sqrt(var + eps))
    if mode == "mod":
        # the unfused path rounds ln(x) to the activation dtype before the
        # f32 modulation (layer_norm returns x.dtype) — replicate
        y = y.astype(o_ref.dtype).astype(jnp.float32)
        y = y * (1.0 + a_ref[...]) + b_ref[...]
    elif mode == "affine":
        y = y * a_ref[...] + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def layer_norm_mod(
    x: jnp.ndarray,
    *,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
    shift: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
    block_s: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ``layer_norm(x) * (1+scale) + shift`` (AdaLN) or affine LN.

    x: [B, S, D]; scale/shift: [B, 1, D] or [B, D] (per-sample modulation
    rows); weight/bias: [D]. Returns x.dtype. The unfused lowering leaves a
    standalone ~25 GB/s stats reduce per site (profiled); this is one
    bandwidth-bound VMEM pass. Falls back to the jnp composition off-TPU,
    under a mesh plan, or for D % 128 != 0.
    """
    import os

    from magcache_tpu.ops.norms import layer_norm
    from magcache_tpu.parallel.mesh import _ACTIVE

    b, s, hd = x.shape
    assert weight is None or scale is None, (
        "layer_norm_mod: affine weight/bias and AdaLN scale/shift are "
        "separate modes — compose them explicitly if ever needed")
    on_tpu = jax.default_backend() in ("tpu", "axon")
    enabled = os.environ.get("MAGCACHE_FUSED_PROLOGUE", "1") != "0"
    if not interpret and (not on_tpu or not enabled or hd % 128 != 0
                          or _ACTIVE.get() is not None):
        y = layer_norm(x, weight, bias, eps=eps)
        if scale is not None:
            sc = scale.reshape(b, 1, hd).astype(jnp.float32)
            sh = shift.reshape(b, 1, hd).astype(jnp.float32)
            y = (y.astype(jnp.float32) * (1.0 + sc) + sh)
        return y.astype(x.dtype)

    # per-batch rows ride a [B, 1, HD] layout so the block's trailing dims
    # are (1, HD) — Mosaic's tiling check requires the last two block dims
    # divisible by (8, 128) or equal to the array dims
    if scale is not None:
        mode = "mod"
        a2 = scale.reshape(b, 1, hd).astype(jnp.float32)
        b2 = shift.reshape(b, 1, hd).astype(jnp.float32)
        a_spec = pl.BlockSpec((None, 1, hd), lambda bi, i: (bi, 0, 0),
                              memory_space=pltpu.VMEM)
    elif weight is not None:
        mode = "affine"
        a2 = jnp.asarray(weight, jnp.float32).reshape(1, 1, hd)
        b2 = (jnp.asarray(bias, jnp.float32).reshape(1, 1, hd)
              if bias is not None else jnp.zeros((1, 1, hd), jnp.float32))
        a_spec = pl.BlockSpec((None, 1, hd), lambda bi, i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        mode = "plain"
        a2 = jnp.zeros((1, 1, hd), jnp.float32)
        b2 = a2
        a_spec = pl.BlockSpec((None, 1, hd), lambda bi, i: (0, 0, 0),
                              memory_space=pltpu.VMEM)

    block_s = min(block_s, max(8, 1 << (s - 1).bit_length()))
    ns = -(-s // block_s)
    return pl.pallas_call(
        functools.partial(_ln_mod_kernel, eps=eps, mode=mode),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((None, block_s, hd), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            a_spec,
            a_spec,
        ],
        out_specs=pl.BlockSpec((None, block_s, hd), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, hd), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, a2, b2)
