"""Analytic forward-pass FLOP counts for the benched trunks.

Used by ``bench.py`` / ``magcache_tpu/eval/bench_opensora.py`` to emit an
``mfu_pct`` alongside the wall-clock numbers, so perf regressions are tracked
against the chip's peak rather than re-derived from traces each round
(the README's 97%-MFU flash-kernel claim came from exactly this arithmetic
at the per-kernel level).

Counting convention: one multiply-add = 2 FLOPs; matmul [m,k]x[k,n] =
2*m*k*n. Elementwise/norm/softmax work is excluded (sub-1% at these shapes
and not MXU work). All counts are for ONE model forward over ``rows``
batch rows (a CFG pair is rows=2).

Model shape sources (the FLOPs are ours; the architecture is the spec):
  Wan DiT:    /root/reference rebuild spec in models/wan.py (30 blocks of
              self-attn + 512-token cross-attn + FFN; magcache_generate.py).
  STDiT3:     paired spatial/temporal blocks w/ caption cross-attn + MLP
              (open_sora_transformer_3d.py:574-601) — spatial attends over
              S=H*W per frame, temporal over T per location.
"""

from __future__ import annotations

from typing import Tuple

# chip peaks used for MFU normalization (bf16 dense)
V5E_PEAK_TFLOPS = 197.0


def _attn_block_flops(n_tokens: int, d: int, self_ctx: int,
                      cross_len: int, ffn: int) -> float:
    """FLOPs for one (self-attn + cross-attn + FFN) block over one row.

    ``self_ctx``: context length each token attends over (== n_tokens for
    full attention; S or T for the factorized STDiT3 paths).
    """
    f = 0.0
    # self-attention: qkv + out projections, then QK^T and PV
    f += 8.0 * n_tokens * d * d
    f += 4.0 * n_tokens * self_ctx * d
    # cross-attention: q + out on tokens, kv on text, QK^T + PV
    if cross_len:
        f += 4.0 * n_tokens * d * d
        f += 4.0 * cross_len * d * d
        f += 4.0 * n_tokens * cross_len * d
    # FFN: d -> ffn -> d
    f += 4.0 * n_tokens * d * ffn
    return f


def wan_forward_flops(cfg, n_tokens: int, rows: int = 2) -> float:
    """One Wan DiT forward (all blocks + embed/head) over ``rows`` rows."""
    d, ffn, L = cfg.dim, cfg.ffn_dim, cfg.text_len
    per_row = cfg.layers * _attn_block_flops(n_tokens, d, n_tokens, L, ffn)
    # patch embed + head + text projection (small but free to count)
    import numpy as np
    pin = cfg.in_channels * int(np.prod(cfg.patch))
    pout = cfg.out_channels * int(np.prod(cfg.patch))
    per_row += 2.0 * n_tokens * pin * d + 2.0 * n_tokens * d * pout
    per_row += 2.0 * L * cfg.text_dim * d
    return per_row * rows


def stdit3_forward_flops(cfg, grid: Tuple[int, int, int], caption_len: int,
                         rows: int = 2) -> float:
    """One STDiT3 forward (depth paired spatial+temporal blocks) over rows."""
    import numpy as np
    T, H, W = grid
    S = H * W
    n = T * S
    d = cfg.hidden
    ffn = cfg.mlp_ratio * d
    per_row = cfg.depth * (
        _attn_block_flops(n, d, S, caption_len, ffn)       # spatial pair half
        + _attn_block_flops(n, d, T, caption_len, ffn))    # temporal half
    pin = cfg.in_channels * int(np.prod(cfg.patch))
    pout = cfg.out_channels * int(np.prod(cfg.patch))
    per_row += 2.0 * n * pin * d + 2.0 * n * d * pout
    per_row += 2.0 * caption_len * cfg.caption_dim * d
    return per_row * rows


def mfu_pct(flops_per_step: float, sec_per_step: float,
            peak_tflops: float = V5E_PEAK_TFLOPS) -> float:
    """Achieved fraction of chip peak, in percent."""
    return 100.0 * flops_per_step / sec_per_step / (peak_tflops * 1e12)
