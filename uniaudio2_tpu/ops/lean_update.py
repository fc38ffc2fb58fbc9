"""Fused Pallas kernel for the adamw_lean per-leaf optimizer update.

Why (docs/bench_train_r4.md): the XLA lowering of `train/lean_opt.py`'s
per-leaf update chain — int8 dequant -> moment EMA -> factored-rsqrt
update -> blockwise-absmax int8 requant — materialises f32 intermediates
around the quant arithmetic instead of fusing it, measured as
~113 ms/step over plain AdamW at identical geometry even though the lean
path moves FEWER bytes (~13 vs ~23 GB/step). This kernel streams each
leaf once and does the whole chain in VMEM:

    m    = b1 * (m_q * m_scale) + (1 - b1) * g
    upd  = -lr * ( (m / mc) / (a_i * b_j + eps) + wd * p )
    m_q' = round(m / absmax_256(m) * 127),  m_scale' = absmax_256(m)/127

where ``a`` (rows) and ``b`` (cols) are the factored-second-moment rsqrt
factors precomputed in XLA (tiny arrays):

    a_i = sqrt(row_i / (max(mean_i row, 1e-30) * vc)),  b_j = sqrt(col_j)

so ``a_i * b_j == sqrt(vhat_ij)`` exactly as `lean_opt._v_rsqrt` computes
it (same value up to float reassociation). The second-moment EMA itself
stays in XLA — it must complete before a/b exist, and its row/col means
fuse into a single extra read of ``g``.

Traffic: read g(2) + m_q(1) + p(2), write upd(2) + m_q'(1) + scales
(~1/64) ≈ 8 bytes/param in ONE grid pass (+2 for XLA's v reductions) vs
the unfused chain's measured ~5x that. All VPU work — no dot_general, no
narrow-int shifts (the Mosaic-wedge classes, see the verify skill).

Layout — one 256-wide quant block per grid step: the leaf collapses to
(B, R, C) and the grid is (B, R/tr, C/256) with data blocks (1, tr, 256).
The quant-block walk rides the INNERMOST GRID DIM, not an unrolled loop
in the kernel body: Mosaic compile time was measured (r5 probes) at
~6.4 s per unrolled 256-block slice in the body (the first design spent
~2 min compiling a cols=5120 leaf and the full train step ~35 min across
its ~24 leaf geometries), while a body with a single block compiles in
~2 s regardless of C. An SMEM scalar BlockSpec costs another +60-85 s per
module, so the two step scalars ride in a (1, 2) f32 VMEM block instead.
Per-block scale vectors use trailing (tr, 1) block dims — sublane=tr and
lane=1 both hit Mosaic's equal-to-array-dim arm, and the (tr,) vector is
used as a (tr, 1) broadcast directly, no in-kernel transpose. The tiny
XLA-side transposes that produce the (B, C/256, R/tr, tr, 1) scale layout
move R*C/256 elements — noise next to the leaf itself.

Reference match: TPU-native optimization of the training capability at
`llm_utils/train_utils.py:109-205`; no reference counterpart (the
reference trains multi-GPU where plain AdamW fits).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

QBLOCK = 256          # must equal lean_opt.M_BLOCK
_TILE_ROWS = 1024     # tr cap: ~1 MB/f32 data block at 256 lanes


def tile_sizes(rows: int, cols: int) -> Optional[Tuple[int, int]]:
    """(tr, QBLOCK) with tr dividing rows, or None when the leaf cannot
    be tiled (fall back to the XLA path). tr is the full row count when
    rows <= the cap (always Mosaic-legal via the equal-to-array-dim arm),
    else the largest multiple-of-8 divisor <= the cap."""
    if cols % QBLOCK != 0:
        return None
    if rows <= _TILE_ROWS:
        return rows, QBLOCK
    tr = _TILE_ROWS
    while tr >= 8:
        if rows % tr == 0:
            return tr, QBLOCK
        tr -= 8
    return None


def _kernel(s_ref, g_ref, mq_ref, ms_ref, p_ref, a_ref, b_ref,
            upd_ref, nmq_ref, nms_ref, *,
            b1: float, wd: float, eps: float):
    inv_mc = s_ref[0, 0]
    lr = s_ref[0, 1]
    gf = g_ref[0].astype(jnp.float32)            # (tr, 256)
    mq = mq_ref[0].astype(jnp.float32)
    pf = p_ref[0].astype(jnp.float32)
    ms = ms_ref[0, 0, 0]                         # (tr, 1)
    acol = a_ref[0, 0, 0]                        # (tr, 1)
    brow = b_ref[0, 0, 0].reshape(1, QBLOCK)     # (1, 256)
    m = b1 * mq * ms + (1.0 - b1) * gf
    upd = m * inv_mc / (acol * brow + eps) + wd * pf
    upd_ref[0] = (-lr * upd).astype(upd_ref.dtype)
    ns = jnp.max(jnp.abs(m), axis=-1, keepdims=True) / 127.0  # (tr, 1)
    nmq_ref[0] = jnp.round(m / jnp.maximum(ns, 1e-30)).astype(jnp.int8)
    nms_ref[0, 0, 0] = ns


def fused_lean_update(
    g: jax.Array,
    m_q: jax.Array,
    m_scale: jax.Array,
    p: jax.Array,
    a: jax.Array,
    b: jax.Array,
    inv_mc: jax.Array,
    lr: jax.Array,
    *,
    b1: float,
    wd: float,
    eps: float,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One leaf's fused update. ``g``/``m_q``/``p`` are leaf-shaped
    (rank >= 2, last dim % 256 == 0), ``m_scale`` is shape[:-1] + (C/256,),
    ``a`` is shape[:-1], ``b`` is shape[:-2] + (C,). Returns
    (upd, new_m_q, new_m_scale) in the same layouts."""
    shape = p.shape
    rows, cols = shape[-2], shape[-1]
    lead = int(np.prod(shape[:-2], dtype=np.int64)) if len(shape) > 2 else 1
    tiles = tile_sizes(rows, cols)
    if tiles is None:
        raise ValueError(f"untileable leaf {shape}")
    tr, _ = tiles
    nsb = cols // QBLOCK
    nrt = rows // tr
    g3 = g.reshape(lead, rows, cols)
    mq3 = m_q.reshape(lead, rows, cols)
    p3 = p.reshape(lead, rows, cols)
    # Scale layout: (B, R, nsb) -> (B, nsb, R/tr, tr, 1) so the per-grid-
    # step block is (1, 1, 1, tr, 1) — trailing dims (tr, 1) are legal via
    # the equal-to-array arm and land in the kernel as a (tr, 1) operand.
    ms5 = (m_scale.astype(jnp.float32).reshape(lead, nrt, tr, nsb)
           .transpose(0, 3, 1, 2)[..., None])
    # Row factors a: (B, R) -> (B, R/tr, 1, tr, 1); col factors b:
    # (B, C) -> (B, C/256, 256) so each grid step reads its 256-slice.
    a5 = a.astype(jnp.float32).reshape(lead, nrt, 1, tr, 1)
    b4 = b.astype(jnp.float32).reshape(lead, nsb, 1, QBLOCK)
    scalars = jnp.stack([
        jnp.asarray(inv_mc, jnp.float32),
        jnp.asarray(lr, jnp.float32)]).reshape(1, 2)
    grid = (lead, nrt, nsb)

    data = lambda: pl.BlockSpec((1, tr, QBLOCK),
                                lambda bi, ri, ki: (bi, ri, ki))
    upd3, nmq3, nms5 = pl.pallas_call(
        functools.partial(_kernel, b1=float(b1), wd=float(wd),
                          eps=float(eps)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda bi, ri, ki: (0, 0)),
            data(),
            data(),
            pl.BlockSpec((1, 1, 1, tr, 1),
                         lambda bi, ri, ki: (bi, ki, ri, 0, 0)),
            data(),
            pl.BlockSpec((1, 1, 1, tr, 1),
                         lambda bi, ri, ki: (bi, ri, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, QBLOCK),
                         lambda bi, ri, ki: (bi, ki, 0, 0)),
        ],
        out_specs=[
            data(),
            data(),
            pl.BlockSpec((1, 1, 1, tr, 1),
                         lambda bi, ri, ki: (bi, ki, ri, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lead, rows, cols), p.dtype),
            jax.ShapeDtypeStruct((lead, rows, cols), jnp.int8),
            jax.ShapeDtypeStruct((lead, nsb, nrt, tr, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * lead * rows * cols,
            bytes_accessed=8 * lead * rows * cols,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, g3, mq3, ms5, p3, a5, b4)

    nms = (nms5[..., 0].transpose(0, 2, 3, 1)
           .reshape(shape[:-1] + (nsb,)))
    return upd3.reshape(shape), nmq3.reshape(shape), nms
