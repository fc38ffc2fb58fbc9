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

Layout: blocks span FULL rows — block (1, tr, C) over the leaf collapsed
to (B, R, C), grid (B, R/tr). Full-width lane dims keep every BlockSpec
legal under Mosaic's lane rule (lane dim divisible by 128 or equal to
the array dim, and likewise for the sublane dim with 8 — the
per-256-block scale arrays and the row/col rsqrt factors can't satisfy
the divisibility arms, so they ride as (1, tr, C/256), (1, 1, 1, tr) and
(1, 1, C) blocks whose trailing dims equal the array dims). The 256-wide quant blocks are
walked as unrolled static lane-slices inside the tile, so no lane-dim
reshape is needed. Leaves whose last dim is not divisible by 256 (one
12300-wide audio-head leaf at the bench geometry) keep the XLA path.

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
from jax.experimental.pallas import tpu as pltpu

QBLOCK = 256          # must equal lean_opt.M_BLOCK
_TILE_ELEMS = 262144  # tr*C cap: ~7 MB/block in flight at ~28 bytes/elem


def tile_sizes(rows: int, cols: int) -> Optional[Tuple[int, int]]:
    """(tr, cols) with tr dividing rows, or None when the leaf cannot be
    tiled (fall back to the XLA path). Blocks span full rows (see module
    docstring); tr is the full row count when it fits the element cap
    (always Mosaic-legal), else the largest multiple-of-8 divisor."""
    if cols % QBLOCK != 0:
        return None
    cap = max(_TILE_ELEMS // cols, 8)
    if rows <= cap:
        return rows, cols
    tr = cap - cap % 8
    while tr >= 8:
        if rows % tr == 0:
            return tr, cols
        tr -= 8
    return None


def _kernel(s_ref, g_ref, mq_ref, ms_ref, p_ref, a_ref, b_ref,
            upd_ref, nmq_ref, nms_ref, *, nsb: int,
            b1: float, wd: float, eps: float):
    inv_mc = s_ref[0]
    lr = s_ref[1]
    gf = g_ref[0].astype(jnp.float32)            # (tr, C)
    mq = mq_ref[0].astype(jnp.float32)
    pf = p_ref[0].astype(jnp.float32)
    ms = ms_ref[0]                               # (tr, nsb)
    af = a_ref[0, 0, 0]                          # (tr,)
    bf = b_ref[0, 0]                             # (C,)
    tr = gf.shape[0]
    acol = af.reshape(tr, 1)
    scales = []
    for k in range(nsb):
        sl = slice(k * QBLOCK, (k + 1) * QBLOCK)
        msk = ms[:, k:k + 1]                     # (tr, 1)
        m = b1 * mq[:, sl] * msk + (1.0 - b1) * gf[:, sl]
        denom = acol * bf[sl].reshape(1, QBLOCK) + eps
        upd = m * inv_mc / denom + wd * pf[:, sl]
        upd_ref[0, :, sl] = (-lr * upd).astype(upd_ref.dtype)
        ns = (jnp.max(jnp.abs(m), axis=-1) / 127.0).reshape(tr, 1)
        scales.append(ns)
        q = jnp.round(m / jnp.maximum(ns, 1e-30))
        nmq_ref[0, :, sl] = q.astype(jnp.int8)
    nms_ref[0] = jnp.concatenate(scales, axis=1)


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
    g3 = g.reshape(lead, rows, cols)
    mq3 = m_q.reshape(lead, rows, cols)
    ms3 = m_scale.astype(jnp.float32).reshape(lead, rows, nsb)
    p3 = p.reshape(lead, rows, cols)
    # Mosaic's block rule requires the last TWO block dims to be divisible
    # by (8, 128) or equal to the array dims; the small factor arrays ride
    # with trailing singleton dims so both trailing dims hit the
    # equal-to-array arm: a -> (B, R/tr, 1, tr), b -> (B, 1, C).
    a4 = a.astype(jnp.float32).reshape(lead, rows // tr, 1, tr)
    b3 = b.astype(jnp.float32).reshape(lead, 1, cols)
    scalars = jnp.stack([
        jnp.asarray(inv_mc, jnp.float32), jnp.asarray(lr, jnp.float32)])
    grid = (lead, rows // tr)

    upd3, nmq3, nms3 = pl.pallas_call(
        functools.partial(_kernel, nsb=nsb, b1=float(b1), wd=float(wd),
                          eps=float(eps)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2,), lambda bi, ri: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tr, cols), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((1, tr, cols), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((1, tr, nsb), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((1, tr, cols), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((1, 1, 1, tr), lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec((1, 1, cols), lambda bi, ri: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tr, cols), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((1, tr, cols), lambda bi, ri: (bi, ri, 0)),
            pl.BlockSpec((1, tr, nsb), lambda bi, ri: (bi, ri, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lead, rows, cols), p.dtype),
            jax.ShapeDtypeStruct((lead, rows, cols), jnp.int8),
            jax.ShapeDtypeStruct((lead, rows, nsb), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * lead * rows * cols,
            bytes_accessed=8 * lead * rows * cols,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, g3, mq3, ms3, p3, a4, b3)

    return (
        upd3.reshape(shape),
        nmq3.reshape(shape),
        nms3.reshape(shape[:-1] + (nsb,)),
    )
