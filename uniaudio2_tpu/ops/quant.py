"""Weight-only int8 quantization for the bandwidth-bound decode path.

Batch-1 autoregressive decode reads every weight once per frame — it is HBM
bandwidth-bound (SURVEY.md §6; the 3B backbone + 8 sequential local-decoder
passes move ~12 GB/frame in bf16). Per-output-channel int8 storage halves
that traffic. The dequantize-then-matmul must NOT materialise the bf16
weight in HBM (XLA does exactly that for ``x @ (w.astype(bf16) * s)``), so
the TPU path is a Pallas kernel that dequantises int8 tiles in VMEM and
feeds the MXU directly; non-TPU backends fall back to the XLA form (tests).

API:
    QuantizedLinear(values int8 (..., K, N), scale f32 (..., N)) — a pytree;
    quantize(w)                      -> QuantizedLinear (per-column scales)
    matmul(x, w)                     -> works for plain arrays and quantized
    quantize_gpt_params / quantize_unified_params -> tree transforms
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class QuantizedLinear(NamedTuple):
    """``values`` is stored with its last (output) axis zero-padded to a
    multiple of 128 (TPU lane width) so the Pallas kernel never re-pads the
    weight at serving time; ``scale`` keeps the TRUE output width and is the
    source of truth for slicing."""

    values: jax.Array   # int8, (..., K, N_padded)
    scale: jax.Array    # f32,  (..., N)


def quantize(w: jax.Array) -> QuantizedLinear:
    """Per-output-channel symmetric int8 (last axis = output features)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = (amax / 127.0 + 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    n = q.shape[-1]
    # pad to a multiple of 512 (128 for small N): wide Pallas tiles need a
    # large power-of-two divisor of N, and wide tiles are what reach HBM
    # peak (v5e measured: 128-wide ~400 GB/s, 512 ~712, 2048 ~891)
    align = 512 if n >= 512 else 128
    if n % align:
        pad = [(0, 0)] * (q.ndim - 1) + [(0, align - n % align)]
        q = jnp.pad(q, pad)
    return QuantizedLinear(q, scale[..., 0, :])


def dequantize(w: QuantizedLinear, dtype=jnp.bfloat16) -> jax.Array:
    n = w.scale.shape[-1]
    v = _unchunk_values(w.values) if is_chunk_major(w) else w.values
    return (v[..., :n].astype(jnp.float32)
            * w.scale[..., None, :]).astype(dtype)


class QuantizedLinear4(NamedTuple):
    """Packed weight-only int4 (half the HBM traffic of int8 — the decode
    path is bandwidth-bound, so batch-1 throughput scales directly).

    ``values`` packs two int4 rows per byte using a K-split layout: byte
    [k, n] holds row ``k`` in the low nibble and row ``k + K/2`` in the high
    nibble. Unpacking is then two sign-extends and the matmul is two MXU
    dots over the K halves — no sublane interleave needed. The last axis is
    lane-padded like the int8 path."""

    values: jax.Array   # int8, (..., K//2, N_padded)
    scale: jax.Array    # f32,  (..., N)


def quantize4(w: jax.Array) -> QuantizedLinear4:
    """Per-output-channel symmetric int4 (levels -7..7)."""
    wf = w.astype(jnp.float32)
    k = wf.shape[-2]
    assert k % 2 == 0, "int4 packing needs even K"
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = (amax / 7.0 + 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    lo = q[..., : k // 2, :]
    hi = q[..., k // 2 :, :]
    packed = jnp.bitwise_or(
        jnp.left_shift(hi, 4), jnp.bitwise_and(lo, jnp.int8(0xF))
    ).astype(jnp.int8)
    n = packed.shape[-1]
    align = 512 if n >= 512 else 128
    if n % align:
        pad = [(0, 0)] * (packed.ndim - 1) + [(0, align - n % align)]
        packed = jnp.pad(packed, pad)
    return QuantizedLinear4(packed, scale[..., 0, :])


class QuantizedLinear4G(NamedTuple):
    """Group-wise packed int4: like `QuantizedLinear4` (K-split nibble
    packing) but with one scale per ``group`` input rows per output channel
    instead of one per whole column. Group-wise scales are the standard
    int4 quality fix (outliers only poison their own 128-row group, not
    the entire column): measured quantization SNR on normal weights rises
    ~3 dB vs per-channel, and heavy-tailed real checkpoint weights gain
    much more. Scale overhead: K/group * N * 4 bytes = 6%% of the packed
    values at group=128 (f32 scales).

    ``scale`` is (G, N) with G = K / group; group g covers input rows
    [g*group, (g+1)*group). K/2 must be divisible by ``group`` so nibble
    halves align with whole groups."""

    values: jax.Array   # int8, (..., K//2, N_padded)
    scale: jax.Array    # f32,  (..., G, N)


INT4_GROUP = 128


def quantize4_grouped(w: jax.Array, group: int = INT4_GROUP) -> QuantizedLinear4G:
    """Symmetric int4 with per-(group, column) scales."""
    wf = w.astype(jnp.float32)
    k, n = wf.shape[-2:]
    assert k % (2 * group) == 0, "group must divide K/2"
    lead = wf.shape[:-2]
    g = k // group
    wg = wf.reshape(*lead, g, group, n)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    scale = amax / 7.0 + 1e-12                       # (..., g, 1, n)
    q = jnp.clip(jnp.round(wg / scale), -7, 7)
    q = q.reshape(*lead, k, n).astype(jnp.int8)
    lo = q[..., : k // 2, :]
    hi = q[..., k // 2 :, :]
    packed = jnp.bitwise_or(
        jnp.left_shift(hi, 4), jnp.bitwise_and(lo, jnp.int8(0xF))
    ).astype(jnp.int8)
    npad = packed.shape[-1]
    align = 512 if npad >= 512 else 128
    if npad % align:
        pad = [(0, 0)] * (packed.ndim - 1) + [(0, align - npad % align)]
        packed = jnp.pad(packed, pad)
    return QuantizedLinear4G(packed, scale[..., 0, :])


def dequantize4_grouped(w: QuantizedLinear4G, dtype=jnp.bfloat16) -> jax.Array:
    g, n = w.scale.shape[-2:]
    v = _unchunk_values(w.values) if is_chunk_major(w) else w.values
    lo, hi = _unpack4(v[..., :n], jnp.float32)
    full = jnp.concatenate([lo, hi], axis=-2)        # (..., K, N)
    k = full.shape[-2]
    group = k // g
    lead = full.shape[:-2]
    full = full.reshape(*lead, g, group, n) * w.scale[..., :, None, :]
    return full.reshape(*lead, k, n).astype(dtype)


class QuantizedLinearC4(NamedTuple):
    """Column-packed int4: byte [k, n] holds column ``n`` (low nibble) and
    column ``n + N/2`` (high nibble). Used where the *contraction* axis must
    stay chunkable in original row order (the fused MLP's down-projection —
    K-split packing would interleave its row chunks)."""

    values: jax.Array   # int8, (..., K, ceil(N/2) lane-padded)
    scale: jax.Array    # f32,  (..., N)


def quantize4_cols(w: jax.Array) -> QuantizedLinearC4:
    """Per-output-channel symmetric int4, packed along the output axis."""
    wf = w.astype(jnp.float32)
    n = wf.shape[-1]
    assert n % 2 == 0, "column int4 packing needs even N"
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = (amax / 7.0 + 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    lo = q[..., :, : n // 2]
    hi = q[..., :, n // 2 :]
    packed = jnp.bitwise_or(
        jnp.left_shift(hi, 4), jnp.bitwise_and(lo, jnp.int8(0xF))
    ).astype(jnp.int8)
    half = packed.shape[-1]
    align = 512 if half >= 512 else 128
    if half % align:
        pad = [(0, 0)] * (packed.ndim - 1) + [(0, align - half % align)]
        packed = jnp.pad(packed, pad)
    return QuantizedLinearC4(packed, scale[..., 0, :])


class QuantizedLinearC4G(NamedTuple):
    """Column-packed int4 with group-wise scales: the `QuantizedLinearC4`
    layout (byte [k, n] holds columns n / n + N/2) with one scale per
    ``group`` input rows per output column (``scale`` (G, N), G = K/group).
    Used for the fused MLP's down-projection under grouped int4 — the
    contraction axis stays chunkable in original row order AND whole
    scale-groups land inside each chunk (group | chunk width)."""

    values: jax.Array   # int8, (..., K, ceil(N/2) lane-padded)
    scale: jax.Array    # f32,  (..., G, N)


def quantize4_cols_grouped(w: jax.Array,
                           group: int = INT4_GROUP) -> QuantizedLinearC4G:
    """Symmetric int4, column-packed, per-(group, column) scales."""
    wf = w.astype(jnp.float32)
    k, n = wf.shape[-2:]
    assert n % 2 == 0, "column int4 packing needs even N"
    assert k % group == 0, "group must divide K"
    lead = wf.shape[:-2]
    g = k // group
    wg = wf.reshape(*lead, g, group, n)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    scale = amax / 7.0 + 1e-12
    q = jnp.clip(jnp.round(wg / scale), -7, 7)
    q = q.reshape(*lead, k, n).astype(jnp.int8)
    lo = q[..., :, : n // 2]
    hi = q[..., :, n // 2 :]
    packed = jnp.bitwise_or(
        jnp.left_shift(hi, 4), jnp.bitwise_and(lo, jnp.int8(0xF))
    ).astype(jnp.int8)
    half = packed.shape[-1]
    align = 512 if half >= 512 else 128
    if half % align:
        pad = [(0, 0)] * (packed.ndim - 1) + [(0, align - half % align)]
        packed = jnp.pad(packed, pad)
    return QuantizedLinearC4G(packed, scale[..., 0, :])


def dequantize4_cols_grouped(w: QuantizedLinearC4G,
                             dtype=jnp.bfloat16) -> jax.Array:
    g, n = w.scale.shape[-2:]
    nh = n // 2
    lo, hi = _unpack4(w.values, jnp.float32)
    full = jnp.concatenate([lo[..., :nh], hi[..., : n - nh]], axis=-1)
    k = full.shape[-2]
    group = k // g
    lead = full.shape[:-2]
    full = full.reshape(*lead, g, group, n) * w.scale[..., :, None, :]
    return full.reshape(*lead, k, n).astype(dtype)


# Kernel tile width; the chunk-major layout bakes it in. Overridable via
# UA2_SERVING_CHUNK: with chunk-major storage every block fetch is one
# contiguous DMA regardless of width, so wider chunks trade VMEM for fewer
# grid steps (the ~0.5 us/step sequencing gap is most of the distance from
# the HBM roofline — docs/profile_decode_r3.md). 1024 measured 1425 -> 1465
# tok/s batch-1 int4all on v5e; 2048 exceeds the 16 MB scoped-VMEM limit
# at the backbone MLP shape (clean AOT compile error). The 512-is-best
# sweep that previously fixed this number predates chunk-major storage
# (burst length was tied to tile width then; it no longer is).
SERVING_CHUNK = int(os.environ.get("UA2_SERVING_CHUNK", "1024"))


def chunk_major(w, bc: "int | None" = None):
    """Serving-time re-layout for contiguous weight DMA.

    The matmul kernels tile the output axis in ``bc``-wide blocks; with
    row-major (K*, N) storage each block fetch is K* strided bursts of
    ``bc`` bytes (int8) — short bursts that cap HBM efficiency (measured on
    v5e: 512-wide tiles stream ~712 GB/s vs ~891 at 2048-wide; the burst
    length, not the tile, is the limiter). Chunk-major storage
    ``(N/bc, K*, bc)`` makes every block fetch ONE contiguous range.

    Applies to `QuantizedLinear` / `QuantizedLinear4` / `QuantizedLinear4G`
    and the row-interleaved `QuantizedLinearI4`/`I4G` (row-chunkable output
    axis). Stored widths that don't divide by ``bc`` are zero-padded up to
    the next multiple first (scales keep true width; every kernel/dequant
    path already trims by scale width) — the quantizers 512-align storage
    so this is a robustness path for non-default chunk widths, not a
    serving-shape requirement. No-op when the leaf is already chunk-major
    or N <= ``bc``. Column-packed
    down-projections (`QuantizedLinearC4*`) and interleaved down-projections
    (row-chunked along the contraction axis at full width) are already
    fetched contiguous."""
    if not isinstance(w, (QuantizedLinear, QuantizedLinear4,
                          QuantizedLinear4G, QuantizedLinearI4,
                          QuantizedLinearI4G)):
        return w
    if bc is None:
        bc = SERVING_CHUNK
        if not isinstance(w, (QuantizedLinearI4, QuantizedLinearI4G)):
            # int8 blocks are 2x the bytes of int4 at the same width, and
            # the legacy shift-chain int4 kernels materialise lo/hi
            # transients; cap both so double-buffered tiles stay in the
            # 16 MB scoped-VMEM budget (only the one-bitcast interleaved
            # kernels are validated at 1024 — scripts/tpu_int4i_smoke.py)
            bc = min(bc, 512)
    v = w.values
    if v.ndim != 2 or v.shape[-1] <= bc:
        return w
    if v.shape[-1] % bc:
        v = jnp.pad(v, ((0, 0), (0, bc - v.shape[-1] % bc)))
    k_, n = v.shape
    v3 = jnp.transpose(v.reshape(k_, n // bc, bc), (1, 0, 2))
    return type(w)(v3, w.scale)


def _unchunk_values(v: jax.Array) -> jax.Array:
    """(C, K*, bc) chunk-major -> (K*, C*bc) row-major."""
    if v.ndim == 2:
        return v
    c, k_, bc = v.shape
    return jnp.transpose(v, (1, 0, 2)).reshape(k_, c * bc)


def is_chunk_major(w) -> bool:
    """Distinguish chunk-major values from LAYER-STACKED values (both 3-D):
    stacking adds a leading axis to values AND scale together, chunking
    adds one to values only."""
    d = w.values.ndim - w.scale.ndim
    return d == 1 if isinstance(w, (QuantizedLinear4G, QuantizedLinearC4G,
                                    QuantizedLinearI4G)) \
        else d == 2


def _unpack4(v: jax.Array, dtype):
    """(..., K/2, N) packed int8 -> (lo, hi) halves in ``dtype``.
    Shifts run in int32 — Mosaic does not legalize int8 vector shifts
    (arith.shli on vector<i8>)."""
    import os
    if os.environ.get("UA2_PROBE_NOUNPACK"):
        # PERF PROBE ONLY (wrong numerics): skip the nibble shift chain to
        # measure how much of the kernel time is VPU unpack compute vs DMA.
        w = v.astype(dtype)
        return w, w
    v32 = v.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(v32, 28), 28)  # sign-extend low nibble
    hi = jnp.right_shift(v32, 4)  # arithmetic: byte sign covers the high one
    return lo.astype(dtype), hi.astype(dtype)


def dequantize4(w: QuantizedLinear4, dtype=jnp.bfloat16) -> jax.Array:
    n = w.scale.shape[-1]
    v = _unchunk_values(w.values) if is_chunk_major(w) else w.values
    lo, hi = _unpack4(v[..., :n], jnp.float32)
    full = jnp.concatenate([lo, hi], axis=-2)
    return (full * w.scale[..., None, :]).astype(dtype)


def dequantize4_cols(w: QuantizedLinearC4, dtype=jnp.bfloat16) -> jax.Array:
    n = w.scale.shape[-1]
    nh = n // 2
    lo, hi = _unpack4(w.values, jnp.float32)
    full = jnp.concatenate([lo[..., :nh], hi[..., : n - nh]], axis=-1)
    return (full * w.scale[..., None, :]).astype(dtype)


# ---------------------------------------------------------------------------
# Row-interleaved int4 (serving layout for the bitcast kernel path)
# ---------------------------------------------------------------------------


class QuantizedLinearI4(NamedTuple):
    """Row-interleaved packed int4: byte [r, c] holds weight row ``2r`` in
    its LOW nibble and row ``2r+1`` in its HIGH nibble — exactly the element
    order of ``pltpu.bitcast(int8 -> int4)``, so a kernel reconstructs the
    (K, N) int4 tile with one register bitcast + the hardware sub-byte
    sign-extend instead of the int32 shift chain (`_unpack4`), which
    measured ~1.0 ms/frame of unhidden VPU time at the r3 serving config
    (docs/profile_decode_r3.md; probe: scripts/int4_native_probe.py).

    Serving-only layout, produced by `to_interleaved` in
    `prepare_serving_params`; checkpoints/training keep the K-split /
    column-packed forms (this one is strictly a kernel-side re-layout of the
    SAME quantized values + scales). It replaces both `QuantizedLinear4`
    (K-split) and `QuantizedLinearC4` (column-packed) in the serving path:
    the contraction axis stays chunkable in original row order (chunk c of
    K covers byte rows [c*bc/2, (c+1)*bc/2)) and the output axis is
    true-width chunkable like int8."""

    values: jax.Array   # int8, (K//2, N_padded) or chunk-major (C, K//2, bc)
    scale: jax.Array    # f32,  (N,)


class QuantizedLinearI4G(NamedTuple):
    """`QuantizedLinearI4` with group-wise scales (``scale`` (G, N); K-axis
    groups of ``K/G`` rows, exactly as `QuantizedLinear4G`)."""

    values: jax.Array   # int8, (K//2, N_padded) or chunk-major (C, K//2, bc)
    scale: jax.Array    # f32,  (G, N)


def _interleave_rows(full: jax.Array) -> jax.Array:
    """(..., K, N) int32 nibble values in [-8, 7] -> (..., K/2, N) int8
    bytes in `pltpu.bitcast(int8 -> int4)` element order (even row in the
    low nibble, odd row in the high one)."""
    even = full[..., 0::2, :]
    odd = full[..., 1::2, :]
    return jnp.bitwise_or(
        jnp.bitwise_and(even, 15), jnp.left_shift(odd, 4)
    ).astype(jnp.int8)


def to_interleaved(w):
    """Serving re-layout: K-split / column-packed int4 -> row-interleaved.
    Same quantized values and scales, different byte order; no-op for
    non-int4 leaves, chunk-major or layer-stacked values (convert before
    `chunk_major`, after `unstack_layers`)."""
    if isinstance(w, (QuantizedLinear4, QuantizedLinear4G)):
        if w.values.ndim != 2:
            return w
        lo, hi = _unpack4(w.values, jnp.int32)         # rows [0,K/2), [K/2,K)
        full = jnp.concatenate([lo, hi], axis=-2)      # (K, N_padded)
        cls = (QuantizedLinearI4G if isinstance(w, QuantizedLinear4G)
               else QuantizedLinearI4)
        return cls(_interleave_rows(full), w.scale)
    if isinstance(w, (QuantizedLinearC4, QuantizedLinearC4G)):
        if w.values.ndim != 2:
            return w
        n = w.scale.shape[-1]
        nh = n // 2
        lo, hi = _unpack4(w.values, jnp.int32)         # cols [0,nh), [nh,n)
        full = jnp.concatenate([lo[..., :nh], hi[..., : n - nh]], axis=-1)
        align = 512 if n >= 512 else 128
        if n % align:
            full = jnp.pad(full, ((0, 0), (0, align - n % align)))
        cls = (QuantizedLinearI4G if isinstance(w, QuantizedLinearC4G)
               else QuantizedLinearI4)
        return cls(_interleave_rows(full), w.scale)
    return w


def dequantize4_interleaved(w: QuantizedLinearI4,
                            dtype=jnp.bfloat16) -> jax.Array:
    n = w.scale.shape[-1]
    v = _unchunk_values(w.values) if is_chunk_major(w) else w.values
    lo, hi = _unpack4(v[..., :n], jnp.float32)         # even / odd rows
    k2 = lo.shape[-2]
    full = jnp.stack([lo, hi], axis=-2)                # (..., K/2, 2, N)
    full = full.reshape(*lo.shape[:-2], 2 * k2, n)
    return (full * w.scale[..., None, :]).astype(dtype)


def dequantize4_interleaved_grouped(w: QuantizedLinearI4G,
                                    dtype=jnp.bfloat16) -> jax.Array:
    g, n = w.scale.shape[-2:]
    v = _unchunk_values(w.values) if is_chunk_major(w) else w.values
    lo, hi = _unpack4(v[..., :n], jnp.float32)
    k2 = lo.shape[-2]
    full = jnp.stack([lo, hi], axis=-2).reshape(*lo.shape[:-2], 2 * k2, n)
    group = 2 * k2 // g
    lead = full.shape[:-2]
    full = full.reshape(*lead, g, group, n) * w.scale[..., :, None, :]
    return full.reshape(*lead, 2 * k2, n).astype(dtype)


# ---------------------------------------------------------------------------
# Pallas int8 GEMV/GEMM kernel
# ---------------------------------------------------------------------------


def _maybe_norm(x, n_ref, eps: float):
    """Fold a leading RMSNorm into a matmul kernel (recomputed per grid
    step — VPU work on the (Mt, K) block, negligible next to the weight
    stream; saves the standalone norm fusion + HBM round trip per call)."""
    if n_ref is None:
        return x
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)
            * n_ref[:].astype(jnp.float32)).astype(x.dtype)


def _int8_matmul_kernel(x_ref, w_ref, s_ref, *rest, norm_eps: float = 1e-5,
                        has_norm: bool = False, has_res: bool = False):
    rest = list(rest)
    n_ref = rest.pop(0) if has_norm else None
    r_ref = rest.pop(0) if has_res else None
    o_ref = rest[0]
    x = _maybe_norm(x_ref[:], n_ref, norm_eps)        # (Mt, K) bf16
    # dequantize the int8 tile in VMEM in bf16 (f32 copies blow scoped vmem
    # for big K); the MXU accumulates in f32 via preferred_element_type
    wv = w_ref[:]
    if wv.ndim == 3:                                  # chunk-major (1, K, Nt)
        wv = wv[0]
    w = wv.astype(x.dtype)                            # (K, Nt)
    s = s_ref[:].astype(jnp.float32)                  # (1, Nt)
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32) * s
    if has_res:
        acc += r_ref[:].astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _pallas_int8_matmul(
    x: jax.Array, values: jax.Array, scale: jax.Array,
    *, block_n: Optional[int] = None, block_m: int = 128, out_dtype=None,
    pre_norm=None, residual=None,
) -> jax.Array:
    """x (M, K) bf16 @ int8 (K, N) * scale (N,) -> (M, N).
    Grid over (M, N) tiles; the K axis stays whole (max 8192 here).

    Tile width is chosen for HBM streaming efficiency under the VMEM budget:
    wider N tiles mean fewer, longer DMAs (measured on v5e: 512 -> 712 GB/s,
    2048 -> 891 GB/s at K=3072), bounded so a double-buffered int8 tile fits
    comfortably in the ~16 MB of VMEM. Chunk-major (3-D) values force the
    stored chunk width and fetch each block as ONE contiguous DMA.
    """
    m, k = x.shape
    if values.ndim == 3:
        cnum, k2, bc = values.shape
        n = cnum * bc
    else:
        k2, n = values.shape
        bc = None
    assert k == k2
    n_orig = scale.shape[-1]
    if n_orig != n:  # values stored lane-padded; pad the (tiny) scale to match
        scale = jnp.pad(scale, ((0, n - n_orig),), constant_values=1.0)
    if bc is not None:
        bn = bc
    else:
        if block_n is None:
            # 512 measures best end-to-end on v5e across the model's shapes
            # (wider tiles win in isolation but lose inside the full frame
            # program, likely from VMEM pressure alongside other fusions)
            block_n = 512
        # power-of-two width so the divisor search below terminates (any N
        # that is a multiple of 128 divides one of 2048/1024/512/256/128)
        block_n = 1 << (block_n.bit_length() - 1)
        bn = min(block_n, n)
        while n % bn and bn > 128:
            bn //= 2
    if m <= block_m:
        bm, mg = m, 1
    else:
        bm = block_m
        mg = -(-m // bm)
        if m % bm:  # pad M up to a tile multiple
            x = jnp.pad(x, ((0, mg * bm - m), (0, 0)))
    grid = (mg, n // bn)
    wspec = (pl.BlockSpec((1, k, bn), lambda i, j: (j, 0, 0),
                          memory_space=pltpu.VMEM) if bc is not None else
             pl.BlockSpec((k, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        wspec,
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, values, scale.reshape(1, n)]
    eps = 1e-5
    if pre_norm is not None:
        nw, eps = pre_norm
        in_specs.append(pl.BlockSpec((1, k), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(nw.reshape(1, k))
    if residual is not None:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                     memory_space=pltpu.VMEM))
        operands.append(_pad_res(residual, mg * bm, n))
    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel, norm_eps=eps,
                          has_norm=pre_norm is not None,
                          has_res=residual is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mg * bm, n), out_dtype or x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=k * n + m * k * 2 + m * n * 2,
            transcendentals=0,
        ),
    )(*operands)
    return out[:m, :n_orig]


def _pad_res(residual: jax.Array, m_pad: int, n_pad: int) -> jax.Array:
    """Pad a (M, n_true) residual to the kernel's padded (m_pad, n_pad)
    output grid (zeros land on sliced-off columns/rows)."""
    m, n = residual.shape
    if m == m_pad and n == n_pad:
        return residual
    return jnp.pad(residual, ((0, m_pad - m), (0, n_pad - n)))


def _int4_matmul_kernel(x_ref, w_ref, s_ref, *rest, norm_eps: float = 1e-5,
                        has_norm: bool = False, has_res: bool = False):
    rest = list(rest)
    n_ref = rest.pop(0) if has_norm else None
    r_ref = rest.pop(0) if has_res else None
    o_ref = rest[0]
    x = _maybe_norm(x_ref[:], n_ref, norm_eps)        # (Mt, K) bf16
    wv = w_ref[:]
    if wv.ndim == 3:                                  # chunk-major
        wv = wv[0]
    lo, hi = _unpack4(wv, x.dtype)                    # (K/2, Nt) each
    k2 = lo.shape[0]
    acc = jnp.dot(x[:, :k2], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x[:, k2:], hi, preferred_element_type=jnp.float32)
    acc = acc * s_ref[:].astype(jnp.float32)
    if has_res:
        acc += r_ref[:].astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _pallas_int4_matmul(
    x: jax.Array, values: jax.Array, scale: jax.Array,
    *, block_n: Optional[int] = None, block_m: int = 128, out_dtype=None,
    pre_norm=None, residual=None,
) -> jax.Array:
    """x (M, K) bf16 @ packed-int4 (K/2, N) * scale (N,) -> (M, N).
    Same tiling policy as the int8 kernel; tiles are half the bytes, so the
    same width streams twice the weight rows per DMA. Chunk-major (3-D)
    values force the stored chunk width (contiguous block DMA)."""
    m, k = x.shape
    if values.ndim == 3:
        cnum, k2, bc = values.shape
        n = cnum * bc
    else:
        k2, n = values.shape
        bc = None
    assert k == 2 * k2
    n_orig = scale.shape[-1]
    if n_orig != n:
        scale = jnp.pad(scale, ((0, n - n_orig),), constant_values=1.0)
    if bc is not None:
        bn = bc
    else:
        if block_n is None:
            block_n = 512
        # the in-kernel nibble unpack materialises lo/hi bf16 copies of the
        # block (2 * k2 * bn * 2 bytes) — cap bn so that stays within scoped
        # VMEM alongside the x block (large-K shapes OOM'd at bn=512)
        while block_n > 128 and 4 * k2 * block_n > 4 * 2 ** 20:
            block_n //= 2
        block_n = 1 << (block_n.bit_length() - 1)
        bn = min(block_n, n)
        while n % bn and bn > 128:
            bn //= 2
    if m <= block_m:
        bm, mg = m, 1
    else:
        bm = block_m
        mg = -(-m // bm)
        if m % bm:
            x = jnp.pad(x, ((0, mg * bm - m), (0, 0)))
    grid = (mg, n // bn)
    wspec = (pl.BlockSpec((1, k2, bn), lambda i, j: (j, 0, 0),
                          memory_space=pltpu.VMEM) if bc is not None else
             pl.BlockSpec((k2, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        wspec,
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, values, scale.reshape(1, n)]
    eps = 1e-5
    if pre_norm is not None:
        nw, eps = pre_norm
        in_specs.append(pl.BlockSpec((1, k), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(nw.reshape(1, k))
    if residual is not None:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                     memory_space=pltpu.VMEM))
        operands.append(_pad_res(residual, mg * bm, n))
    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel, norm_eps=eps,
                          has_norm=pre_norm is not None,
                          has_res=residual is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mg * bm, n), out_dtype or x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=k2 * n + m * k * 2 + m * n * 2,
            transcendentals=0,
        ),
    )(*operands)
    return out[:m, :n_orig]


def _scale_rows(w, s, group: int):
    """(K2, N) tile * per-group row scales (K2/group, N) -> scaled tile.
    The reshape splits sublanes only (lanes preserved) so Mosaic keeps it
    register-local; multiplying scales into the weight tile costs one VPU
    pass and lets the contraction stay a single MXU matmul instead of
    K2/group small ones (the loop form measured ~15%% slower end-to-end)."""
    k2, n = w.shape
    scaled = w.reshape(k2 // group, group, n) * s[:, None, :]
    return scaled.reshape(k2, n)


def _int4g_matmul_kernel(x_ref, w_ref, s_ref, *rest, group: int,
                         norm_eps: float = 1e-5, has_norm: bool = False,
                         has_res: bool = False):
    rest = list(rest)
    n_ref = rest.pop(0) if has_norm else None
    r_ref = rest.pop(0) if has_res else None
    o_ref = rest[0]
    x = _maybe_norm(x_ref[:], n_ref, norm_eps)        # (Mt, K) bf16
    wv = w_ref[:]
    if wv.ndim == 3:                                  # chunk-major
        wv = wv[0]
    lo, hi = _unpack4(wv, jnp.float32)                # (K/2, Nt) each
    k2 = lo.shape[0]
    g2 = k2 // group
    s = s_ref[:].astype(jnp.float32)                  # (G, Nt), G = 2*g2
    lo = _scale_rows(lo, s[:g2], group).astype(x.dtype)
    hi = _scale_rows(hi, s[g2:], group).astype(x.dtype)
    acc = jnp.dot(x[:, :k2], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x[:, k2:], hi, preferred_element_type=jnp.float32)
    if has_res:
        acc += r_ref[:].astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _pallas_int4g_matmul(
    x: jax.Array, values: jax.Array, scale: jax.Array,
    *, block_n: Optional[int] = None, block_m: int = 128, out_dtype=None,
    pre_norm=None, residual=None,
) -> jax.Array:
    """x (M, K) bf16 @ group-scaled packed-int4 (K/2, N) -> (M, N).
    Same tiling as the int4 kernel; the scale block is (G, bn). Chunk-major
    (3-D) values force the stored chunk width (contiguous block DMA)."""
    m, k = x.shape
    if values.ndim == 3:
        cnum, k2, bc = values.shape
        n = cnum * bc
    else:
        k2, n = values.shape
        bc = None
    assert k == 2 * k2
    g, n_orig = scale.shape
    group = k // g
    if n_orig != n:
        scale = jnp.pad(scale, ((0, 0), (0, n - n_orig)), constant_values=1.0)
    if bc is not None:
        bn = bc
    else:
        if block_n is None:
            block_n = 512
        while block_n > 128 and 4 * k2 * block_n > 4 * 2 ** 20:
            block_n //= 2
        block_n = 1 << (block_n.bit_length() - 1)
        bn = min(block_n, n)
        while n % bn and bn > 128:
            bn //= 2
    if m <= block_m:
        bm, mg = m, 1
    else:
        bm = block_m
        mg = -(-m // bm)
        if m % bm:
            x = jnp.pad(x, ((0, mg * bm - m), (0, 0)))
    grid = (mg, n // bn)
    wspec = (pl.BlockSpec((1, k2, bn), lambda i, j: (j, 0, 0),
                          memory_space=pltpu.VMEM) if bc is not None else
             pl.BlockSpec((k2, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        wspec,
        pl.BlockSpec((g, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, values, scale]
    eps = 1e-5
    if pre_norm is not None:
        nw, eps = pre_norm
        in_specs.append(pl.BlockSpec((1, k), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(nw.reshape(1, k))
    if residual is not None:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                     memory_space=pltpu.VMEM))
        operands.append(_pad_res(residual, mg * bm, n))
    out = pl.pallas_call(
        functools.partial(_int4g_matmul_kernel, group=group, norm_eps=eps,
                          has_norm=pre_norm is not None,
                          has_res=residual is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mg * bm, n), out_dtype or x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=k2 * n + m * k * 2 + m * n * 2,
            transcendentals=0,
        ),
    )(*operands)
    return out[:m, :n_orig]


def _int4c_matmul_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]                                      # (Mt, K)
    lo, hi = _unpack4(w_ref[:], x.dtype)              # (K, bc) each
    al = jnp.dot(x, lo, preferred_element_type=jnp.float32)
    ah = jnp.dot(x, hi, preferred_element_type=jnp.float32)
    s = s_ref[:].astype(jnp.float32)                  # (2, bc)
    o_ref[:] = jnp.stack(
        [al * s[0:1], ah * s[1:2]], axis=0).astype(o_ref.dtype)


def _pallas_int4c_matmul(
    x: jax.Array, values: jax.Array, scale: jax.Array,
    *, block_n: int = 512, block_m: int = 128, out_dtype=None,
) -> jax.Array:
    """x (M, K) @ column-packed int4 (K, halfpad) -> (M, N). Each grid step
    emits one (2, Mt, bc) output block: the low-nibble columns land in
    out[0], the high-nibble ones in out[1]; the caller re-concatenates."""
    m, k = x.shape
    k2, halfpad = values.shape
    assert k == k2
    n = scale.shape[-1]
    nh = n // 2
    s2 = jnp.stack([
        jnp.pad(scale[:nh], ((0, halfpad - nh),), constant_values=1.0),
        jnp.pad(scale[nh:], ((0, halfpad - (n - nh)),), constant_values=1.0),
    ])
    # unpack materialises lo/hi bf16 (k, bn) copies — bound bn by VMEM
    # (batched prefill at K=8192, bn=512 overflowed scoped vmem)
    while block_n > 128 and 4 * k * block_n > 4 * 2 ** 20:
        block_n //= 2
    bn = min(1 << (block_n.bit_length() - 1), halfpad)
    while halfpad % bn and bn > 128:
        bn //= 2
    if m <= block_m:
        bm, mg = m, 1
    else:
        bm = block_m
        mg = -(-m // bm)
        if m % bm:
            x = jnp.pad(x, ((0, mg * bm - m), (0, 0)))
    grid = (mg, halfpad // bn)
    out = pl.pallas_call(
        _int4c_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, bm, bn), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, mg * bm, halfpad),
                                       out_dtype or x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * k * halfpad,
            bytes_accessed=k * halfpad + m * k * 2 + 2 * m * halfpad * 2,
            transcendentals=0,
        ),
    )(x, values, s2)
    return jnp.concatenate(
        [out[0, :m, :nh], out[1, :m, : n - nh]], axis=-1)


def _int4cg_matmul_kernel(x_ref, w_ref, s_ref, o_ref, *, group: int):
    x = x_ref[:]                                      # (Mt, K)
    lo, hi = _unpack4(w_ref[:], jnp.float32)          # (K, bc) each
    s = s_ref[:].astype(jnp.float32)                  # (g, 2, bc)
    lo = _scale_rows(lo, s[:, 0], group).astype(x.dtype)
    hi = _scale_rows(hi, s[:, 1], group).astype(x.dtype)
    al = jnp.dot(x, lo, preferred_element_type=jnp.float32)
    ah = jnp.dot(x, hi, preferred_element_type=jnp.float32)
    o_ref[:] = jnp.stack([al, ah], axis=0).astype(o_ref.dtype)


def _pallas_int4cg_matmul(
    x: jax.Array, values: jax.Array, scale: jax.Array,
    *, block_n: int = 512, block_m: int = 128, out_dtype=None,
) -> jax.Array:
    """Grouped variant of `_pallas_int4c_matmul`: scale (G, N)."""
    m, k = x.shape
    k2, halfpad = values.shape
    assert k == k2
    g, n = scale.shape
    group = k // g
    nh = n // 2
    s2 = jnp.stack([
        jnp.pad(scale[:, :nh], ((0, 0), (0, halfpad - nh)),
                constant_values=1.0),
        jnp.pad(scale[:, nh:], ((0, 0), (0, halfpad - (n - nh))),
                constant_values=1.0),
    ], axis=1)                                        # (G, 2, halfpad)
    block_n_ = block_n
    while block_n_ > 128 and 4 * k * block_n_ > 4 * 2 ** 20:
        block_n_ //= 2
    bn = min(1 << (block_n_.bit_length() - 1), halfpad)
    while halfpad % bn and bn > 128:
        bn //= 2
    if m <= block_m:
        bm, mg = m, 1
    else:
        bm = block_m
        mg = -(-m // bm)
        if m % bm:
            x = jnp.pad(x, ((0, mg * bm - m), (0, 0)))
    grid = (mg, halfpad // bn)
    out = pl.pallas_call(
        functools.partial(_int4cg_matmul_kernel, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 2, bn), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, bm, bn), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, mg * bm, halfpad),
                                       out_dtype or x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * k * halfpad,
            bytes_accessed=k * halfpad + m * k * 2 + 2 * m * halfpad * 2,
            transcendentals=0,
        ),
    )(x, values, s2)
    return jnp.concatenate(
        [out[0, :m, :nh], out[1, :m, : n - nh]], axis=-1)


def _int4i_matmul_kernel(x_ref, w_ref, s_ref, *rest, group: int = 0,
                         norm_eps: float = 1e-5, has_norm: bool = False,
                         has_res: bool = False):
    """Row-interleaved int4 GEMV: ONE `pltpu.bitcast` reconstructs the
    (K, Nt) int4 tile (hardware sub-byte order), the convert sign-extends
    on the VPU's native unpack path, and the contraction is a single MXU
    dot — no shift chain, no K-half split."""
    rest = list(rest)
    n_ref = rest.pop(0) if has_norm else None
    r_ref = rest.pop(0) if has_res else None
    o_ref = rest[0]
    x = _maybe_norm(x_ref[:], n_ref, norm_eps)        # (Mt, K) bf16
    wv = w_ref[:]
    if wv.ndim == 3:                                  # chunk-major
        wv = wv[0]
    w4 = pltpu.bitcast(wv, jnp.int4)                  # (K, Nt)
    if group:
        w = _scale_rows(w4.astype(jnp.float32),
                        s_ref[:].astype(jnp.float32), group).astype(x.dtype)
        acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    else:
        acc = jnp.dot(x, w4.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        acc = acc * s_ref[:].astype(jnp.float32)
    if has_res:
        acc += r_ref[:].astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _pallas_int4i_matmul(
    x: jax.Array, values: jax.Array, scale: jax.Array,
    *, block_n: Optional[int] = None, block_m: int = 128, out_dtype=None,
    pre_norm=None, residual=None,
) -> jax.Array:
    """x (M, K) bf16 @ row-interleaved int4 (K/2, N) * scale ((N,) or
    grouped (G, N)) -> (M, N). Tiling as the int8 kernel; chunk-major (3-D)
    values force the stored chunk width (contiguous block DMA)."""
    m, k = x.shape
    grouped = scale.ndim == 2
    if values.ndim == 3:
        cnum, k2, bc = values.shape
        n = cnum * bc
    else:
        k2, n = values.shape
        bc = None
    assert k == 2 * k2
    if grouped:
        g, n_orig = scale.shape
        group = k // g
        if n_orig != n:
            scale = jnp.pad(scale, ((0, 0), (0, n - n_orig)),
                            constant_values=1.0)
        s_rows = g
    else:
        group = 0
        n_orig = scale.shape[-1]
        if n_orig != n:
            scale = jnp.pad(scale, ((0, n - n_orig),), constant_values=1.0)
        scale = scale.reshape(1, n)
        s_rows = 1
    if bc is not None:
        bn = bc
    else:
        if block_n is None:
            block_n = 512
        # the in-kernel convert materialises one (K, bn) bf16 tile (f32
        # when grouped) — half the transient footprint of the shift-chain
        # kernels' int32 + lo/hi copies
        per = 4 if grouped else 2
        while block_n > 128 and per * k * block_n > 4 * 2 ** 20:
            block_n //= 2
        block_n = 1 << (block_n.bit_length() - 1)
        bn = min(block_n, n)
        while n % bn and bn > 128:
            bn //= 2
    if m <= block_m:
        bm, mg = m, 1
    else:
        bm = block_m
        mg = -(-m // bm)
        if m % bm:
            x = jnp.pad(x, ((0, mg * bm - m), (0, 0)))
    grid = (mg, n // bn)
    wspec = (pl.BlockSpec((1, k2, bn), lambda i, j: (j, 0, 0),
                          memory_space=pltpu.VMEM) if bc is not None else
             pl.BlockSpec((k2, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        wspec,
        pl.BlockSpec((s_rows, bn), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, values, scale]
    eps = 1e-5
    if pre_norm is not None:
        nw, eps = pre_norm
        in_specs.append(pl.BlockSpec((1, k), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(nw.reshape(1, k))
    if residual is not None:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                     memory_space=pltpu.VMEM))
        operands.append(_pad_res(residual, mg * bm, n))
    out = pl.pallas_call(
        functools.partial(_int4i_matmul_kernel, group=group, norm_eps=eps,
                          has_norm=pre_norm is not None,
                          has_res=residual is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mg * bm, n), out_dtype or x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=k2 * n + m * k * 2 + m * n * 2,
            transcendentals=0,
        ),
    )(*operands)
    return out[:m, :n_orig]


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu" or any(
        d.platform == "tpu" for d in jax.devices()
    )


@functools.lru_cache(maxsize=1)
def _use_pallas() -> bool:
    try:
        return _on_tpu()
    except Exception:
        return False


def matmul(
    x: jax.Array, w: Union[jax.Array, QuantizedLinear, QuantizedLinear4],
    out_dtype=None, pre_norm=None, residual=None,
) -> jax.Array:
    """``x @ w`` over the last two axes; ``w`` may be quantized (int8/int4).

    x: (..., K); plain w: (K, N); int8 w: values (K, N); int4 w: packed
    values (K/2, N). ``out_dtype`` forces the output dtype (e.g. f32 logits).
    ``pre_norm=(weight, eps)`` folds a leading RMSNorm of ``x`` into the
    Pallas kernels (applied in XLA on the fallback paths) — the decode hot
    loop's norm->matmul pairs become one kernel each. ``residual`` (same
    shape as the output) likewise folds the transformer residual add into
    the row-quantized Pallas kernels (XLA add elsewhere)."""
    def _normed(x2):
        if pre_norm is None:
            return x2
        from uniaudio2_tpu.ops.norms import rms_norm

        return rms_norm(x2, pre_norm[0], pre_norm[1])

    def _res2(n):
        return residual.reshape(-1, n) if residual is not None else None

    if isinstance(w, (QuantizedLinearI4, QuantizedLinearI4G)):
        lead = x.shape[:-1]
        k = x.shape[-1]
        x2 = x.reshape(-1, k)
        grouped = isinstance(w, QuantizedLinearI4G)
        if _use_pallas() and k % 256 == 0 \
                and (not grouped or k % w.scale.shape[-2] == 0):
            out = _pallas_int4i_matmul(x2, w.values, w.scale,
                                       out_dtype=out_dtype, pre_norm=pre_norm,
                                       residual=_res2(w.scale.shape[-1]))
        else:
            wd = (dequantize4_interleaved_grouped(w, x.dtype) if grouped
                  else dequantize4_interleaved(w, x.dtype))
            out = jnp.einsum(
                "mk,kn->mn", _normed(x2), wd,
                preferred_element_type=jnp.float32
            ).astype(x.dtype)
            if residual is not None:
                out = out + _res2(out.shape[-1]).astype(out.dtype)
        out = out.reshape(*lead, -1)
        return out.astype(out_dtype) if out_dtype else out
    if isinstance(w, QuantizedLinear4):
        lead = x.shape[:-1]
        k = x.shape[-1]
        x2 = x.reshape(-1, k)
        if _use_pallas() and k % 256 == 0:
            out = _pallas_int4_matmul(x2, w.values, w.scale,
                                      out_dtype=out_dtype, pre_norm=pre_norm,
                                      residual=_res2(w.scale.shape[-1]))
        else:
            wd = dequantize4(w, x.dtype)
            out = jnp.einsum(
                "mk,kn->mn", _normed(x2), wd,
                preferred_element_type=jnp.float32
            ).astype(x.dtype)
            if residual is not None:
                out = out + _res2(out.shape[-1]).astype(out.dtype)
        out = out.reshape(*lead, -1)
        return out.astype(out_dtype) if out_dtype else out
    if isinstance(w, QuantizedLinear4G):
        lead = x.shape[:-1]
        k = x.shape[-1]
        x2 = x.reshape(-1, k)
        group = k // w.scale.shape[-2]
        if _use_pallas() and k % 256 == 0 and (k // 2) % group == 0:
            out = _pallas_int4g_matmul(x2, w.values, w.scale,
                                       out_dtype=out_dtype, pre_norm=pre_norm,
                                       residual=_res2(w.scale.shape[-1]))
        else:
            wd = dequantize4_grouped(w, x.dtype)
            out = jnp.einsum(
                "mk,kn->mn", _normed(x2), wd,
                preferred_element_type=jnp.float32
            ).astype(x.dtype)
            if residual is not None:
                out = out + _res2(out.shape[-1]).astype(out.dtype)
        out = out.reshape(*lead, -1)
        return out.astype(out_dtype) if out_dtype else out
    if isinstance(w, QuantizedLinearC4):
        lead = x.shape[:-1]
        k = x.shape[-1]
        x2 = _normed(x.reshape(-1, k))
        if _use_pallas() and k % 128 == 0:
            out = _pallas_int4c_matmul(x2, w.values, w.scale,
                                       out_dtype=out_dtype)
        else:
            wd = dequantize4_cols(w, x.dtype)
            out = jnp.einsum(
                "mk,kn->mn", x2, wd, preferred_element_type=jnp.float32
            ).astype(x.dtype)
        if residual is not None:
            out = out + _res2(out.shape[-1]).astype(out.dtype)
        out = out.reshape(*lead, -1)
        return out.astype(out_dtype) if out_dtype else out
    if isinstance(w, QuantizedLinearC4G):
        lead = x.shape[:-1]
        k = x.shape[-1]
        x2 = _normed(x.reshape(-1, k))
        group = k // w.scale.shape[-2]
        if _use_pallas() and k % 128 == 0 and k % group == 0:
            out = _pallas_int4cg_matmul(x2, w.values, w.scale,
                                        out_dtype=out_dtype)
        else:
            wd = dequantize4_cols_grouped(w, x.dtype)
            out = jnp.einsum(
                "mk,kn->mn", x2, wd, preferred_element_type=jnp.float32
            ).astype(x.dtype)
        if residual is not None:
            out = out + _res2(out.shape[-1]).astype(out.dtype)
        out = out.reshape(*lead, -1)
        return out.astype(out_dtype) if out_dtype else out
    if not isinstance(w, QuantizedLinear):
        if pre_norm is not None:
            lead = x.shape[:-1]
            x = _normed(x.reshape(-1, x.shape[-1])).reshape(*lead, -1)
        out = jnp.einsum(
            "...k,kn->...n", x, w,
            preferred_element_type=out_dtype or jnp.float32,
        )
        if residual is not None:
            out = out + residual.astype(out.dtype)
        return out if out_dtype else out.astype(x.dtype)
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    if _use_pallas() and k % 128 == 0:
        out = _pallas_int8_matmul(x2, w.values, w.scale, out_dtype=out_dtype,
                                  pre_norm=pre_norm,
                                  residual=_res2(w.scale.shape[-1]))
    else:
        wd = dequantize(w, x.dtype)
        out = jnp.einsum(
            "mk,kn->mn", _normed(x2), wd, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        if residual is not None:
            out = out + _res2(out.shape[-1]).astype(out.dtype)
    out = out.reshape(*lead, -1)
    return out.astype(out_dtype) if out_dtype else out


# ---------------------------------------------------------------------------
# Param-tree quantization
# ---------------------------------------------------------------------------

_GPT_QUANT_LEAVES = (
    "qkv_w", "attn_proj_w", "fc1_w", "fc2_w", "mlp_proj_w", "lm_head_w",
)


_quantize_jit = jax.jit(quantize)
_quantize4_jit = jax.jit(quantize4)
_quantize4c_jit = jax.jit(quantize4_cols)
_quantize4g_jit = jax.jit(quantize4_grouped, static_argnums=(1,))
_quantize4cg_jit = jax.jit(quantize4_cols_grouped, static_argnums=(1,))


def _free(w) -> None:
    """Free a source HBM buffer right after its quantized copy is
    dispatched. Buffer donation can never alias here (bf16 in, int8/int4 +
    f32 scales out: different dtypes and byte sizes), so `donate_argnums`
    only produced "donated buffers were not usable" warnings that drowned
    out real donation regressions (VERDICT r3 item 9); an explicit
    `.delete()` gives the same sequential memory profile silently. The
    runtime holds its own reference while the quantize step is in flight,
    so deleting immediately after dispatch is safe."""
    if isinstance(w, jax.Array):
        w.delete()


def _q(w, donate: bool, bits=8, cols: bool = False):
    """Quantize one leaf; with ``donate`` the source HBM buffer is freed as
    soon as the quantized copy is dispatched (big models don't fit twice).
    ``bits`` is 8, 4 (per-channel scales) or "4g" (group-wise scales —
    better accuracy, ~11% slower; both int4 forms route through the fused
    SwiGLU kernel via column-packed down-projections)."""
    if bits == "4g":
        if cols:
            if w.shape[-2] % INT4_GROUP:
                bits = 4
            else:
                out = _quantize4cg_jit(w, INT4_GROUP) if donate \
                    else quantize4_cols_grouped(w)
                if donate:
                    _free(w)
                return out
        elif w.shape[-2] % (2 * INT4_GROUP):
            bits = 4  # K not group-divisible: per-channel int4
        else:
            out = _quantize4g_jit(w, INT4_GROUP) if donate \
                else quantize4_grouped(w)
            if donate:
                _free(w)
            return out
    if bits == 4 and cols:
        out = _quantize4c_jit(w) if donate else quantize4_cols(w)
    elif bits == 4:
        out = _quantize4_jit(w) if donate else quantize4(w)
    elif donate:
        out = _quantize_jit(w)
    else:
        out = quantize(w)
    if donate:
        _free(w)
    return out


def quantize_gpt_params(params, *, donate: bool = False, bits=8,
                        lm_head_bits: Optional[int] = None):
    """Quantize a GPT param tree's matmul weights (layer-stacked leaves get
    per-layer scales); embeddings and norms stay bf16. ``bits`` is 8, 4 or
    "4g" (group-wise int4 — see `quantize4_grouped`); the lm_head defaults
    to int8 even under int4 (text logits are the most
    quantization-sensitive head). Under int4/"4g" the MLP down-projection
    is column-packed so the fused SwiGLU kernel can chunk its contraction
    axis (`ops/fused_mlp.py`). MoE expert stacks (4-D leaves) stay bf16 —
    no shipped config quantizes an MoE model."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in _GPT_QUANT_LEAVES:
        if name in layers and layers[name].ndim == 3:
            layers[name] = _q(layers[name], donate, bits,
                              cols=bits in (4, "4g")
                              and name == "mlp_proj_w")
    out["layers"] = layers
    if "lm_head_w" in out:
        out["lm_head_w"] = _q(out["lm_head_w"], donate,
                              lm_head_bits if lm_head_bits else 8)
    return out


def quantize_unified_params(params, *, donate: bool = False,
                            int4_modules: Tuple[str, ...] = (),
                            grouped: bool = False):
    """Quantize the unified model's weight matrices for serving.

    ``donate=True`` frees each source buffer as it is quantized — required
    when the bf16 model plus its int8 copy don't fit in HBM together. The
    input tree must not be reused afterwards.

    ``int4_modules`` selects submodules for packed int4 storage instead of
    int8 (halves their decode HBM traffic); with ``grouped`` those modules
    use group-wise scales (`quantize4_grouped` — better accuracy, ~11%
    slower than per-channel through the same fused kernels). Valid names:
    "backbone",
    "decoder", "understanding_expert", "generation_expert", "projection_w",
    "audio_head". The local decoder is the prime target — its weights are
    re-read 8x per frame (VERDICT r1: ~2 GB of the ~5.4 GB/frame), so
    int4_modules=("decoder",) cuts ~18%% of the frame traffic.
    """
    four = "4g" if grouped else 4
    out = dict(params)
    for sub in ("backbone", "decoder", "understanding_expert",
                "generation_expert"):
        out[sub] = quantize_gpt_params(
            params[sub], donate=donate,
            bits=four if sub in int4_modules else 8)
    out["projection_w"] = _q(params["projection_w"], donate,
                             four if "projection_w" in int4_modules else 8)
    out["audio_head"] = _q(params["audio_head"], donate,
                           four if "audio_head" in int4_modules else 8)
    return out
