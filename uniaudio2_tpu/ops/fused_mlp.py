"""Fused SwiGLU MLP kernel for quantized decode.

The unfused MLP is three Pallas GEMV calls with two HBM-round-tripped
intermediates (`gate`, `up`); at batch-1 decode the op-latency floor between
them is a real cost (measured ~1 ms/frame of glue in the local decoder,
scripts/profile_localdec.py). This kernel computes

    out = (silu(x @ W1 * s1) * (x @ W2 * s2)) @ W3 * s3

in ONE pallas_call: the grid walks chunks of the intermediate dimension,
each step streams the matching W1/W2 column block and W3 row block once,
accumulating into an f32 VMEM scratch; the output is written on the last
step. Weight DMA for chunk c+1 overlaps chunk c's compute (Mosaic pipelines
block fetches across grid steps), so the pipeline never drains between the
three matmuls.

Weight formats: W1/W2 int8 (K, I) or packed int4 (K/2, I) (K-split — see
`quant.QuantizedLinear4`); W3 int8 (I, N) or *column*-packed int4 (I, N/2)
(`quant.QuantizedLinearC4` — K-split would break row-chunked access along I).
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uniaudio2_tpu.ops.quant import (
    QuantizedLinear, QuantizedLinear4, QuantizedLinear4G, QuantizedLinearC4,
    QuantizedLinearC4G, QuantizedLinearI4, QuantizedLinearI4G, _scale_rows,
    _unpack4,
)

_VMEM_BUDGET = 6 * 2 ** 20  # per-block bytes cap (double-buffered by Mosaic)


def _kernel(x_ref, w1_ref, s1_ref, w2_ref, s2_ref, w3_ref, s3_ref,
            *rest, w12_int4: bool, w3_int4: bool,
            w12_group: int = 0, w3_group: int = 0,
            has_norm: bool = False, norm_eps: float = 1e-5,
            res_cols: int = 0, interleaved: bool = False):
    """``w12_group``/``w3_group`` > 0 switch the scale semantics to
    group-wise (`QuantizedLinear4G` / `QuantizedLinearC4G`): s1/s2 blocks
    are (G, bc) over the full K, the s3 block is (bc/group, 2, half) for
    THIS chunk's rows (chunk-local scales — applied here, not at the final
    write).

    ``has_norm`` folds the layer's pre-MLP RMSNorm into the kernel (the
    norm-weight ref follows s3; recomputed per chunk — VPU work on a
    (M, K) row is negligible next to the weight stream). ``res_cols`` > 0
    folds the residual add: a (M, res_cols) residual ref is added at the
    final write, de-interleaved across the lo/hi column halves under
    column-packed int4 output. Both remove an XLA fusion + HBM round trip
    per layer from the decode hot loop."""
    rest = list(rest)
    n_ref = rest.pop(0) if has_norm else None
    r_ref = rest.pop(0) if res_cols else None
    o_ref, acc_ref = rest
    c = pl.program_id(0)
    x = x_ref[:]                                    # (M, K) bf16/f32
    if has_norm:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = (xf * jax.lax.rsqrt(var + norm_eps)
             * n_ref[:].astype(jnp.float32)).astype(x.dtype)

    def gemv(w_ref, s_ref):
        wv = w_ref[:]
        if wv.ndim == 3:                            # chunk-major (1, kw, bc)
            wv = wv[0]
        if interleaved:
            # row-interleaved storage: one bitcast reconstructs the (K, bc)
            # int4 tile on the hardware sub-byte path — no shift chain
            w4 = pltpu.bitcast(wv, jnp.int4)
            if w12_group:
                w = _scale_rows(w4.astype(jnp.float32),
                                s_ref[:].astype(jnp.float32),
                                w12_group).astype(x.dtype)
                return jnp.dot(x, w, preferred_element_type=jnp.float32)
            acc = jnp.dot(x, w4.astype(x.dtype),
                          preferred_element_type=jnp.float32)
            return acc * s_ref[:].astype(jnp.float32)
        if w12_int4 and w12_group:
            # grouped scales are multiplied into the weight tile (one VPU
            # pass) so the contraction stays two big MXU matmuls — the
            # looped per-group form measured ~15% slower end-to-end
            lo, hi = _unpack4(wv, jnp.float32)        # (K/2, bc) each
            k2 = lo.shape[0]
            g2 = k2 // w12_group
            s = s_ref[:].astype(jnp.float32)        # (2*g2, bc)
            lo = _scale_rows(lo, s[:g2], w12_group).astype(x.dtype)
            hi = _scale_rows(hi, s[g2:], w12_group).astype(x.dtype)
            acc = jnp.dot(x[:, :k2], lo, preferred_element_type=jnp.float32)
            acc += jnp.dot(x[:, k2:], hi, preferred_element_type=jnp.float32)
            return acc                              # scales already applied
        if w12_int4:
            lo, hi = _unpack4(wv, x.dtype)          # (K/2, bc) each
            k2 = lo.shape[0]
            acc = jnp.dot(x[:, :k2], lo, preferred_element_type=jnp.float32)
            acc += jnp.dot(x[:, k2:], hi, preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(x, wv.astype(x.dtype),
                          preferred_element_type=jnp.float32)
        return acc * s_ref[:].astype(jnp.float32)

    a = gemv(w1_ref, s1_ref)                        # (M, bc) f32
    b = gemv(w2_ref, s2_ref)
    h = (jax.nn.silu(a) * b).astype(x.dtype)        # (M, bc)

    if interleaved and w3_int4:
        w4 = pltpu.bitcast(w3_ref[:], jnp.int4)     # (bc, N)
        if w3_group:
            s3 = s3_ref[0].astype(jnp.float32)      # (1, bc/group, N) block
            w3w = _scale_rows(w4.astype(jnp.float32), s3,
                              w3_group).astype(x.dtype)
        else:
            w3w = w4.astype(x.dtype)                # scaled at final write
        part = jnp.dot(h, w3w, preferred_element_type=jnp.float32)
    elif w3_int4:
        if w3_group:
            lo, hi = _unpack4(w3_ref[:], jnp.float32)  # (bc, N/2) each
            s3 = s3_ref[:].astype(jnp.float32)      # (bc/group, 2, half)
            lo = _scale_rows(lo, s3[:, 0], w3_group).astype(x.dtype)
            hi = _scale_rows(hi, s3[:, 1], w3_group).astype(x.dtype)
        else:
            lo, hi = _unpack4(w3_ref[:], x.dtype)   # (bc, N/2) each
        part = jnp.concatenate(
            [jnp.dot(h, lo, preferred_element_type=jnp.float32),
             jnp.dot(h, hi, preferred_element_type=jnp.float32)], axis=-1)
    else:
        part = jnp.dot(h, w3_ref[:].astype(x.dtype),
                       preferred_element_type=jnp.float32)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = part

    @pl.when(c > 0)
    def _():
        acc_ref[:] += part

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        if w3_group:
            out = acc_ref[:]                        # scales already in
        else:
            out = acc_ref[:] * s3_ref[:].astype(jnp.float32)
        if res_cols:
            r = r_ref[:].astype(jnp.float32)        # (M, n_true)
            if w3_int4 and not interleaved:
                # out layout: [lo cols ++ pad][hi cols ++ pad]
                half = out.shape[-1] // 2
                nh = res_cols // 2
                r = jnp.concatenate([
                    jnp.pad(r[:, :nh], ((0, 0), (0, half - nh))),
                    jnp.pad(r[:, nh:],
                            ((0, 0), (0, half - (res_cols - nh)))),
                ], axis=-1)
            elif out.shape[-1] != res_cols:         # lane-padded out
                r = jnp.pad(r, ((0, 0), (0, out.shape[-1] - res_cols)))
            out = out + r
        o_ref[:] = out.astype(o_ref.dtype)


def can_fuse(w1, w2, w3, x: jax.Array) -> bool:
    """Fusable: quantized weights, small M (decode steps; prefill's large-M
    matmuls are MXU-efficient unfused), aligned dims. Interleaved (I4/I4G)
    weights must be all-interleaved across w1/w2/w3 or paired with an int8
    down-projection."""
    interleaved = isinstance(w1, (QuantizedLinearI4, QuantizedLinearI4G))
    if not isinstance(w1, (QuantizedLinear, QuantizedLinear4,
                           QuantizedLinear4G, QuantizedLinearI4,
                           QuantizedLinearI4G)):
        return False
    if type(w1) is not type(w2):
        return False
    w3_ok = (QuantizedLinear, QuantizedLinearI4, QuantizedLinearI4G) \
        if interleaved else (QuantizedLinear, QuantizedLinearC4,
                             QuantizedLinearC4G)
    if not isinstance(w3, w3_ok):
        return False
    import math

    if math.prod(x.shape[:-1]) > 128:
        return False
    k = x.shape[-1]
    if k % 256:
        return False
    i = w1.scale.shape[-1]

    def width(v):     # chunk-major (C, kw, bc) stores width C*bc
        return v.shape[0] * v.shape[2] if v.ndim == 3 else v.shape[-1]

    if w1.values.ndim != w2.values.ndim:
        return False
    if width(w1.values) != i or width(w2.values) != i:
        return False  # lane-padded I would index pad rows of W3
    w3_rows = i // 2 if isinstance(w3, (QuantizedLinearI4,
                                        QuantizedLinearI4G)) else i
    if w3.values.shape[-2] != w3_rows:
        return False
    if isinstance(w1, QuantizedLinear4G):
        # nibble halves must align with whole scale groups
        if (k // 2) % (k // w1.scale.shape[-2]):
            return False
    if isinstance(w1, QuantizedLinearI4G):
        if k % w1.scale.shape[-2]:
            return False
    if isinstance(w3, (QuantizedLinearC4G, QuantizedLinearI4G)):
        if i % w3.scale.shape[-2]:
            return False
        # the chunk width bc can shrink to 128 under the VMEM cap; whole
        # scale groups must fit any such chunk, so the group size must
        # divide 128 (the default INT4_GROUP=128 does)
        if 128 % (i // w3.scale.shape[-2]):
            return False
    # chunking needs the intermediate dim to divide evenly
    return i % 256 == 0


def fused_swiglu(
    x: jax.Array,
    w1: Union[QuantizedLinear, QuantizedLinear4, QuantizedLinear4G],
    w2: Union[QuantizedLinear, QuantizedLinear4, QuantizedLinear4G],
    w3: Union[QuantizedLinear, QuantizedLinearC4, QuantizedLinearC4G],
    *,
    norm_w: "jax.Array | None" = None,
    norm_eps: float = 1e-5,
    residual: "jax.Array | None" = None,
) -> jax.Array:
    """(..., K) -> (..., N) fused quantized SwiGLU (see module docstring).

    ``norm_w`` folds a leading RMSNorm (``x`` is then the UN-normed layer
    activation); ``residual`` (same shape as the output) folds the layer's
    residual add — together one kernel computes the whole transformer MLP
    block ``x + swiglu(rmsnorm(x))``.

    (A manually DMA-pipelined variant — weights in `pl.ANY`, unrolled chunk
    loop, triple-buffered `make_async_copy` streaming — was tried and
    REMOVED in r3: it measured 13-300x SLOWER than this grid-pipelined form
    on v5e (2.5 ms vs 56 us per backbone MLP; hand-issued HBM->VMEM copies
    do not reach the implicit pipeline's descriptor efficiency). Negative
    result recorded in docs/profile_decode_r3.md.)"""
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    interleaved = isinstance(w1, (QuantizedLinearI4, QuantizedLinearI4G))
    w12_int4 = isinstance(w1, (QuantizedLinear4, QuantizedLinear4G,
                               QuantizedLinearI4, QuantizedLinearI4G))
    w3_int4 = isinstance(w3, (QuantizedLinearC4, QuantizedLinearC4G,
                              QuantizedLinearI4, QuantizedLinearI4G))
    w12_group = (k // w1.scale.shape[-2]
                 if isinstance(w1, (QuantizedLinear4G, QuantizedLinearI4G))
                 else 0)
    w3_grouped = isinstance(w3, (QuantizedLinearC4G, QuantizedLinearI4G))

    i_true = w1.scale.shape[-1]          # == stored width (can_fuse checks)
    n_true = w3.scale.shape[-1]
    n_stored = w3.values.shape[-1]       # N (int8/interleaved) or pad N/2
    w3_group = i_true // w3.scale.shape[-2] if w3_grouped else 0

    s1 = w1.scale
    s2 = w2.scale
    s3 = w3.scale
    if interleaved and w3_int4:
        # interleaved down-projection: true-width output like int8; scales
        # are (N,) -> (1, n_stored) or grouped (G3, N) -> (G3, n_stored)
        out_width = n_stored
        if s3.shape[-1] != n_stored:
            pad = ((0, 0), (0, n_stored - s3.shape[-1])) if w3_grouped \
                else ((0, n_stored - s3.shape[-1]),)
            s3 = jnp.pad(s3, pad, constant_values=1.0)
        if not w3_grouped:
            s3 = s3.reshape(1, -1)
    elif w3_grouped:
        # chunk-local scales: (G3, 2, half) — lo-column scales in [:, 0],
        # hi-column in [:, 1]; the kernel applies them per chunk
        half = n_stored
        nh = n_true // 2
        s3 = jnp.stack([
            jnp.pad(s3[:, :nh], ((0, 0), (0, half - nh)),
                    constant_values=1.0),
            jnp.pad(s3[:, nh:], ((0, 0), (0, half - (n_true - nh))),
                    constant_values=1.0),
        ], axis=1)
        out_width = 2 * half
    elif w3_int4:
        # stored column layout: [cols 0..N/2) ++ pad] in the low nibbles,
        # [cols N/2..N) ++ pad] in the high nibbles -> out is (M, 2*half)
        half = n_stored
        nh = n_true // 2
        s3 = jnp.concatenate([
            jnp.pad(s3[: nh], ((0, half - nh),), constant_values=1.0),
            jnp.pad(s3[nh:], ((0, half - (n_true - nh)),),
                    constant_values=1.0),
        ]).reshape(1, -1)
        out_width = 2 * half
    else:
        out_width = n_stored
        if s3.shape[-1] != n_stored:
            s3 = jnp.pad(s3, ((0, n_stored - s3.shape[-1]),),
                         constant_values=1.0)
        s3 = s3.reshape(1, -1)

    # chunk width over I: chunk-major storage dictates it; otherwise as
    # wide as the VMEM budget allows; must contain whole w3 scale groups
    # when grouped (group=128 divides any bc here)
    w3_i = interleaved and w3_int4
    if w1.values.ndim == 3:
        bc = w1.values.shape[2]
    else:
        bc = 512
        per_chunk = (k // (2 if w12_int4 else 1)) * 2 \
            + (n_stored // 2 if w3_i else n_stored)               # B/I-row
        while bc > 128 and bc * per_chunk > _VMEM_BUDGET:
            bc //= 2
        while i_true % bc:
            bc //= 2
    grid = (i_true // bc,)

    kw = k // 2 if w12_int4 else k
    s12_rows = s1.shape[-2] if w12_group else 1
    s1_in = s1 if w12_group else s1.reshape(1, -1)
    s2_in = s2 if w12_group else s2.reshape(1, -1)
    if w3_grouped and w3_i:
        # leading grid axis: a 2-D (bc/group, N) block would violate
        # Mosaic's 8-row block rule (bc/group is 4 at the serving config);
        # (1, bc/group, N) blocks of the 3-D reshape have their last two
        # dims equal to the array's, which Mosaic accepts
        s3 = s3.reshape(i_true // bc, bc // w3_group, n_stored)
        s3_spec = pl.BlockSpec((1, bc // w3_group, n_stored),
                               lambda c: (c, 0, 0), memory_space=pltpu.VMEM)
    elif w3_grouped:
        s3_spec = pl.BlockSpec((bc // w3_group, 2, n_stored),
                               lambda c: (c, 0, 0), memory_space=pltpu.VMEM)
    else:
        s3_spec = pl.BlockSpec((1, out_width), lambda c: (0, 0),
                               memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, w12_int4=w12_int4, w3_int4=w3_int4,
                               w12_group=w12_group, w3_group=w3_group,
                               has_norm=norm_w is not None, norm_eps=norm_eps,
                               res_cols=n_true if residual is not None else 0,
                               interleaved=interleaved)
    w12_spec = (pl.BlockSpec((1, kw, bc), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM)
                if w1.values.ndim == 3 else
                pl.BlockSpec((kw, bc), lambda c: (0, c),
                             memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((m, k), lambda c: (0, 0), memory_space=pltpu.VMEM),
        w12_spec,
        pl.BlockSpec((s12_rows, bc), lambda c: (0, c),
                     memory_space=pltpu.VMEM),
        w12_spec,
        pl.BlockSpec((s12_rows, bc), lambda c: (0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bc // 2 if w3_i else bc, n_stored), lambda c: (c, 0),
                     memory_space=pltpu.VMEM),
        s3_spec,
    ]
    operands = [x2, w1.values, s1_in, w2.values, s2_in, w3.values, s3]
    if norm_w is not None:
        in_specs.append(pl.BlockSpec((1, k), lambda c: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(norm_w.reshape(1, k))
    if residual is not None:
        in_specs.append(pl.BlockSpec((m, n_true), lambda c: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(residual.reshape(m, n_true))
    # double-buffered weight blocks per grid step; when a wide chunk pushes
    # past Mosaic's 16 MB default scoped-VMEM limit (e.g. UA2_MLP_CHUNK=2048
    # at the backbone shape), raise the per-kernel limit to fit (physical
    # VMEM is 128 MB; the default is a conservative assertion, and the
    # failure mode is a clean AOT error, not a miscompile)
    step_bytes = 2 * (2 * kw * bc + (bc // 2 if w3_i else bc) * n_stored)
    params = (pltpu.CompilerParams(
        vmem_limit_bytes=int(step_bytes * 2.5) + 8 * 2 ** 20)
        if step_bytes > 14 * 2 ** 20 else None)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, out_width), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, out_width), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, out_width), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * m * k * i_true,
            bytes_accessed=2 * kw * i_true + i_true * n_stored,
            transcendentals=m * i_true,
        ),
        **({"compiler_params": params} if params else {}),
    )(*operands)

    if w3_int4 and not interleaved:
        half = n_stored
        nh = n_true // 2
        out = jnp.concatenate([out[:, :nh], out[:, half:half + nh]], axis=-1)
    else:
        out = out[:, :n_true]
    return out.reshape(*lead, n_true)
