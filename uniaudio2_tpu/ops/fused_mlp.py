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
    QuantizedLinear, QuantizedLinear4, QuantizedLinearC4, _unpack4,
)

_VMEM_BUDGET = 6 * 2 ** 20  # per-block bytes cap (double-buffered by Mosaic)


def _kernel(x_ref, w1_ref, s1_ref, w2_ref, s2_ref, w3_ref, s3_ref,
            o_ref, acc_ref, *, w12_int4: bool, w3_int4: bool):
    c = pl.program_id(0)
    x = x_ref[:]                                    # (M, K) bf16/f32

    def gemv(w_ref, s_ref):
        if w12_int4:
            lo, hi = _unpack4(w_ref[:], x.dtype)    # (K/2, bc) each
            k2 = lo.shape[0]
            acc = jnp.dot(x[:, :k2], lo, preferred_element_type=jnp.float32)
            acc += jnp.dot(x[:, k2:], hi, preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(x, w_ref[:].astype(x.dtype),
                          preferred_element_type=jnp.float32)
        return acc * s_ref[:].astype(jnp.float32)

    a = gemv(w1_ref, s1_ref)                        # (M, bc) f32
    b = gemv(w2_ref, s2_ref)
    h = (jax.nn.silu(a) * b).astype(x.dtype)        # (M, bc)

    if w3_int4:
        lo, hi = _unpack4(w3_ref[:], x.dtype)       # (bc, N/2) each
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
        o_ref[:] = (acc_ref[:] * s3_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


def can_fuse(w1, w2, w3, x: jax.Array) -> bool:
    """Fusable: quantized weights, small M (decode steps; prefill's large-M
    matmuls are MXU-efficient unfused), aligned dims."""
    if not isinstance(w1, (QuantizedLinear, QuantizedLinear4)):
        return False
    if type(w1) is not type(w2):
        return False
    if not isinstance(w3, (QuantizedLinear, QuantizedLinearC4)):
        return False
    import math

    if math.prod(x.shape[:-1]) > 128:
        return False
    k = x.shape[-1]
    if k % 256:
        return False
    i = w1.scale.shape[-1]
    if w1.values.shape[-1] != i or w2.values.shape[-1] != i:
        return False  # lane-padded I would index pad rows of W3
    if w3.values.shape[-2] != i:
        return False
    # chunking needs the intermediate dim to divide evenly
    return i % 256 == 0


def fused_swiglu(
    x: jax.Array,
    w1: Union[QuantizedLinear, QuantizedLinear4],
    w2: Union[QuantizedLinear, QuantizedLinear4],
    w3: Union[QuantizedLinear, QuantizedLinearC4],
) -> jax.Array:
    """(..., K) -> (..., N) fused quantized SwiGLU (see module docstring)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    w12_int4 = isinstance(w1, QuantizedLinear4)
    w3_int4 = isinstance(w3, QuantizedLinearC4)

    i_true = w1.scale.shape[-1]          # == stored width (can_fuse checks)
    n_true = w3.scale.shape[-1]
    n_stored = w3.values.shape[-1]       # N (int8) or padded N/2 (int4)

    s1 = w1.scale
    s2 = w2.scale
    s3 = w3.scale
    if w3_int4:
        # stored column layout: [cols 0..N/2) ++ pad] in the low nibbles,
        # [cols N/2..N) ++ pad] in the high nibbles -> out is (M, 2*half)
        half = n_stored
        nh = n_true // 2
        s3 = jnp.concatenate([
            jnp.pad(s3[: nh], ((0, half - nh),), constant_values=1.0),
            jnp.pad(s3[nh:], ((0, half - (n_true - nh)),),
                    constant_values=1.0),
        ])
        out_width = 2 * half
    else:
        out_width = n_stored
        if s3.shape[-1] != n_stored:
            s3 = jnp.pad(s3, ((0, n_stored - s3.shape[-1]),),
                         constant_values=1.0)

    # chunk width over I: as wide as the VMEM budget allows
    bc = 512
    per_chunk = (k // (2 if w12_int4 else 1)) * 2 + n_stored  # bytes per I-row
    while bc > 128 and bc * per_chunk > _VMEM_BUDGET:
        bc //= 2
    while i_true % bc:
        bc //= 2
    grid = (i_true // bc,)

    kw = k // 2 if w12_int4 else k
    kernel = functools.partial(_kernel, w12_int4=w12_int4, w3_int4=w3_int4)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, bc), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, bc), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, n_stored), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_width), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, out_width), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, out_width), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, out_width), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * m * k * i_true,
            bytes_accessed=2 * kw * i_true + i_true * n_stored,
            transcendentals=m * i_true,
        ),
    )(x2, w1.values, s1.reshape(1, -1), w2.values, s2.reshape(1, -1),
      w3.values, s3.reshape(1, -1))

    if w3_int4:
        half = n_stored
        nh = n_true // 2
        out = jnp.concatenate([out[:, :nh], out[:, half:half + nh]], axis=-1)
    else:
        out = out[:, :n_true]
    return out.reshape(*lead, n_true)
