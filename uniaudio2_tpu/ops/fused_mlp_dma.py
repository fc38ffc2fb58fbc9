"""Manually DMA-pipelined fused SwiGLU kernel (decode hot path).

Same math as `ops/fused_mlp.fused_swiglu` — one kernel computes the whole
transformer MLP half-block ``x + swiglu(rmsnorm(x))`` over quantized
weights — but the weight streaming is driven by explicit async copies
instead of Mosaic's implicit grid pipeline.  The r3 profile
(docs/profile_decode_r3.md) measured the grid-pipelined kernels at ~82 % of
the 819 GB/s HBM roofline, with a ~0.4-0.6 µs gap per grid step (prologue +
per-step sequencing).  Here the weights stay in HBM (`pl.ANY`), the kernel
runs as ONE invocation, and a fully unrolled chunk loop triple-buffers each
weight's chunks through VMEM scratch with a lookahead-2 prefetch: the
per-chunk cost collapses to a semaphore wait + DMA enqueue, and the DMA
queue never drains between chunks.

Supported layouts are exactly the r3 serving ones (fall back to the grid
kernel otherwise): w1/w2 chunk-major ``(C, kw, bc)`` int8 / row-interleaved
int4 (`quant.QuantizedLinearI4[G]`), w3 2-D ``(I[/2], N)`` int8 /
row-interleaved int4.

Reference semantics: `LLaMAMLP` forward
(/root/reference/llm_models/lit_model.py:582-595) plus the pre-MLP RMSNorm
and residual of `Block` (/root/reference/llm_models/lit_model.py:277-351).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uniaudio2_tpu.ops.quant import (
    QuantizedLinear, QuantizedLinearI4, QuantizedLinearI4G, _scale_rows,
)

_NBUF = 3  # triple buffering: compute chunk c while c+1, c+2 stream


def enabled() -> bool:
    """Env gate ``UA2_MLP_DMA`` (default ON; 0 restores the grid kernel)."""
    return os.environ.get("UA2_MLP_DMA", "1") != "0"


def can_fuse_dma(w1, w2, w3, x: jax.Array) -> bool:
    """Serving layouts only: chunk-major w1/w2, 2-D w3, int8 or
    row-interleaved int4, no lane padding, small M."""
    import math

    ok12 = (QuantizedLinear, QuantizedLinearI4, QuantizedLinearI4G)
    if not (isinstance(w1, ok12) and type(w1) is type(w2)):
        return False
    if not isinstance(w3, ok12):
        return False
    if w1.values.ndim != 3 or w2.values.ndim != 3 or w3.values.ndim != 2:
        return False
    if math.prod(x.shape[:-1]) > 128:
        return False
    k = x.shape[-1]
    if k % 256:
        return False
    i = w1.scale.shape[-1]
    n = w3.scale.shape[-1]

    def width(v):
        return v.shape[0] * v.shape[2]

    if width(w1.values) != i or width(w2.values) != i:
        return False
    if w1.values.shape[2] != w2.values.shape[2]:
        return False
    i4_3 = isinstance(w3, (QuantizedLinearI4, QuantizedLinearI4G))
    if w3.values.shape != ((i // 2 if i4_3 else i), n):
        return False
    bc = w1.values.shape[2]
    if i4_3 and bc % 2:
        return False
    if isinstance(w1, QuantizedLinearI4G):
        if k % w1.scale.shape[-2]:
            return False
    if isinstance(w3, QuantizedLinearI4G):
        g3 = i // w3.scale.shape[-2]
        if i % w3.scale.shape[-2] or bc % g3:
            return False
    return True


def _gemv_chunk(x, wv, s, *, int4: bool, group: int):
    """(M, K) @ chunk -> (M, bc) f32, scales applied."""
    if int4:
        w4 = pltpu.bitcast(wv, jnp.int4)
        if group:
            w = _scale_rows(w4.astype(jnp.float32), s.astype(jnp.float32),
                            group).astype(x.dtype)
            return jnp.dot(x, w, preferred_element_type=jnp.float32)
        acc = jnp.dot(x, w4.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        return acc * s.astype(jnp.float32)
    acc = jnp.dot(x, wv.astype(x.dtype), preferred_element_type=jnp.float32)
    return acc * s.astype(jnp.float32)


def _kernel(x_ref, w1_ref, s1_ref, w2_ref, s2_ref, w3_ref, s3_ref, *rest,
            chunks: int, rows3: int, w12_int4: bool, w3_int4: bool,
            w12_group: int, w3_group: int, has_norm: bool, norm_eps: float,
            has_res: bool):
    rest = list(rest)
    n_ref = rest.pop(0) if has_norm else None
    r_ref = rest.pop(0) if has_res else None
    o_ref, w1b, w2b, w3b, sem = rest

    def dma(widx, w_ref, buf, c):
        if w_ref.ndim == 3:
            src = w_ref.at[c]
        else:
            src = w_ref.at[pl.ds(c * rows3, rows3), :]
        return pltpu.make_async_copy(src, buf.at[c % _NBUF],
                                     sem.at[widx, c % _NBUF])

    def start(c):
        dma(0, w1_ref, w1b, c).start()
        dma(1, w2_ref, w2b, c).start()
        dma(2, w3_ref, w3b, c).start()

    for c in range(min(_NBUF - 1, chunks)):
        start(c)

    x = x_ref[:]
    if has_norm:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        x = (xf * jax.lax.rsqrt(var + norm_eps)
             * n_ref[:].astype(jnp.float32)).astype(x.dtype)

    bc = w1b.shape[-1]
    acc = jnp.zeros((x.shape[0], o_ref.shape[-1]), jnp.float32)
    for c in range(chunks):
        dma(0, w1_ref, w1b, c).wait()
        dma(1, w2_ref, w2b, c).wait()
        sl = slice(c * bc, (c + 1) * bc)
        a = _gemv_chunk(x, w1b[c % _NBUF], s1_ref[:, sl],
                        int4=w12_int4, group=w12_group)
        b = _gemv_chunk(x, w2b[c % _NBUF], s2_ref[:, sl],
                        int4=w12_int4, group=w12_group)
        h = (jax.nn.silu(a) * b).astype(x.dtype)
        dma(2, w3_ref, w3b, c).wait()
        if c + _NBUF - 1 < chunks:
            start(c + _NBUF - 1)
        wv3 = w3b[c % _NBUF]
        if w3_int4:
            w4 = pltpu.bitcast(wv3, jnp.int4)
            if w3_group:
                # s3 is (chunks, bc/group, N): leading-axis indexing only
                # (sublane-offset slicing at non-8-multiples is the Mosaic
                # trap the grid kernel hit — commit 3998546)
                s3 = s3_ref[c].astype(jnp.float32)
                w3w = _scale_rows(w4.astype(jnp.float32), s3,
                                  w3_group).astype(x.dtype)
            else:
                w3w = w4.astype(x.dtype)  # (1, N) scale at final write
            acc = acc + jnp.dot(h, w3w, preferred_element_type=jnp.float32)
        else:
            acc = acc + jnp.dot(h, wv3.astype(x.dtype),
                                preferred_element_type=jnp.float32)

    out = acc if w3_group else acc * s3_ref[:].astype(jnp.float32)
    if has_res:
        out = out + r_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def fused_swiglu_dma(
    x: jax.Array, w1, w2, w3, *,
    norm_w: "jax.Array | None" = None,
    norm_eps: float = 1e-5,
    residual: "jax.Array | None" = None,
) -> jax.Array:
    """(..., K) -> (..., N); see module docstring. Callers must have
    checked `can_fuse_dma`."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    w12_int4 = isinstance(w1, (QuantizedLinearI4, QuantizedLinearI4G))
    w3_int4 = isinstance(w3, (QuantizedLinearI4, QuantizedLinearI4G))
    w12_group = (k // w1.scale.shape[-2]
                 if isinstance(w1, QuantizedLinearI4G) else 0)
    i = w1.scale.shape[-1]
    n = w3.scale.shape[-1]
    w3_group = (i // w3.scale.shape[-2]
                if isinstance(w3, QuantizedLinearI4G) else 0)
    bc = w1.values.shape[2]
    chunks = i // bc
    kw = w1.values.shape[1]
    rows3 = (bc // 2) if w3_int4 else bc

    s1 = w1.scale if w12_group else w1.scale.reshape(1, i)
    s2 = w2.scale if w12_group else w2.scale.reshape(1, i)
    s3 = (w3.scale.reshape(chunks, bc // w3_group, n) if w3_group
          else w3.scale.reshape(1, n))

    operands = [x2, w1.values, s1, w2.values, s2, w3.values, s3]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if norm_w is not None:
        operands.append(norm_w.reshape(1, k))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if residual is not None:
        operands.append(residual.reshape(m, n))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _kernel, chunks=chunks, rows3=rows3, w12_int4=w12_int4,
        w3_int4=w3_int4, w12_group=w12_group, w3_group=w3_group,
        has_norm=norm_w is not None, norm_eps=norm_eps,
        has_res=residual is not None)
    out = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, kw, bc), jnp.int8),
            pltpu.VMEM((_NBUF, kw, bc), jnp.int8),
            pltpu.VMEM((_NBUF, rows3, n), jnp.int8),
            pltpu.SemaphoreType.DMA((3, _NBUF)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * m * k * i,
            bytes_accessed=2 * kw * i + rows3 * chunks * n,
            transcendentals=m * i,
        ),
    )(*operands)
    return out.reshape(*lead, n)
