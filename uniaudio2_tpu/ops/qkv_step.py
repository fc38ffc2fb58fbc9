"""Fused QKV decode-step kernel: norm + quantized GEMV + RoPE + stream split.

One Pallas call replaces the decode hot loop's per-layer chain
``rmsnorm -> qkv matmul -> split(q,k,v) -> head reshape -> rope(q) ->
rope(k)``: the grid walks output-column chunks (chunk-major weight storage,
contiguous DMA, exactly as `ops/quant`'s GEMV kernels), and each chunk —
which by the eligibility gate holds only whole heads of exactly one of the
three streams — is rotated in-kernel where needed and stored into a
dedicated single-block output (`q``/``k``/``v`` each use a constant index
map, so the three buffers stay VMEM-resident across the grid and are
written back once).  This removes ~6 µs of XLA glue per layer step
(split slices, head reshapes, rope rotate-half fusions — see
docs/profile_decode_r3.md) while streaming the same weight bytes.

Attention itself stays OUTSIDE the kernel: the r2/r3 fused-attention-step
experiment measured net-slower (Mosaic small-matmul attention forfeits more
than the saved launches; negative result in docs/profile_decode_r3.md).

Reference semantics: fused-QKV projection + rope of
`/root/reference/llm_models/lit_model.py:352-432,778-807` at T==1.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uniaudio2_tpu.ops.quant import (
    QuantizedLinear, QuantizedLinear4, QuantizedLinear4G, QuantizedLinearI4,
    QuantizedLinearI4G, _scale_rows, _unpack4,
)

QKVWeight = Union[QuantizedLinear, QuantizedLinear4, QuantizedLinear4G,
                  QuantizedLinearI4, QuantizedLinearI4G]


def enabled() -> bool:
    """Env gate: ``UA2_QKV_FUSED`` (default ON; set 0 to restore the
    composed chain)."""
    return os.environ.get("UA2_QKV_FUSED", "1") != "0"


def _rope_chunk(y: jax.Array, cos: jax.Array, sin: jax.Array,
                hd: int) -> jax.Array:
    """Rotate a (B, bc) f32 chunk holding bc//hd whole heads: per head,
    ``out = y*cos + cat(-y2, y1)*sin`` (half-split convention, matching
    `ops/rope.apply_rope`). ``cos``/``sin`` are (1, bc), head-tiled."""
    half = hd // 2
    parts = []
    for i in range(y.shape[-1] // hd):
        y1 = y[:, i * hd: i * hd + half]
        y2 = y[:, i * hd + half: (i + 1) * hd]
        parts.append(-y2)
        parts.append(y1)
    rot = jnp.concatenate(parts, axis=-1)
    return y * cos + rot * sin


def _kernel(x_ref, w_ref, s_ref, n_ref, cos_ref, sin_ref,
            q_ref, k_ref, v_ref, *, mode: str, group: int, hd: int,
            q_chunks: int, k_chunks: int, v_chunks: int, bc: int,
            norm_eps: float):
    c = pl.program_id(0)
    xf = x_ref[:].astype(jnp.float32)                 # (B, K)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    x = (xf * jax.lax.rsqrt(var + norm_eps)
         * n_ref[:].astype(jnp.float32)).astype(x_ref.dtype)

    wv = w_ref[:]
    if wv.ndim == 3:                                  # chunk-major (1, kw, bc)
        wv = wv[0]
    if mode == "int8":
        acc = jnp.dot(x, wv.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        y = acc * s_ref[:].astype(jnp.float32)
    elif mode == "int4i":
        w4 = pltpu.bitcast(wv, jnp.int4)              # (K, bc)
        acc = jnp.dot(x, w4.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        y = acc * s_ref[:].astype(jnp.float32)
    elif mode == "int4ig":
        w4 = pltpu.bitcast(wv, jnp.int4)
        w = _scale_rows(w4.astype(jnp.float32),
                        s_ref[:].astype(jnp.float32), group).astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    elif mode == "int4":
        lo, hi = _unpack4(wv, x.dtype)                # (K/2, bc) each
        k2 = lo.shape[0]
        acc = jnp.dot(x[:, :k2], lo, preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, k2:], hi, preferred_element_type=jnp.float32)
        y = acc * s_ref[:].astype(jnp.float32)
    else:                                             # grouped int4
        lo, hi = _unpack4(wv, jnp.float32)
        k2 = lo.shape[0]
        g2 = k2 // group
        s = s_ref[:].astype(jnp.float32)              # (2*g2, bc)
        lo = _scale_rows(lo, s[:g2], group).astype(x.dtype)
        hi = _scale_rows(hi, s[g2:], group).astype(x.dtype)
        y = jnp.dot(x[:, :k2], lo, preferred_element_type=jnp.float32)
        y += jnp.dot(x[:, k2:], hi, preferred_element_type=jnp.float32)

    roped = _rope_chunk(y, cos_ref[:].astype(jnp.float32),
                        sin_ref[:].astype(jnp.float32), hd)
    # Unrolled static-chunk stores into the three resident output blocks
    # (each output's index map is constant -> one writeback at grid end).
    for ci in range(q_chunks):
        @pl.when(c == ci)
        def _(ci=ci):
            q_ref[:, ci * bc:(ci + 1) * bc] = roped.astype(q_ref.dtype)
    for ci in range(k_chunks):
        @pl.when(c == q_chunks + ci)
        def _(ci=ci):
            k_ref[:, ci * bc:(ci + 1) * bc] = roped.astype(k_ref.dtype)
    for ci in range(v_chunks):
        @pl.when(c == q_chunks + k_chunks + ci)
        def _(ci=ci):
            v_ref[:, ci * bc:(ci + 1) * bc] = y.astype(v_ref.dtype)


def _chunk_width(w: QKVWeight, k: int, n: int) -> int:
    """The grid's output-chunk width: forced by chunk-major storage,
    otherwise the GEMV kernels' 512-wide default shrunk to divide N."""
    if w.values.ndim == 3:
        return w.values.shape[2]
    bn = min(512, n)
    while n % bn and bn > 128:
        bn //= 2
    return bn


def can_fuse(w, x: jax.Array, n_head: int, n_groups: int,
             head_size: int) -> bool:
    """Eligibility: quantized weight, single-token rows, chunk layout in
    which every chunk holds whole heads of exactly one stream."""
    if not isinstance(w, (QuantizedLinear, QuantizedLinear4,
                          QuantizedLinear4G, QuantizedLinearI4,
                          QuantizedLinearI4G)):
        return False
    if x.ndim != 2 or x.shape[0] > 128:
        return False
    k = x.shape[-1]
    if k % 256:
        return False
    n = (n_head + 2 * n_groups) * head_size
    if w.scale.shape[-1] != n:
        return False
    stored = (w.values.shape[0] * w.values.shape[2]
              if w.values.ndim == 3 else w.values.shape[-1])
    if stored != n:
        return False                                  # lane-padded storage
    bc = _chunk_width(w, k, n)
    if n % bc or bc % head_size:
        return False
    if (n_head * head_size) % bc or (n_groups * head_size) % bc:
        return False                                  # stream straddles chunk
    if isinstance(w, QuantizedLinear4G):
        group = k // w.scale.shape[-2]
        if (k // 2) % group:
            return False
    if isinstance(w, QuantizedLinearI4G):
        if k % w.scale.shape[-2]:
            return False
    return True


def qkv_rope_step(
    x: jax.Array,
    w: QKVWeight,
    norm_w: jax.Array,
    norm_eps: float,
    cos: jax.Array,
    sin: jax.Array,
    n_head: int,
    n_groups: int,
    head_size: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """``x`` (B, K) un-normed activations -> roped ``q`` (B, H*hd),
    roped ``k`` (B, G*hd), raw ``v`` (B, G*hd). ``cos``/``sin`` are the
    (hd,) rope rows for the (shared) step position."""
    b, k = x.shape
    hd = head_size
    n = (n_head + 2 * n_groups) * hd
    bc = _chunk_width(w, k, n)
    q_cols = n_head * hd
    kv_cols = n_groups * hd
    q_chunks, k_chunks, v_chunks = q_cols // bc, kv_cols // bc, kv_cols // bc

    if isinstance(w, QuantizedLinearI4G):
        mode = "int4ig"
        group = k // w.scale.shape[-2]
        kw = k // 2
        s = w.scale
        s_rows = s.shape[0]
    elif isinstance(w, QuantizedLinearI4):
        mode, group, kw = "int4i", 0, k // 2
        s = w.scale.reshape(1, n)
        s_rows = 1
    elif isinstance(w, QuantizedLinear4G):
        mode = "int4g"
        group = k // w.scale.shape[-2]
        kw = k // 2
        s = w.scale
        s_rows = s.shape[0]
    elif isinstance(w, QuantizedLinear4):
        mode, group, kw = "int4", 0, k // 2
        s = w.scale.reshape(1, n)
        s_rows = 1
    else:
        mode, group, kw = "int8", 0, k
        s = w.scale.reshape(1, n)
        s_rows = 1

    tiles = bc // hd
    cos_t = jnp.tile(cos.reshape(1, hd), (1, tiles)).astype(jnp.float32)
    sin_t = jnp.tile(sin.reshape(1, hd), (1, tiles)).astype(jnp.float32)

    wspec = (pl.BlockSpec((1, kw, bc), lambda c: (c, 0, 0),
                          memory_space=pltpu.VMEM)
             if w.values.ndim == 3 else
             pl.BlockSpec((kw, bc), lambda c: (0, c),
                          memory_space=pltpu.VMEM))
    kernel = functools.partial(
        _kernel, mode=mode, group=group, hd=hd, q_chunks=q_chunks,
        k_chunks=k_chunks, v_chunks=v_chunks, bc=bc, norm_eps=norm_eps)
    q, k_out, v_out = pl.pallas_call(
        kernel,
        grid=(n // bc,),
        in_specs=[
            pl.BlockSpec((b, k), lambda c: (0, 0), memory_space=pltpu.VMEM),
            wspec,
            pl.BlockSpec((s_rows, bc), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, q_cols), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, kv_cols), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, kv_cols), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, q_cols), x.dtype),
            jax.ShapeDtypeStruct((b, kv_cols), x.dtype),
            jax.ShapeDtypeStruct((b, kv_cols), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=kw * n + b * k * 2 + b * n * 2,
            transcendentals=0,
        ),
    )(x, w.values, s, norm_w.reshape(1, k), cos_t, sin_t)
    return q, k_out, v_out
