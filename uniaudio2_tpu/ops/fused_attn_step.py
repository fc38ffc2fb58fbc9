"""Fused single-token attention decode step (Pallas, TPU) — EXPERIMENTAL,
off by default (`UA2_FUSED_ATTN_STEP=1` to enable).

One kernel per transformer layer per decode step replaces the composed
rmsnorm -> quantized-QKV matmul -> RoPE -> KV-cache write -> masked GQA
attention chain of `models/gpt.py::decode_step`; the output projection
stays on the (already chunked) quantized-matmul kernel. At batch 1 the
composed chain is latency-bound: each step dispatches ~10 kernels whose
work is microseconds (profiling: the 4-layer local decoder costs
2.4 ms/frame against a 1.2 ms weight-streaming roofline; the 33-layer
backbone step 3.2 ms against 2.0 ms — scripts/profile_frame_parts.py).
Fusing collapses a layer's decode step to 3 kernels (this one + proj
matmul + fused SwiGLU) and keeps every intermediate in VMEM.

Measured verdict so far (scripts/tpu_fused_attn_smoke.py, v5e): numerics
match (rel err ~1%, bf16 rounding), but the per-group attention-loop
variant ran ~8% SLOWER than the composed chain (backbone 180 vs 166
us/step) — the in-kernel small-matmul attention does not beat XLA's
batched einsums, i.e. the composed chain's cost is not primarily kernel
launch overhead. A batched-dot_general variant is in-tree (correct under
interpret mode) but its Mosaic compile hung the remote TPU toolchain
twice, so it stays opt-in until revalidated on a local chip. Keep OFF in
production.

Scope (gated by `can_fuse_step`):
  * batch 1, one new token (the compiled while-loop serving path);
  * K-split packed int4 QKV weights, per-channel (`QuantizedLinear4`) or
    group-wise (`QuantizedLinear4G`) scales — the int4/int4all serving
    configs. (int8 QKV exceeds the VMEM budget at backbone shapes);
  * no sliding window / softcapping / key_valid (shipped configs);
  * packed QKV + both KV cache blocks resident in VMEM (~9 MB at the
    3072d backbone shapes, within the ~16 MB of a v5e core). The int4 is
    unpacked to bf16 in 512-column chunks so the transient stays ~3 MB
    (a full unpack would add 31 MB and OOM scoped VMEM).

The KV cache blocks are input/output-aliased: the kernel writes the new
K/V row at ``pos`` in place and the caller receives the updated cache
without a copy.

Reference for the math being fused: `lit_model.py:352-532` (attention),
`ops/attention.py::decode_attention`, `ops/rope.py::apply_rope`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uniaudio2_tpu.ops.quant import (
    QuantizedLinear4, QuantizedLinear4G, _scale_rows, _unpack4,
)

_CHUNK_N = 512
_VMEM_LIMIT = 14 * 2 ** 20  # full resident-set budget (16 MB scoped - slack)


def _q_matmul_chunked(x, vals_ref, scale_ref, group: int):
    """(1, K) @ K-split packed int4 (K/2, N) -> (1, N) f32, unpacking the
    weight in column chunks so the bf16 transient stays small."""
    k2, n = vals_ref.shape
    outs = []
    for c0 in range(0, n, _CHUNK_N):
        c1 = min(c0 + _CHUNK_N, n)
        block = vals_ref[:, c0:c1]
        if group:
            lo, hi = _unpack4(block, jnp.float32)
            g2 = k2 // group
            s = scale_ref[:, c0:c1].astype(jnp.float32)   # (2*g2, nc)
            lo = _scale_rows(lo, s[:g2], group).astype(x.dtype)
            hi = _scale_rows(hi, s[g2:], group).astype(x.dtype)
            acc = jnp.dot(x[:, :k2], lo, preferred_element_type=jnp.float32)
            acc += jnp.dot(x[:, k2:], hi, preferred_element_type=jnp.float32)
        else:
            lo, hi = _unpack4(block, x.dtype)
            acc = jnp.dot(x[:, :k2], lo, preferred_element_type=jnp.float32)
            acc += jnp.dot(x[:, k2:], hi, preferred_element_type=jnp.float32)
            acc = acc * scale_ref[:, c0:c1].astype(jnp.float32)
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


def _kernel(
    x_ref, n1_ref, qkv_ref, qkv_s_ref, cos_ref, sin_ref, pos_ref,
    k_ref, v_ref,
    attn_ref, k_out_ref, v_out_ref,
    *, h: int, g: int, hd: int, eps: float, scale: float, qkv_group: int,
):
    pos = pos_ref[0]
    x = x_ref[:]                                   # (1, D)
    xf = x.astype(jnp.float32)
    # RMSNorm (ops/norms.py::rms_norm)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    hn = (xf * jax.lax.rsqrt(var + eps)
          * n1_ref[:].astype(jnp.float32)).astype(x.dtype)

    qkv = _q_matmul_chunked(hn, qkv_ref, qkv_s_ref, qkv_group)
    q = qkv[:, : h * hd].reshape(h, hd)
    k = qkv[:, h * hd : (h + g) * hd].reshape(g, hd)
    v = qkv[:, (h + g) * hd :].reshape(g, hd)

    # RoPE, half-split convention (ops/rope.py::apply_rope)
    cos = cos_ref[:].astype(jnp.float32)           # (1, hd)
    sin = sin_ref[:].astype(jnp.float32)
    half = hd // 2

    def rope(t):
        rot = jnp.concatenate([-t[:, half:], t[:, :half]], axis=-1)
        return t * cos + rot * sin

    q = rope(q)
    k = rope(k)

    # cache write at pos (aliased in-place)
    kc = k_ref[:]                                   # (G, S, hd)
    vc = v_ref[:]
    s_len = kc.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, s_len, 1), 1)
    sel = row == pos
    kc = jnp.where(sel, k.astype(kc.dtype)[:, None, :], kc)
    vc = jnp.where(sel, v.astype(vc.dtype)[:, None, :], vc)
    k_out_ref[:] = kc  # aliased with k_ref: in-place cache update
    v_out_ref[:] = vc

    # masked GQA attention over the cache (ops/attention.py::decode_attention)
    # — one batched dot_general over the group axis (a per-group loop of
    # (pq, hd) x (hd, S) matmuls measured ~8x slower: tiny-M MXU passes)
    kcf = kc.astype(x.dtype)
    vcf = vc.astype(x.dtype)
    qg3 = q.astype(x.dtype).reshape(g, h // g, hd)  # (G, pq, hd)
    key_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s_len), 2)
    valid = key_idx <= pos                          # (1, 1, S)
    scores = jax.lax.dot_general(
        qg3, kcf, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                       # (G, pq, S)
    scores = jnp.where(valid, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    attn = jax.lax.dot_general(
        p.astype(x.dtype), vcf, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                               # (G, pq, hd) f32
    attn_ref[:] = attn.reshape(1, h * hd).astype(attn_ref.dtype)


def can_fuse_step(layer, x: jax.Array, *, window=None, softcap=None,
                  key_valid=None, k_cache=None, v_cache=None,
                  rope_width=None, head_size=None) -> bool:
    """The serving gate: batch-1 single-token int4 decode, no exotic
    attention options, and the kernel's FULL resident set — packed QKV,
    both K/V cache blocks, the chunked unpack transient, and activations —
    within the VMEM budget (a compile-time VMEM OOM wedges the remote TPU
    toolchain; see the module docstring). ``rope_width``/``head_size``
    decline partial-rotary configs (rotary_percentage < 1): the kernel
    applies rope across the full head, so a narrower cos table must fall
    back to the composed path instead of mis-rotating (ADVICE r2)."""
    if x.ndim != 3 or x.shape[0] != 1 or x.shape[1] != 1:
        return False
    if window is not None or softcap is not None or key_valid is not None:
        return False
    if rope_width is not None and head_size is not None \
            and rope_width != head_size:
        return False
    qkv_w = layer["qkv_w"]
    if not isinstance(qkv_w, (QuantizedLinear4, QuantizedLinear4G)):
        return False
    d = x.shape[-1]
    # lane padding of the packed width would misalign the q/k/v split
    if qkv_w.values.shape[-2] != d // 2:
        return False
    if qkv_w.values.shape[-1] != qkv_w.scale.shape[-1]:
        return False
    resident = qkv_w.values.size + 4 * qkv_w.scale.size
    if k_cache is not None:
        cache_bytes = k_cache.dtype.itemsize * k_cache.size
        resident += 2 * cache_bytes            # k and v blocks
    else:
        return False                           # unknown cache size: refuse
    # chunked-unpack transient (bf16 lo+hi of a _CHUNK_N-column slice) +
    # the f32 qkv row + small activations
    resident += 2 * (d // 2) * _CHUNK_N * 2
    resident += 4 * qkv_w.scale.shape[-1] + 64 * 1024
    return resident <= _VMEM_LIMIT


def fused_attn_decode_step(
    layer,
    x: jax.Array,            # (1, 1, D)
    cos: jax.Array,          # (1, hd)
    sin: jax.Array,
    k_cache: jax.Array,      # (1, G, S, hd)
    v_cache: jax.Array,
    pos: jax.Array,          # i32 scalar
    *,
    n_head: int,
    n_query_groups: int,
    head_size: int,
    norm_eps: float,
    scale: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (attention output pre-projection (1, 1, H*hd),
    new_k (1, G, S, hd), new_v). The caller applies the output projection
    (quantized matmul) and the residual add."""
    d = x.shape[-1]
    qkv_w = layer["qkv_w"]
    qkv_group = (d // qkv_w.scale.shape[-2]
                 if isinstance(qkv_w, QuantizedLinear4G) else 0)
    qkv_s = qkv_w.scale if qkv_group else qkv_w.scale.reshape(1, -1)

    g, s_len, hd = k_cache.shape[1], k_cache.shape[2], k_cache.shape[3]
    kernel = functools.partial(
        _kernel, h=n_head, g=n_query_groups, hd=head_size,
        eps=norm_eps, scale=scale, qkv_group=qkv_group,
    )
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    attn, k_new, v_new = pl.pallas_call(
        kernel,
        in_specs=[
            vspec(),                                   # x
            vspec(),                                   # norm1
            vspec(), vspec(),                          # qkv vals/scale
            vspec(), vspec(),                          # cos/sin
            pl.BlockSpec(memory_space=pltpu.SMEM),     # pos
            vspec(), vspec(),                          # k, v cache
        ],
        out_specs=(vspec(), vspec(), vspec()),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_head * head_size), x.dtype),
            jax.ShapeDtypeStruct(k_cache.shape[1:], k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape[1:], v_cache.dtype),
        ),
        input_output_aliases={7: 1, 8: 2},  # k/v caches update in place
        cost_estimate=pl.CostEstimate(
            flops=2 * d * qkv_w.scale.shape[-1]
            + 4 * n_head * head_size * s_len,
            bytes_accessed=qkv_w.values.size + 2 * g * s_len * hd * 2,
            transcendentals=n_head * s_len,
        ),
    )(
        x.reshape(1, d), layer["norm1_w"].reshape(1, d),
        qkv_w.values, qkv_s,
        cos.reshape(1, hd), sin.reshape(1, hd),
        pos.reshape(1).astype(jnp.int32),
        k_cache[0], v_cache[0],
    )
    return attn.reshape(1, 1, n_head * head_size), k_new[None], v_new[None]
