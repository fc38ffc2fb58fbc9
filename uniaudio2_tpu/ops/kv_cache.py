"""Static-shape KV cache as a functional pytree.

TPU-native replacement for the reference's `KVCache` module with positional
scatter-writes (`lit_model.py:814-860`) and the `input_pos_maxp1` dynamic
slice optimisation (`lit_model.py:141-145,468-471`): on TPU dynamic slices
force recompilation or copies, so instead the cache is a fixed
``(n_layer, B, G, S_max, hd)`` buffer written with `lax.dynamic_update_slice`
and attention is masked by position. Under ``jit`` with donated arguments the
update is performed in place.

Layer-stacked layout (leading ``n_layer`` axis) so the transformer can
`lax.scan` over layers, consuming and re-emitting one cache slice per step.

Serving-time layout: ``k``/``v`` may instead be LISTS of per-layer
``(B, G, S_max, hd)`` buffers (`unstack_cache`), mirroring the unrolled
per-layer weights. With the stacked form, the unrolled decode loop's
``k_all[i]`` / ``k_all.at[i].set(...)`` pair materialises a COPY of every
layer's cache every step — invisible at batch 1 (~0.4 µs) but ~7 µs per
layer at batch 16 (~1.7 ms/frame across 65 layer units, the dominant
non-kernel cost in the batched decode profile). Per-layer buffers update
in place under donation with no slice copies.

int8 quantized layout (``QuantKV``): each cache entry stores int8 values
plus one f32 absmax scale per (batch, group, slot) — the TPU-shaped
equivalent of the int8 KV caches in GPU serving stacks, built for the
measured batch-16 attention-read floor (0.66 ms/frame at S=256, scaling
with the cache budget — docs/profile_decode_r3.md). Halves cache HBM
traffic AND doubles servable rows/context per chip. Reads dequantize
nothing: both attention contractions run natively in int8 on the MXU with
the scales commuted out of the dot (see `ops/attention.py`). Writes
quantize at `update_layer`; prefill attention itself stays exact (it
attends over the fresh bf16 K/V, only the cache copy is quantized).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import GPTConfig


class QuantKV(NamedTuple):
    """One int8-quantized cache tensor: ``q`` int8 values with the same
    layout as the bf16 cache ((..., B, G, S, hd)) and ``s`` f32 per-slot
    absmax scales ((..., B, G, S)); dequantized value = q * s[..., None].
    Scale overhead is 4/(hd) bytes/byte ≈ 3 % at hd=128."""

    q: jax.Array
    s: jax.Array


CacheEntry = Union[jax.Array, QuantKV]


class KVCache(NamedTuple):
    """``k``/``v``: (n_layer, batch, n_query_groups, max_seq, head_size),
    or a LIST of per-layer (batch, n_query_groups, max_seq, head_size)
    buffers in the unrolled serving layout. Either form may be a
    `QuantKV` (int8 values + per-slot scales) instead of a plain array."""

    k: "CacheEntry | list"
    v: "CacheEntry | list"

    @property
    def max_seq(self) -> int:
        k = self.k[0] if isinstance(self.k, list) else self.k
        if isinstance(k, QuantKV):
            k = k.q
        return k.shape[-2]


def _zeros_entry(shape, dtype) -> CacheEntry:
    if dtype == jnp.int8:
        return QuantKV(
            q=jnp.zeros(shape, jnp.int8),
            s=jnp.zeros(shape[:-1], jnp.float32),
        )
    return jnp.zeros(shape, dtype)


def init_cache(
    cfg: GPTConfig, batch: int, max_seq: int, dtype=jnp.bfloat16,
    as_lists: bool = False,
) -> KVCache:
    """``dtype=jnp.int8`` builds the quantized cache (QuantKV entries)."""
    if as_lists:
        shape = (batch, cfg.n_query_groups, max_seq, cfg.head_size)
        return KVCache(
            k=[_zeros_entry(shape, dtype) for _ in range(cfg.n_layer)],
            v=[_zeros_entry(shape, dtype) for _ in range(cfg.n_layer)],
        )
    shape = (cfg.n_layer, batch, cfg.n_query_groups, max_seq, cfg.head_size)
    return KVCache(k=_zeros_entry(shape, dtype), v=_zeros_entry(shape, dtype))


def layer_entry(stacked: CacheEntry, i: int) -> CacheEntry:
    """One layer's view of a stacked (L, ...) cache entry."""
    if isinstance(stacked, QuantKV):
        return QuantKV(stacked.q[i], stacked.s[i])
    return stacked[i]


def set_layer_entry(stacked: CacheEntry, i: int, val: CacheEntry) -> CacheEntry:
    """Write one layer back into a stacked cache entry (`.at[i].set`)."""
    if isinstance(stacked, QuantKV):
        return QuantKV(stacked.q.at[i].set(val.q), stacked.s.at[i].set(val.s))
    return stacked.at[i].set(val)


def unstack_cache(cache: KVCache) -> KVCache:
    """Stacked (L, B, G, S, hd) -> per-layer list buffers (no-op if
    already lists)."""
    if isinstance(cache.k, list):
        return cache
    n = (cache.k.q if isinstance(cache.k, QuantKV) else cache.k).shape[0]
    return KVCache(k=[layer_entry(cache.k, i) for i in range(n)],
                   v=[layer_entry(cache.v, i) for i in range(n)])


def quantize_slots(x: jax.Array) -> QuantKV:
    """(..., T, hd) values -> int8 with one absmax scale per (..., T) slot."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    q = jnp.round(xf / jnp.maximum(s, 1e-30)[..., None])
    return QuantKV(q=jnp.clip(q, -127, 127).astype(jnp.int8), s=s)


def _update_entry(
    layer: CacheEntry, new: jax.Array, pos: jax.Array
) -> CacheEntry:
    zero = jnp.int32(0)
    p = jnp.asarray(pos, jnp.int32)
    if isinstance(layer, QuantKV):
        qn = quantize_slots(new)
        return QuantKV(
            q=jax.lax.dynamic_update_slice(layer.q, qn.q, (zero, zero, p, zero)),
            s=jax.lax.dynamic_update_slice(layer.s, qn.s, (zero, zero, p)),
        )
    return jax.lax.dynamic_update_slice(
        layer, new.astype(layer.dtype), (zero, zero, p, zero)
    )


def update_layer(
    k_layer: CacheEntry,
    v_layer: CacheEntry,
    k_new: jax.Array,
    v_new: jax.Array,
    pos: jax.Array,
) -> Tuple[CacheEntry, CacheEntry]:
    """Write ``k_new``/``v_new`` of shape (B, G, T, hd) at positions
    [pos, pos+T) of one layer's (B, G, S_max, hd) buffers (quantizing at
    write when the layer is a `QuantKV`)."""
    return (_update_entry(k_layer, k_new, pos),
            _update_entry(v_layer, v_new, pos))


def _update_stacked_entry(
    stacked: CacheEntry, new: jax.Array, pos: jax.Array
) -> CacheEntry:
    zero = jnp.int32(0)
    p = jnp.asarray(pos, jnp.int32)
    if isinstance(stacked, QuantKV):
        qn = quantize_slots(new)     # all layers quantized in ONE op
        return QuantKV(
            q=jax.lax.dynamic_update_slice(
                stacked.q, qn.q, (zero, zero, zero, p, zero)),
            s=jax.lax.dynamic_update_slice(
                stacked.s, qn.s, (zero, zero, zero, p)),
        )
    return jax.lax.dynamic_update_slice(
        stacked, new.astype(stacked.dtype), (zero, zero, zero, p, zero)
    )


def update_stacked(
    k_all: CacheEntry,
    v_all: CacheEntry,
    k_new: jax.Array,
    v_new: jax.Array,
    pos: jax.Array,
) -> Tuple[CacheEntry, CacheEntry]:
    """Coalesced deferred write: ``k_new``/``v_new`` of shape
    (L, B, G, T, hd) — one frame's fresh K/V for EVERY layer — written at
    slots [pos, pos+T) of the stacked (L, B, G, S_max, hd) cache in ONE
    `dynamic_update_slice` per field (2 writes for a bf16 cache, 4 for a
    QuantKV, instead of 2/4 PER LAYER). This is the write half of the
    deferred-KV decode path (`gpt.decode_step(kv_write="deferred")`): the
    r3 batch-16 anatomy charged ~0.3 ms/frame of (B, G, pos) scatter
    writes plus small-async-slice glue to the per-layer writes
    (docs/profile_decode_r3.md:151-154), and the int8 cache doubled the
    per-layer write count (values + scales)."""
    return (_update_stacked_entry(k_all, k_new, pos),
            _update_stacked_entry(v_all, v_new, pos))
