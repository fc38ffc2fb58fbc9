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
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import GPTConfig


class KVCache(NamedTuple):
    """``k``/``v``: (n_layer, batch, n_query_groups, max_seq, head_size),
    or a LIST of per-layer (batch, n_query_groups, max_seq, head_size)
    buffers in the unrolled serving layout."""

    k: "jax.Array | list"
    v: "jax.Array | list"

    @property
    def max_seq(self) -> int:
        if isinstance(self.k, list):
            return self.k[0].shape[2]
        return self.k.shape[3]


def init_cache(
    cfg: GPTConfig, batch: int, max_seq: int, dtype=jnp.bfloat16,
    as_lists: bool = False,
) -> KVCache:
    if as_lists:
        shape = (batch, cfg.n_query_groups, max_seq, cfg.head_size)
        return KVCache(
            k=[jnp.zeros(shape, dtype) for _ in range(cfg.n_layer)],
            v=[jnp.zeros(shape, dtype) for _ in range(cfg.n_layer)],
        )
    shape = (cfg.n_layer, batch, cfg.n_query_groups, max_seq, cfg.head_size)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def unstack_cache(cache: KVCache) -> KVCache:
    """Stacked (L, B, G, S, hd) -> per-layer list buffers (no-op if
    already lists)."""
    if isinstance(cache.k, list):
        return cache
    n = cache.k.shape[0]
    return KVCache(k=[cache.k[i] for i in range(n)],
                   v=[cache.v[i] for i in range(n)])


def update_layer(
    k_layer: jax.Array,
    v_layer: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    pos: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Write ``k_new``/``v_new`` of shape (B, G, T, hd) at positions
    [pos, pos+T) of one layer's (B, G, S_max, hd) buffers."""
    zero = jnp.int32(0)
    idx = (zero, zero, jnp.asarray(pos, jnp.int32), zero)
    k_layer = jax.lax.dynamic_update_slice(k_layer, k_new.astype(k_layer.dtype), idx)
    v_layer = jax.lax.dynamic_update_slice(v_layer, v_new.astype(v_layer.dtype), idx)
    return k_layer, v_layer
