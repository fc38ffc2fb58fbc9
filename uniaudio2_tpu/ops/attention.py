"""Grouped-query attention (GQA) primitives.

Replaces the reference's SDPA call (`lit_model.py:502-532`). Two shapes of the
same math:

* ``causal_attention`` — full-sequence (prefill / training): queries and keys
  have the same length, plain causal (optionally prefix-LM) masking. Computed
  as grouped einsums so the MXU sees large batched matmuls; no
  ``repeat_interleave`` materialisation of KV heads (the reference expands KV
  to all query heads, `lit_model.py:478-481` — on TPU we keep the group axis
  and let the contraction broadcast instead).
* ``decode_attention`` — incremental: T query steps against a static-length
  cache, masked by position (replaces the `input_pos_maxp1` slicing).

Softmax is computed in float32 regardless of activation dtype.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def _group_query_heads(q: jax.Array, n_groups: int) -> jax.Array:
    """(B, H, T, hd) -> (B, G, H/G, T, hd)."""
    b, h, t, hd = q.shape
    return q.reshape(b, n_groups, h // n_groups, t, hd)


def _softcap(scores: jax.Array, cap: Optional[float]) -> jax.Array:
    """Gemma-style logit softcapping (reference `lit_model.py:810-811`)."""
    if cap is None:
        return scores
    return jnp.tanh(scores / cap) * cap


def causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    extra_mask: Optional[jax.Array] = None,
    logit_softcap: Optional[float] = None,
    window: Optional[jax.Array] = None,
) -> jax.Array:
    """Full-sequence causal GQA.

    Args:
        q: (B, H, T, hd); k, v: (B, G, T, hd) with H % G == 0.
        extra_mask: optional (B, T, T) or (T, T) boolean, True = attend.
            Combined with the causal mask (prefix-LM support,
            reference `llm_utils/train_utils.py:246-286`).
        logit_softcap: optional Gemma-style tanh cap applied to scores before
            masking (reference `lit_model.py:519-521`).
        window: optional sliding-window size (scalar; may be traced so a
            scanned layer stack can switch windows per layer — window >= T
            degenerates to full causal). Keys with q_pos - k_pos >= window
            are masked (reference `lit_model.py:483-500`).
    Returns:
        (B, T, H*hd)
    """
    b, h, t, hd = q.shape
    g = k.shape[1]
    if scale is None:
        scale = 1.0 / (hd ** 0.5)
    qg = _group_query_heads(q, g)  # (B, G, P, T, hd)
    scores = jnp.einsum(
        "bgpth,bgsh->bgpts", qg, k, preferred_element_type=jnp.float32
    ) * scale
    scores = _softcap(scores, logit_softcap)
    causal = jnp.tril(jnp.ones((t, t), dtype=bool))
    if window is not None:
        idx = jnp.arange(t, dtype=jnp.int32)
        causal = jnp.logical_and(
            causal, idx[:, None] - idx[None, :] < window
        )
    if extra_mask is None:
        mask = causal  # broadcasts over (B, G, P, T, S)
    elif extra_mask.ndim == 2:
        mask = jnp.logical_and(causal, extra_mask)
    else:  # (B, T, T) -> (B, 1, 1, T, S)
        mask = jnp.logical_and(causal[None], extra_mask)[:, None, None]
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bgpts,bgsh->bgpth", probs, v)
    return out.reshape(b, h, t, hd).transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def _attend_prefix(
    qg: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    q_positions: jax.Array,
    scale: float,
    key_valid: Optional[jax.Array],
    logit_softcap: Optional[float],
    window: Optional[jax.Array],
) -> jax.Array:
    """Dense masked attention of grouped queries against the (possibly
    prefix-sliced) cache. Shared by the full-cache and level-switched
    paths of `decode_attention`."""
    s_max = k_cache.shape[2]
    scores = jnp.einsum(
        "bgpth,bgsh->bgpts", qg, k_cache, preferred_element_type=jnp.float32
    ) * scale
    scores = _softcap(scores, logit_softcap)
    key_idx = jnp.arange(s_max, dtype=jnp.int32)
    mask = key_idx[None, :] <= q_positions[:, None]  # (T, S)
    if window is not None:
        mask = jnp.logical_and(
            mask, q_positions[:, None] - key_idx[None, :] < window
        )
    if key_valid is not None:
        mask = jnp.logical_and(
            mask[None], key_valid[:, None, :]
        )[:, None, None]  # (B, 1, 1, T, S)
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
    return jnp.einsum("bgpts,bgsh->bgpth", probs, v_cache)


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    q_positions: jax.Array,
    *,
    scale: Optional[float] = None,
    key_valid: Optional[jax.Array] = None,
    logit_softcap: Optional[float] = None,
    window: Optional[jax.Array] = None,
    prefix_levels: Optional[Tuple[int, ...]] = None,
) -> jax.Array:
    """Incremental GQA against a static-length cache.

    Args:
        q: (B, H, T, hd) — T new query steps (typically 1).
        k_cache, v_cache: (B, G, S_max, hd) — already contain the new K/V.
        q_positions: (T,) int32 absolute positions of the query steps.
        key_valid: optional (B, S_max) bool — False marks cache slots that
            must never be attended (per-row prompt padding in batched
            decoding, where shorter rows carry garbage K/V between their true
            length and the shared bucket length).
        logit_softcap / window: see `causal_attention`.
        prefix_levels: optional ascending static prefix lengths ending at
            S_max. When given, a `lax.switch` picks the smallest level
            covering the last query position and attends only over that
            static prefix slice — cache slots past the fill line are never
            READ, so early-decode attention traffic scales with the filled
            prefix instead of the full cache budget (the TPU-shaped
            equivalent of paged-KV reads; the write side is unchanged).
            Token-identical to the full read: the masked tail contributes
            exact zeros.
    Returns:
        (B, T, H*hd)
    """
    b, h, t, hd = q.shape
    g, s_max = k_cache.shape[1], k_cache.shape[2]
    if scale is None:
        scale = 1.0 / (hd ** 0.5)
    qg = _group_query_heads(q, g)
    if prefix_levels is not None and len(prefix_levels) > 1:
        assert prefix_levels[-1] == s_max and list(prefix_levels) == sorted(
            set(prefix_levels)
        ), f"bad prefix levels {prefix_levels} for cache length {s_max}"
        need = q_positions[-1] + 1  # cache slots [0, need) may be attended
        sel = jnp.searchsorted(
            jnp.asarray(prefix_levels, jnp.int32), need, side="left"
        )

        def make_branch(lvl: int):
            def branch(qg, k_cache, v_cache, q_positions, key_valid):
                return _attend_prefix(
                    qg, k_cache[:, :, :lvl], v_cache[:, :, :lvl],
                    q_positions, scale,
                    None if key_valid is None else key_valid[:, :lvl],
                    logit_softcap, window,
                )
            return branch

        out = jax.lax.switch(
            sel, [make_branch(l) for l in prefix_levels],
            qg, k_cache, v_cache, q_positions, key_valid,
        )
    else:
        out = _attend_prefix(qg, k_cache, v_cache, q_positions, scale,
                             key_valid, logit_softcap, window)
    return out.reshape(b, h, t, hd).transpose(0, 2, 1, 3).reshape(b, t, h * hd)
