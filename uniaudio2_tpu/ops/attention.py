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

from uniaudio2_tpu.ops.kv_cache import QuantKV

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


def _decode_mask(
    s_max: int,
    q_positions: jax.Array,
    key_valid: Optional[jax.Array],
    window: Optional[jax.Array],
    exclusive: bool = False,
) -> jax.Array:
    """Position mask for cache attention: (T, S) — or (B, 1, 1, T, S) when a
    per-row ``key_valid`` is given. ``exclusive`` masks the query's own
    slot too (deferred-KV decode: the current token is not in the cache
    yet, its score comes from the fresh K/V instead)."""
    key_idx = jnp.arange(s_max, dtype=jnp.int32)
    if exclusive:
        mask = key_idx[None, :] < q_positions[:, None]   # (T, S)
    else:
        mask = key_idx[None, :] <= q_positions[:, None]  # (T, S)
    if window is not None:
        mask = jnp.logical_and(
            mask, q_positions[:, None] - key_idx[None, :] < window
        )
    if key_valid is not None:
        mask = jnp.logical_and(
            mask[None], key_valid[:, None, :]
        )[:, None, None]  # (B, 1, 1, T, S)
    return mask


def _self_scores(
    qg: jax.Array, k_fresh: jax.Array, scale: float
) -> jax.Array:
    """(B, G, P, T, 1) scores of each query step against ITS OWN fresh key
    (deferred-KV decode, T == 1: the current token attends itself through
    the un-written bf16 K rather than the cache slot)."""
    sc = jnp.einsum(
        "bgpth,bgth->bgpt", qg, k_fresh,
        preferred_element_type=jnp.float32,
    ) * scale
    return sc[..., None]


def _attend_prefix(
    qg: jax.Array,
    k_cache,
    v_cache,
    q_positions: jax.Array,
    scale: float,
    key_valid: Optional[jax.Array],
    logit_softcap: Optional[float],
    window: Optional[jax.Array],
    fresh_kv=None,
) -> jax.Array:
    """Dense masked attention of grouped queries against the (possibly
    prefix-sliced) cache. Shared by the full-cache and level-switched
    paths of `decode_attention`. ``k_cache``/``v_cache`` may be `QuantKV`
    (int8 cache) — see `_attend_prefix_quant`. With ``fresh_kv`` (deferred
    cache writes) the cache holds only positions < pos; the current
    token's (B, G, T, hd) K/V arrive fresh and contribute one extra
    softmax column."""
    if isinstance(k_cache, QuantKV):
        return _attend_prefix_quant(
            qg, k_cache, v_cache, q_positions, scale, key_valid,
            logit_softcap, window, fresh_kv,
        )
    s_max = k_cache.shape[2]
    scores = jnp.einsum(
        "bgpth,bgsh->bgpts", qg, k_cache, preferred_element_type=jnp.float32
    ) * scale
    mask = _decode_mask(s_max, q_positions, key_valid, window,
                        exclusive=fresh_kv is not None)
    if fresh_kv is None:
        scores = _softcap(scores, logit_softcap)
        scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
        return jnp.einsum("bgpts,bgsh->bgpth", probs, v_cache)
    k_f, v_f = fresh_kv
    self_sc = _self_scores(qg, k_f.astype(qg.dtype), scale)
    scores = jnp.concatenate([scores, self_sc], axis=-1)
    scores = _softcap(scores, logit_softcap)
    ones = jnp.ones(mask.shape[:-1] + (1,), bool)
    scores = jnp.where(jnp.concatenate([mask, ones], axis=-1),
                       scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bgpts,bgsh->bgpth",
                     probs[..., :s_max].astype(v_cache.dtype), v_cache)
    # each query step attends only its OWN fresh value (T == 1 upstream)
    return out + (probs[..., s_max:] * v_f[:, :, None].astype(probs.dtype)
                  ).astype(out.dtype)


def _attend_prefix_quant(
    qg: jax.Array,
    k_cache: QuantKV,
    v_cache: QuantKV,
    q_positions: jax.Array,
    scale: float,
    key_valid: Optional[jax.Array],
    logit_softcap: Optional[float],
    window: Optional[jax.Array],
    fresh_kv=None,
) -> jax.Array:
    """int8-cache decode attention with NO dequantized materialisation.

    Per-slot absmax scales commute out of both contractions, so each matmul
    runs natively in int8 on the MXU (the AQT pattern — `lax.dot_general`
    with int8 operands and an int32 accumulator) and the int8 cache bytes
    are the only cache HBM traffic:

    * QKᵀ: queries are themselves absmax-quantized per (b, g, p, t) row —
      ``scores = (q_i8 · k_i8) * q_s * k_s * scale`` — the per-row /
      per-slot scale products are elementwise on the (…, T, S) scores and
      fuse into the masking/softmax fusion.
    * PV: the value scales fold into the probabilities BEFORE the second
      contraction (``p' = softmax(scores) * v_s``), then p' is absmax-
      quantized per row so the contraction is again int8×int8.

    Accuracy: three absmax-int8 roundings (q, p', plus the cache write) —
    measured SNR and greedy-fidelity in docs/kv_quant_r5.md. Prefill is
    unaffected (it attends over the fresh bf16 K/V; only cache reads after
    the write are quantized). Reference capability match: the KVCache of
    `lit_model.py:814-860`, extended with the standard serving-stack int8
    compression the reference lacks."""
    k_q, k_s = k_cache.q, k_cache.s          # (B,G,S,hd) i8, (B,G,S) f32
    v_q, v_s = v_cache.q, v_cache.s
    s_max = k_q.shape[2]
    qf = qg.astype(jnp.float32)              # (B,G,P,T,hd)
    q_s = jnp.max(jnp.abs(qf), axis=-1) / 127.0
    q_i8 = jnp.round(qf / jnp.maximum(q_s, 1e-30)[..., None])
    q_i8 = jnp.clip(q_i8, -127, 127).astype(jnp.int8)
    acc = jnp.einsum(
        "bgpth,bgsh->bgpts", q_i8, k_q, preferred_element_type=jnp.int32
    )
    scores = (acc.astype(jnp.float32)
              * (q_s[..., None] * scale)
              * k_s[:, :, None, None, :])
    mask = _decode_mask(s_max, q_positions, key_valid, window,
                        exclusive=fresh_kv is not None)
    if fresh_kv is not None:
        # deferred write: the current token's score/value use the EXACT
        # fresh bf16 K/V (better than the inline path, which reads its own
        # slot back through the int8 rounding)
        k_f, v_f = fresh_kv
        self_sc = _self_scores(qg, k_f.astype(qg.dtype), scale)
        scores = jnp.concatenate([scores, self_sc], axis=-1)
        ones = jnp.ones(mask.shape[:-1] + (1,), bool)
        mask = jnp.concatenate([mask, ones], axis=-1)
    scores = _softcap(scores, logit_softcap)
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)  # f32
    self_out = 0
    if fresh_kv is not None:
        self_out = probs[..., s_max:] * v_f[:, :, None].astype(jnp.float32)
        probs = probs[..., :s_max]
    p = probs * v_s[:, :, None, None, :]
    p_s = jnp.max(p, axis=-1) / 127.0        # p >= 0
    p_i8 = jnp.round(p / jnp.maximum(p_s, 1e-30)[..., None]).astype(jnp.int8)
    out = jnp.einsum(
        "bgpts,bgsh->bgpth", p_i8, v_q, preferred_element_type=jnp.int32
    )
    return (out.astype(jnp.float32) * p_s[..., None]
            + self_out).astype(qg.dtype)


def _slice_prefix(cache, lvl: int):
    """First ``lvl`` slots of a cache entry (array or QuantKV)."""
    if isinstance(cache, QuantKV):
        return QuantKV(cache.q[:, :, :lvl], cache.s[:, :, :lvl])
    return cache[:, :, :lvl]


def decode_attention(
    q: jax.Array,
    k_cache,
    v_cache,
    q_positions: jax.Array,
    *,
    scale: Optional[float] = None,
    key_valid: Optional[jax.Array] = None,
    logit_softcap: Optional[float] = None,
    window: Optional[jax.Array] = None,
    prefix_levels: Optional[Tuple[int, ...]] = None,
    fresh_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """Incremental GQA against a static-length cache.

    Args:
        q: (B, H, T, hd) — T new query steps (typically 1).
        k_cache, v_cache: (B, G, S_max, hd) — already contain the new K/V.
            May be `QuantKV` entries (int8 cache): reads then run natively
            in int8 with scales commuted out of the contractions
            (`_attend_prefix_quant`).
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
    kq = k_cache.q if isinstance(k_cache, QuantKV) else k_cache
    g, s_max = kq.shape[1], kq.shape[2]
    if scale is None:
        scale = 1.0 / (hd ** 0.5)
    qg = _group_query_heads(q, g)
    if prefix_levels is not None and len(prefix_levels) > 1:
        assert prefix_levels[-1] == s_max and list(prefix_levels) == sorted(
            set(prefix_levels)
        ), f"bad prefix levels {prefix_levels} for cache length {s_max}"
        # cache slots [0, need) may be attended; deferred writes keep the
        # current token OUT of the cache, so one fewer slot is needed
        need = q_positions[-1] + (1 if fresh_kv is None else 0)
        sel = jnp.searchsorted(
            jnp.asarray(prefix_levels, jnp.int32), need, side="left"
        )

        def make_branch(lvl: int):
            def branch(qg, k_cache, v_cache, q_positions, key_valid,
                       fresh_kv):
                return _attend_prefix(
                    qg, _slice_prefix(k_cache, lvl), _slice_prefix(v_cache, lvl),
                    q_positions, scale,
                    None if key_valid is None else key_valid[:, :lvl],
                    logit_softcap, window, fresh_kv,
                )
            return branch

        out = jax.lax.switch(
            sel, [make_branch(l) for l in prefix_levels],
            qg, k_cache, v_cache, q_positions, key_valid, fresh_kv,
        )
    else:
        out = _attend_prefix(qg, k_cache, v_cache, q_positions, scale,
                             key_valid, logit_softcap, window, fresh_kv)
    return out.reshape(b, h, t, hd).transpose(0, 2, 1, 3).reshape(b, t, h * hd)
