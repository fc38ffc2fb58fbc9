"""Chunked (logit-free) softmax cross-entropy for the big-vocab heads.

The dense training losses materialise full logits — (B·S, 128256) f32 for
the text head and (B·S, 8, 12300) f32 for the audio heads — which, with
their softmax/gradient copies, dominate the training step's HLO temps
(measured: the temps, not the weights, are what stop batch 4×512 fitting a
single chip — docs/bench_train_r3.md). This module computes

    loss = Σ_masked ( logsumexp(h @ W) - (h @ W)[y] )

with an online (streaming) logsumexp over vocab CHUNKS and a
`jax.custom_vjp` backward that RECOMPUTES each chunk's logits and
accumulates `dh`/`dW` chunk by chunk — no (N, V) tensor ever exists in
either pass. Peak extra memory is one (N, chunk) block.

Numerics are f32 and match the dense path to float tolerance (tested
against `losses._masked_ce` including gradients). Accuracy is tracked with
a running argmax (non-differentiable aux).

Reference loss semantics: `CrossEntropyAndAccuracy_{zero,text,residual}`
(/root/reference/llm_models/model_new.py:38-109).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def _num_chunks(v: int, chunk: int) -> int:
    return -(-v // chunk)


def _pad_w(w: jax.Array, chunk: int) -> jax.Array:
    v = w.shape[-1]
    vp = _num_chunks(v, chunk) * chunk
    if vp != v:
        w = jnp.pad(w, ((0, 0), (0, vp - v)))
    return w


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_ce_sums(
    h: jax.Array, w: jax.Array, y: jax.Array, mask: jax.Array, chunk: int
) -> Tuple[jax.Array, jax.Array]:
    """Masked CE over ``h @ w`` without materialising the logits.

    Args:
        h: (N, D) hidden states (any float dtype; math in f32).
        w: (D, V) head weights.
        y: (N,) int32 targets; mask: (N,) bool.
        chunk: static vocab-chunk width.
    Returns:
        (nll_sum, acc_sum): masked sums (normalise by mask count outside).
    """
    (out, _) = _fwd(h, w, y, mask, chunk)
    return out


def _scan_stats(h, wp, y, v: int, chunk: int):
    """Online logsumexp + gold logit + running argmax over vocab chunks."""
    n = h.shape[0]
    hc = h.astype(jnp.float32)

    def body(carry, c):
        m_run, s_run, best, best_idx, gold = carry
        wc = jax.lax.dynamic_slice(wp, (0, c * chunk), (wp.shape[0], chunk))
        logits = jnp.dot(hc, wc.astype(jnp.float32),
                         preferred_element_type=jnp.float32)  # (N, chunk)
        cols = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        logits = jnp.where(cols[None, :] < v, logits, NEG_INF)
        cmax = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m_run, cmax)
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1)
        carg = cols[jnp.argmax(logits, axis=-1)]
        best_idx = jnp.where(cmax > best, carg, best_idx)
        best = jnp.maximum(best, cmax)
        in_chunk = (y >= c * chunk) & (y < (c + 1) * chunk)
        gidx = jnp.clip(y - c * chunk, 0, chunk - 1)
        gval = jnp.take_along_axis(logits, gidx[:, None], axis=1)[:, 0]
        gold = jnp.where(in_chunk, gval, gold)
        return (m_new, s_run, best, best_idx, gold), None

    init = (jnp.full((n,), NEG_INF), jnp.zeros((n,), jnp.float32),
            jnp.full((n,), NEG_INF), jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), jnp.float32))
    (m_run, s_run, _, best_idx, gold), _ = jax.lax.scan(
        body, init, jnp.arange(_num_chunks(v, chunk)))
    logz = m_run + jnp.log(s_run)
    return logz, gold, best_idx


def _fwd(h, w, y, mask, chunk: int):
    v = w.shape[-1]
    wp = _pad_w(w, chunk)
    logz, gold, best_idx = _scan_stats(h, wp, y, v, chunk)
    m = mask.astype(jnp.float32)
    nll_sum = jnp.sum((logz - gold) * m)
    acc_sum = jnp.sum((best_idx == y) & mask).astype(jnp.float32)
    return (nll_sum, acc_sum), (h, w, y, mask, logz)


def _bwd(chunk: int, res, cot):
    h, w, y, mask, logz = res
    g_nll, _ = cot                       # accuracy is non-differentiable
    v = w.shape[-1]
    d = w.shape[0]
    wp = _pad_w(w, chunk)
    hc = h.astype(jnp.float32)
    scale = (mask.astype(jnp.float32) * g_nll)[:, None]   # (N, 1)

    def body(carry, c):
        dh, dwp = carry
        wc = jax.lax.dynamic_slice(wp, (0, c * chunk), (d, chunk))
        wc32 = wc.astype(jnp.float32)
        logits = jnp.dot(hc, wc32, preferred_element_type=jnp.float32)
        cols = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        logits = jnp.where(cols[None, :] < v, logits, NEG_INF)
        p = jnp.exp(logits - logz[:, None])               # softmax chunk
        onehot = (y[:, None] == cols[None, :]).astype(jnp.float32)
        dlog = (p - onehot) * scale                       # (N, chunk)
        dh = dh + jnp.dot(dlog, wc32.T, preferred_element_type=jnp.float32)
        dwc = jnp.dot(hc.T, dlog, preferred_element_type=jnp.float32)
        dwp = jax.lax.dynamic_update_slice(
            dwp, dwc.astype(dwp.dtype), (0, c * chunk))
        return (dh, dwp), None

    init = (jnp.zeros(h.shape, jnp.float32),
            jnp.zeros(wp.shape, jnp.float32))
    (dh, dwp), _ = jax.lax.scan(body, init, jnp.arange(_num_chunks(v, chunk)))
    return (dh.astype(h.dtype), dwp[:, :v].astype(w.dtype), None, None)


masked_ce_sums.defvjp(_fwd, _bwd)


def masked_ce(h, w, y, mask, chunk: int = 2048):
    """Mean masked CE + accuracy (same contract as `losses._masked_ce` but
    taking hidden states + head weights). Shapes: h (N, D), w (D, V),
    y/mask (N,)."""
    nll_sum, acc_sum = masked_ce_sums(h, w, y, mask, chunk)
    denom = jnp.maximum(mask.astype(jnp.float32).sum(), 1.0)
    return nll_sum / denom, acc_sum / denom
