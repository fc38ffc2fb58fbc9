"""Training losses for the unified 9-stream audio LM.

Same loss semantics as the reference's three criteria
(`/root/reference/llm_models/model_new.py:38-109`):

* ``ce_zero``     — codebook-0 CE, mean over masked steps (`:38-57`).
* ``ce_text``     — text-stream CE, mean over masked steps (`:59-73`).
* ``ce_residual`` — per-codebook CE for codebooks 1..7 with per-codebook
  weights, averaged over the codebook count; normalised by the *row count*
  like the reference (`:75-109`).

Differences by design (not semantics): the reference gathers audio steps into
a dense (N_audio, ...) tensor before the local decoder (data-dependent shape),
so its residual loss normalises by N_audio rows. Here the local decoder runs
at every step and masking happens inside the loss; normalising by the number
of *masked* audio steps gives the identical expected gradient with static
shapes.

All reductions are in float32.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def _masked_ce(
    logits: jax.Array, y: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Token-level CE and accuracy under a boolean mask.

    Args:
        logits: (..., V) float; y: (...) int; mask: (...) bool.
    Returns:
        (mean_loss, accuracy) — both scalars, normalised by mask count.
    """
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, y[..., None], axis=-1)[..., 0]
    nll = logz - gold
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(m.sum(), 1.0)
    loss = (nll * m).sum() / denom
    pred = jnp.argmax(logits, axis=-1)
    acc = (jnp.logical_and(pred == y, mask)).astype(jnp.float32).sum() / denom
    return loss, acc


def ce_text(
    text_logits: jax.Array, y: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Text-stream loss (reference `CrossEntropyAndAccuracy_text`)."""
    loss, acc = _masked_ce(text_logits, y, mask)
    return loss, {"loss_text": loss, "acc_text": acc}


def ce_zero(
    logits_cb0: jax.Array, y_cb0: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Codebook-0 loss (reference `CrossEntropyAndAccuracy_zero`)."""
    loss, acc = _masked_ce(logits_cb0, y_cb0, mask)
    return loss, {"loss_0": loss, "acc_0": acc}


def ce_residual(
    logits: jax.Array,
    y: jax.Array,
    mask: jax.Array,
    weights: Sequence[float],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Residual-codebook loss (reference `CrossEntropyAndAccuracy_residual`).

    Args:
        logits: (B, S, R, V) — R residual codebooks (1..7).
        y: (B, S, R) targets; mask: (B, S) audio-step mask.
        weights: length-R per-codebook loss weights.
    """
    r = logits.shape[2]
    assert len(weights) == r
    w = jnp.asarray(list(weights), jnp.float32)
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, y[..., None], axis=-1)[..., 0]
    nll = (logz - gold) * mask[..., None].astype(jnp.float32)  # (B,S,R)
    denom = jnp.maximum(mask.astype(jnp.float32).sum(), 1.0)
    per_cb = nll.sum(axis=(0, 1)) / denom  # (R,)
    loss = (per_cb * w).sum() / r
    pred = jnp.argmax(logits, axis=-1)
    acc = (
        jnp.logical_and(pred == y, mask[..., None]).astype(jnp.float32).sum(axis=(0, 1))
        / denom
    )
    metrics = {f"loss_{i+1}": per_cb[i] for i in range(r)}
    metrics.update({f"acc_{i+1}": acc[i] for i in range(r)})
    return loss, metrics


def unified_loss(
    text_logits: jax.Array,
    audio_logits: jax.Array,
    text_labels: jax.Array,
    audio_labels: jax.Array,
    text_loss_mask: jax.Array,
    audio_loss_mask: jax.Array,
    residual_weights: Sequence[float] = (1.0,) * 7,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Combined loss of one training step.

    Args:
        text_logits: (B, S, V_text); audio_logits: (B, S, 8, V_audio).
        text_labels: (B, S); audio_labels: (B, S, 8).
        text_loss_mask / audio_loss_mask: (B, S) bool — which steps contribute
            to the text / audio losses (the loss_key selection of the task
            format DSL, `llm_utils/task_definition.py`).
    """
    l_text, m_text = ce_text(text_logits, text_labels, text_loss_mask)
    l_zero, m_zero = ce_zero(
        audio_logits[:, :, 0, :], audio_labels[:, :, 0], audio_loss_mask
    )
    l_res, m_res = ce_residual(
        audio_logits[:, :, 1:, :], audio_labels[:, :, 1:], audio_loss_mask,
        residual_weights,
    )
    loss = l_text + l_zero + l_res
    metrics = {"loss": loss}
    metrics.update(m_text)
    metrics.update(m_zero)
    metrics.update(m_res)
    return loss, metrics


def unified_loss_fused(
    h_final: jax.Array,
    lm_head_w: jax.Array,
    dec_h: jax.Array,
    audio_head: jax.Array,
    text_labels: jax.Array,
    audio_labels: jax.Array,
    text_loss_mask: jax.Array,
    audio_loss_mask: jax.Array,
    residual_weights: Sequence[float] = (1.0,) * 7,
    chunk: int = 2048,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """`unified_loss` from HIDDEN STATES via the chunked (logit-free) CE
    (`train/chunked_ce.py`) — same losses/metrics, no (B·S, V) logits in
    memory.

    Args:
        h_final: (B, S, D) backbone output; lm_head_w: (D, V_text).
        dec_h: (B·N, 8, D_dec) local-decoder output (pre-head) — N is S for
            the dense path, or the gather capacity C when the trainer runs
            the decoder on gathered audio rows (`decoder_positions`); then
            ``audio_labels``/``audio_loss_mask`` are (B, N, 8)/(B, N) in the
            same gathered space.
        audio_head: (8, D_dec, V_audio).
    """
    import functools

    from uniaudio2_tpu.train import chunked_ce

    b, s, d = h_final.shape
    l_text, acc_text = chunked_ce.masked_ce(
        h_final.reshape(b * s, d), lm_head_w,
        text_labels.reshape(-1), text_loss_mask.reshape(-1), chunk)

    ncb = dec_h.shape[1]
    amask = audio_loss_mask.reshape(-1)
    y = audio_labels.reshape(dec_h.shape[0], ncb)
    sums_fn = functools.partial(chunked_ce.masked_ce_sums, chunk=chunk)
    nll, acc = jax.vmap(
        lambda hh, ww, yy: sums_fn(hh, ww, yy, amask)
    )(jnp.transpose(dec_h, (1, 0, 2)), audio_head, y.T)  # (ncb,) each
    denom = jnp.maximum(amask.astype(jnp.float32).sum(), 1.0)
    per_cb = nll / denom
    acc_cb = acc / denom

    r = ncb - 1
    assert len(residual_weights) == r
    wts = jnp.asarray(list(residual_weights), jnp.float32)
    l_zero = per_cb[0]
    l_res = (per_cb[1:] * wts).sum() / r
    loss = l_text + l_zero + l_res
    metrics = {
        "loss": loss, "loss_text": l_text, "acc_text": acc_text,
        "loss_0": l_zero, "acc_0": acc_cb[0],
    }
    metrics.update({f"loss_{i+1}": per_cb[i + 1] for i in range(r)})
    metrics.update({f"acc_{i+1}": acc_cb[i + 1] for i in range(r)})
    return loss, metrics
