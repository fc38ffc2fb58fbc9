"""Attention-mask builders for training.

``prefix_lm_mask`` has the reference's `attention_mask` semantics
(`/root/reference/llm_utils/train_utils.py:246-286`): given a per-step loss
mask containing exactly one contiguous True segment per row,

1. target steps are causal and see the whole prefix;
2. prefix steps see each other bidirectionally when ``prefix_lm`` is on,
   otherwise causally;
3. padding (after the target segment) neither sees nor is seen.

Implemented branch-free so it jits cleanly (the reference's assert on
segment contiguity becomes a host-side `validate_loss_mask` helper for the
data pipeline to call).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.int32(1 << 30)


def prefix_lm_mask(loss_mask: jax.Array, prefix_lm: bool = True) -> jax.Array:
    """(B, S) bool loss mask -> (B, S, S) bool attention mask (True=attend)."""
    b, s = loss_mask.shape
    axis = jnp.arange(s, dtype=jnp.int32)
    start = jnp.min(jnp.where(loss_mask, axis[None, :], _BIG), axis=1)   # (B,)
    end = jnp.max(jnp.where(loss_mask, axis[None, :], -_BIG), axis=1)    # (B,)

    causal = axis[:, None] >= axis[None, :]                               # (S,S)
    mask = jnp.broadcast_to(causal, (b, s, s))
    if prefix_lm:
        in_prefix_key = axis[None, None, :] < start[:, None, None]
        mask = jnp.logical_or(mask, in_prefix_key)
    pad_key = axis[None, None, :] > end[:, None, None]
    mask = jnp.logical_and(mask, jnp.logical_not(pad_key))
    return mask


def validate_loss_mask(loss_mask: np.ndarray) -> None:
    """Host-side check of the one-contiguous-True-segment invariant the
    reference asserts in-graph (`train_utils.py:271-273`)."""
    loss_mask = np.asarray(loss_mask, bool)
    for row in loss_mask:
        idx = np.flatnonzero(row)
        if idx.size == 0:
            raise ValueError("loss mask row has no True entries")
        if idx[-1] - idx[0] + 1 != idx.size:
            raise ValueError("loss mask row is not one contiguous segment")
