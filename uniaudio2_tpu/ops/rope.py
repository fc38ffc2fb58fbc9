"""Rotary position embeddings with Llama-3 frequency adjustment.

Numerically equivalent to the reference's `build_rope_cache` / `apply_rope`
(`/root/reference/llm_models/lit_model.py:634-706,778-807`), but designed as
pure functions over precomputed per-position tables so that decode steps can
gather a single row with `jnp.take` inside a jitted loop (no data-dependent
cache rebuilds).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uniaudio2_tpu.config import RoPEAdjustments


@functools.lru_cache(maxsize=32)
def _rope_cache_np(
    seq_len: int,
    n_elem: int,
    base: float,
    adjustments: Optional[RoPEAdjustments],
) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute (cos, sin) tables of shape ``(seq_len, n_elem)``.

    Host-side numpy in float64 for accuracy, then cast to float32; the tables
    are tiny (seq_len x head_dim) and constant-folded into compiled programs.
    Cached as *numpy* — caching jax arrays here would leak tracers when the
    first call happens inside a jit trace.
    """
    theta = 1.0 / (base ** (np.arange(0, n_elem, 2, dtype=np.float64) / n_elem))

    if adjustments is not None:
        # Llama-3.x smooth low/high frequency interpolation
        wavelen = 2.0 * np.pi / theta
        ratio = adjustments.original_max_seq_len / wavelen
        smooth = (ratio - adjustments.low_freq_factor) / (
            adjustments.high_freq_factor - adjustments.low_freq_factor
        )
        smooth = np.clip(smooth, 0.0, 1.0)
        theta = (1.0 - smooth) * (theta / adjustments.factor) + smooth * theta

    seq_idx = np.arange(seq_len, dtype=np.float64)
    idx_theta = np.outer(seq_idx, theta)  # (S, n_elem/2)
    idx_theta = np.concatenate([idx_theta, idx_theta], axis=-1)  # (S, n_elem)
    return (
        np.cos(idx_theta).astype(np.float32),
        np.sin(idx_theta).astype(np.float32),
    )


def rope_cache(
    seq_len: int,
    n_elem: int,
    base: float = 10000.0,
    adjustments: Optional[RoPEAdjustments] = None,
) -> Tuple[jax.Array, jax.Array]:
    cos, sin = _rope_cache_np(seq_len, n_elem, float(base), adjustments)
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate ``x`` of shape ``(..., T, head_size)`` by (cos, sin) of shape
    ``(T, head_size)`` (half-split rotation convention, matching the
    reference's `apply_rope`, `lit_model.py:778-807`)."""
    half = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    x1 = xf[..., :half]
    x2 = xf[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    # rotate in float32 for accuracy, broadcast (T, hd) across leading dims
    out = xf * cos + rotated * sin
    return out.astype(x.dtype)
