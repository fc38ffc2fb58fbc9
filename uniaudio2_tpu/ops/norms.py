"""Normalization layers (functional).

RMSNorm matching the reference semantics (`lit_model.py:869-893`): reduce in
float32, scale by a learned weight, cast back to the activation dtype. XLA
fuses this into neighbouring ops; no Pallas kernel is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)
