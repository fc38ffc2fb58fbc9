"""Residual vector quantization — inference ops, functional.

The reference delegates RVQ to the external ``vector-quantize-pytorch``
package (`/root/reference/tools/tokenizer/ReasoningCodec_film/models/
AudioDiffusion1D.py:26,183-187,256-264`). Only two operations are on the
runtime path and both are plain tensor math:

* **decode** (`get_output_from_indices`, used at `AudioDiffusion1D.py:577-583`):
  sum the selected codebook vectors across quantizers in the projected
  ``codebook_dim`` space, then apply the shared output projection.
* **encode** (`ResidualVQ.__call__`, used at `:529-544`): shared input
  projection, then per-quantizer nearest-neighbour (squared-L2) with residual
  subtraction.

TPU shape: the codebook lookup is a ``take`` (gather) and the NN search is one
``(T, d) @ (d, K)`` matmul per quantizer — MXU-friendly; quantizers are a
``lax.scan`` over the stacked codebook tensor.

Params pytree:
    {"project_in_w": (dim, cb_dim), "project_in_b": (cb_dim,),
     "project_out_w": (cb_dim, dim), "project_out_b": (dim,),
     "codebooks": (Q, K, cb_dim)}
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def init_params(
    key: jax.Array, *, dim: int, codebook_size: int, codebook_dim: int,
    num_quantizers: int, dtype=jnp.float32,
) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    s = 0.02
    return {
        "project_in_w": jax.random.normal(k1, (dim, codebook_dim), dtype) * s,
        "project_in_b": jnp.zeros((codebook_dim,), dtype),
        "project_out_w": jax.random.normal(k2, (codebook_dim, dim), dtype) * s,
        "project_out_b": jnp.zeros((dim,), dtype),
        "codebooks": jax.random.normal(
            k3, (num_quantizers, codebook_size, codebook_dim), dtype
        ),
    }


def decode(params: Params, indices: jax.Array) -> jax.Array:
    """Indices -> vectors.

    Args:
        indices: (..., T, Q) int codes (quantizer axis last).
    Returns:
        (..., T, dim) float vectors.
    """
    q = params["codebooks"].shape[0]
    assert indices.shape[-1] == q, (indices.shape, q)
    gathered = _gather(params["codebooks"], indices)  # (..., T, Q, cb_dim)
    summed = gathered.sum(axis=-2)  # (..., T, cb_dim)
    return summed @ params["project_out_w"] + params["project_out_b"]


def _gather(codebooks: jax.Array, indices: jax.Array) -> jax.Array:
    """codebooks (Q, K, d), indices (..., T, Q) -> (..., T, Q, d)."""
    qn = codebooks.shape[0]
    per_q = [jnp.take(codebooks[i], indices[..., i], axis=0) for i in range(qn)]
    return jnp.stack(per_q, axis=-2)


def encode(params: Params, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Vectors -> indices (and the quantized reconstruction).

    Args:
        x: (..., T, dim) float features.
    Returns:
        indices (..., T, Q) int32, quantized (..., T, dim).
    """
    z = x @ params["project_in_w"] + params["project_in_b"]  # (..., T, cb_dim)

    def step(residual, codebook):
        # squared-L2 NN: argmin ||r - c||^2 = argmin (||c||^2 - 2 r.c)
        dots = jnp.einsum(
            "...td,kd->...tk", residual, codebook,
            preferred_element_type=jnp.float32,
        )
        sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)
        idx = jnp.argmin(sq - 2.0 * dots, axis=-1)
        chosen = jnp.take(codebook, idx, axis=0)
        return residual - chosen, (idx.astype(jnp.int32), chosen)

    _, (indices, chosen) = jax.lax.scan(step, z, params["codebooks"])
    # scan stacks on axis 0 -> move quantizer axis last
    indices = jnp.moveaxis(indices, 0, -1)            # (..., T, Q)
    quantized_cb = jnp.moveaxis(chosen, 0, -2).sum(-2)  # (..., T, cb_dim)
    quantized = quantized_cb @ params["project_out_w"] + params["project_out_b"]
    return indices, quantized
