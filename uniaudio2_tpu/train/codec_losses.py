"""Codec-training auxiliary losses.

The reference ships the codec's training-side modules (frozen feature
decoders `AudioDiffusion1D.py:252-253`, CFM loss `:131-167`, EMA/commitment
losses inside vector-quantize-pytorch) but no training entry script. This
module provides the TPU-side loss surface for codec fine-tuning:

* `feature_reconstruction_loss` — decode quantized features back to frozen
  SSL space with `codec/semantic_decoder.py` and take masked MSE (the role
  of `structure_semantic_decoder` / `pronunciation_decoder`).
* `rvq_commitment_loss` — encoder-side commitment to the chosen codebook
  entries (vector-quantize-pytorch `commitment_weight=1.`,
  `AudioDiffusion1D.py:256-264`; codebooks themselves are EMA-updated in
  the original — under jax, train them with this same gradient or port EMA
  updates as an optimizer transform).

The CFM flow-matching loss lives in `codec/cfm.py::compute_loss`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import semantic_decoder


def masked_mse(pred: jax.Array, target: jax.Array,
               mask: Optional[jax.Array] = None) -> jax.Array:
    """Mean squared error over valid frames; ``mask`` is (B, T) with 1 =
    real frame (mirrors the reference's mask-weighted MSE shape,
    `AudioDiffusion1D.py:158-166`)."""
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if mask is None:
        return err.mean()
    m = mask.astype(jnp.float32)[..., None]
    return (err * m).sum() / jnp.maximum(m.sum() * err.shape[-1], 1.0)


def feature_reconstruction_loss(
    dec_params, dec_cfg: semantic_decoder.FeatureDecoderConfig,
    quantized: jax.Array, ssl_target: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """MSE between the decoded quantized stream and the frozen SSL feature
    target. ``quantized`` (B, T, code_dim); ``ssl_target``
    (B, T * prod(strides), output_channels)."""
    pred = semantic_decoder.forward(dec_params, dec_cfg, quantized)
    t = min(pred.shape[1], ssl_target.shape[1])
    return masked_mse(pred[:, :t], ssl_target[:, :t],
                      None if mask is None else mask[:, :t])


def rvq_commitment_loss(residual_in: jax.Array,
                        quantized_out: jax.Array) -> jax.Array:
    """||x - sg(q)||^2 — the encoder-side commitment term."""
    q = jax.lax.stop_gradient(quantized_out.astype(jnp.float32))
    return ((residual_in.astype(jnp.float32) - q) ** 2).mean()
