"""Manually DMA-pipelined fused SwiGLU (`ops/fused_mlp_dma`): interpret-mode
parity with the dequantized reference on the exact serving layouts
(chunk-major int8 / row-interleaved int4), incl. the norm+residual folds."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from uniaudio2_tpu.ops import fused_mlp, fused_mlp_dma, quant

K, I, N = 256, 1024, 256
BC = 512


def _serving_weights(bits):
    rng = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(rng, 3)
    w1 = jax.random.normal(k1, (K, I)) * 0.05
    w2 = jax.random.normal(k2, (K, I)) * 0.05
    w3 = jax.random.normal(k3, (I, N)) * 0.05
    if bits == 8:
        q1, q2, q3 = quant.quantize(w1), quant.quantize(w2), quant.quantize(w3)
        d1 = quant.dequantize(q1, jnp.float32)
        d2 = quant.dequantize(q2, jnp.float32)
        d3 = quant.dequantize(q3, jnp.float32)
    elif bits == "4g":
        q1 = quant.to_interleaved(quant.quantize4_grouped(w1))
        q2 = quant.to_interleaved(quant.quantize4_grouped(w2))
        q3 = quant.to_interleaved(quant.quantize4_cols_grouped(w3))
        d1 = quant.dequantize4_interleaved_grouped(q1, jnp.float32)
        d2 = quant.dequantize4_interleaved_grouped(q2, jnp.float32)
        d3 = quant.dequantize4_interleaved_grouped(q3, jnp.float32)
    else:
        q1 = quant.to_interleaved(quant.quantize4(w1))
        q2 = quant.to_interleaved(quant.quantize4(w2))
        q3 = quant.to_interleaved(quant.quantize4_cols(w3))
        d1 = quant.dequantize4_interleaved(q1, jnp.float32)
        d2 = quant.dequantize4_interleaved(q2, jnp.float32)
        d3 = quant.dequantize4_interleaved(q3, jnp.float32)
    q1, q2 = quant.chunk_major(q1, BC), quant.chunk_major(q2, BC)
    return q1, q2, q3, d1, d2, d3


@pytest.mark.parametrize("bits", [8, 4, "4g"])
def test_dma_swiglu_interpret_matches_dequantized(bits):
    q1, q2, q3, d1, d2, d3 = _serving_weights(bits)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, K), jnp.float32)
    assert q1.values.ndim == 3 and q1.values.shape[-1] == BC
    assert fused_mlp_dma.can_fuse_dma(q1, q2, q3, x)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp_dma.fused_swiglu_dma(x, q1, q2, q3)
    xn = np.asarray(x)
    h = jax.nn.silu(xn @ np.asarray(d1)) * (xn @ np.asarray(d2))
    ref = np.asarray(h) @ np.asarray(d3)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("bits", [8, 4, "4g"])
def test_dma_swiglu_norm_residual_folds(bits):
    q1, q2, q3, d1, d2, d3 = _serving_weights(bits)
    x = jax.random.normal(jax.random.PRNGKey(11), (1, K), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(12), (1, N), jnp.float32)
    nw = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(13), (K,))
    eps = 1e-5
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp_dma.fused_swiglu_dma(
            x, q1, q2, q3, norm_w=nw, norm_eps=eps, residual=res)
    xn = np.asarray(x, np.float64)
    xh = xn / np.sqrt((xn ** 2).mean(-1, keepdims=True) + eps) * np.asarray(nw)
    h = jax.nn.silu(xh @ np.asarray(d1, np.float64)) \
        * (xh @ np.asarray(d2, np.float64))
    ref = np.asarray(h) @ np.asarray(d3, np.float64) + np.asarray(res)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=2e-2, atol=3e-3)


def test_dispatch_from_fused_swiglu(monkeypatch):
    """`fused_mlp.fused_swiglu` routes serving layouts to the DMA kernel
    (and respects the UA2_MLP_DMA=0 kill switch)."""
    q1, q2, q3, d1, d2, d3 = _serving_weights(4)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, K), jnp.float32)
    called = {}
    orig = fused_mlp_dma.fused_swiglu_dma

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(fused_mlp_dma, "fused_swiglu_dma", spy)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp.fused_swiglu(x, q1, q2, q3)
    assert called.get("yes")
    xn = np.asarray(x)
    h = jax.nn.silu(xn @ np.asarray(d1)) * (xn @ np.asarray(d2))
    ref = np.asarray(h) @ np.asarray(d3)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=2e-2, atol=2e-3)

    monkeypatch.setenv("UA2_MLP_DMA", "0")
    assert not fused_mlp_dma.enabled()


def test_can_fuse_dma_rejects_non_serving_layouts():
    q1, q2, q3, *_ = _serving_weights(4)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, K), jnp.float32)
    # row-major (non-chunk-major) w1 -> reject
    flat = quant.QuantizedLinearI4(
        jnp.transpose(q1.values, (1, 0, 2)).reshape(K // 2, I), q1.scale)
    assert not fused_mlp_dma.can_fuse_dma(flat, q2, q3, x)
    # large-M prefill -> reject
    xb = jax.random.normal(jax.random.PRNGKey(4), (256, K), jnp.float32)
    assert not fused_mlp_dma.can_fuse_dma(q1, q2, q3, xb)
    # column-packed down-projection (training layout) -> reject
    c4 = quant.quantize4_cols(jax.random.normal(jax.random.PRNGKey(5), (I, N)))
    assert not fused_mlp_dma.can_fuse_dma(q1, q2, c4, x)
