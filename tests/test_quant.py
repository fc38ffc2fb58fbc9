"""Int8 weight-only quantization: accuracy, matmul dispatcher, pallas kernel
(interpret mode), and quantized decode on the tiny unified model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.ops import quant


def test_quantize_dequantize_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.1
    q = quant.quantize(w)
    assert q.values.dtype == jnp.int8
    assert q.scale.shape == (128,)
    assert q.values.shape == (64, 128)
    wd = quant.dequantize(q, jnp.float32)
    rel = np.abs(np.asarray(wd - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01  # 127-level quantization: < 1% of column max


def test_quantize_stacked_layers():
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 32))
    q = quant.quantize(w)
    assert q.values.shape == (3, 16, 128)  # lane-padded storage
    assert q.scale.shape == (3, 32)
    np.testing.assert_allclose(
        np.asarray(quant.dequantize(q, jnp.float32)), np.asarray(w),
        atol=float(np.abs(np.asarray(w)).max()) * 0.01,
    )
    # per-layer scales must match per-layer quantization
    q0 = quant.quantize(w[0])
    np.testing.assert_array_equal(np.asarray(q.values[0]), np.asarray(q0.values))


def test_matmul_dispatcher():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 64))
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 32)) * 0.1
    plain = quant.matmul(x, w)
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(x) @ np.asarray(w), rtol=1e-5, atol=1e-5
    )
    q = quant.quantize(w)
    out = quant.matmul(x, q)
    ref = np.asarray(x) @ np.asarray(quant.dequantize(q, jnp.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=1e-2, atol=1e-3)


def test_pallas_kernel_interpret_matches_reference():
    """Run the Pallas int8 kernel in interpreter mode on CPU and compare to
    the dequantized matmul."""
    from jax.experimental.pallas import tpu as pltpu

    x = jax.random.normal(jax.random.PRNGKey(4), (1, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(5), (256, 512)) * 0.05
    q = quant.quantize(w)
    with pltpu.force_tpu_interpret_mode():
        out = quant._pallas_int8_matmul(x, q.values, q.scale, block_n=128)
    ref = np.asarray(x) @ np.asarray(quant.dequantize(q, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-3)


def test_quantized_unified_decode_runs():
    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.engine.decode import DecodeEngine
    from uniaudio2_tpu.engine import tasks as tm
    from uniaudio2_tpu.models import unified

    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_unified_params(params)
    # structure: gpt layer leaves replaced by QuantizedLinear pytrees
    assert isinstance(qparams["backbone"]["layers"]["qkv_w"], quant.QuantizedLinear)
    assert isinstance(qparams["audio_head"], quant.QuantizedLinear)

    eng = DecodeEngine(qparams, cfg, max_frames=4, cache_dtype=jnp.float32,
                       buckets=(64,))
    grid, mask = tm.prepare_asr(
        np.array([1, 2, 3]),
        np.random.default_rng(0).integers(0, 30, (4, 8)),
        np.random.default_rng(1).integers(0, 60, (6, 8)),
        cfg.tokens,
    )
    toks = eng.generate_text(grid, mask, topk=1)
    assert toks.ndim == 1  # runs end to end with int8 weights

    # quantized greedy tokens should usually match full-precision greedy
    eng_fp = DecodeEngine(params, cfg, max_frames=4, cache_dtype=jnp.float32,
                          buckets=(64,))
    toks_fp = eng_fp.generate_text(grid, mask, topk=1)
    # not bit-guaranteed (1% weight error) — only check same dtype/shape sanity
    assert toks.dtype == toks_fp.dtype
