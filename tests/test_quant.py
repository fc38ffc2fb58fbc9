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


def test_int4_quantize_dequantize_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(6), (64, 128)) * 0.1
    q = quant.quantize4(w)
    assert q.values.shape == (32, 128)  # packed: two rows per byte
    assert q.values.dtype == jnp.int8
    wd = quant.dequantize4(q, jnp.float32)
    rel = np.abs(np.asarray(wd - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.08  # 15-level quantization: < 1/14 of column max
    # exact nibble round trip: quantizing the dequantized values is stable
    q2 = quant.quantize4(wd)
    np.testing.assert_array_equal(np.asarray(q2.values), np.asarray(q.values))


def test_int4_matmul_dispatch_and_stacked():
    x = jax.random.normal(jax.random.PRNGKey(7), (3, 64)).astype(jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(8), (64, 32)) * 0.1
    q = quant.quantize4(w)
    out = quant.matmul(x, q)
    ref = np.asarray(x) @ np.asarray(quant.dequantize4(q, jnp.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=1e-2, atol=1e-3)
    # stacked layer leaves quantize per layer
    ws = jax.random.normal(jax.random.PRNGKey(9), (3, 16, 32))
    qs = quant.quantize4(ws)
    assert qs.values.shape == (3, 8, 128)
    q0 = quant.quantize4(ws[0])
    np.testing.assert_array_equal(np.asarray(qs.values[0]), np.asarray(q0.values))


def test_int4_pallas_kernel_interpret_matches_reference():
    from jax.experimental.pallas import tpu as pltpu

    x = jax.random.normal(jax.random.PRNGKey(10), (1, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(11), (256, 512)) * 0.05
    q = quant.quantize4(w)
    with pltpu.force_tpu_interpret_mode():
        out = quant._pallas_int4_matmul(x, q.values, q.scale, block_n=128)
    ref = np.asarray(x) @ np.asarray(quant.dequantize4(q, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-3)


def test_int4_cols_roundtrip_and_matmul():
    w = jax.random.normal(jax.random.PRNGKey(12), (64, 128)) * 0.1
    q = quant.quantize4_cols(w)
    assert q.values.shape == (64, 128)  # 64 packed cols, lane-padded to 128
    wd = quant.dequantize4_cols(q, jnp.float32)
    rel = np.abs(np.asarray(wd - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.08
    x = jax.random.normal(jax.random.PRNGKey(13), (3, 64), jnp.float32)
    out = quant.matmul(x, q)
    ref = np.asarray(x) @ np.asarray(wd)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=1e-2, atol=1e-3)


def test_int4c_pallas_kernel_interpret_matches_reference():
    from jax.experimental.pallas import tpu as pltpu

    x = jax.random.normal(jax.random.PRNGKey(14), (2, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(15), (256, 512)) * 0.05
    q = quant.quantize4_cols(w)
    with pltpu.force_tpu_interpret_mode():
        out = quant._pallas_int4c_matmul(x, q.values, q.scale, block_n=128)
    ref = np.asarray(x) @ np.asarray(quant.dequantize4_cols(q, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("bits", [8, 4, "4g"])
def test_fused_swiglu_interpret_matches_unfused(bits):
    from jax.experimental.pallas import tpu as pltpu

    from uniaudio2_tpu.ops import fused_mlp

    k, i, n = 256, 512, 256
    rng = jax.random.PRNGKey(16)
    k1, k2, k3, kx = jax.random.split(rng, 4)
    w1 = jax.random.normal(k1, (k, i)) * 0.05
    w2 = jax.random.normal(k2, (k, i)) * 0.05
    w3 = jax.random.normal(k3, (i, n)) * 0.05
    x = jax.random.normal(kx, (2, k), jnp.float32)
    if bits == 8:
        q1, q2, q3 = quant.quantize(w1), quant.quantize(w2), quant.quantize(w3)
        d1 = quant.dequantize(q1, jnp.float32)
        d2 = quant.dequantize(q2, jnp.float32)
        d3 = quant.dequantize(q3, jnp.float32)
    elif bits == "4g":
        q1 = quant.quantize4_grouped(w1)
        q2 = quant.quantize4_grouped(w2)
        q3 = quant.quantize4_cols_grouped(w3)
        d1 = quant.dequantize4_grouped(q1, jnp.float32)
        d2 = quant.dequantize4_grouped(q2, jnp.float32)
        d3 = quant.dequantize4_cols_grouped(q3, jnp.float32)
    else:
        q1, q2 = quant.quantize4(w1), quant.quantize4(w2)
        q3 = quant.quantize4_cols(w3)
        d1 = quant.dequantize4(q1, jnp.float32)
        d2 = quant.dequantize4(q2, jnp.float32)
        d3 = quant.dequantize4_cols(q3, jnp.float32)
    assert fused_mlp.can_fuse(q1, q2, q3, x)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp.fused_swiglu(x, q1, q2, q3)
    xn = np.asarray(x)
    h = jax.nn.silu(xn @ np.asarray(d1)) * (xn @ np.asarray(d2))
    ref = np.asarray(h) @ np.asarray(d3)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=2e-2, atol=2e-3)


def test_int4_decoder_unified_decode_runs():
    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.engine.decode import DecodeEngine
    from uniaudio2_tpu.engine import tasks as tm
    from uniaudio2_tpu.models import unified

    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_unified_params(params, int4_modules=("decoder",))
    assert isinstance(qparams["decoder"]["layers"]["qkv_w"],
                      quant.QuantizedLinear4)
    assert isinstance(qparams["backbone"]["layers"]["qkv_w"],
                      quant.QuantizedLinear)
    eng = DecodeEngine(qparams, cfg, max_frames=4, cache_dtype=jnp.float32,
                       buckets=(64,))
    grid, mask = tm.prepare_tts(np.array([1, 5, 6]), np.array([1, 10, 2]),
                                cfg.tokens)
    reason, semantic = eng.generate_audio(grid, mask, topk=5)
    assert reason.shape[0] == 8 and semantic.shape[0] == 8


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


def test_int4_grouped_roundtrip_and_matmul():
    """Group-wise int4: dequant matches per-group scaling; matmul agrees
    with explicit dequantized einsum; quantization error strictly below the
    per-channel int4 error on outlier-bearing weights."""
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (512, 384), jnp.float32)
    # plant outliers: one huge row poisons whole columns under per-channel
    w = w.at[17].mul(40.0)
    g = quant.quantize4_grouped(w, group=128)
    assert g.values.shape == (256, 384) and g.scale.shape == (4, 384)
    wg = quant.dequantize4_grouped(g, jnp.float32)
    w4 = quant.dequantize4(quant.quantize4(w), jnp.float32)
    err_g = float(jnp.abs(wg - w).mean())
    err_c = float(jnp.abs(w4 - w).mean())
    assert err_g < 0.5 * err_c, (err_g, err_c)
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 512), jnp.bfloat16)
    got = quant.matmul(x, g)
    ref = jnp.einsum("mk,kn->mn", x, wg.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-1, rtol=3e-2)


def test_int4_grouped_unified_tree():
    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.models import unified

    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    qp = quant.quantize_unified_params(
        params, int4_modules=("decoder", "audio_head", "projection_w"),
        grouped=True)
    k = params["decoder"]["layers"]["qkv_w"].shape[-2]
    if k % (2 * quant.INT4_GROUP) == 0:
        assert isinstance(qp["decoder"]["layers"]["qkv_w"],
                          quant.QuantizedLinear4G)
    sp = unified.prepare_serving_params(qp)
    assert "audio_embeddings_proj" in sp


def test_grouped_scales_improve_snr():
    """Group-wise (128-row) scales must beat per-channel scales on
    quantization SNR — the quality rationale for the int4allg serving
    mode (QuantizedLinear4G docstring)."""
    rng = np.random.default_rng(0)
    # heavy-tailed rows emulate real checkpoint outlier structure
    w = rng.standard_normal((512, 256)).astype(np.float32)
    w[::37] *= 8.0
    wj = jnp.asarray(w)

    def snr(dq):
        err = np.asarray(dq, np.float32) - w
        return 10 * np.log10((w ** 2).mean() / (err ** 2).mean())

    snr_pc = snr(quant.dequantize4(quant.quantize4(wj), jnp.float32))
    snr_g = snr(quant.dequantize4_grouped(
        quant.quantize4_grouped(wj, 128), jnp.float32))
    assert snr_g > snr_pc + 2.0, (snr_pc, snr_g)   # measured +2.7 dB
    snr_gc = snr(quant.dequantize4_cols_grouped(
        quant.quantize4_cols_grouped(wj, 128), jnp.float32))
    assert snr_gc > snr_pc + 2.0, (snr_pc, snr_gc)


@pytest.mark.parametrize("bits", [8, 4, "4g"])
def test_fused_swiglu_norm_residual_fold(bits):
    """norm_w/residual folding: one kernel == rmsnorm -> swiglu -> +x."""
    from jax.experimental.pallas import tpu as pltpu

    from uniaudio2_tpu.ops import fused_mlp
    from uniaudio2_tpu.ops.norms import rms_norm

    k, i = 256, 512
    n = k                              # residual requires N == K
    rng = jax.random.PRNGKey(21)
    k1, k2, k3, kx, kn = jax.random.split(rng, 5)
    w1 = jax.random.normal(k1, (k, i)) * 0.05
    w2 = jax.random.normal(k2, (k, i)) * 0.05
    w3 = jax.random.normal(k3, (i, n)) * 0.05
    x = jax.random.normal(kx, (2, k), jnp.float32)
    nw = 1.0 + jax.random.normal(kn, (k,)) * 0.1
    if bits == 8:
        q1, q2, q3 = quant.quantize(w1), quant.quantize(w2), quant.quantize(w3)
        d3 = quant.dequantize(q3, jnp.float32)
        d1, d2 = (quant.dequantize(q, jnp.float32) for q in (q1, q2))
    elif bits == "4g":
        q1, q2 = quant.quantize4_grouped(w1), quant.quantize4_grouped(w2)
        q3 = quant.quantize4_cols_grouped(w3)
        d1 = quant.dequantize4_grouped(q1, jnp.float32)
        d2 = quant.dequantize4_grouped(q2, jnp.float32)
        d3 = quant.dequantize4_cols_grouped(q3, jnp.float32)
    else:
        q1, q2 = quant.quantize4(w1), quant.quantize4(w2)
        q3 = quant.quantize4_cols(w3)
        d1 = quant.dequantize4(q1, jnp.float32)
        d2 = quant.dequantize4(q2, jnp.float32)
        d3 = quant.dequantize4_cols(q3, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp.fused_swiglu(x, q1, q2, q3, norm_w=nw,
                                     norm_eps=1e-5, residual=x)
    xn = np.asarray(rms_norm(x, nw, 1e-5))
    h = jax.nn.silu(xn @ np.asarray(d1)) * (xn @ np.asarray(d2))
    ref = np.asarray(x) + np.asarray(h) @ np.asarray(d3)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("kind", ["int8", "int4", "int4g"])
def test_matmul_pre_norm_fold(kind):
    """pre_norm=(w, eps) in the quantized matmul kernels == rmsnorm first."""
    from jax.experimental.pallas import tpu as pltpu

    from uniaudio2_tpu.ops.norms import rms_norm

    k, n = 256, 384
    rng = jax.random.PRNGKey(22)
    kw, kx, kn = jax.random.split(rng, 3)
    w = jax.random.normal(kw, (k, n)) * 0.05
    x = jax.random.normal(kx, (3, k), jnp.float32)
    nw = 1.0 + jax.random.normal(kn, (k,)) * 0.1
    q = {"int8": quant.quantize, "int4": quant.quantize4,
         "int4g": quant.quantize4_grouped}[kind](w)
    deq = {"int8": quant.dequantize, "int4": quant.dequantize4,
           "int4g": quant.dequantize4_grouped}[kind](q, jnp.float32)
    fn = {"int8": quant._pallas_int8_matmul,
          "int4": quant._pallas_int4_matmul,
          "int4g": quant._pallas_int4g_matmul}[kind]
    with pltpu.force_tpu_interpret_mode():
        out = fn(x, q.values, q.scale, pre_norm=(nw, 1e-5))
    ref = np.asarray(rms_norm(x, nw, 1e-5)) @ np.asarray(deq)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=2e-2, atol=2e-3)

    # dispatcher fallback path agrees too
    out2 = quant.matmul(x, q, pre_norm=(nw, 1e-5))
    np.testing.assert_allclose(np.asarray(out2, np.float32), ref,
                               rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("kind", ["int8", "int4", "int4g"])
def test_chunk_major_matmul(kind):
    """Chunk-major storage: same results through the kernels, fallback, and
    dequantize round trip (values (C, K*, bc) with contiguous block DMA)."""
    from jax.experimental.pallas import tpu as pltpu

    k, n, bc = 256, 1024, 256
    rng = jax.random.PRNGKey(30)
    kw_, kx = jax.random.split(rng)
    w = jax.random.normal(kw_, (k, n)) * 0.05
    x = jax.random.normal(kx, (2, k), jnp.float32)
    qf = {"int8": quant.quantize, "int4": quant.quantize4,
          "int4g": quant.quantize4_grouped}[kind]
    deqf = {"int8": quant.dequantize, "int4": quant.dequantize4,
            "int4g": quant.dequantize4_grouped}[kind]
    q = qf(w)
    qc = quant.chunk_major(q, bc)
    assert qc.values.ndim == 3 and qc.values.shape[0] == n // bc
    # dequantize agrees between layouts
    np.testing.assert_array_equal(np.asarray(deqf(q, jnp.float32)),
                                  np.asarray(deqf(qc, jnp.float32)))
    fn = {"int8": quant._pallas_int8_matmul,
          "int4": quant._pallas_int4_matmul,
          "int4g": quant._pallas_int4g_matmul}[kind]
    with pltpu.force_tpu_interpret_mode():
        out_c = fn(x, qc.values, qc.scale)
        out_r = fn(x, q.values, q.scale)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r),
                               rtol=1e-5, atol=1e-6)
    # dispatcher fallback path on the chunked layout
    out_f = quant.matmul(x, qc)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("bits", [8, 4, "4g"])
def test_fused_swiglu_chunk_major(bits):
    """The fused SwiGLU accepts chunk-major W1/W2 and matches row-major."""
    from jax.experimental.pallas import tpu as pltpu

    from uniaudio2_tpu.ops import fused_mlp

    k, i, n = 256, 512, 256
    rng = jax.random.PRNGKey(31)
    k1, k2, k3, kx = jax.random.split(rng, 4)
    w1 = jax.random.normal(k1, (k, i)) * 0.05
    w2 = jax.random.normal(k2, (k, i)) * 0.05
    w3 = jax.random.normal(k3, (i, n)) * 0.05
    x = jax.random.normal(kx, (2, k), jnp.float32)
    if bits == 8:
        q1, q2, q3 = quant.quantize(w1), quant.quantize(w2), quant.quantize(w3)
    elif bits == "4g":
        q1, q2 = quant.quantize4_grouped(w1), quant.quantize4_grouped(w2)
        q3 = quant.quantize4_cols_grouped(w3)
    else:
        q1, q2 = quant.quantize4(w1), quant.quantize4(w2)
        q3 = quant.quantize4_cols(w3)
    c1, c2 = quant.chunk_major(q1, 256), quant.chunk_major(q2, 256)
    assert fused_mlp.can_fuse(c1, c2, q3, x)
    with pltpu.force_tpu_interpret_mode():
        out_c = fused_mlp.fused_swiglu(x, c1, c2, q3)
        out_r = fused_mlp.fused_swiglu(x, q1, q2, q3)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r),
                               rtol=1e-5, atol=1e-6)


def test_prepare_serving_chunk_major_decode():
    """Tiny quantized unified decode with the chunk-major serving layout
    matches the row-major layout greedily end to end."""
    import os

    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.engine import tasks
    from uniaudio2_tpu.engine.decode import DecodeEngine
    from uniaudio2_tpu.models import unified

    cfg = UnifiedModelConfig.tiny()
    base = unified.init_params(jax.random.PRNGKey(0), cfg)
    qp = quant.quantize_unified_params(
        jax.tree_util.tree_map(lambda a: a, base),
        int4_modules=("decoder", "audio_head", "projection_w"))
    grid, mask = tasks.prepare_tts(np.arange(1, 5), np.arange(2, 8),
                                   cfg.tokens)

    outs = {}
    for flag in ("0", "1"):
        os.environ["UA2_CHUNK_MAJOR"] = flag
        try:
            sp = unified.prepare_serving_params(
                jax.tree_util.tree_map(lambda a: a, qp))
            eng = DecodeEngine(sp, cfg, max_frames=6,
                               cache_dtype=jnp.float32, buckets=(32,))
            r, s = eng.generate_audio(grid, mask, topk=1)
            outs[flag] = (np.asarray(r), np.asarray(s))
        finally:
            os.environ.pop("UA2_CHUNK_MAJOR", None)
    np.testing.assert_array_equal(outs["0"][0], outs["1"][0])
    np.testing.assert_array_equal(outs["0"][1], outs["1"][1])


def test_residual_fold_matches_separate_add():
    """matmul(residual=r) == matmul() + r across quant types and both the
    Pallas (interpret) and fallback paths."""
    from jax.experimental.pallas import tpu as pltpu

    x = jax.random.normal(jax.random.PRNGKey(40), (2, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(41), (256, 512)) * 0.05
    for make in (quant.quantize, quant.quantize4,
                 lambda ww: quant.quantize4_grouped(ww, 64),
                 lambda ww: quant.chunk_major(quant.quantize4(ww), 128)):
        q = make(w)
        r = jax.random.normal(jax.random.PRNGKey(42), (2, 512), jnp.float32)
        base = quant.matmul(x, q)
        folded = quant.matmul(x, q, residual=r)
        np.testing.assert_allclose(np.asarray(folded),
                                   np.asarray(base + r), rtol=1e-5, atol=1e-5)
        with pltpu.force_tpu_interpret_mode():
            if isinstance(q, quant.QuantizedLinear4G):
                pk = quant._pallas_int4g_matmul(
                    x, q.values, q.scale, residual=r)
            elif isinstance(q, quant.QuantizedLinear4):
                pk = quant._pallas_int4_matmul(
                    x, q.values, q.scale, residual=r)
            else:
                pk = quant._pallas_int8_matmul(
                    x, q.values, q.scale, residual=r)
        np.testing.assert_allclose(np.asarray(pk), np.asarray(base + r),
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Row-interleaved int4 (serving bitcast layout)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("src", ["int4", "int4g", "c4", "c4g"])
def test_interleaved_roundtrip_exact(src):
    """to_interleaved is a pure byte-order transform: dequantized values are
    EXACTLY the source dequantized values (same nibbles, same scales)."""
    w = jax.random.normal(jax.random.PRNGKey(50), (256, 384)) * 0.05
    if src == "int4":
        q = quant.quantize4(w)
        ref = quant.dequantize4(q, jnp.float32)
    elif src == "int4g":
        q = quant.quantize4_grouped(w, 64)
        ref = quant.dequantize4_grouped(q, jnp.float32)
    elif src == "c4":
        q = quant.quantize4_cols(w)
        ref = quant.dequantize4_cols(q, jnp.float32)
    else:
        q = quant.quantize4_cols_grouped(w, 64)
        ref = quant.dequantize4_cols_grouped(q, jnp.float32)
    qi = quant.to_interleaved(q)
    grouped = src.endswith("g")
    assert isinstance(qi, quant.QuantizedLinearI4G if grouped
                      else quant.QuantizedLinearI4)
    assert qi.values.shape[-2] == 128          # K/2 byte rows
    deq = (quant.dequantize4_interleaved_grouped(qi, jnp.float32) if grouped
           else quant.dequantize4_interleaved(qi, jnp.float32))
    np.testing.assert_array_equal(np.asarray(deq), np.asarray(ref))


@pytest.mark.parametrize("grouped", [False, True])
@pytest.mark.parametrize("chunked", [False, True])
def test_int4i_pallas_kernel_interpret(grouped, chunked):
    from jax.experimental.pallas import tpu as pltpu

    x = jax.random.normal(jax.random.PRNGKey(51), (2, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(52), (256, 512)) * 0.05
    q = quant.to_interleaved(
        quant.quantize4_grouped(w, 64) if grouped else quant.quantize4(w))
    deq = (quant.dequantize4_interleaved_grouped(q, jnp.float32) if grouped
           else quant.dequantize4_interleaved(q, jnp.float32))
    if chunked:
        q = quant.chunk_major(q, 256)
        assert q.values.ndim == 3
    ref = np.asarray(x) @ np.asarray(deq)
    with pltpu.force_tpu_interpret_mode():
        out = quant._pallas_int4i_matmul(x, q.values, q.scale)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-3)
    # norm + residual folds
    nw = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(53), (256,))
    r = jax.random.normal(jax.random.PRNGKey(54), (2, 512), jnp.float32)
    from uniaudio2_tpu.ops.norms import rms_norm

    refn = np.asarray(rms_norm(x, nw, 1e-5) @ deq + r)
    with pltpu.force_tpu_interpret_mode():
        outn = quant._pallas_int4i_matmul(
            x, q.values, q.scale, pre_norm=(nw, 1e-5), residual=r)
    np.testing.assert_allclose(np.asarray(outn), refn, rtol=1e-2, atol=1e-3)


def test_int4i_matmul_dispatch_fallback():
    """The matmul dispatcher handles I4/I4G off-TPU via the dequant path."""
    x = jax.random.normal(jax.random.PRNGKey(55), (3, 5, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(56), (256, 192)) * 0.05
    for make, deqf in [
        (quant.quantize4, quant.dequantize4),
        (lambda ww: quant.quantize4_grouped(ww, 64),
         quant.dequantize4_grouped),
    ]:
        q = make(w)
        qi = quant.to_interleaved(q)
        out = quant.matmul(x, qi)
        ref = quant.matmul(x, q)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        r = jax.random.normal(jax.random.PRNGKey(57), (3, 5, 192))
        out_r = quant.matmul(x, qi, residual=r)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref + r),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("grouped", [False, True])
@pytest.mark.parametrize("chunked", [False, True])
def test_fused_swiglu_interleaved(grouped, chunked):
    """Fused SwiGLU with all-interleaved weights matches the source-layout
    fused kernel (same nibble values -> tight tolerance)."""
    from jax.experimental.pallas import tpu as pltpu

    from uniaudio2_tpu.ops import fused_mlp

    k, i, n = 256, 512, 256
    k1, k2, k3, kx = jax.random.split(jax.random.PRNGKey(58), 4)
    w1 = jax.random.normal(k1, (k, i)) * 0.05
    w2 = jax.random.normal(k2, (k, i)) * 0.05
    w3 = jax.random.normal(k3, (i, n)) * 0.05
    x = jax.random.normal(kx, (2, k), jnp.float32)
    if grouped:
        q1, q2 = quant.quantize4_grouped(w1, 64), quant.quantize4_grouped(w2, 64)
        q3 = quant.quantize4_cols_grouped(w3, 64)
    else:
        q1, q2 = quant.quantize4(w1), quant.quantize4(w2)
        q3 = quant.quantize4_cols(w3)
    i1, i2, i3 = (quant.to_interleaved(q) for q in (q1, q2, q3))
    if chunked:
        i1, i2 = quant.chunk_major(i1, 256), quant.chunk_major(i2, 256)
    assert fused_mlp.can_fuse(i1, i2, i3, x)
    nw = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(59), (k,))
    r = jax.random.normal(jax.random.PRNGKey(60), (2, n), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp.fused_swiglu(x, i1, i2, i3, norm_w=nw, residual=r)
        ref = fused_mlp.fused_swiglu(x, q1, q2, q3, norm_w=nw, residual=r)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_prepare_serving_int4i_decode():
    """Tiny int4 unified decode with the interleaved serving layout matches
    the non-interleaved layout greedily end to end (identical dequantized
    values -> identical CPU decode math)."""
    import os

    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.engine import tasks
    from uniaudio2_tpu.engine.decode import DecodeEngine
    from uniaudio2_tpu.models import unified

    cfg = UnifiedModelConfig.tiny()
    base = unified.init_params(jax.random.PRNGKey(0), cfg)
    qp = quant.quantize_unified_params(
        jax.tree_util.tree_map(lambda a: a, base),
        int4_modules=("decoder", "audio_head", "projection_w"))
    grid, mask = tasks.prepare_tts(np.arange(1, 5), np.arange(2, 8),
                                   cfg.tokens)

    outs = {}
    for flag in ("0", "1"):
        os.environ["UA2_INT4I"] = flag
        try:
            sp = unified.prepare_serving_params(
                jax.tree_util.tree_map(lambda a: a, qp))
            if flag == "1":
                found = [
                    v for v in sp["decoder"]["layers"][0].values()
                    if isinstance(v, (quant.QuantizedLinearI4,
                                      quant.QuantizedLinearI4G))
                ]
                assert found, "interleave did not apply to decoder leaves"
            eng = DecodeEngine(sp, cfg, max_frames=6,
                               cache_dtype=jnp.float32, buckets=(32,))
            r, s = eng.generate_audio(grid, mask, topk=1)
            outs[flag] = (np.asarray(r), np.asarray(s))
        finally:
            os.environ.pop("UA2_INT4I", None)
    np.testing.assert_array_equal(outs["0"][0], outs["1"][0])
    np.testing.assert_array_equal(outs["0"][1], outs["1"][1])


def test_chunk_major_pads_indivisible_width():
    """`chunk_major` zero-pads a stored width that doesn't divide the chunk
    width instead of silently no-opping (the quantizers 512-align storage,
    so this exercises non-default bc). Scales keep true width; dequant +
    kernels trim."""
    from jax.experimental.pallas import tpu as pltpu

    w = jax.random.normal(jax.random.PRNGKey(60), (256, 600)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(61), (2, 256), jnp.float32)

    # int8: quantize 512-aligns storage to 1024; chunk at 384 -> pad to 1152
    q8 = quant.quantize(w)
    assert q8.values.shape == (256, 1024)
    c8 = quant.chunk_major(q8, 384)
    assert c8.values.shape == (3, 256, 384) and c8.scale.shape == (600,)
    np.testing.assert_array_equal(
        np.asarray(quant.dequantize(c8, jnp.float32)),
        np.asarray(quant.dequantize(q8, jnp.float32)))
    ref = np.asarray(x) @ np.asarray(quant.dequantize(q8, jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        out = quant._pallas_int8_matmul(x, c8.values, c8.scale)
    assert out.shape == (2, 600)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-3)

    # row-interleaved int4 (the audio_head serving format, non-default bc)
    qi = quant.to_interleaved(quant.quantize4(w))
    ci = quant.chunk_major(qi, 384)
    assert ci.values.shape == (3, 128, 384)
    np.testing.assert_array_equal(
        np.asarray(quant.dequantize4_interleaved(ci, jnp.float32)),
        np.asarray(quant.dequantize4_interleaved(qi, jnp.float32)))
    refi = np.asarray(x) @ np.asarray(
        quant.dequantize4_interleaved(qi, jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        outi = quant._pallas_int4i_matmul(x, ci.values, ci.scale)
    assert outi.shape == (2, 600)
    np.testing.assert_allclose(np.asarray(outi), refi, rtol=1e-2, atol=1e-3)
