"""Codec encode path: reasoning CLS interleave semantics, FiLM, and the
wav -> (reason, semantic) tokenize pipeline on tiny configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import reasoning as reas
from uniaudio2_tpu.codec import encoder as enc
from uniaudio2_tpu.codec.decoder import CodecConfig
from uniaudio2_tpu.codec.encoder import EncoderConfig
from uniaudio2_tpu.codec.tokenizer import ReasoningCodecTokenizer


def test_cls_interleave_and_extract():
    x = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
    cls = jnp.full((3,), -1.0)
    out = reas.interleave_cls(x, cls, 5)
    assert out.shape == (2, 12, 3)
    # positions 5 and 11 are CLS
    np.testing.assert_array_equal(np.asarray(out[:, 5]), np.full((2, 3), -1.0))
    np.testing.assert_array_equal(np.asarray(out[:, 11]), np.full((2, 3), -1.0))
    # non-CLS positions preserve order
    np.testing.assert_array_equal(np.asarray(out[:, :5]), np.asarray(x[:, :5]))
    np.testing.assert_array_equal(np.asarray(out[:, 6:11]), np.asarray(x[:, 5:]))
    cls_out = reas.extract_cls(out, 5)
    assert cls_out.shape == (2, 2, 3)
    np.testing.assert_array_equal(np.asarray(cls_out), np.full((2, 2, 3), -1.0))


def test_film_semantics():
    x = jnp.ones((1, 4, 2))
    cond = jnp.zeros((1, 4, 2))
    layer = {"w": jnp.zeros((2, 4)), "b": jnp.asarray([10.0, -10.0, 0.5, -0.5])}
    out = enc.film(x, cond, layer, gamma_scale=0.1)
    # gamma = 1 + 0.1*tanh([10,-10]) ~= [1.1, 0.9]; beta = [0.5, -0.5]
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), [1.1 * 1 + 0.5, 0.9 * 1 - 0.5], atol=1e-4
    )


def test_reasoning_encode_shapes():
    cfg = reas.ReasoningConfig.tiny_test()
    params = reas.init_params(jax.random.PRNGKey(0), cfg)
    whisper = jax.random.normal(jax.random.PRNGKey(1), (2, 40, cfg.whisper_dim))
    bestrq = jax.random.normal(jax.random.PRNGKey(2), (2, 20, cfg.bestrq_dim))
    codes, quant = reas.encode(params, cfg, whisper, bestrq)
    # min(40//2, 20) = 20 frames -> 4 CLS queries
    assert codes.shape == (2, 4, cfg.num_quantizers)
    assert quant.shape == (2, 4, cfg.dim)
    assert int(codes.max()) < cfg.codebook_size


@pytest.fixture(scope="module")
def tiny_tokenizer():
    enc_cfg = EncoderConfig.tiny_test()
    codec_cfg = CodecConfig(
        sample_rate=16000, codec_dim=enc_cfg.codec_dim, latent_dim=8,
        rec_codebook_size=32, reason_codebook_size=16,
        rec_codebook_dim=8, reason_codebook_dim=8, window_seconds=0.5,
    )
    params = enc.init_encode_params(jax.random.PRNGKey(0), enc_cfg)
    return ReasoningCodecTokenizer(
        params, None, enc_cfg, codec_cfg, min_duration=0.5
    )


def test_encode_window_shapes(tiny_tokenizer):
    tok = tiny_tokenizer
    wav = np.random.default_rng(0).standard_normal((1, 8240)).astype(np.float32)
    reason, rec = enc.encode_window(
        tok.enc_params, tok.enc_cfg, tok.cfg, jnp.asarray(wav)
    )
    assert reason.ndim == 3 and reason.shape[-1] == 8
    assert rec.ndim == 3 and rec.shape[-1] == 8
    assert reason.shape[1] > 0 and rec.shape[1] > 0


def test_tokenize_end_to_end(tiny_tokenizer):
    tok = tiny_tokenizer
    wav = (np.sin(np.linspace(0, 300, 12000)) * 0.3).astype(np.float32)
    reason, semantic = tok.tokenize(wav)
    assert reason.shape[0] == 8 and semantic.shape[0] == 8
    assert reason.shape[1] > 0 and semantic.shape[1] > 0
    assert reason.dtype == np.int64
    # determinism (the reference is stochastic here by defect; we are not)
    r2, s2 = tok.tokenize(wav)
    np.testing.assert_array_equal(reason, r2)
    np.testing.assert_array_equal(semantic, s2)
