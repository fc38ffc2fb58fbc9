"""Codec decode path: RVQ semantics, DiT/CFM shapes, ScalarAE round-trip
shapes, and the chunked tokens->wav driver on a tiny config."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import cfm, dit, rvq, scalar_ae
from uniaudio2_tpu.codec.decoder import (
    CodecConfig, CodecDecoder, condition_features, init_decode_params,
    _upsample_nearest,
)


def test_rvq_decode_matches_manual():
    key = jax.random.PRNGKey(0)
    p = rvq.init_params(key, dim=12, codebook_size=7, codebook_dim=4,
                        num_quantizers=3)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 5, 3), 0, 7)
    out = rvq.decode(p, idx)
    cb = np.asarray(p["codebooks"])
    i = np.asarray(idx)
    summed = sum(cb[q][i[..., q]] for q in range(3))
    manual = summed @ np.asarray(p["project_out_w"]) + np.asarray(p["project_out_b"])
    np.testing.assert_allclose(np.asarray(out), manual, rtol=1e-5, atol=1e-5)


def test_rvq_encode_decode_roundtrip():
    """Encoding the decoded vectors of some codes must recover the codes
    (the codes are exactly representable)."""
    key = jax.random.PRNGKey(2)
    p = rvq.init_params(key, dim=16, codebook_size=11, codebook_dim=16,
                        num_quantizers=2)
    # identity projections so the residual structure is exact
    p["project_in_w"] = jnp.eye(16)
    p["project_in_b"] = jnp.zeros(16)
    p["project_out_w"] = jnp.eye(16)
    p["project_out_b"] = jnp.zeros(16)
    # make the second codebook small-magnitude so NN search is unambiguous
    p["codebooks"] = p["codebooks"].at[1].multiply(0.05)
    idx = jax.random.randint(jax.random.PRNGKey(3), (1, 6, 2), 0, 11)
    vec = rvq.decode(p, idx)
    idx2, quant = rvq.encode(p, vec)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx))
    np.testing.assert_allclose(np.asarray(quant), np.asarray(vec), atol=1e-5)


def test_upsample_nearest_matches_torch_semantics():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1)
    out = _upsample_nearest(x, 2.5)
    assert out.shape == (1, 20, 1)
    expected = [math.floor(i / 2.5) for i in range(20)]
    np.testing.assert_array_equal(np.asarray(out)[0, :, 0], expected)
    out2 = _upsample_nearest(x, 2.0)
    np.testing.assert_array_equal(
        np.asarray(out2)[0, :, 0], np.repeat(np.arange(8), 2)
    )


def test_dit_forward_shape_and_determinism():
    cfg = dit.DiTConfig.tiny()
    p = dit.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.in_channels))
    t = jnp.array([0.3, 0.7])
    out = dit.forward(p, cfg, x, t)
    assert out.shape == (2, 16, cfg.out_channels)
    out2 = dit.forward(p, cfg, x, t)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # time conditioning must matter
    out3 = dit.forward(p, cfg, x, jnp.array([0.9, 0.1]))
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-6


def test_cfm_solver_integrates_constant_field():
    """With a constant estimator v(x,t)=c the Euler solve from noise must end
    at noise + c (dt sums to 1), and in-context frames must be clamped."""
    lat = 4

    def estimator(x_cat, t):
        return jnp.ones((x_cat.shape[0], x_cat.shape[1], lat))

    mu = jnp.zeros((1, 6, 3))
    ctx = jnp.full((1, 6, lat), 7.0)
    ctx_mask = jnp.array([[True, True, False, False, False, False]])
    out = cfm.solve_euler(
        estimator, key=jax.random.PRNGKey(0), mu=mu, incontext_x=ctx,
        incontext_mask=ctx_mask, num_steps=5, guidance_scale=1.0,
        latent_dim=lat,
    )
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 6, lat))
    np.testing.assert_allclose(
        np.asarray(out[:, :2]), np.full((1, 2, lat), 7.0), atol=1e-5
    )
    # generated frames: start from noise, last re-noise at t=0.8 mixes the
    # path; just check finiteness and deviation from pure noise
    assert np.isfinite(np.asarray(out)).all()


def test_cfm_cfg_reduces_to_uncond_plus_scaled_delta():
    lat = 2

    def estimator(x_cat, t):
        # velocity depends on the conditioning channels -> cond != uncond
        mu_part = x_cat[..., -1:]
        return jnp.concatenate([mu_part, jnp.zeros_like(mu_part)], -1)

    mu = jnp.ones((1, 3, 1))
    ctx = jnp.zeros((1, 3, lat))
    mask = jnp.zeros((1, 3), bool)
    out_g = cfm.solve_euler(
        estimator, key=jax.random.PRNGKey(1), mu=mu, incontext_x=ctx,
        incontext_mask=mask, num_steps=1, guidance_scale=2.0, latent_dim=lat,
    )
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 3, lat))
    # uncond velocity = 0 (mu zeroed), cond = 1 -> guided = 0 + 2*(1-0) = 2
    np.testing.assert_allclose(
        np.asarray(out_g[..., 0]), np.asarray(noise[..., 0]) + 2.0, atol=1e-5
    )


def test_scalar_ae_shapes_and_quantizer():
    cfg = scalar_ae.ScalarAEConfig.tiny()
    p = scalar_ae.init_params(jax.random.PRNGKey(0), cfg)
    wav = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 1))
    lat = scalar_ae.encode(p, cfg, wav)
    assert lat.shape == (1, 64 // cfg.total_stride, cfg.latent_hidden_dim)
    assert np.abs(np.asarray(lat)).max() <= 1.0  # tanh bounded
    out = scalar_ae.decode(p, cfg, lat)
    assert out.shape == (1, 64, 1)
    q = scalar_ae.scalar_quantize(jnp.array([0.123, -0.456]), 9)
    np.testing.assert_allclose(
        np.asarray(q), np.round(np.array([0.123, -0.456]) * 9) / 9, atol=1e-6
    )


def test_codec_decoder_end_to_end_tiny():
    cfg = CodecConfig.tiny()
    params = init_decode_params(jax.random.PRNGKey(0), cfg)
    dec = CodecDecoder(params, cfg)
    t_rec = 40  # > one 25-frame window -> exercises chunking + crossfade
    rec = np.random.default_rng(0).integers(0, cfg.rec_codebook_size, (8, t_rec))
    reason = np.random.default_rng(1).integers(
        0, cfg.reason_codebook_size, (8, 16)
    )
    wav = dec.decode(rec, reason, num_steps=2, guidance_scale=1.5)
    expected_samples = int(t_rec / cfg.rec_hz * cfg.sample_rate)
    assert wav.shape == (1, expected_samples)
    assert np.isfinite(wav).all()
    # no-reason path (detokenize_no_reason parity)
    wav2 = dec.decode(rec, None, num_steps=2, guidance_scale=1.0)
    assert wav2.shape == (1, expected_samples)


def test_condition_features_shapes():
    cfg = CodecConfig.tiny()
    params = init_decode_params(jax.random.PRNGKey(0), cfg)
    rec = jnp.zeros((1, 25, 8), jnp.int32)
    reason = jnp.zeros((1, 10, 8), jnp.int32)
    mu = condition_features(params, cfg, rec, reason)
    assert mu.shape == (1, 50, cfg.codec_dim)


def test_short_clip_uses_smaller_window_bucket():
    """A one-chunk short clip must pick a fractional window (quarter/half)
    instead of padding to the full window — and still decode correctly."""
    cfg = CodecConfig.tiny()   # full window 2.0 s = 25 rec frames
    params = init_decode_params(jax.random.PRNGKey(0), cfg)
    dec = CodecDecoder(params, cfg)
    rec = np.random.default_rng(0).integers(0, cfg.rec_codebook_size, (8, 10))
    wav = dec.decode(rec, None, num_steps=2)
    assert wav.shape == (1, int(10 / cfg.rec_hz * cfg.sample_rate))
    # the compiled chunk fn was keyed on the half window (1.0 s), not 2.0 s
    assert any(k[0] == 1.0 for k in dec._chunk_fn)
