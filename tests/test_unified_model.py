"""Unified-model correctness: decode path vs full forward, stream muxing,
and the local RQ-decoder loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.models import gpt, unified


@pytest.fixture(scope="module")
def tiny():
    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _random_grid(cfg, key, s, batch=1):
    """Random mixed audio/text grid: alternating audio and text steps."""
    ts = cfg.tokens
    k1, k2 = jax.random.split(key)
    audio = jax.random.randint(k1, (batch, s, ts.num_codebooks), 0, 30)
    text = jax.random.randint(k2, (batch, s, 1), 0, 800)
    tokens = jnp.concatenate([audio, text], axis=-1)
    # even steps audio, odd steps text
    step_is_audio = (jnp.arange(s) % 2 == 0)
    mask = jnp.zeros((batch, s, ts.parallel_number), bool)
    mask = mask.at[:, :, : ts.num_codebooks].set(step_is_audio[None, :, None])
    mask = mask.at[:, :, -1].set(~step_is_audio[None, :])
    tokens = tokens * mask  # zero inactive streams like the data pipeline
    return tokens.astype(jnp.int32), mask


def test_forward_shapes(tiny):
    cfg, params = tiny
    ts = cfg.tokens
    s, b = 6, 2
    tokens, mask = _random_grid(cfg, jax.random.PRNGKey(1), s, b)
    mask_ext = jnp.concatenate([mask, mask[:, -1:, :]], axis=1)  # (B, S+1, 9)
    labels = jax.random.randint(jax.random.PRNGKey(2), (b, s, ts.num_codebooks), 0, 30)
    text_logits, audio_logits = unified.forward(params, cfg, tokens, labels, mask_ext)
    assert text_logits.shape == (b, s, cfg.backbone.padded_vocab_size)
    assert audio_logits.shape == (b, s, ts.num_codebooks, ts.audio_vocab)


def test_prefill_decode_matches_forward_text(tiny):
    """The cached decode path must reproduce the no-cache forward_text logits
    step by step (validates expert/backbone cache threading and muxing)."""
    cfg, params = tiny
    s = 8
    tokens, mask = _random_grid(cfg, jax.random.PRNGKey(3), s)
    full_logits = unified.forward_text(params, cfg, tokens, mask)

    caches = unified.init_caches(cfg, 1, dtype=jnp.float32)
    caches = unified.prefill(params, cfg, tokens[:, : s - 1], mask[:, : s - 1], caches)

    # Step the last token through the decode path; its text logits must match
    # the full forward at position s-1.
    frame, _ = unified.decode_frame(
        params, cfg, tokens[:, s - 1 : s], mask[:, s - 1 : s], caches,
        jnp.int32(s - 1), jax.random.PRNGKey(0),
        temperature=1.0, topk=1, forbid_prefix=jnp.int32(0),
    )
    # Greedy text token == argmax of the full-forward logits at the last step
    expected = jnp.argmax(full_logits[0, s - 1])
    assert int(frame[0, 0]) == int(expected)


def test_decode_frame_cfg_broadcasts(tiny):
    cfg, params = tiny
    s = 4
    tokens, mask = _random_grid(cfg, jax.random.PRNGKey(4), s)
    tokens2 = jnp.concatenate([tokens, tokens], axis=0)
    mask2 = jnp.concatenate([mask, mask], axis=0)
    caches = unified.init_caches(cfg, 2, dtype=jnp.float32)
    caches = unified.prefill(params, cfg, tokens2[:, :-1], mask2[:, :-1], caches)
    frame, _ = unified.decode_frame(
        params, cfg, tokens2[:, -1:], mask2[:, -1:], caches, jnp.int32(s - 1),
        jax.random.PRNGKey(1), temperature=0.9, topk=3,
        forbid_prefix=jnp.int32(0), use_cfg=True, cfg_scale=jnp.float32(1.5),
    )
    # CFG: both rows must carry the same sampled tokens
    np.testing.assert_array_equal(np.asarray(frame[0]), np.asarray(frame[1]))


def test_serving_fold_matches_unfolded_decode(tiny):
    """prepare_serving_params folds audio_embeddings @ projection_w; the
    greedy frame decode must be unchanged (the fold is exact linearity, only
    dtype rounding differs — fp32 here, so bit-equal sampling decisions)."""
    cfg, params = tiny
    s = 4
    tokens, mask = _random_grid(cfg, jax.random.PRNGKey(11), s)
    folded = unified.prepare_serving_params(params, dtype=jnp.float32)
    assert folded["audio_embeddings_proj"].shape == (
        params["audio_embeddings"].shape[0], cfg.decoder.n_embd)
    frames = []
    for p in (params, folded):
        caches = unified.init_caches(cfg, 1, dtype=jnp.float32)
        caches = unified.prefill(p, cfg, tokens[:, :-1], mask[:, :-1], caches)
        frame, _ = unified.decode_frame(
            p, cfg, tokens[:, -1:], mask[:, -1:], caches, jnp.int32(s - 1),
            jax.random.PRNGKey(7), temperature=0.9, topk=3,
            forbid_prefix=jnp.int32(0),
        )
        frames.append(np.asarray(frame))
    np.testing.assert_array_equal(frames[0], frames[1])


def test_forbid_prefix_masks_reasoning_vocab(tiny):
    """With forbid_prefix = reason_card, sampled audio ids must all fall in
    the semantic segment (reference audio_sample_topk semantics,
    model_new.py:158-187)."""
    cfg, params = tiny
    ts = cfg.tokens
    s = 4
    tokens, mask = _random_grid(cfg, jax.random.PRNGKey(5), s)
    caches = unified.init_caches(cfg, 1, dtype=jnp.float32)
    caches = unified.prefill(params, cfg, tokens[:, :-1], mask[:, :-1], caches)
    frame, _ = unified.decode_frame(
        params, cfg, tokens[:, -1:], mask[:, -1:], caches, jnp.int32(s - 1),
        jax.random.PRNGKey(2), temperature=0.9, topk=5,
        forbid_prefix=jnp.int32(ts.audio_reason_card),
    )
    audio = np.asarray(frame[0, 1:])
    assert (audio >= ts.audio_reason_card).all()


def test_empty_streams_do_not_affect_output(tiny):
    """Masked (inactive) stream values must not change the computation —
    the reference relies on this to stuff empty_token=0 into unused slots
    (asr_task.py:197)."""
    cfg, params = tiny
    s = 6
    tokens, mask = _random_grid(cfg, jax.random.PRNGKey(6), s)
    # scribble garbage into masked positions
    garbage = jax.random.randint(jax.random.PRNGKey(7), tokens.shape, 0, 30)
    tokens_g = jnp.where(mask, tokens, garbage).astype(jnp.int32)
    out_a = unified.forward_text(params, cfg, tokens, mask)
    out_b = unified.forward_text(params, cfg, tokens_g, mask)
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), atol=1e-5, rtol=1e-5
    )
