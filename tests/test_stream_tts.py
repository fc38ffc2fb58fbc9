"""Streaming decode/TTS: incremental outputs must equal the offline path
bit-for-bit (same chunk schedule, same PRNG sequence)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec.decoder import CodecConfig, CodecDecoder, \
    init_decode_params
from uniaudio2_tpu.codec.streaming_decoder import StreamingCodecDecoder


@pytest.fixture(scope="module")
def codec():
    cfg = CodecConfig.tiny()
    params = init_decode_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def _stream_all(params, cfg, codes, feed_sizes, seed=0):
    sd = StreamingCodecDecoder(params, cfg, num_steps=4, seed=seed)
    outs = []
    t = 0
    rng_sizes = list(feed_sizes)
    while t < codes.shape[1]:
        k = min(rng_sizes.pop(0) if rng_sizes else 3, codes.shape[1] - t)
        outs.append(sd.feed(codes[:, t : t + k]))
        t += k
    outs.append(sd.flush())
    return np.concatenate(outs, axis=-1)


def test_streaming_decoder_matches_offline_multichunk(codec):
    params, cfg = codec
    win = cfg.window_rec_frames
    hop = win // 4 * 3
    rng = np.random.default_rng(0)
    # spans 3 full chunks exactly (no flush padding)
    t_rec = win + 2 * hop
    codes = rng.integers(0, 60, (8, t_rec))

    offline = CodecDecoder(params, cfg).decode(codes, num_steps=4, seed=0)
    streamed = _stream_all(params, cfg, codes, [1, 5, 2, 7, 3])
    assert streamed.shape == np.asarray(offline).shape
    np.testing.assert_array_equal(streamed, np.asarray(offline))


def test_streaming_decoder_flush_padding(codec):
    """A ragged tail (partial window) pads and solves at flush exactly
    like the offline path."""
    params, cfg = codec
    win = cfg.window_rec_frames
    hop = win // 4 * 3
    rng = np.random.default_rng(1)
    t_rec = win + hop + hop // 2     # ragged: flush must repeat-pad
    codes = rng.integers(0, 60, (8, t_rec))
    offline = CodecDecoder(params, cfg).decode(codes, num_steps=4, seed=3)
    streamed = _stream_all(params, cfg, codes, [4, 4, 4], seed=3)
    np.testing.assert_array_equal(streamed, np.asarray(offline))


def test_streaming_decoder_incremental_latency(codec):
    """Audio must start flowing after the first window, not at flush."""
    params, cfg = codec
    win = cfg.window_rec_frames
    hop = win // 4 * 3
    rng = np.random.default_rng(2)
    sd = StreamingCodecDecoder(params, cfg, num_steps=4)
    got_early = sd.feed(rng.integers(0, 60, (8, win)))
    assert got_early.shape[-1] > 0          # first chunk emitted pre-flush
    got_more = sd.feed(rng.integers(0, 60, (8, hop)))
    assert got_more.shape[-1] > 0
    sd.flush()


def test_stream_tts_end_to_end_matches_offline():
    """Full pipeline: streamed LLM frames -> streamed codec decode equals
    (greedy LLM -> offline codec decode)."""
    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.engine import tasks
    from uniaudio2_tpu.engine.continuous import ContinuousEngine
    from uniaudio2_tpu.engine.decode import DecodeEngine
    from uniaudio2_tpu.engine.stream_tts import stream_tts
    from uniaudio2_tpu.models import unified

    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = CodecConfig.tiny()
    cparams = init_decode_params(jax.random.PRNGKey(1), ccfg)
    g, m = tasks.prepare_tts(np.array([1, 5, 6]), np.array([1, 10, 2]),
                             cfg.tokens)

    ref_eng = DecodeEngine(params, cfg, max_frames=24,
                           cache_dtype=jnp.float32, buckets=(32,))
    _, semantic = ref_eng.generate_audio(g, m, topk=1)
    semantic = np.asarray(semantic)

    # the streamed token sequence itself must match offline greedy
    from uniaudio2_tpu.engine.decode import PHASE_SEMANTIC

    ce = ContinuousEngine(params, cfg, mode="audio", rows=1, bucket=32,
                          seg_frames=6, cache_len=128, max_frames=24,
                          topk=1, cache_dtype=jnp.float32)
    sem_frames = [f - cfg.tokens.audio_reason_card
                  for p, f in ce.stream(g, m) if p == PHASE_SEMANTIC]
    sem_streamed = (np.stack(sem_frames, axis=1) if sem_frames
                    else np.zeros((8, 0), np.int64))
    np.testing.assert_array_equal(sem_streamed, semantic)

    ce2 = ContinuousEngine(params, cfg, mode="audio", rows=1, bucket=32,
                           seg_frames=6, cache_len=128, max_frames=24,
                           topk=1, cache_dtype=jnp.float32)
    chunks = list(stream_tts(ce2, cparams, ccfg, g, m, num_steps=4,
                             codec_seed=5))
    if semantic.shape[1] == 0:
        assert chunks == []
        return
    offline_wav = CodecDecoder(cparams, ccfg).decode(
        semantic, num_steps=4, seed=5)
    streamed = np.concatenate(chunks, axis=-1)
    # short clips delegate to the offline facade at flush, so the whole
    # pipeline is bit-identical to (greedy LLM -> offline codec decode)
    np.testing.assert_array_equal(streamed, np.asarray(offline_wav))


def test_stream_tts_glue_with_scripted_llm(codec):
    """stream_tts phase filtering / offset removal / flush, driven by a
    scripted LLM stream (untrained tiny models never reach the semantic
    phase, so this pins the glue deterministically)."""
    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.engine.decode import (
        PHASE_DROPPED, PHASE_REASON, PHASE_SEMANTIC,
    )
    from uniaudio2_tpu.engine.stream_tts import stream_tts

    params, ccfg = codec
    cfg = UnifiedModelConfig.tiny()
    card = cfg.tokens.audio_reason_card
    win = ccfg.window_rec_frames
    hop = win // 4 * 3
    rng = np.random.default_rng(3)
    sem = rng.integers(0, 60, (8, win + hop))

    class Scripted:
        def __init__(self):
            self.cfg = cfg

        def stream(self, grid, mask, max_frames=None):
            yield PHASE_REASON, np.zeros(8, np.int64)      # ignored
            # generated semantic-BOS frame: offline split drops it
            # (split_two_phase, decode.py:836-837); the stream must too
            yield PHASE_SEMANTIC, np.full(
                (8,), cfg.tokens.semantic_bos + card, np.int64)
            for t in range(sem.shape[1]):
                yield PHASE_SEMANTIC, sem[:, t] + card
                if t == 2:
                    yield PHASE_DROPPED, np.zeros(8, np.int64)  # ignored

    chunks = list(stream_tts(Scripted(), params, ccfg, None, None,
                             num_steps=4, codec_seed=9))
    streamed = np.concatenate(chunks, axis=-1)
    assert len(chunks) >= 2                      # incremental, not one blob
    sd = StreamingCodecDecoder(params, ccfg, num_steps=4, seed=9)
    ref = np.concatenate([sd.feed(sem), sd.flush()], axis=-1)
    np.testing.assert_array_equal(streamed, ref)
    offline = CodecDecoder(params, ccfg).decode(sem, num_steps=4, seed=9)
    np.testing.assert_array_equal(streamed, np.asarray(offline))


def test_streaming_decoder_short_clip_delegates_to_offline(codec):
    """Clips shorter than one window must match the offline facade's
    fractional-window decode bit-for-bit (flush delegates wholesale)."""
    params, cfg = codec
    win = cfg.window_rec_frames
    rng = np.random.default_rng(5)
    for t_rec in (max(2, win // 3), max(3, win - 1)):
        codes = rng.integers(0, 60, (8, t_rec))
        offline = CodecDecoder(params, cfg).decode(codes, num_steps=4, seed=7)
        sd = StreamingCodecDecoder(params, cfg, num_steps=4, seed=7)
        outs = [sd.feed(codes[:, :1]), sd.feed(codes[:, 1:]), sd.flush()]
        streamed = np.concatenate(outs, axis=-1)
        np.testing.assert_array_equal(streamed, np.asarray(offline))
