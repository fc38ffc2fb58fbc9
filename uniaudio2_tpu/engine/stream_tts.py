"""Streaming TTS: text in, waveform chunks out, incrementally.

The reference runs TTS as two offline stages — the full token generation,
then the full codec decode (`multi_task_inference.py:408-553`); first
audio arrives only after everything finishes. This driver pipelines the
two halves that already exist:

* the LLM half streams frames segment-by-segment from a single-slot
  `ContinuousEngine` (`engine/continuous.py::stream`);
* semantic-phase frames feed a `StreamingCodecDecoder`
  (`codec/streaming_decoder.py`), which solves a codec window as soon as
  its tokens have arrived and emits the finalized waveform prefix.

Time-to-first-audio therefore becomes (reason phase + one codec window of
semantic frames + one chunk solve) instead of the whole utterance; with
the production geometry (12.5 Hz semantic, LLM at ~147 frames/s, chunk
solve RTF 0.012) a 30 s-window chunk streams out ~7x faster than real
time after the first chunk.

The concatenated stream equals the offline pipeline bit-for-bit (same
tokens greedily, same codec chunk schedule/PRNG — `test_stream_tts.py`).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from uniaudio2_tpu.codec.streaming_decoder import StreamingCodecDecoder
from uniaudio2_tpu.engine.decode import PHASE_SEMANTIC


def stream_tts(
    llm_engine,                 # ContinuousEngine (mode="audio", rows=1)
    codec_params,
    codec_cfg,
    grid: np.ndarray,
    mask: np.ndarray,
    *,
    max_frames: Optional[int] = None,
    num_steps: int = 10,
    guidance_scale: float = 1.5,
    codec_seed: int = 0,
    window_seconds: Optional[float] = None,
) -> Iterator[np.ndarray]:
    """Yield finalized waveform chunks (1, n) float32 as generation
    proceeds. ``grid``/``mask`` come from `engine/tasks.py::prepare_tts`.

    ``window_seconds`` overrides the codec chunk window for this stream —
    the LOW-LATENCY profile (docs/stream_tts_r5.md): time-to-first-audio
    is dominated by filling the first codec window (default 30 s x
    12.5 Hz = 375 semantic frames), so an 8 s window cuts TTFA ~4x at the
    cost of less acoustic context per solve. Short windows are on the
    reference path already (fractional windows for short clips,
    decoder.py:273-282); `None` keeps the offline-bit-identical default.
    """
    card = llm_engine.cfg.tokens.audio_reason_card
    if window_seconds is not None:
        import dataclasses
        codec_cfg = dataclasses.replace(codec_cfg,
                                        window_seconds=float(window_seconds))
    sd = StreamingCodecDecoder(
        codec_params, codec_cfg, num_steps=num_steps,
        guidance_scale=guidance_scale, seed=codec_seed)
    first_semantic = True
    for phase, frame in llm_engine.stream(grid, mask, max_frames):
        if phase == PHASE_SEMANTIC:
            if first_semantic:
                # drop the generated semantic-BOS frame, exactly like the
                # offline split (`split_two_phase`, decode.py:836-837) —
                # its code (semantic_bos + card) is outside the rec
                # codebooks and must never reach the codec
                first_semantic = False
                continue
            wav = sd.feed((frame.astype(np.int64) - card)[:, None])
            if wav.shape[-1]:
                yield wav
    tail = sd.flush()
    if tail.shape[-1]:
        yield tail
