"""Streaming (chunked incremental) Mimi encode/decode — O(1) state.

The reference's streaming machinery (`/root/reference/tools/tokenizer/
MimiCodec/model/modules/{streaming,conv,transformer}.py`) threads per-module
state so chunk-wise processing equals offline processing. This facade wraps
the TPU-native equivalent (`codec/mimi_stream.py`): per-conv input
histories, transposed-conv overlap-add carries, and per-layer ring KV
caches, all advanced by ONE fixed-shape jit-compiled step per frame chunk.

Per-chunk cost is constant — independent of how much audio has streamed
through (the state pytree never grows) — and emitted tokens/samples are
identical to the offline `mimi.encode`/`mimi.decode` outputs.

API mirrors the reference streaming protocol: ``reset()``, ``feed(chunk)``
-> newly available frames, ``flush()``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import mimi_stream
from uniaudio2_tpu.codec.mimi import MimiConfig


def _frame_samples(cfg: MimiConfig) -> int:
    return cfg.hop_length * cfg.resample_stride


class StreamingMimiEncoder:
    """wav chunks in -> (8, T_new) code chunks out, offline-identical.

    ``chunk_frames`` sets the compiled step granularity (latency/throughput
    trade-off); ``context_frames`` is accepted for backwards compatibility
    and ignored — O(1) state never evicts needed context.
    """

    def __init__(self, params, cfg: MimiConfig, *,
                 chunk_frames: int = 1,
                 context_frames: Optional[int] = None):
        del context_frames  # legacy rolling-window knob; no longer needed
        self.params = params
        self.cfg = cfg
        self.frame = _frame_samples(cfg)
        self.chunk_frames = chunk_frames
        self.chunk_samples = self.frame * chunk_frames
        self._step = jax.jit(
            lambda p, s, w: mimi_stream.encode_step(p, cfg, s, w),
            donate_argnums=(1,),
        )
        self.reset()

    def reset(self) -> None:
        self._state = mimi_stream.init_encoder_state(
            self.params, self.cfg, batch=1, chunk_frames=self.chunk_frames
        )
        self._buffer = np.zeros((0,), np.float32)

    def feed(self, chunk: np.ndarray) -> np.ndarray:
        """Append audio; returns newly-ready codes (8, T_new) (possibly
        empty). Frames become ready once their full frame of samples has
        arrived."""
        chunk = np.asarray(chunk, np.float32).reshape(-1)
        self._buffer = np.concatenate([self._buffer, chunk])
        outs = []
        while self._buffer.shape[0] >= self.chunk_samples:
            piece = self._buffer[: self.chunk_samples]
            self._buffer = self._buffer[self.chunk_samples:]
            codes, self._state = self._step(
                self.params, self._state, jnp.asarray(piece)[None]
            )
            outs.append(np.asarray(codes)[0])
        if not outs:
            return np.zeros((self.cfg.rvq_layers, 0), np.int64)
        return np.concatenate(outs, axis=1).astype(np.int64)

    def flush(self) -> np.ndarray:
        """Emit the frames of the partial tail, matching offline
        `mimi.encode`'s pad-to-frame-boundary: the buffered samples are
        zero-padded to a full *chunk* for the compiled step, but only
        ``ceil(buffered / frame)`` frames are returned (the extra pad
        frames the chunk step produces are dropped — encoding is causal,
        so the kept frames are unaffected by the pad). Terminal: call
        `reset()` before streaming a new clip."""
        buffered = self._buffer.shape[0]
        if buffered == 0:
            return np.zeros((self.cfg.rvq_layers, 0), np.int64)
        owed = -(-buffered // self.frame)
        pad = self.chunk_samples - (buffered % self.chunk_samples)
        codes = self.feed(np.zeros(pad % self.chunk_samples, np.float32))
        return codes[:, :owed]


class StreamingMimiDecoder:
    """code chunks in -> wav chunks out, offline-identical."""

    def __init__(self, params, cfg: MimiConfig, *,
                 chunk_frames: int = 1,
                 context_frames: Optional[int] = None):
        del context_frames
        self.params = params
        self.cfg = cfg
        self.frame = _frame_samples(cfg)
        self.chunk_frames = chunk_frames
        self._step = jax.jit(
            lambda p, s, c: mimi_stream.decode_step(p, cfg, s, c),
            donate_argnums=(1,),
        )
        self.reset()

    def reset(self) -> None:
        self._state = mimi_stream.init_decoder_state(
            self.params, self.cfg, batch=1, chunk_frames=self.chunk_frames
        )
        self._codes = np.zeros((self.cfg.rvq_layers, 0), np.int32)

    def feed(self, codes: np.ndarray) -> np.ndarray:
        """Append (8, T) codes; returns the new samples (T·frame,)."""
        codes = np.asarray(codes, np.int32)
        if codes.ndim == 1:
            codes = codes[:, None]
        self._codes = np.concatenate([self._codes, codes], axis=1)
        outs = []
        while self._codes.shape[1] >= self.chunk_frames:
            piece = self._codes[:, : self.chunk_frames]
            self._codes = self._codes[:, self.chunk_frames:]
            wav, self._state = self._step(
                self.params, self._state, jnp.asarray(piece)[None]
            )
            outs.append(np.asarray(wav)[0])
        if not outs:
            return np.zeros((0,), np.float32)
        return np.concatenate(outs).astype(np.float32)

    def flush(self) -> np.ndarray:
        """Emit the samples of a partial code tail (< chunk_frames codes):
        the tail is zero-code-padded to a full chunk for the compiled step
        and the output is trimmed to ``n_real_codes * frame`` samples
        (decoding is causal, so real frames' samples are unaffected by the
        pad codes). Terminal: call `reset()` before streaming a new clip."""
        rem = self._codes.shape[1]
        if rem == 0:
            return np.zeros((0,), np.float32)
        pad = np.zeros((self.cfg.rvq_layers, self.chunk_frames - rem),
                       np.int32)
        wav = self.feed(pad)
        return wav[: rem * self.frame]
