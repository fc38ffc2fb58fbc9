"""Streaming (chunked incremental) Mimi encode/decode.

The reference's streaming machinery (`/root/reference/tools/tokenizer/
MimiCodec/model/modules/{streaming,conv,transformer}.py`) threads per-module
state so chunk-wise processing equals offline processing. Because this
framework's Mimi is *causal by construction* (left-padded convs, windowed
causal attention — prefix-consistency is asserted in `test_mimi.py`), the
same guarantee holds for a rolling-window recompute: keep the last
``context`` of input, re-encode the window, emit only the new frames.
Emitted tokens are bit-identical to the offline encode (not merely close).

Trade-off (explicit): per-chunk compute is ``window / chunk`` times the
incremental cost — the simple, correct form for a first release; per-layer
O(1) state is a planned optimization, not a semantics change. The window is
sized to the model's true receptive field (conv receptive field + the
transformer's ``context`` frames), beyond which causal outputs cannot
depend on older input.

API mirrors the reference streaming protocol: ``reset()``, ``feed(chunk)``
-> newly available frames, ``flush()``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import mimi
from uniaudio2_tpu.codec.mimi import MimiConfig


def _frame_samples(cfg: MimiConfig) -> int:
    return cfg.hop_length * cfg.resample_stride


class StreamingMimiEncoder:
    """wav chunks in -> (8, T_new) code chunks out, offline-identical."""

    def __init__(self, params, cfg: MimiConfig, *,
                 context_frames: Optional[int] = None):
        self.params = params
        self.cfg = cfg
        self.frame = _frame_samples(cfg)
        # receptive field: transformer context (in encoder frames) plus a
        # conv margin; round to whole output frames
        ctx = context_frames if context_frames is not None else cfg.context + 8
        self.window_frames = ctx
        self._enc = jax.jit(lambda p, w: mimi.encode(p, cfg, w))
        self.reset()

    def reset(self) -> None:
        self._buffer = np.zeros((0,), np.float32)
        self._emitted = 0        # frames emitted so far (global)
        self._consumed = 0       # samples dropped from the buffer front

    def feed(self, chunk: np.ndarray) -> np.ndarray:
        """Append audio; returns newly-ready codes (8, T_new) (possibly
        empty). Frames become ready once their full frame of samples has
        arrived."""
        chunk = np.asarray(chunk, np.float32).reshape(-1)
        self._buffer = np.concatenate([self._buffer, chunk])
        total_samples = self._consumed + self._buffer.shape[0]
        ready = total_samples // self.frame
        if ready <= self._emitted:
            return np.zeros((self.cfg.rvq_layers, 0), np.int64)
        # encode the buffered window (multiple of frame) and emit the tail
        usable = (self._buffer.shape[0] + self._consumed) // self.frame * self.frame
        window = self._buffer[: usable - self._consumed]
        codes = np.asarray(self._enc(self.params, jnp.asarray(window)[None]))[0]
        start_frame = self._consumed // self.frame
        new = codes[:, self._emitted - start_frame : ready - start_frame]
        self._emitted = ready
        # drop history beyond the receptive-field window (frame-aligned)
        max_keep = self.window_frames * self.frame
        if self._buffer.shape[0] > max_keep + self.frame:
            drop = (self._buffer.shape[0] - max_keep) // self.frame * self.frame
            self._buffer = self._buffer[drop:]
            self._consumed += drop
        return new.astype(np.int64)

    def flush(self) -> np.ndarray:
        """Pad the partial tail frame with zeros and emit it."""
        rem = (self._consumed + self._buffer.shape[0]) % self.frame
        if rem == 0:
            return np.zeros((self.cfg.rvq_layers, 0), np.int64)
        return self.feed(np.zeros(self.frame - rem, np.float32))


class StreamingMimiDecoder:
    """code chunks in -> wav chunks out, offline-identical."""

    def __init__(self, params, cfg: MimiConfig, *,
                 context_frames: Optional[int] = None):
        self.params = params
        self.cfg = cfg
        self.frame = _frame_samples(cfg)
        ctx = context_frames if context_frames is not None else cfg.context + 8
        self.window_frames = ctx
        self._dec = jax.jit(lambda p, c: mimi.decode(p, cfg, c))
        self.reset()

    def reset(self) -> None:
        self._codes = np.zeros((self.cfg.rvq_layers, 0), np.int32)
        self._emitted_frames = 0
        self._dropped_frames = 0

    def feed(self, codes: np.ndarray) -> np.ndarray:
        """Append (8, T) codes; returns the new samples (T·frame,)."""
        codes = np.asarray(codes, np.int32)
        if codes.ndim == 1:
            codes = codes[:, None]
        self._codes = np.concatenate([self._codes, codes], axis=1)
        total = self._dropped_frames + self._codes.shape[1]
        if total <= self._emitted_frames:
            return np.zeros((0,), np.float32)
        wav = np.asarray(self._dec(self.params, jnp.asarray(self._codes)[None]))[0]
        local_start = (self._emitted_frames - self._dropped_frames) * self.frame
        new = wav[local_start : (total - self._dropped_frames) * self.frame]
        self._emitted_frames = total
        if self._codes.shape[1] > self.window_frames + 1:
            drop = self._codes.shape[1] - self.window_frames
            self._codes = self._codes[:, drop:]
            self._dropped_frames += drop
        return np.asarray(new, np.float32)
