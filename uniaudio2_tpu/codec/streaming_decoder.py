"""Incremental codec decode: feed rec tokens as they are generated, get
waveform chunks back — the codec half of streaming TTS.

`CodecDecoder.decode` (offline) windows the full token sequence into 30 s
chunks with a ¾-window hop, carries the in-context latent tail between
chunks, and crossfade-stitches the waveforms (reference `token2audio*`,
`reason_tokenizer.py:131-306`). This class runs the SAME chunk schedule
online: a chunk solves as soon as its window of tokens has arrived, and
the waveform prefix that can no longer change (everything before the next
chunk's crossfade region) is emitted immediately.

Output is bit-identical to the offline `CodecDecoder.decode` — same chunk
boundaries, same PRNG key sequence, same repeat-padding of the final
partial window at `flush()` (tested in `test_stream_tts.py`). Clips that
never fill the first window delegate the whole decode to the offline
facade at `flush()`, reproducing its fractional-window selection for
short utterances exactly (and paying a quarter-window solve instead of a
padded full-window one). Latency: the first audio emerges after
`window_rec_frames` tokens (or at flush for shorter utterances) and every
`hop` frames thereafter.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec.decoder import CodecConfig, CodecDecoder, _pad_repeat

Params = dict


class StreamingCodecDecoder:
    """Chunk-streaming facade over `CodecDecoder`'s jitted chunk solver.

    Usage:
        sd = StreamingCodecDecoder(params, cfg, seed=0)
        for frames in token_stream:          # (8, k) int arrays
            wav = sd.feed(frames)            # (1, n) float32 (may be empty)
            ...
        wav = sd.flush()                     # final samples
    """

    def __init__(self, params: Params, cfg: CodecConfig, *,
                 num_steps: int = 10, guidance_scale: float = 1.5,
                 seed: int = 0, decoder: "Optional[CodecDecoder]" = None):
        # ``decoder`` lets successive streams share one CodecDecoder (and
        # its jitted chunk/SQ programs) — a StreamingCodecDecoder is
        # single-use (feed...flush), the compiled programs are not
        self._dec = decoder if decoder is not None else CodecDecoder(
            params, cfg)
        self.cfg = cfg
        self.num_steps = num_steps
        self.guidance_scale = guidance_scale
        self._chunk_fn = self._dec._get_chunk_fn(
            cfg, False, num_steps, guidance_scale)
        self._seed = seed
        self._key = jax.random.PRNGKey(seed)

        self._win = cfg.window_rec_frames
        self._hop = self._win // 4 * 3
        self._ovlp = self._win - self._hop
        self._ovlp_lat = self._ovlp * 2
        self._lat_frames = 2 * self._win
        self._win_samp = int(cfg.window_seconds * cfg.sample_rate)
        self._hop_samp = self._win_samp // 4 * 3
        self._ovlp_samp = self._win_samp - self._hop_samp

        self._ncb = cfg.num_codebooks
        self._buf = np.zeros((0, self._ncb), np.int32)  # frame-major codes
        self._n_fed = 0
        self._chunks = 0
        self._emitted = 0
        self._prev_latent = None                   # (1, lat, D) device
        self._tail = None                          # (1, ovlp_samp) np: pending
        self._flushed = False

    # -- internal ----------------------------------------------------------

    def _solve_chunk(self, rec_win: np.ndarray) -> np.ndarray:
        """One window solve + ScalarAE decode -> (1, win_samp) np.float32."""
        cfg = self.cfg
        rec_in = jnp.asarray(rec_win[None])        # (1, win, ncb)
        reason_in = jnp.zeros(
            (1, cfg.window_reason_frames, self._ncb), jnp.int32)
        self._key, sub = jax.random.split(self._key)
        if self._chunks == 0:
            ctx = jnp.zeros((1, self._lat_frames, cfg.latent_dim), jnp.float32)
            ctx_len = jnp.int32(0)
        else:
            prev_tail = self._prev_latent[:, -self._ovlp_lat:]
            pad = jnp.zeros(
                (1, self._lat_frames - self._ovlp_lat, cfg.latent_dim),
                jnp.float32)
            ctx = jnp.concatenate([prev_tail, pad], axis=1)
            ctx_len = jnp.int32(self._ovlp_lat)
        lat = self._chunk_fn(rec_in, reason_in, ctx, ctx_len, sub)
        self._prev_latent = lat
        self._chunks += 1
        wav = np.array(self._dec._sq_decode(lat))[0, :, 0][None]
        return wav[:, : self._win_samp]

    def _emit(self, wav: np.ndarray) -> np.ndarray:
        """Crossfade against the pending tail; return the newly-final
        samples, holding back this chunk's overlap tail."""
        if self._tail is None:
            out = wav[:, : -self._ovlp_samp]
        else:
            ramp = np.linspace(0, 1, self._ovlp_samp, dtype=np.float32)[None]
            head = (self._tail * (1.0 - ramp)
                    + wav[:, : self._ovlp_samp] * ramp)
            out = np.concatenate(
                [head, wav[:, self._ovlp_samp : -self._ovlp_samp]], axis=-1)
        self._tail = wav[:, -self._ovlp_samp:]
        return out

    # -- public ------------------------------------------------------------

    def feed(self, codes: np.ndarray) -> np.ndarray:
        """Append rec codes (8, k) codebook-major; returns any newly-final
        waveform samples (1, n) — possibly n == 0."""
        assert not self._flushed, "feed() after flush()"
        codes = np.asarray(codes, np.int32)
        assert codes.ndim == 2 and codes.shape[0] == self._ncb
        self._buf = np.concatenate([self._buf, codes.T], axis=0)
        self._n_fed += codes.shape[1]
        outs = []
        while self._buf.shape[0] >= self._chunks * self._hop + self._win:
            s = self._chunks * self._hop
            outs.append(self._emit(
                self._solve_chunk(self._buf[s : s + self._win])))
        out = (np.concatenate(outs, axis=-1) if outs
               else np.zeros((1, 0), np.float32))
        self._emitted += out.shape[-1]
        return out

    def flush(self) -> np.ndarray:
        """Repeat-pad the remaining partial window exactly as the offline
        path does, solve the remaining chunk(s), and return all remaining
        samples trimmed to the true audio length."""
        assert not self._flushed
        self._flushed = True
        if self._n_fed == 0:       # nothing ever arrived (e.g. empty
            return np.zeros((1, 0), np.float32)    # semantic stream)
        cfg = self.cfg
        if self._chunks == 0:
            # no window ever filled: delegate the whole clip to the offline
            # facade so its fractional-window selection for short clips
            # (decoder.py:273-282) is reproduced bit-for-bit (also ~4x
            # cheaper than padding to the full window)
            wav = np.asarray(self._dec.decode(
                self._buf.T, num_steps=self.num_steps,
                guidance_scale=self.guidance_scale, seed=self._seed))
            self._emitted += wav.shape[-1]
            return wav
        target = int(self._n_fed / cfg.rec_hz * cfg.sample_rate)
        buf = self._buf[None]                      # (1, T, ncb)
        n = buf.shape[1]
        if n < self._win:
            buf = _pad_repeat(buf, self._win)
        elif (n - self._ovlp) % self._hop:
            total = (math.ceil((n - self._ovlp) / self._hop) * self._hop
                     + self._ovlp)
            buf = _pad_repeat(buf, total)
        outs = []
        while self._chunks * self._hop + self._win <= buf.shape[1]:
            s = self._chunks * self._hop
            outs.append(self._emit(
                self._solve_chunk(buf[0, s : s + self._win])))
        if self._tail is not None:
            outs.append(self._tail)
            self._tail = None
        out = (np.concatenate(outs, axis=-1) if outs
               else np.zeros((1, 0), np.float32))
        out = out[:, : max(0, target - self._emitted)]
        self._emitted += out.shape[-1]
        return out

    @property
    def samples_emitted(self) -> int:
        """Total samples returned so far."""
        return self._emitted
