"""ReasoningCodec tokenizer facade: wav <-> (reasoning, reconstruction) codes.

API parity with the reference `ReasoningTokenizer` / `AbsTokenizer` protocol
(`/root/reference/tools/tokenizer/abs_tokenizer.py:3-70`,
`ReasoningCodec_film/reason_tokenizer.py:21-404`):

* ``tokenize(wav)`` -> (reason (8, T@5 Hz), semantic (8, T@12.5 Hz)):
  30 s windowing with a 240-sample completion guard and self-repetition
  padding (`audio2token`, `reason_tokenizer.py:86-129`), window-batched
  encode, concatenation, and the ``duration·rate + 1`` trim.
* ``detokenize(reason, semantic)`` / ``detokenize_no_reason(semantic)`` ->
  24 kHz waveform via the chunked flow-matching decoder (`decoder.py`).

Audio IO uses scipy (wav files); resampling is the on-device sinc resampler.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from uniaudio2_tpu.codec import encoder as enc
from uniaudio2_tpu.codec.decoder import CodecConfig, CodecDecoder
from uniaudio2_tpu.codec.encoder import EncoderConfig
from uniaudio2_tpu.codec import mel as meljax


def load_wav(path: str, target_sr: int) -> np.ndarray:
    """Read a wav file -> float32 mono (T,) at ``target_sr``."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if sr != target_sr:
        data = np.asarray(meljax.resample(jnp.asarray(data)[None], sr, target_sr))[0]
    return data


def save_wav(path: str, wav: np.ndarray, sr: int) -> None:
    from scipy.io import wavfile

    wav = np.asarray(wav, np.float32).reshape(-1)
    wavfile.write(path, sr, np.clip(wav, -1.0, 1.0))


class ReasoningCodecTokenizer:
    """Functional-params tokenizer facade over the encode + decode paths."""

    GUARD_SAMPLES = 240  # completion guard (reference reason_tokenizer.py:101)

    def __init__(
        self,
        encode_params,
        decode_params,
        enc_cfg: EncoderConfig,
        codec_cfg: CodecConfig,
        *,
        min_duration: float = 30.0,
    ):
        self.enc_params = encode_params
        self.enc_cfg = enc_cfg
        self.cfg = codec_cfg
        self.min_duration = min_duration
        self.decoder = (
            CodecDecoder(decode_params, codec_cfg)
            if decode_params is not None else None
        )
        self._encode_fn = None

    @property
    def is_discrete(self) -> bool:
        return True

    def _window_encode(self, windows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        if self._encode_fn is None:
            # params as jit arguments (closure capture would inline them as
            # huge HLO constants)
            self._encode_fn = jax.jit(
                lambda p, wav: enc.encode_window(p, self.enc_cfg, self.cfg, wav)
            )
        reason, rec = self._encode_fn(self.enc_params, jnp.asarray(windows))
        return np.asarray(reason), np.asarray(rec)

    def tokenize(
        self, wav: Union[str, np.ndarray], *, batch_size: int = 6
    ) -> Tuple[np.ndarray, np.ndarray]:
        """wav path or (T,) float array -> (reason (8, T1), semantic (8, T2))."""
        sr = self.cfg.sample_rate
        if isinstance(wav, str):
            audio = load_wav(wav, sr)
        else:
            audio = np.asarray(wav, np.float32).reshape(-1)
        orig_len = audio.shape[-1]
        out_len = int(orig_len / sr * self.cfg.rec_hz) + 1
        out_len_reason = int(orig_len / sr * self.cfg.reason_hz) + 1

        win = int(self.min_duration * sr) + self.GUARD_SAMPLES
        while audio.shape[-1] < win:
            audio = np.concatenate([audio, audio], -1)
        n_win = audio.shape[-1] // (win - self.GUARD_SAMPLES) + 1
        audio = np.concatenate([audio, audio], -1)[: n_win * win]
        windows = audio.reshape(n_win, win)

        reason_list, rec_list = [], []
        for i in range(0, n_win, batch_size):
            chunk = windows[i : i + batch_size]
            real = chunk.shape[0]
            if real < batch_size and n_win > batch_size:
                # pad the tail batch so every call reuses one compiled shape
                pad = np.repeat(chunk[-1:], batch_size - real, axis=0)
                chunk = np.concatenate([chunk, pad], 0)
            r, c = self._window_encode(chunk)
            reason_list.append(r[:real])
            rec_list.append(c[:real])
        reason = np.concatenate(reason_list, 0).reshape(-1, 8)[:out_len_reason]
        rec = np.concatenate(rec_list, 0).reshape(-1, 8)[:out_len]
        return reason.T.astype(np.int64), rec.T.astype(np.int64)

    def detokenize(
        self, reason: np.ndarray, semantic: np.ndarray, *,
        steps: int = 50, guidance_scale: float = 1.5, seed: int = 0,
    ) -> np.ndarray:
        assert self.decoder is not None, "decode params not loaded"
        return self.decoder.decode(
            semantic, reason, num_steps=steps,
            guidance_scale=guidance_scale, seed=seed,
        )

    def detokenize_no_reason(
        self, semantic: np.ndarray, *,
        steps: int = 50, guidance_scale: float = 1.5, seed: int = 0,
    ) -> np.ndarray:
        assert self.decoder is not None, "decode params not loaded"
        return self.decoder.decode(
            semantic, None, num_steps=steps,
            guidance_scale=guidance_scale, seed=seed,
        )

    def find_length(self, codes: np.ndarray) -> int:
        return int(codes.shape[-1])
