"""On-device audio frontend: resampling + Whisper log-mel spectrograms.

The reference computes whisper mels on the *host* through numpy
(`WhisperFeatureExtractor`, `reason_tokenizer.py:67-72`) — a CPU round-trip
inside the encode hot path (SURVEY.md §7 hard-part 7). Here both stages are
pure JAX so the whole wav->tokens encode runs on-device:

* ``resample`` — torchaudio-style windowed-sinc polyphase resampler
  (hann window, lowpass_filter_width 6, rolloff 0.99), expressed as one
  strided conv — the 24 kHz -> 16 kHz transfer the reference does with
  `torchaudio.transforms.Resample` (`reason_tokenizer.py:37`).
* ``log_mel_spectrogram`` — Whisper's mel recipe: 400-pt hann STFT, hop 160,
  reflect padding, power spectrum with the final frame dropped, slaney-scale
  mel filterbank, ``log10 -> max(.,max-8) -> (x+4)/4`` normalisation.

The mel filterbank is built host-side once (numpy, constant-folded by jit).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE_MEL = 16000
N_FFT = 400
HOP = 160
N_MELS = 80


# ---------------------------------------------------------------------------
# Mel filterbank (librosa-slaney convention, as used by Whisper)
# ---------------------------------------------------------------------------


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    freq = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    above = m >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), freq)


@functools.lru_cache(maxsize=4)
def mel_filterbank(
    sr: int = SAMPLE_RATE_MEL, n_fft: int = N_FFT, n_mels: int = N_MELS
) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) slaney-normalised triangular filterbank."""
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_min, mel_max = _hz_to_mel(np.array(0.0)), _hz_to_mel(np.array(sr / 2.0))
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    return (fb * enorm[:, None]).astype(np.float32)


# ---------------------------------------------------------------------------
# STFT + whisper log-mel
# ---------------------------------------------------------------------------


def _frame(x: jax.Array, frame_len: int, hop: int) -> jax.Array:
    """(B, T) -> (B, n_frames, frame_len) with stride ``hop``."""
    b, t = x.shape
    n = 1 + (t - frame_len) // hop
    idx = jnp.arange(n)[:, None] * hop + jnp.arange(frame_len)[None, :]
    return x[:, idx]


def log_mel_spectrogram(wav16k: jax.Array, n_mels: int = N_MELS) -> jax.Array:
    """(B, T) 16 kHz waveform -> (B, T//HOP, n_mels) normalised log-mels
    (whisper convention; the usual 30 s window gives 3000 frames)."""
    b, t = wav16k.shape
    half = N_FFT // 2
    x = jnp.pad(wav16k.astype(jnp.float32), ((0, 0), (half, half)), mode="reflect")
    frames = _frame(x, N_FFT, HOP)
    window = jnp.asarray(np.hanning(N_FFT + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2)[:, :-1, :]  # drop last frame
    fb = jnp.asarray(mel_filterbank(SAMPLE_RATE_MEL, N_FFT, n_mels))
    mel = jnp.einsum("btf,mf->btm", power, fb)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(
        log_spec, log_spec.max(axis=(1, 2), keepdims=True) - 8.0
    )
    return (log_spec + 4.0) / 4.0


# ---------------------------------------------------------------------------
# Sinc resampler (torchaudio 'sinc_interp_hann' convention)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _resample_kernel(
    orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> Tuple[np.ndarray, int]:
    """Polyphase kernel (new_freq_g, 1, width) and left padding, following
    torchaudio's windowed-sinc construction."""
    g = math.gcd(orig_freq, new_freq)
    up, down = new_freq // g, orig_freq // g
    base_freq = min(orig_freq, new_freq) / g * rolloff
    width = math.ceil(lowpass_filter_width * (orig_freq // g) / base_freq)
    idx = np.arange(-width, width + (orig_freq // g), dtype=np.float64)[None] / (orig_freq // g)
    t = (-np.arange(up, dtype=np.float64)[:, None] / up + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    scale = base_freq / (orig_freq // g)
    kernel = np.where(t == 0, 1.0, np.sinc(t)) * window * scale
    return kernel.astype(np.float32), width


def resample(wav: jax.Array, orig_freq: int, new_freq: int) -> jax.Array:
    """(B, T) -> (B, ceil(T * new/orig)); torchaudio-equivalent quality."""
    if orig_freq == new_freq:
        return wav
    g = math.gcd(orig_freq, new_freq)
    up, down = new_freq // g, orig_freq // g
    kernel, width = _resample_kernel(orig_freq, new_freq)
    t = wav.shape[-1]
    x = jnp.pad(wav.astype(jnp.float32), ((0, 0), (width, width + down)))
    # conv with stride=down for each of the `up` phases, interleaved
    # (cross-correlation, matching torch conv1d — no kernel flip)
    k = jnp.asarray(kernel).T[:, None, :]        # (W, 1, up) in TIO layout
    out = jax.lax.conv_general_dilated(
        x[:, None, :], k,
        window_strides=(down,), padding=[(0, 0)],
        dimension_numbers=("NCT", "TIO", "NTC"),
    )  # (B, n_blocks, up)
    out = out.reshape(out.shape[0], -1)
    target = int(math.ceil(new_freq * t / orig_freq))
    return out[:, :target]
