"""BEST-RQ / MERT music-SSL tower: wav2vec2/HuBERT-style encoder in JAX.

The reference wraps a fairseq-plugin MERT model and uses only its frozen
``features_only`` forward with per-layer outputs — layers 4 (acoustic) and
11 (semantic) (`/root/reference/tools/tokenizer/ReasoningCodec_film/models/
PretrainedModel.py:12-62`, model `modules/our_MERT_BESTRQ/mert_fairseq/
models/mert/mert_model.py:1217-1424`). SURVEY.md §7 notes fairseq matters
only for checkpoint *loading*; the forward is:

    [optional wav layer-norm] -> conv feature extractor -> LayerNorm ->
    post-projection -> [conv positional embedding + transformer stack]

which is exactly the HuBERT/wav2vec2 encoder family. This module implements
that family configurably (pre-/post-norm, arbitrary conv stacks) so the
converted MERT checkpoint drops in; parity is pinned against HF
``HubertModel`` (same fairseq lineage) in tests.

The reference MERT additionally supports two alternative frontends selected
by ``audio_extract_type`` (`mert_model.py:55,827-845`):

* ``melspec`` — a normalised log-mel spectrogram replaces the conv stack
  (`model_mel_pred.compute_mel`, `mert_model.py:523-556`: torchaudio
  MelSpectrogram n_fft 2048, hop sr/label_rate, f_min 32.7, HTK mel scale,
  window-normalised, then +1e-5 -> log -> global mean/std standardisation);
* optional **CQT extra input** concatenated onto the conv features before
  the feature LayerNorm (`mert_model.py:820-825,1226-1231`: nnAudio
  CQT1992v2, hop sr/50, fmin 32.7, bins_per_octave cqt_bins/7, l1-norm
  kernels, librosa magnitude normalisation), which widens the
  ``post_extract_proj`` input to ``conv_dim[-1] + cqt_bins``;
* ``do_cnn_feat_stable_layernorm`` adds an affine-free LayerNorm after the
  post-projection (`mert_model.py:860-863`).

(`hstft_conv`` appears in the upstream enum but its constructor branch is
``raise NotImplementedError`` — dead upstream, not ported.)

Returns per-layer outputs in fairseq's ``layer_results`` convention
(index i = output of layer i, no embedding entry).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class SSLEncoderConfig:
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    extractor_mode: str = "default"   # "default": group-norm on conv0 only
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 4096
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    layer_norm_first: bool = False
    wav_normalize: bool = False
    layer_norm_eps: float = 1e-5
    # frontend selection (reference audio_extract_type, mert_model.py:55)
    frontend: str = "w2v_conv"        # "w2v_conv" | "melspec"
    sample_rate: int = 24000
    label_rate: int = 75              # frontend frame rate (mel hop = sr/this)
    melspec_n_bins: int = 84          # mert_model.py:136
    cqt_bins: int = 0                 # >0 enables the CQT extra input
    stable_post_proj_ln: bool = False  # do_cnn_feat_stable_layernorm

    @property
    def feature_dim(self) -> int:
        """Channel width entering the feature LayerNorm / post-projection
        (reference ``self.embed``, `mert_model.py:834,843,848`)."""
        if self.cqt_bins > 0:
            return self.conv_dim[-1] + self.cqt_bins
        if self.frontend == "melspec":
            return self.melspec_n_bins
        return self.conv_dim[-1]

    @classmethod
    def tiny_test(cls) -> "SSLEncoderConfig":
        return cls(conv_dim=(16,) * 3, conv_kernel=(10, 3, 2),
                   conv_stride=(5, 2, 2), hidden_size=32, num_layers=2,
                   num_heads=2, ffn_dim=64, pos_conv_kernel=16,
                   pos_conv_groups=2)


def init_params(key: jax.Array, cfg: SSLEncoderConfig, dtype=jnp.float32) -> Params:
    assert cfg.frontend in ("w2v_conv", "melspec"), cfg.frontend
    assert cfg.cqt_bins == 0 or cfg.frontend == "w2v_conv", (
        "the CQT extra input composes with the conv frontend only "
        "(reference self.embed override, mert_model.py:848)"
    )
    d, l, f = cfg.hidden_size, cfg.num_layers, cfg.ffn_dim
    ks = iter(jax.random.split(key, 32))
    s = 0.02

    def n(shape):
        return (jax.random.normal(next(ks), shape, jnp.float32) * s).astype(dtype)

    convs = []
    cin = 1
    if cfg.frontend == "w2v_conv":
        for i, (c, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
            conv = {"w": n((k, cin, c))}
            if cfg.conv_bias:
                conv["b"] = jnp.zeros((c,), dtype)
            if i == 0 and cfg.extractor_mode == "default":
                conv["gn_w"] = jnp.ones((c,), dtype)
                conv["gn_b"] = jnp.zeros((c,), dtype)
            convs.append(conv)
            cin = c
    fd = cfg.feature_dim
    return {
        "convs": convs,
        "feat_ln_w": jnp.ones((fd,), dtype),
        "feat_ln_b": jnp.zeros((fd,), dtype),
        "proj_w": n((fd, d)), "proj_b": jnp.zeros((d,), dtype),
        "pos_conv_w": n((cfg.pos_conv_kernel, d // cfg.pos_conv_groups, d)),
        "pos_conv_b": jnp.zeros((d,), dtype),
        "enc_ln_w": jnp.ones((d,), dtype), "enc_ln_b": jnp.zeros((d,), dtype),
        "layers": {
            "q_w": n((l, d, d)), "q_b": jnp.zeros((l, d), dtype),
            "k_w": n((l, d, d)), "k_b": jnp.zeros((l, d), dtype),
            "v_w": n((l, d, d)), "v_b": jnp.zeros((l, d), dtype),
            "out_w": n((l, d, d)), "out_b": jnp.zeros((l, d), dtype),
            "ln1_w": jnp.ones((l, d), dtype), "ln1_b": jnp.zeros((l, d), dtype),
            "ff1_w": n((l, d, f)), "ff1_b": jnp.zeros((l, f), dtype),
            "ff2_w": n((l, f, d)), "ff2_b": jnp.zeros((l, d), dtype),
            "ln2_w": jnp.ones((l, d), dtype), "ln2_b": jnp.zeros((l, d), dtype),
        },
    }


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


# ---------------------------------------------------------------------------
# MERT melspec frontend (reference model_mel_pred, mert_model.py:523-556)
# ---------------------------------------------------------------------------


def _hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=4)
def _htk_fbank(sr: int, n_fft: int, n_mels: int, f_min: float) -> np.ndarray:
    """torchaudio ``melscale_fbanks(norm=None, mel_scale='htk')``:
    (n_fft//2+1, n_mels) un-normalised triangles on the HTK mel scale."""
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(
        _hz_to_mel_htk(np.array(f_min)), _hz_to_mel_htk(np.array(sr / 2.0)),
        n_mels + 2,
    )
    hz_pts = _mel_to_hz_htk(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    return fb.T.astype(np.float32)  # (n_freqs, n_mels)


def _stft_frames(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Center-padded (constant) framing: (B, T) -> (B, 1+T//hop, n_fft)."""
    b, t = x.shape
    half = n_fft // 2
    x = jnp.pad(x.astype(jnp.float32), ((0, 0), (half, half)))
    n = 1 + t // hop
    idx = jnp.arange(n)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return x[:, idx]


def melspec_features(
    wav: jax.Array, *, sample_rate: int, label_rate: int, n_bins: int,
    n_fft: int = 2048, f_min: float = 32.7,
) -> jax.Array:
    """(B, T) wav -> (B, 1+T//hop, n_bins) standardised log-mels.

    Reference `model_mel_pred.compute_mel` (`mert_model.py:541-556`):
    torchaudio MelSpectrogram(n_fft=2048, hop=sr//label_rate, f_min=32.7,
    hann periodic window, center/constant pad, power 2, HTK mel scale,
    ``normalized=True`` i.e. the spectrogram is divided by
    ``window.pow(2).sum().sqrt()``), then ``log(mel + 1e-5)`` and a *global*
    (whole-tensor, batch included) mean/std standardisation with torch's
    Bessel-corrected std.
    """
    hop = sample_rate // label_rate
    frames = _stft_frames(wav, n_fft, hop)
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2) / jnp.sum(window ** 2)
    fb = jnp.asarray(_htk_fbank(sample_rate, n_fft, n_bins, f_min))
    mels = power @ fb + 1e-5
    logmel = jnp.log(mels)
    n = logmel.size
    mu = logmel.mean()
    std = jnp.sqrt(((logmel - mu) ** 2).sum() / (n - 1))  # torch ddof=1
    return (logmel - mu) / (std + 1e-5)


# ---------------------------------------------------------------------------
# CQT extra input (reference nnAudio CQT1992v2 config, mert_model.py:820-825)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _cqt_kernels(
    sr: int, n_bins: int, bins_per_octave: int, fmin: float = 32.7,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """nnAudio ``create_cqt_kernels`` (filter_scale 1, l1 norm, hann):
    complex log-spaced kernels centered in a pow2 buffer.
    Returns (real (K, L), imag (K, L), lengths (K,), fft_len)."""
    q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    lengths = np.ceil(q * sr / freqs)
    fft_len = int(2 ** np.ceil(np.log2(lengths.max())))
    kern = np.zeros((n_bins, fft_len), np.complex128)
    for k in range(n_bins):
        l = int(lengths[k])
        start = int(np.ceil(fft_len / 2 - l / 2)) - (l % 2)
        t = np.arange((-l) // 2, l // 2)  # nnAudio np.r_[-l//2:l//2]
        window = np.hanning(l + 1)[:-1] if l > 1 else np.ones(1)
        sig = window * np.exp(2j * np.pi * freqs[k] * t / sr) / l
        sig = sig / np.linalg.norm(sig, 1)
        kern[k, start:start + l] = sig
    return (kern.real.astype(np.float32), kern.imag.astype(np.float32),
            lengths.astype(np.float32), fft_len)


def cqt_features(
    wav: jax.Array, *, sample_rate: int, n_bins: int,
) -> jax.Array:
    """(B, T) wav -> (B, 1+T//hop, n_bins) CQT magnitudes (hop = sr//50,
    bins_per_octave = n_bins//7, librosa-style sqrt(length) scaling —
    the fixed configuration at `mert_model.py:821-825`)."""
    hop = sample_rate // 50
    real_k, imag_k, lengths, fft_len = _cqt_kernels(
        sample_rate, n_bins, n_bins // 7)
    b, t = wav.shape
    half = fft_len // 2
    x = jnp.pad(wav.astype(jnp.float32), ((0, 0), (half, half)))[:, :, None]
    kr = jnp.asarray(real_k.T[:, None, :])   # (L, 1, K) TIO
    ki = jnp.asarray(imag_k.T[:, None, :])
    dn = ("NTC", "TIO", "NTC")
    re = jax.lax.conv_general_dilated(
        x, kr, window_strides=(hop,), padding="VALID", dimension_numbers=dn)
    im = -jax.lax.conv_general_dilated(
        x, ki, window_strides=(hop,), padding="VALID", dimension_numbers=dn)
    mag = jnp.sqrt(re ** 2 + im ** 2 + 1e-20)
    return mag * jnp.sqrt(jnp.asarray(lengths))[None, None, :]


def feature_extractor(params: Params, cfg: SSLEncoderConfig, wav: jax.Array) -> jax.Array:
    if cfg.wav_normalize:
        xf = wav.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
        wav = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(wav.dtype)
    x = wav[:, :, None].astype(params["convs"][0]["w"].dtype)
    for i, (conv, st) in enumerate(zip(params["convs"], cfg.conv_stride)):
        x = jax.lax.conv_general_dilated(
            x, conv["w"], window_strides=(st,), padding="VALID",
            dimension_numbers=("NTC", "TIO", "NTC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if "b" in conv:
            x = x + conv["b"]
        if "gn_w" in conv:
            xf = x.astype(jnp.float32)
            mu = xf.mean(axis=1, keepdims=True)
            var = ((xf - mu) ** 2).mean(axis=1, keepdims=True)
            x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * conv["gn_w"]
                 + conv["gn_b"]).astype(x.dtype)
        x = jax.nn.gelu(x, approximate=False)
    return x


def forward(
    params: Params, cfg: SSLEncoderConfig, wav: jax.Array
) -> Tuple[jax.Array, List[jax.Array]]:
    """(B, T) waveform -> (final_output, [layer_0_out, ..., layer_{L-1}_out])."""
    if cfg.frontend == "melspec":
        feats = melspec_features(
            wav, sample_rate=cfg.sample_rate, label_rate=cfg.label_rate,
            n_bins=cfg.melspec_n_bins,
        ).astype(params["feat_ln_w"].dtype)
    else:
        feats = feature_extractor(params, cfg, wav)
        if cfg.cqt_bins > 0:
            cqt = cqt_features(
                wav, sample_rate=cfg.sample_rate, n_bins=cfg.cqt_bins,
            )[:, : feats.shape[1], :]  # align (mert_model.py:1228)
            feats = jnp.concatenate([feats, cqt.astype(feats.dtype)], axis=-1)
    h = _ln(feats, params["feat_ln_w"], params["feat_ln_b"], cfg.layer_norm_eps)
    h = h @ params["proj_w"] + params["proj_b"]
    if cfg.stable_post_proj_ln:
        # affine-free LayerNorm (mert_model.py:861: elementwise_affine=False)
        hf = h.astype(jnp.float32)
        mu = hf.mean(-1, keepdims=True)
        var = ((hf - mu) ** 2).mean(-1, keepdims=True)
        h = ((hf - mu) * jax.lax.rsqrt(var + cfg.layer_norm_eps)).astype(h.dtype)

    pad = cfg.pos_conv_kernel // 2
    pos = jax.lax.conv_general_dilated(
        h.astype(params["pos_conv_w"].dtype), params["pos_conv_w"],
        window_strides=(1,),
        padding=[(pad, pad)], feature_group_count=cfg.pos_conv_groups,
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32,
    ).astype(h.dtype) + params["pos_conv_b"]
    if cfg.pos_conv_kernel % 2 == 0:
        pos = pos[:, :-1]
    h = h + jax.nn.gelu(pos, approximate=False)
    if not cfg.layer_norm_first:
        h = _ln(h, params["enc_ln_w"], params["enc_ln_b"], cfg.layer_norm_eps)

    b, t, d = h.shape
    heads = cfg.num_heads
    hd = d // heads

    def layer_fn(h, lp):
        if cfg.layer_norm_first:
            hn = _ln(h, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        else:
            hn = h
        q = (hn @ lp["q_w"] + lp["q_b"]).reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
        k = (hn @ lp["k_w"] + lp["k_b"]).reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
        v = (hn @ lp["v_w"] + lp["v_b"]).reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, -1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        h = h + (o @ lp["out_w"] + lp["out_b"])
        if not cfg.layer_norm_first:
            h = _ln(h, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
            ff = jax.nn.gelu(h @ lp["ff1_w"] + lp["ff1_b"], approximate=False)
            h = h + (ff @ lp["ff2_w"] + lp["ff2_b"])
            h = _ln(h, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        else:
            hn = _ln(h, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
            ff = jax.nn.gelu(hn @ lp["ff1_w"] + lp["ff1_b"], approximate=False)
            h = h + (ff @ lp["ff2_w"] + lp["ff2_b"])
        return h, h

    final, stacked = jax.lax.scan(layer_fn, h, params["layers"])
    outs = [stacked[i] for i in range(cfg.num_layers)]
    if cfg.layer_norm_first:
        final = _ln(final, params["enc_ln_w"], params["enc_ln_b"], cfg.layer_norm_eps)
    return final, outs


def acoustic_semantic_features(
    params: Params, cfg: SSLEncoderConfig, wav: jax.Array,
    layers: Tuple[int, int] = (4, 11),
) -> Tuple[jax.Array, jax.Array]:
    """(acoustic, semantic) = layer_results[4], layer_results[11]
    (reference `extract_continous_embeds_multiple`,
    `PretrainedModel.py:47-62`), returned time-major (B, T, D)."""
    _, outs = forward(params, cfg, wav)
    return outs[layers[0]], outs[layers[1]]
