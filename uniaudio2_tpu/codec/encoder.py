"""Codec encode path: waveform -> (reasoning codes, reconstruction codes).

Re-design of the reference's `fetch_codes_batch`
(`/root/reference/tools/tokenizer/ReasoningCodec_film/models/
AudioDiffusion1D.py:492-551`) with every stage on-device:

towers (frozen):  whisper encoder @50 Hz · WavLM layers-6..9 mean @50 Hz ·
                  BEST-RQ/MERT layers 4/11 @25 Hz
reasoning branch: whisper/2 ‖ bestrq-semantic -> CLS-query transformer ->
                  RVQ 8×4096 @5 Hz  (`reasoning.py`)
rec branches:     stride-4/4/2/2 downsample convs to 12.5 Hz, per-branch
                  condition-fusion linears, FiLM modulation from the
                  (×2.5-upsampled) quantized reasoning features, three RVQs
                  (phone 1 ‖ structure 1 ‖ acoustic 6) -> 8 codebooks @12.5 Hz

Determinism note: the reference's `time_film` applies a 20 % random
zero-condition mask even under `torch.no_grad()` (`AudioDiffusion1D.py:
434-437`) — i.e. reference encoding is stochastic at inference. That is a
training-regularisation leak, not a capability; here FiLM is deterministic at
inference and the dropout is exposed as an explicit training flag.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import mel as meljax
from uniaudio2_tpu.codec import reasoning as reas
from uniaudio2_tpu.codec import rvq, ssl_encoder, wavlm_encoder, whisper_encoder
from uniaudio2_tpu.codec.decoder import CodecConfig, _upsample_nearest
from uniaudio2_tpu.codec.reasoning import ReasoningConfig
from uniaudio2_tpu.codec.ssl_encoder import SSLEncoderConfig
from uniaudio2_tpu.codec.wavlm_encoder import WavLMConfig
from uniaudio2_tpu.codec.whisper_encoder import WhisperEncoderConfig

Params = Dict[str, Any]


@dataclass(frozen=True)
class EncoderConfig:
    whisper: WhisperEncoderConfig = WhisperEncoderConfig.medium()
    wavlm: WavLMConfig = WavLMConfig.base()
    ssl: SSLEncoderConfig = SSLEncoderConfig()
    reasoning: ReasoningConfig = ReasoningConfig()
    codec_dim: int = 768
    wavlm_dim: int = 768
    bestrq_dim: int = 1024
    # BEST-RQ layer indices used as (acoustic, semantic) features
    # (reference `PretrainedModel.py` layers=[4, 11])
    ssl_layers: Tuple[int, int] = (4, 11)

    @classmethod
    def tiny_test(cls) -> "EncoderConfig":
        return cls(
            whisper=WhisperEncoderConfig(n_mels=8, d_model=24, n_layers=1,
                                         n_heads=2, ffn_dim=32,
                                         max_positions=512),
            wavlm=WavLMConfig.tiny_test(),          # hidden 32
            ssl=SSLEncoderConfig.tiny_test(),       # hidden 32
            reasoning=ReasoningConfig(dim=16, head_dim=8, depth=1,
                                      whisper_dim=24, bestrq_dim=32,
                                      rope_dim=4, codebook_size=16,
                                      codebook_dim=8, num_quantizers=8),
            codec_dim=16, wavlm_dim=32, bestrq_dim=32,
            ssl_layers=(0, 1),
        )


def _lin(key, cin, cout, dtype):
    return {
        "w": (jax.random.normal(key, (cin, cout)) * 0.02).astype(dtype),
        "b": jnp.zeros((cout,), dtype),
    }


def _conv_init(key, k, c, dtype):
    s = (1.0 / (c * k)) ** 0.5
    return {
        "w": jax.random.uniform(key, (k, c, c), dtype, -s, s),
        "b": jnp.zeros((c,), dtype),
    }


def init_encode_params(key: jax.Array, cfg: EncoderConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 24))
    d = cfg.codec_dim
    return {
        "whisper": whisper_encoder.init_params(next(ks), cfg.whisper, dtype),
        "wavlm": wavlm_encoder.init_params(next(ks), cfg.wavlm, dtype),
        "ssl": ssl_encoder.init_params(next(ks), cfg.ssl, dtype),
        "reasoning": reas.init_params(next(ks), cfg.reasoning, dtype),
        "d_conv_whisper": _conv_init(next(ks), 4, cfg.whisper.d_model, dtype),
        "d_conv_wavlm": _conv_init(next(ks), 4, cfg.wavlm_dim, dtype),
        "d_conv_semantic": _conv_init(next(ks), 2, cfg.bestrq_dim, dtype),
        "d_conv_acoustic": _conv_init(next(ks), 2, cfg.bestrq_dim, dtype),
        "fusion_phone": _lin(next(ks), cfg.wavlm_dim, d, dtype),
        "fusion_semantic": _lin(next(ks), cfg.bestrq_dim, d, dtype),
        "fusion_acoustic": _lin(
            next(ks), cfg.bestrq_dim + cfg.whisper.d_model, d, dtype
        ),
        "film_phone": _lin(next(ks), d, 2 * d, dtype),
        "film_semantic": _lin(next(ks), d, 2 * d, dtype),
        "film_acoustic": _lin(next(ks), d, 2 * d, dtype),
        # the three rec RVQs + reason_adaptor are shared with the decode
        # params; the facade wires the same leaves into both paths.
        "rvq_phone": rvq.init_params(
            next(ks), dim=d, codebook_size=8192 if d == 768 else 32,
            codebook_dim=32 if d == 768 else 8, num_quantizers=1, dtype=dtype),
        "rvq_semantic": rvq.init_params(
            next(ks), dim=d, codebook_size=8192 if d == 768 else 32,
            codebook_dim=32 if d == 768 else 8, num_quantizers=1, dtype=dtype),
        "rvq_acoustic": rvq.init_params(
            next(ks), dim=d, codebook_size=8192 if d == 768 else 32,
            codebook_dim=32 if d == 768 else 8, num_quantizers=6, dtype=dtype),
        "reason_adaptor": _lin(next(ks), d, d, dtype),
    }


def _dconv(x: jax.Array, p: Params, stride: int) -> jax.Array:
    """VALID strided downsample conv, NTC."""
    x = x.astype(p["w"].dtype)
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding="VALID",
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32,
    )
    return (out + p["b"]).astype(x.dtype)


def film(
    x: jax.Array, cond: jax.Array, layer: Params, *, gamma_scale: float = 0.1
) -> jax.Array:
    """FiLM modulation (reference `time_film`, `AudioDiffusion1D.py:428-438`,
    without the inference-time random zero-condition — see module note)."""
    tl = min(x.shape[1], cond.shape[1])
    x, cond = x[:, :tl], cond[:, :tl]
    p = cond @ layer["w"] + layer["b"]
    delta_gamma, beta = jnp.split(p, 2, -1)
    gamma = 1.0 + gamma_scale * jnp.tanh(delta_gamma)
    return gamma * x + beta


def fuse_and_quantize(
    params: Params,
    whisper_f: jax.Array,     # (B, T50, d_whisper) 50 Hz tower features
    wavlm_f: jax.Array,       # (B, T50, d_wavlm)
    bestrq_ac: jax.Array,     # (B, T25, d_bestrq) 25 Hz
    bestrq_sem: jax.Array,    # (B, T25, d_bestrq)
    reason_q: jax.Array,      # (B, T5, codec_dim) quantized reasoning
) -> jax.Array:
    """Tower features + quantized reasoning -> rec codes (B, T12.5, 8).

    The encode fusion chain of `fetch_codes_batch`
    (`AudioDiffusion1D.py:515-551`): reason adaptor + x2.5 upsample,
    stride-4/4/2/2 VALID downsample convs, per-branch condition-fusion
    linears, FiLM from reasoning, three RVQ nearest-neighbour encodes
    (phone 1 ‖ structure 1 ‖ acoustic 6), min-length concat."""
    rf = reason_q @ params["reason_adaptor"]["w"] + params["reason_adaptor"]["b"]
    rf = _upsample_nearest(rf, 2.5)      # 5 Hz -> 12.5 Hz

    whisper_ds = _dconv(whisper_f, params["d_conv_whisper"], 4)
    wavlm_ds = _dconv(wavlm_f, params["d_conv_wavlm"], 4)
    sem_ds = _dconv(bestrq_sem, params["d_conv_semantic"], 2)
    ac_ds = _dconv(bestrq_ac, params["d_conv_acoustic"], 2)

    phone = wavlm_ds @ params["fusion_phone"]["w"] + params["fusion_phone"]["b"]
    phone = film(phone, rf, params["film_phone"])
    codes_phone, _ = rvq.encode(params["rvq_phone"], phone)

    sem = sem_ds @ params["fusion_semantic"]["w"] + params["fusion_semantic"]["b"]
    sem = film(sem, rf, params["film_semantic"])
    codes_sem, _ = rvq.encode(params["rvq_semantic"], sem)

    tl = min(ac_ds.shape[1], whisper_ds.shape[1])
    ac = jnp.concatenate([ac_ds[:, :tl], whisper_ds[:, :tl]], -1)
    ac = ac @ params["fusion_acoustic"]["w"] + params["fusion_acoustic"]["b"]
    ac = film(ac, rf, params["film_acoustic"])
    codes_ac, _ = rvq.encode(params["rvq_acoustic"], ac)

    tmin = min(codes_phone.shape[1], codes_sem.shape[1], codes_ac.shape[1])
    return jnp.concatenate(
        [codes_phone[:, :tmin], codes_sem[:, :tmin], codes_ac[:, :tmin]], -1
    )


def encode_window(
    params: Params,
    enc_cfg: EncoderConfig,
    codec_cfg: CodecConfig,
    wav24k: jax.Array,        # (B, T) at codec sample rate
) -> Tuple[jax.Array, jax.Array]:
    """One padded window -> (reason_codes (B, T5, 8), rec_codes (B, T12.5, 8)).

    Mirrors `fetch_codes_batch` stage by stage; all feature lengths are
    aligned by truncation to the shortest branch exactly as the reference
    does (min-length cat, `AudioDiffusion1D.py:379,539`).
    """
    sr = codec_cfg.sample_rate
    # --- frozen towers ---
    wav16 = meljax.resample(wav24k, sr, 16000) if sr != 16000 else wav24k
    mels = meljax.log_mel_spectrogram(wav16, enc_cfg.whisper.n_mels)
    # whisper positional table bounds the mel length (30 s window = 3000)
    mels = mels[:, : enc_cfg.whisper.max_positions * 2]
    whisper_f = whisper_encoder.forward(params["whisper"], enc_cfg.whisper, mels)

    bestrq_ac, bestrq_sem = ssl_encoder.acoustic_semantic_features(
        params["ssl"], enc_cfg.ssl, wav24k, layers=enc_cfg.ssl_layers
    )
    wavlm_in = jnp.concatenate(
        [wav16, jnp.zeros((wav16.shape[0], 160), wav16.dtype)], -1
    )
    wavlm_f = wavlm_encoder.phone_features(params["wavlm"], enc_cfg.wavlm, wavlm_in)

    # length alignment (reference get_whisper_feature/get_wavlm_feature)
    len_sem = bestrq_sem.shape[1]
    n50 = min(whisper_f.shape[1], 2 * len_sem)
    whisper_f = whisper_f[:, :n50]
    wavlm_f = wavlm_f[:, : min(wavlm_f.shape[1], 2 * len_sem)]

    # --- reasoning branch (5 Hz codes) ---
    rp = {**params["reasoning"]}
    reason_codes, reason_q = reas.encode(
        rp, enc_cfg.reasoning, whisper_f, bestrq_sem
    )
    # --- reconstruction branches (12.5 Hz) ---
    rec_codes = fuse_and_quantize(
        params, whisper_f, wavlm_f, bestrq_ac, bestrq_sem, reason_q
    )
    return reason_codes, rec_codes
