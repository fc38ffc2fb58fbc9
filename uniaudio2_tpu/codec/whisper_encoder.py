"""Whisper audio encoder, functional JAX.

The codec's first frozen feature tower: the reference loads HF
``WhisperModel`` and uses only ``.encoder`` on 16 kHz log-mels
(`/root/reference/tools/tokenizer/ReasoningCodec_film/models/
AudioDiffusion1D.py:223-232`, features via `get_whisper_feature:334-343`;
vendored torch copy `models/modeling_whisper.py`). Architecture (whisper-
medium class): two GELU convs (k=3, second stride 2) from n_mels to d_model,
learned sinusoid-initialised position embedding, pre-norm transformer stack
(MHA with bias except k_proj, GELU MLP), final LayerNorm. Output 50 Hz.

TPU design: stacked layers + ``lax.scan`` (one compiled block), bf16-friendly
(f32 softmax/norms), no dropout (inference tower — frozen during codec use).

Params:
    conv1/conv2: {"w": (k, C_in, C_out), "b"}
    pos_embed: (max_positions, D)
    layers (stacked): ln1_w/b, q_w/b, k_w, v_w/b, out_w/b, ln2_w/b,
                      fc1_w/b, fc2_w/b
    ln_f: w, b
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass(frozen=True)
class WhisperEncoderConfig:
    n_mels: int = 80
    d_model: int = 1024        # whisper-medium
    n_layers: int = 24
    n_heads: int = 16
    ffn_dim: int = 4096
    max_positions: int = 1500

    @classmethod
    def medium(cls) -> "WhisperEncoderConfig":
        return cls()

    @classmethod
    def tiny_test(cls) -> "WhisperEncoderConfig":
        return cls(n_mels=8, d_model=32, n_layers=2, n_heads=2, ffn_dim=64,
                   max_positions=64)


def init_params(key: jax.Array, cfg: WhisperEncoderConfig, dtype=jnp.float32) -> Params:
    d, l, f = cfg.d_model, cfg.n_layers, cfg.ffn_dim
    ks = jax.random.split(key, 10)
    s = 0.02

    def n(k_, shape):
        return (jax.random.normal(k_, shape, jnp.float32) * s).astype(dtype)

    return {
        "conv1": {"w": n(ks[0], (3, cfg.n_mels, d)), "b": jnp.zeros((d,), dtype)},
        "conv2": {"w": n(ks[1], (3, d, d)), "b": jnp.zeros((d,), dtype)},
        "pos_embed": n(ks[2], (cfg.max_positions, d)),
        "layers": {
            "ln1_w": jnp.ones((l, d), dtype), "ln1_b": jnp.zeros((l, d), dtype),
            "q_w": n(ks[3], (l, d, d)), "q_b": jnp.zeros((l, d), dtype),
            "k_w": n(ks[4], (l, d, d)),
            "v_w": n(ks[5], (l, d, d)), "v_b": jnp.zeros((l, d), dtype),
            "out_w": n(ks[6], (l, d, d)), "out_b": jnp.zeros((l, d), dtype),
            "ln2_w": jnp.ones((l, d), dtype), "ln2_b": jnp.zeros((l, d), dtype),
            "fc1_w": n(ks[7], (l, d, f)), "fc1_b": jnp.zeros((l, f), dtype),
            "fc2_w": n(ks[8], (l, f, d)), "fc2_b": jnp.zeros((l, d), dtype),
        },
        "ln_f_w": jnp.ones((d,), dtype), "ln_f_b": jnp.zeros((d,), dtype),
    }


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


def _conv(x, p, stride):
    x = x.astype(p["w"].dtype)
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding=[(1, 1)],
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32,
    )
    return (out + p["b"]).astype(x.dtype)


def forward(params: Params, cfg: WhisperEncoderConfig, mels: jax.Array) -> jax.Array:
    """(B, T_mel, n_mels) log-mels -> (B, T_mel // 2, d_model) @ 50 Hz."""
    h = jax.nn.gelu(_conv(mels, params["conv1"], 1), approximate=False)
    h = jax.nn.gelu(_conv(h, params["conv2"], 2), approximate=False)
    tl = h.shape[1]
    h = h + params["pos_embed"][:tl][None].astype(h.dtype)

    heads = cfg.n_heads
    hd = cfg.d_model // heads
    scale = hd ** -0.5

    def block(h, layer):
        b, t, d = h.shape
        hn = _ln(h, layer["ln1_w"], layer["ln1_b"])
        q = (hn @ layer["q_w"] + layer["q_b"]) * scale
        k = hn @ layer["k_w"]                     # k_proj has no bias
        v = hn @ layer["v_w"] + layer["v_b"]

        def split(z):
            return z.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)

        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k),
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(scores, -1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        h = h + (o @ layer["out_w"] + layer["out_b"])
        hn = _ln(h, layer["ln2_w"], layer["ln2_b"])
        ff = jax.nn.gelu(hn @ layer["fc1_w"] + layer["fc1_b"], approximate=False)
        h = h + (ff @ layer["fc2_w"] + layer["fc2_b"])
        return h, None

    h, _ = jax.lax.scan(block, h, params["layers"])
    return _ln(h, params["ln_f_w"], params["ln_f_b"])
