"""WavLM encoder, functional JAX.

The codec's phone-level feature tower: the reference loads it via HF
``AutoModel`` and mean-pools hidden-state layers 6–9
(`/root/reference/tools/tokenizer/ReasoningCodec_film/models/
AudioDiffusion1D.py:233-236,355-366`). Architecture (WavLM-base class):

* 7-layer conv feature extractor (512 ch; k 10/3/3/3/3/2/2, s 5/2/2/2/2/2/2),
  GroupNorm after conv 0, GELU — 16 kHz -> 50 Hz, 320× stride;
* feature projection LayerNorm(512) + Linear(512 -> D);
* grouped conv positional embedding (k=128, groups=16, one-sample trim),
  additive, then LayerNorm;
* post-norm transformer layers whose attention adds a **gated relative
  position bias**: T5-style log-bucketed relative positions (320 buckets,
  max distance 800) embedded per head, gated by
  ``a·(b·c − 1) + 2`` with (a, b) sigmoid projections of the per-head
  hidden states (matching HF `WavLMAttention`).

Inference-only (frozen tower); returns all hidden states so callers can
reproduce the 6–9 mean.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class WavLMConfig:
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    num_buckets: int = 320
    max_distance: int = 800
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    layer_norm_eps: float = 1e-5
    # hidden-state slice averaged as phone features (reference uses 6..9,
    # `AudioDiffusion1D.py:363`)
    phone_layers: Tuple[int, int] = (6, 10)

    @classmethod
    def base(cls) -> "WavLMConfig":
        return cls()

    @classmethod
    def tiny_test(cls) -> "WavLMConfig":
        return cls(conv_dim=(16,) * 3, conv_kernel=(10, 3, 2),
                   conv_stride=(5, 2, 2), hidden_size=32, num_layers=2,
                   num_heads=2, ffn_dim=64, num_buckets=32, max_distance=50,
                   pos_conv_kernel=16, pos_conv_groups=2,
                   phone_layers=(1, 3))


def init_params(key: jax.Array, cfg: WavLMConfig, dtype=jnp.float32) -> Params:
    d, l, f = cfg.hidden_size, cfg.num_layers, cfg.ffn_dim
    hd = d // cfg.num_heads
    ks = iter(jax.random.split(key, 32))
    s = 0.02

    def n(shape):
        return (jax.random.normal(next(ks), shape, jnp.float32) * s).astype(dtype)

    convs = []
    cin = 1
    for i, (c, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        conv = {"w": n((k, cin, c))}
        if i == 0:
            conv["gn_w"] = jnp.ones((c,), dtype)
            conv["gn_b"] = jnp.zeros((c,), dtype)
        convs.append(conv)
        cin = c
    return {
        "convs": convs,
        "fp_ln_w": jnp.ones((cfg.conv_dim[-1],), dtype),
        "fp_ln_b": jnp.zeros((cfg.conv_dim[-1],), dtype),
        "fp_w": n((cfg.conv_dim[-1], d)), "fp_b": jnp.zeros((d,), dtype),
        "pos_conv_w": n((cfg.pos_conv_kernel, d // cfg.pos_conv_groups, d)),
        "pos_conv_b": jnp.zeros((d,), dtype),
        "ln0_w": jnp.ones((d,), dtype), "ln0_b": jnp.zeros((d,), dtype),
        "rel_attn_embed": n((cfg.num_buckets, cfg.num_heads)),
        "layers": {
            "q_w": n((l, d, d)), "q_b": jnp.zeros((l, d), dtype),
            "k_w": n((l, d, d)), "k_b": jnp.zeros((l, d), dtype),
            "v_w": n((l, d, d)), "v_b": jnp.zeros((l, d), dtype),
            "out_w": n((l, d, d)), "out_b": jnp.zeros((l, d), dtype),
            "gru_w": n((l, hd, 8)), "gru_b": jnp.zeros((l, 8), dtype),
            "gru_const": jnp.ones((l, cfg.num_heads), dtype),
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


def _relative_position_buckets(t: int, num_buckets: int, max_distance: int) -> np.ndarray:
    """T5/WavLM log-bucketed relative positions, (T, T) int32 (host-side,
    constant-folded)."""
    ctx = np.arange(t)[:, None]
    mem = np.arange(t)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets.astype(np.int32)


def feature_extractor(params: Params, cfg: WavLMConfig, wav: jax.Array) -> jax.Array:
    """(B, T) 16 kHz -> (B, T/320, conv_dim[-1]) @ 50 Hz."""
    x = wav[:, :, None].astype(params["convs"][0]["w"].dtype)  # NTC
    for i, (conv, k, st) in enumerate(
        zip(params["convs"], cfg.conv_kernel, cfg.conv_stride)
    ):
        x = jax.lax.conv_general_dilated(
            x, conv["w"], window_strides=(st,), padding="VALID",
            dimension_numbers=("NTC", "TIO", "NTC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if i == 0:
            # GroupNorm(num_groups=C, C): per-channel instance norm over time
            xf = x.astype(jnp.float32)
            mu = xf.mean(axis=1, keepdims=True)
            var = ((xf - mu) ** 2).mean(axis=1, keepdims=True)
            x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * conv["gn_w"]
                 + conv["gn_b"]).astype(x.dtype)
        x = jax.nn.gelu(x, approximate=False)
    return x


def forward(
    params: Params, cfg: WavLMConfig, wav: jax.Array
) -> List[jax.Array]:
    """(B, T) waveform -> list of hidden states [h_0 .. h_L] (HF
    `output_hidden_states=True` layout: index 0 = pre-layer embedding)."""
    feats = feature_extractor(params, cfg, wav)
    h = _ln(feats, params["fp_ln_w"], params["fp_ln_b"], cfg.layer_norm_eps)
    h = h @ params["fp_w"] + params["fp_b"]

    # grouped conv positional embedding, SAME-ish padding with 1-sample trim
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
    h = _ln(h, params["ln0_w"], params["ln0_b"], cfg.layer_norm_eps)

    b, t, d = h.shape
    heads = cfg.num_heads
    hd = d // heads
    buckets = jnp.asarray(
        _relative_position_buckets(t, cfg.num_buckets, cfg.max_distance)
    )
    pos_bias = jnp.take(params["rel_attn_embed"], buckets, axis=0)  # (T,T,H)
    pos_bias = pos_bias.transpose(2, 0, 1)[None]                    # (1,H,T,T)

    def layer_fn(h, lp):
        hh = h.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)  # (B,H,T,hd)
        proj = hh @ lp["gru_w"] + lp["gru_b"]                  # (B,H,T,8)
        proj = proj.reshape(b, heads, t, 2, 4).sum(-1)
        gates = jax.nn.sigmoid(proj)                           # (B,H,T,2)
        gate_a, gate_b = gates[..., 0], gates[..., 1]
        gate_out = gate_a * (gate_b * lp["gru_const"][None, :, None] - 1.0) + 2.0
        gated_bias = gate_out[..., None] * pos_bias            # (B,H,T,T)

        q = (h @ lp["q_w"] + lp["q_b"]).reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
        k = (h @ lp["k_w"] + lp["k_b"]).reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
        v = (h @ lp["v_w"] + lp["v_b"]).reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5) + gated_bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, -1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        h = h + (o @ lp["out_w"] + lp["out_b"])
        h = _ln(h, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        ff = jax.nn.gelu(h @ lp["ff1_w"] + lp["ff1_b"], approximate=False)
        h = h + (ff @ lp["ff2_w"] + lp["ff2_b"])
        h = _ln(h, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        return h, h

    _, stacked = jax.lax.scan(layer_fn, h, params["layers"])
    return [h] + [stacked[i] for i in range(cfg.num_layers)]


def phone_features(params: Params, cfg: WavLMConfig, wav: jax.Array) -> jax.Array:
    """Layers 6..9 mean (reference `get_wavlm_feature`,
    `AudioDiffusion1D.py:355-366`): (B, T50, D)."""
    hs = forward(params, cfg, wav)
    lo, hi = cfg.phone_layers
    return jnp.stack(hs[lo:hi], 0).mean(0)
