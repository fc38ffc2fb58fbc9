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

Returns per-layer outputs in fairseq's ``layer_results`` convention
(index i = output of layer i, no embedding entry).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

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

    @classmethod
    def tiny_test(cls) -> "SSLEncoderConfig":
        return cls(conv_dim=(16,) * 3, conv_kernel=(10, 3, 2),
                   conv_stride=(5, 2, 2), hidden_size=32, num_layers=2,
                   num_heads=2, ffn_dim=64, pos_conv_kernel=16,
                   pos_conv_groups=2)


def init_params(key: jax.Array, cfg: SSLEncoderConfig, dtype=jnp.float32) -> Params:
    d, l, f = cfg.hidden_size, cfg.num_layers, cfg.ffn_dim
    ks = iter(jax.random.split(key, 32))
    s = 0.02

    def n(shape):
        return (jax.random.normal(next(ks), shape, jnp.float32) * s).astype(dtype)

    convs = []
    cin = 1
    for i, (c, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        conv = {"w": n((k, cin, c))}
        if cfg.conv_bias:
            conv["b"] = jnp.zeros((c,), dtype)
        if i == 0 and cfg.extractor_mode == "default":
            conv["gn_w"] = jnp.ones((c,), dtype)
            conv["gn_b"] = jnp.zeros((c,), dtype)
        convs.append(conv)
        cin = c
    return {
        "convs": convs,
        "feat_ln_w": jnp.ones((cfg.conv_dim[-1],), dtype),
        "feat_ln_b": jnp.zeros((cfg.conv_dim[-1],), dtype),
        "proj_w": n((cfg.conv_dim[-1], d)), "proj_b": jnp.zeros((d,), dtype),
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
    feats = feature_extractor(params, cfg, wav)
    h = _ln(feats, params["feat_ln_w"], params["feat_ln_b"], cfg.layer_norm_eps)
    h = h @ params["proj_w"] + params["proj_b"]

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
