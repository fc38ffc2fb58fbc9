"""Reasoning branch ("AudioThinking"): CLS-query encoder + reasoning RVQ.

Same computation as the reference's `AudioThinking` + `encode_reasoning_part`
(`/root/reference/tools/tokenizer/ReasoningCodec_film/models/
AudioDiffusion1D.py:169-188,372-390,458-486`):

1. whisper features (50 Hz, D_wh) are stride-2 conv-downsampled to 25 Hz and
   channel-concatenated with the BEST-RQ semantic features (25 Hz, 1024),
   then linearly merged to ``dim``;
2. a learned CLS token is interleaved after every ``interval``(=5) frames;
3. a 5-deep non-causal transformer (qk-norm, partial RoPE, sigmoid-GLU FF,
   LayerScale, no pre-norms — the reference's ``power_normalized`` blocks,
   `modules/transformer.py:645-788`, whose weight-norm reparametrisation is
   folded into plain weights at conversion);
4. the CLS positions are gathered (one per 5 frames → 5 Hz) and quantized by
   an 8×4096 RVQ (codebook dim 64).

TPU notes: CLS interleave/extract are pure reshapes; blocks are stacked and
scanned; attention is full non-causal over ≤ 900 positions per 30 s window.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import rvq

Params = Dict[str, Any]


@dataclass(frozen=True)
class ReasoningConfig:
    dim: int = 768
    head_dim: int = 128            # -> 6 heads at dim 768
    depth: int = 5
    interval: int = 5
    whisper_dim: int = 1024
    bestrq_dim: int = 1024
    rope_dim: int = 64             # max(head_dim // 2, 32)
    ff_mult: int = 4
    codebook_size: int = 4096
    codebook_dim: int = 64
    num_quantizers: int = 8
    layer_scale_init: float = 1e-2

    @property
    def num_heads(self) -> int:
        return self.dim // self.head_dim

    @classmethod
    def tiny_test(cls) -> "ReasoningConfig":
        return cls(dim=32, head_dim=16, depth=2, whisper_dim=24,
                   bestrq_dim=16, rope_dim=8, codebook_size=16,
                   codebook_dim=8, num_quantizers=4)


def init_params(key: jax.Array, cfg: ReasoningConfig, dtype=jnp.float32) -> Params:
    d, l, f = cfg.dim, cfg.depth, cfg.dim * cfg.ff_mult
    hd = cfg.head_dim
    ks = iter(jax.random.split(key, 16))
    s = 0.02

    def n(shape):
        return (jax.random.normal(next(ks), shape, jnp.float32) * s).astype(dtype)

    return {
        "cls_token": jax.random.normal(next(ks), (d,)).astype(dtype),
        "whisper_down": {"w": n((2, cfg.whisper_dim, cfg.whisper_dim)),
                         "b": jnp.zeros((cfg.whisper_dim,), dtype)},
        "merge_proj": {"w": n((cfg.whisper_dim + cfg.bestrq_dim, d)),
                       "b": jnp.zeros((d,), dtype)},
        "blocks": {
            "qkv_w": n((l, d, 3 * d)),
            "q_norm_w": jnp.ones((l, hd), dtype), "q_norm_b": jnp.zeros((l, hd), dtype),
            "k_norm_w": jnp.ones((l, hd), dtype), "k_norm_b": jnp.zeros((l, hd), dtype),
            "attn_out_w": n((l, d, d)),
            "attn_scale": jnp.full((l, d), cfg.layer_scale_init, dtype),
            "glu_w": n((l, d, 2 * f)), "glu_b": jnp.zeros((l, 2 * f), dtype),
            "ff_out_w": n((l, f, d)), "ff_out_b": jnp.zeros((l, d), dtype),
            "ff_scale": jnp.full((l, d), cfg.layer_scale_init, dtype),
        },
        "rvq": rvq.init_params(
            next(ks), dim=d, codebook_size=cfg.codebook_size,
            codebook_dim=cfg.codebook_dim, num_quantizers=cfg.num_quantizers,
            dtype=dtype,
        ),
    }


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


def _rope_tables(t: int, rope_dim: int) -> Tuple[jax.Array, jax.Array]:
    """x-transformers convention: inv_freq over rope_dim, tables duplicated
    (cos/sin of shape (T, rope_dim))."""
    inv = 1.0 / (10000.0 ** (jnp.arange(0, rope_dim, 2, dtype=jnp.float32) / rope_dim))
    freqs = jnp.arange(t, dtype=jnp.float32)[:, None] * inv[None]
    freqs = jnp.concatenate([freqs, freqs], -1)
    return jnp.cos(freqs), jnp.sin(freqs)


def _apply_partial_rope(x: jax.Array, cos: jax.Array, sin: jax.Array, rope_dim: int):
    """Rotate the first ``rope_dim`` channels of each head (GPT-J partial
    rotary, half-split convention)."""
    rot, rest = x[..., :rope_dim], x[..., rope_dim:]
    half = rope_dim // 2
    r1, r2 = rot[..., :half], rot[..., half:]
    rotated = jnp.concatenate([-r2, r1], -1)
    out = rot * cos + rotated * sin
    return jnp.concatenate([out, rest], -1)


def interleave_cls(x: jax.Array, cls_token: jax.Array, interval: int) -> jax.Array:
    """(B, T, D) with T % interval == 0 -> (B, T + T//interval, D): a CLS
    token after every ``interval`` frames (reference `set_masking`)."""
    b, t, d = x.shape
    g = t // interval
    x = x.reshape(b, g, interval, d)
    cls = jnp.broadcast_to(cls_token, (b, g, 1, d)).astype(x.dtype)
    return jnp.concatenate([x, cls], axis=2).reshape(b, g * (interval + 1), d)


def extract_cls(x: jax.Array, interval: int) -> jax.Array:
    """Inverse gather of the CLS positions: (B, G*(interval+1), D) -> (B, G, D)."""
    b, n, d = x.shape
    g = n // (interval + 1)
    return x.reshape(b, g, interval + 1, d)[:, :, interval, :]


def transformer(params: Params, cfg: ReasoningConfig, x: jax.Array) -> jax.Array:
    b, t, d = x.shape
    h_, hd = cfg.num_heads, cfg.head_dim
    cos, sin = _rope_tables(t, cfg.rope_dim)

    def block(h, layer):
        qkv = h @ layer["qkv_w"]
        q, k, v = jnp.split(qkv, 3, -1)

        def heads(z):
            return z.reshape(b, t, h_, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        q = _ln(q, layer["q_norm_w"], layer["q_norm_b"])
        k = _ln(k, layer["k_norm_w"], layer["k_norm_b"])
        q = _apply_partial_rope(q, cos, sin, cfg.rope_dim)
        k = _apply_partial_rope(k, cos, sin, cfg.rope_dim)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, -1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d) @ layer["attn_out_w"]
        h = h + o * layer["attn_scale"]
        glu = h @ layer["glu_w"] + layer["glu_b"]
        val, gate = jnp.split(glu, 2, -1)
        ff = (val * jax.nn.sigmoid(gate)) @ layer["ff_out_w"] + layer["ff_out_b"]
        h = h + ff * layer["ff_scale"]
        return h, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    return x


def encode(
    params: Params,
    cfg: ReasoningConfig,
    whisper_feats: jax.Array,   # (B, T50, whisper_dim) @ 50 Hz
    bestrq_semantic: jax.Array,  # (B, T25, bestrq_dim) @ 25 Hz
) -> Tuple[jax.Array, jax.Array]:
    """-> (reason_codes (B, T5, Q), quantized (B, T5, dim))."""
    w = jax.lax.conv_general_dilated(
        whisper_feats.astype(params["whisper_down"]["w"].dtype),
        params["whisper_down"]["w"], window_strides=(2,),
        padding="VALID", dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32,
    ).astype(whisper_feats.dtype) + params["whisper_down"]["b"]
    tl = min(w.shape[1], bestrq_semantic.shape[1])
    tl -= tl % cfg.interval  # CLS interleave needs a multiple of the interval
    fused = jnp.concatenate([w[:, :tl], bestrq_semantic[:, :tl]], -1)
    fused = fused @ params["merge_proj"]["w"] + params["merge_proj"]["b"]
    x = interleave_cls(fused, params["cls_token"], cfg.interval)
    x = transformer(params, cfg, x)
    queries = extract_cls(x, cfg.interval)
    codes, quantized = rvq.encode(params["rvq"], queries)
    return codes, quantized
