"""Flow-matching DiT (the codec's latent decoder), functional JAX.

Same architecture as the reference's `Transformer1DModel`
(`/root/reference/tools/tokenizer/ReasoningCodec_film/models/
transformer_1d_flow.py:162-386` with blocks from `models/attention.py:97-418`,
config `models/model_config.json`): a PixArt-α-style 1-D DiT —

* conv(k=3) + linear input projection (``ProjectLayer``, scaled by k^-0.5)
* additive sinusoidal position embedding (interleaved sin/cos)
* N pre-norm blocks with **adaLN-single** conditioning: one global
  ``silu→linear(D→6D)`` of the flow-time embedding shared by all layers,
  plus a per-block learned ``(6, D)`` shift table; self-attention with QKV
  bias; GELU(tanh) MLP ×4
* final LayerNorm + (2, D) scale-shift table + conv/linear output projection

Shipped shape: 32 layers × 24 heads × 64 head-dim (D=1536), in 1040
(= 136 noisy latent ‖ 136 incontext latent ‖ 768 condition), out 136.

TPU design: layers are stacked and scanned (one compiled block), attention is
full (non-causal, T ≈ 750 per 30 s chunk — XLA's fused attention handles this
well below the flash-attention crossover), everything bf16 with f32 softmax.

Params pytree:
    proj_in:  conv_w (k, C_in, D), conv_b (D,), lin_w (D, D), lin_b (D,)
    t_embed:  w1 (512, D), b1, w2 (D, D), b2      (TimestepEmbedding)
    adaln:    w (D, 6D), b (6D,)
    blocks (stacked, leading L):
        sst (L, 6, D)                              per-block shift table
        qkv_w (L, D, 3D), qkv_b (L, 3D)
        attn_out_w (L, D, D), attn_out_b (L, D)
        ff1_w (L, D, 4D), ff1_b (L, 4D), ff2_w (L, 4D, D), ff2_b (L, D)
    out:      sst (2, D), conv_w (k, D, C_out), conv_b, lin_w? — the
              reference's proj_out is conv+linear like proj_in.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass(frozen=True)
class DiTConfig:
    in_channels: int = 1040
    out_channels: int = 136
    num_layers: int = 32
    num_heads: int = 24
    head_dim: int = 64
    norm_eps: float = 1e-6
    flow_t_size: int = 512
    max_positions: int = 3000
    proj_kernel: int = 3

    @property
    def dim(self) -> int:
        return self.num_heads * self.head_dim

    @classmethod
    def tiny(cls) -> "DiTConfig":
        return cls(in_channels=20, out_channels=8, num_layers=2,
                   num_heads=2, head_dim=16, max_positions=256)


def init_params(key: jax.Array, cfg: DiTConfig, dtype=jnp.float32) -> Params:
    d, l, k = cfg.dim, cfg.num_layers, cfg.proj_kernel
    ks = jax.random.split(key, 12)
    s = 0.02

    def n(k_, shape):
        return (jax.random.normal(k_, shape, jnp.float32) * s).astype(dtype)

    return {
        "proj_in": {
            "conv_w": n(ks[0], (k, cfg.in_channels, d)),
            "conv_b": jnp.zeros((d,), dtype),
            "lin_w": n(ks[1], (d, d)), "lin_b": jnp.zeros((d,), dtype),
        },
        "t_embed": {
            "w1": n(ks[2], (cfg.flow_t_size, d)), "b1": jnp.zeros((d,), dtype),
            "w2": n(ks[3], (d, d)), "b2": jnp.zeros((d,), dtype),
        },
        "adaln": {"w": n(ks[4], (d, 6 * d)), "b": jnp.zeros((6 * d,), dtype)},
        "blocks": {
            "sst": (jax.random.normal(ks[5], (l, 6, d)) / d ** 0.5).astype(dtype),
            "qkv_w": n(ks[6], (l, d, 3 * d)), "qkv_b": jnp.zeros((l, 3 * d), dtype),
            "attn_out_w": n(ks[7], (l, d, d)), "attn_out_b": jnp.zeros((l, d), dtype),
            "ff1_w": n(ks[8], (l, d, 4 * d)), "ff1_b": jnp.zeros((l, 4 * d), dtype),
            "ff2_w": n(ks[9], (l, 4 * d, d)), "ff2_b": jnp.zeros((l, d), dtype),
        },
        "out": {
            "sst": (jax.random.normal(ks[10], (2, d)) / d ** 0.5).astype(dtype),
            "conv_w": n(ks[11], (k, d, cfg.out_channels)),
            "conv_b": jnp.zeros((cfg.out_channels,), dtype),
            "lin_w": jnp.eye(cfg.out_channels, dtype=dtype),
            "lin_b": jnp.zeros((cfg.out_channels,), dtype),
        },
    }


# ---------------------------------------------------------------------------
# Pieces
# ---------------------------------------------------------------------------


def _layer_norm(x: jax.Array, eps: float) -> jax.Array:
    """LayerNorm without affine (norm_elementwise_affine=False)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _conv1d_same(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """(B, T, C_in) conv (k, C_in, C_out) with SAME padding."""
    out = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b).astype(x.dtype)


def _project(p: Params, x: jax.Array, kernel: int) -> jax.Array:
    """ProjectLayer: conv(k) scaled by k^-0.5, then linear
    (reference `transformer_1d_flow.py:19-33`)."""
    h = _conv1d_same(x, p["conv_w"], p["conv_b"]) * (kernel ** -0.5)
    return h @ p["lin_w"] + p["lin_b"]


def flow_time_embedding(t: jax.Array, size: int) -> jax.Array:
    """Sinusoidal embedding of the flow time (scaled ×1000, cos‖sat layout
    matching reference `:56-70`). t: (B,) float -> (B, size) f32."""
    half = size // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None] * 1000.0
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _sinusoidal_positions(max_len: int, dim: int) -> jax.Array:
    """Interleaved sin/cos additive position table (diffusers
    `SinusoidalPositionalEmbedding` convention)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    pe = jnp.zeros((max_len, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


def _flash_ok(b: int, h: int, t: int, hd: int, dtype) -> bool:
    """Use the Pallas flash kernel only on TPU at supported shapes (a
    power-of-two head dim; sequences are padded to the kernel's 128 block
    with segment-id masking)."""
    from uniaudio2_tpu.ops.quant import _use_pallas

    return (
        _use_pallas()
        and t >= 128
        and hd in (64, 128, 256)
        and dtype in (jnp.bfloat16, jnp.float32)
    )


def _flash_attention(q, k, v, hd: int):
    """Non-causal flash attention with right-padding to the kernel's 128
    block; pad positions get segment id 1 (valid = 0) so they never mix
    with real keys, and their output rows are sliced off."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention,
    )

    b, h, t, _ = q.shape
    tp = -(-t // 128) * 128
    seg = None
    if tp != t:
        pad = ((0, 0), (0, 0), (0, tp - t), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        ids = (jnp.arange(tp) >= t).astype(jnp.int32)[None]
        ids = jnp.broadcast_to(ids, (b, tp))
        seg = SegmentIds(q=ids, kv=ids)
    o = flash_attention(q, k, v, segment_ids=seg, causal=False,
                        sm_scale=1.0 / (hd ** 0.5))
    return o[:, :, :t]


def _attention(
    x: jax.Array, qkv_w, qkv_b, out_w, out_b, num_heads: int
) -> jax.Array:
    b, t, d = x.shape
    hd = d // num_heads
    qkv = x @ qkv_w + qkv_b
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(z):
        return z.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    o = None
    if _flash_ok(b, num_heads, t, hd, q.dtype):
        # measured 1.32x over the einsum form at the production shape
        # (B=2, H=24, T=768, hd=64 — scripts/profile_attention.py); the
        # backbone prefill stays on the einsum path, where flash measured
        # 0.89x (XLA's fusion wins there)
        try:
            o = _flash_attention(q, k, v, hd)
        except Exception:  # pragma: no cover - shape/backend corner
            o = None
    if o is None:
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return o @ out_w + out_b


def forward(
    params: Params,
    cfg: DiTConfig,
    x: jax.Array,          # (B, T, in_channels)
    t: jax.Array,          # (B,) flow time in [0, 1]
) -> jax.Array:
    """One estimator evaluation: returns the predicted velocity
    (B, T, out_channels)."""
    b, tl, _ = x.shape
    h = _project(params["proj_in"], x, cfg.proj_kernel)
    pe = _sinusoidal_positions(cfg.max_positions, cfg.dim)[:tl]
    h = h + pe.astype(h.dtype)[None]

    te = flow_time_embedding(t, cfg.flow_t_size)  # (B, 512) f32
    emb = params["t_embed"]
    te = jax.nn.silu(te @ emb["w1"] + emb["b1"])
    te = (te @ emb["w2"] + emb["b2"]).astype(h.dtype)  # (B, D) embedded t
    ada = jax.nn.silu(te) @ params["adaln"]["w"] + params["adaln"]["b"]
    ada = ada.reshape(b, 6, cfg.dim)  # shared across layers

    def block(h, layer):
        mods = layer["sst"][None] + ada  # (B, 6, D)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [
            mods[:, i][:, None, :] for i in range(6)
        ]
        hn = _layer_norm(h, cfg.norm_eps) * (1 + sc_msa) + sh_msa
        attn = _attention(
            hn, layer["qkv_w"], layer["qkv_b"],
            layer["attn_out_w"], layer["attn_out_b"], cfg.num_heads,
        )
        h = h + g_msa * attn
        hn = _layer_norm(h, cfg.norm_eps) * (1 + sc_mlp) + sh_mlp
        ff = jax.nn.gelu(hn @ layer["ff1_w"] + layer["ff1_b"], approximate=True)
        ff = ff @ layer["ff2_w"] + layer["ff2_b"]
        h = h + g_mlp * ff
        return h, None

    h, _ = jax.lax.scan(block, h, params["blocks"])

    # final: scale_shift_table (2, D) + embedded timestep, then norm+modulate
    out_mods = params["out"]["sst"][None] + te[:, None, :]
    shift, scale = out_mods[:, 0][:, None], out_mods[:, 1][:, None]
    h = _layer_norm(h, 1e-6) * (1 + scale) + shift
    return _project(params["out"], h, cfg.proj_kernel)
