"""Decoder-only transformer (Llama-3.2 family), functional and TPU-native.

Re-design of the reference GPT (`/root/reference/llm_models/lit_model.py:22-532`)
with the same math — GQA attention with fused QKV, full-rotary Llama-3 RoPE,
RMSNorm, SwiGLU MLP, non-parallel residual — but structured for XLA:

* **Parameters are a pytree with a stacked layer axis** (every per-layer leaf
  has leading dim ``n_layer``) and the forward pass is a single
  ``jax.lax.scan`` over layers. One compiled layer body instead of N inlined
  copies: much faster compiles, natural FSDP sharding (shard dim 0 of the
  stack), and layer-granular ``jax.checkpoint`` for training.
* **No module state**: KV caches are explicit pytrees threaded through the
  step functions (see `ops/kv_cache.py`), replacing the reference's stateful
  `set_kv_cache`/`reset_kv_cache` (`lit_model.py:224-274`).
* Embedding lookup and lm_head are exposed separately because the unified
  audio model feeds continuous features and muxes streams itself
  (`model_new.py:111-115,402-454`).

Weight layout is ``(in_features, out_features)`` so activations multiply as
``x @ w`` (checkpoint converters transpose from torch's ``(out, in)``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import GPTConfig
from uniaudio2_tpu.ops.attention import causal_attention, decode_attention
from uniaudio2_tpu.ops.kv_cache import KVCache, update_layer
from uniaudio2_tpu.ops.norms import rms_norm
from uniaudio2_tpu.ops.quant import matmul
from uniaudio2_tpu.ops.rope import apply_rope, rope_cache

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: GPTConfig, dtype=jnp.float32) -> Params:
    """Random init matching the reference's scheme (`lit_model.py:74-81`):
    normal(0, 0.02) for linears/embeddings, ones for RMSNorm weights."""
    assert cfg.rope_n_elem == cfg.head_size, (
        "only full-rotary models are supported (all shipped configs use "
        "rotary_percentage=1.0, reference config.py:795)"
    )
    n_l, d = cfg.n_layer, cfg.n_embd
    hd, h, g = cfg.head_size, cfg.n_head, cfg.n_query_groups
    i = cfg.intermediate_size
    keys = jax.random.split(key, 8)

    def normal(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    params: Params = {
        "layers": {
            "norm1_w": jnp.ones((n_l, d), dtype),
            "qkv_w": normal(keys[0], (n_l, d, (h + 2 * g) * hd)),
            "attn_proj_w": normal(keys[1], (n_l, h * hd, d)),
            "norm2_w": jnp.ones((n_l, d), dtype),
            "fc1_w": normal(keys[2], (n_l, d, i)),
            "fc2_w": normal(keys[3], (n_l, d, i)),
            "mlp_proj_w": normal(keys[4], (n_l, i, d)),
        },
        "ln_f_w": jnp.ones((d,), dtype),
    }
    if cfg.has_wte:
        params["wte"] = normal(keys[5], (cfg.padded_vocab_size, d))
    if cfg.has_lm_head:
        params["lm_head_w"] = normal(keys[6], (d, cfg.padded_vocab_size))
    return params


def param_count(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def unstack_layers(params: Params) -> Params:
    """Serving-time layout change: stacked layer leaves -> a list of
    per-layer trees.

    Measured on v5e (scripts/profile_scan_slice.py): `lax.scan` over stacked
    weights feeds each Pallas matmul through a materialized dynamic-slice
    copy (Pallas operands cannot fuse a producer), capping the serial decode
    GEMV chain at ~281 GB/s of weight reads; with separate per-layer buffers
    and a trace-time-unrolled loop the same chain streams ~481 GB/s (1.7x).
    The forward/prefill/decode functions detect the list form and unroll.
    """
    layers = params["layers"]
    if isinstance(layers, list):
        return params
    n_layer = jax.tree_util.tree_leaves(layers)[0].shape[0]
    out = dict(params)
    out["layers"] = [
        jax.tree_util.tree_map(lambda a: a[i], layers) for i in range(n_layer)
    ]
    return out


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def embed(params: Params, tokens: jax.Array) -> jax.Array:
    """Token embedding lookup: (B, S) int -> (B, S, D)."""
    return jnp.take(params["wte"], tokens, axis=0)


def lm_head(params: Params, h: jax.Array) -> jax.Array:
    """(..., D) -> (..., padded_vocab); f32 logits (weight may be int8)."""
    return matmul(h, params["lm_head_w"], out_dtype=jnp.float32)


def _qkv(
    layer: Params, cfg: GPTConfig, x: jax.Array, cos: jax.Array, sin: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Project + split + head-reshape + RoPE.
    Returns q (B,H,T,hd), k/v (B,G,T,hd)."""
    b, t, _ = x.shape
    h, g, hd = cfg.n_head, cfg.n_query_groups, cfg.head_size
    qkv = matmul(x, layer["qkv_w"])
    q, k, v = jnp.split(qkv, [h * hd, (h + g) * hd], axis=-1)
    q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, g, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, g, hd).transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    return q, k, v


def _mlp(layer: Params, x: jax.Array) -> jax.Array:
    """SwiGLU (reference `LLaMAMLP`, `lit_model.py:582-595`).

    Quantized small-M steps (decode) route through the single fused Pallas
    kernel (`ops/fused_mlp.py`) — one weight-streaming pass instead of three
    calls with HBM-round-tripped intermediates."""
    from uniaudio2_tpu.ops import fused_mlp
    from uniaudio2_tpu.ops.quant import _use_pallas

    w1, w2, w3 = layer["fc1_w"], layer["fc2_w"], layer["mlp_proj_w"]
    if _use_pallas() and fused_mlp.can_fuse(w1, w2, w3, x):
        return fused_mlp.fused_swiglu(x, w1, w2, w3)
    gate = matmul(x, w1)
    up = matmul(x, w2)
    return matmul(jax.nn.silu(gate) * up, w3)


def _rope_tables(cfg: GPTConfig, max_positions: int) -> Tuple[jax.Array, jax.Array]:
    return rope_cache(
        max_positions, cfg.rope_n_elem, base=cfg.rope_base,
        adjustments=cfg.rope_adjustments,
    )


# ---------------------------------------------------------------------------
# Full-sequence forward (training / no-cache prefill)
# ---------------------------------------------------------------------------


def forward(
    params: Params,
    cfg: GPTConfig,
    x: jax.Array,
    *,
    positions: Optional[jax.Array] = None,
    extra_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Full-sequence forward over continuous features ``x`` (B, S, D).

    Returns hidden states after the final norm (B, S, D); the lm_head is
    applied by the caller (matching reference `GPT.forward`,
    `lit_model.py:180`).
    """
    b, s, d = x.shape
    # With explicit positions, bound the table by the model's practical
    # context (the inference cache is 2048; training sequences are bucketed).
    cos_t, sin_t = _rope_tables(cfg, s if positions is None else min(cfg.block_size, 8192))
    if positions is None:
        cos, sin = cos_t[:s], sin_t[:s]
    else:
        cos, sin = jnp.take(cos_t, positions, 0), jnp.take(sin_t, positions, 0)
    scale = 1.0 / math.sqrt(cfg.head_size)

    def layer_fn(carry, layer):
        xc = carry
        hn = rms_norm(xc, layer["norm1_w"], cfg.norm_eps)
        q, k, v = _qkv(layer, cfg, hn, cos, sin)
        attn = causal_attention(q, k, v, scale=scale, extra_mask=extra_mask)
        attn = matmul(attn, layer["attn_proj_w"])
        xc = xc + attn
        hn = rms_norm(xc, layer["norm2_w"], cfg.norm_eps)
        xc = xc + _mlp(layer, hn)
        return xc, None

    if isinstance(params["layers"], list):  # unrolled serving form
        for layer in params["layers"]:
            x, _ = layer_fn(x, layer)
    else:
        x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    return rms_norm(x, params["ln_f_w"], cfg.norm_eps)


# ---------------------------------------------------------------------------
# Cached forward (prefill + incremental decode)
# ---------------------------------------------------------------------------


def prefill(
    params: Params,
    cfg: GPTConfig,
    x: jax.Array,
    cache: KVCache,
    *,
    extra_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    """Process a (padded) prompt block at positions [0, S), writing K/V into
    the cache. Attention is causal within the block, so padded tail positions
    never contaminate valid ones; decode steps later overwrite them in
    sequence order (static-shape bucketing instead of the reference's dynamic
    `input_pos_maxp1` slicing).
    """
    b, s, d = x.shape
    cos_t, sin_t = _rope_tables(cfg, cache.max_seq)
    cos, sin = cos_t[:s], sin_t[:s]
    scale = 1.0 / math.sqrt(cfg.head_size)

    def layer_fn(carry, inputs):
        xc = carry
        layer, k_l, v_l = inputs
        hn = rms_norm(xc, layer["norm1_w"], cfg.norm_eps)
        q, k, v = _qkv(layer, cfg, hn, cos, sin)
        k_l, v_l = update_layer(k_l, v_l, k, v, jnp.int32(0))
        attn = causal_attention(q, k, v, scale=scale, extra_mask=extra_mask)
        attn = matmul(attn, layer["attn_proj_w"])
        xc = xc + attn
        hn = rms_norm(xc, layer["norm2_w"], cfg.norm_eps)
        xc = xc + _mlp(layer, hn)
        return xc, (k_l, v_l)

    if isinstance(params["layers"], list):  # unrolled serving form
        k_all, v_all = cache.k, cache.v
        for i, layer in enumerate(params["layers"]):
            x, (k_l, v_l) = layer_fn(x, (layer, k_all[i], v_all[i]))
            k_all = k_all.at[i].set(k_l)
            v_all = v_all.at[i].set(v_l)
        return rms_norm(x, params["ln_f_w"], cfg.norm_eps), KVCache(k_all, v_all)
    x, (k_new, v_new) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.k, cache.v)
    )
    return rms_norm(x, params["ln_f_w"], cfg.norm_eps), KVCache(k_new, v_new)


def decode_step(
    params: Params,
    cfg: GPTConfig,
    x: jax.Array,
    cache: KVCache,
    pos: jax.Array,
    *,
    key_valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    """One incremental step: ``x`` (B, T, D) at absolute positions
    [pos, pos+T). Writes K/V then attends over the full static cache with a
    position mask (plus an optional per-row ``key_valid`` cache mask for
    batched decoding over ragged prompts). Typically T == 1."""
    b, t, d = x.shape
    cos_t, sin_t = _rope_tables(cfg, cache.max_seq)
    positions = pos + jnp.arange(t, dtype=jnp.int32)
    cos = jnp.take(cos_t, positions, axis=0)
    sin = jnp.take(sin_t, positions, axis=0)
    scale = 1.0 / math.sqrt(cfg.head_size)

    def layer_fn(carry, inputs):
        xc = carry
        layer, k_l, v_l = inputs
        hn = rms_norm(xc, layer["norm1_w"], cfg.norm_eps)
        q, k, v = _qkv(layer, cfg, hn, cos, sin)
        k_l, v_l = update_layer(k_l, v_l, k, v, pos)
        attn = decode_attention(q, k_l, v_l, positions, scale=scale,
                                key_valid=key_valid)
        attn = matmul(attn, layer["attn_proj_w"])
        xc = xc + attn
        hn = rms_norm(xc, layer["norm2_w"], cfg.norm_eps)
        xc = xc + _mlp(layer, hn)
        return xc, (k_l, v_l)

    if isinstance(params["layers"], list):  # unrolled serving form
        k_all, v_all = cache.k, cache.v
        for i, layer in enumerate(params["layers"]):
            x, (k_l, v_l) = layer_fn(x, (layer, k_all[i], v_all[i]))
            k_all = k_all.at[i].set(k_l)
            v_all = v_all.at[i].set(v_l)
        return rms_norm(x, params["ln_f_w"], cfg.norm_eps), KVCache(k_all, v_all)
    x, (k_new, v_new) = jax.lax.scan(
        layer_fn, x, (params["layers"], cache.k, cache.v)
    )
    return rms_norm(x, params["ln_f_w"], cfg.norm_eps), KVCache(k_new, v_new)
