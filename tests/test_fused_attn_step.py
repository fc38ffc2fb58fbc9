"""Fused attention decode-step kernel (interpret mode) vs the composed
library ops it replaces (rms_norm -> qkv -> rope -> cache write ->
decode_attention)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from uniaudio2_tpu.ops import quant
from uniaudio2_tpu.ops.attention import decode_attention
from uniaudio2_tpu.ops.fused_attn_step import (
    can_fuse_step, fused_attn_decode_step,
)
from uniaudio2_tpu.ops.kv_cache import update_layer
from uniaudio2_tpu.ops.norms import rms_norm
from uniaudio2_tpu.ops.rope import apply_rope, rope_cache


def _setup(grouped, d=256, h=4, g=2, hd=64, s=16, seed=0):
    rng = np.random.default_rng(seed)
    n_qkv = (h + 2 * g) * hd
    qf = lambda a: (quant.quantize4_grouped(jnp.asarray(a), 64) if grouped
                    else quant.quantize4(jnp.asarray(a)))
    layer = {
        "norm1_w": jnp.asarray(rng.standard_normal(d).astype(np.float32)),
        "qkv_w": qf(rng.standard_normal((d, n_qkv)).astype(np.float32) * 0.1),
        "attn_proj_w": qf(
            rng.standard_normal((h * hd, d)).astype(np.float32) * 0.1),
    }
    x = jnp.asarray(rng.standard_normal((1, 1, d)).astype(np.float32))
    k_cache = jnp.asarray(
        rng.standard_normal((1, g, s, hd)).astype(np.float32) * 0.2)
    v_cache = jnp.asarray(
        rng.standard_normal((1, g, s, hd)).astype(np.float32) * 0.2)
    return layer, x, k_cache, v_cache


def _composed(layer, x, k_cache, v_cache, pos, *, h, g, hd, eps=1e-5):
    """The exact op sequence from `gpt.decode_step`'s layer_fn, up to (and
    excluding) the output projection."""
    cos_t, sin_t = rope_cache(64, hd)
    positions = pos + jnp.arange(1, dtype=jnp.int32)
    cos = jnp.take(cos_t, positions, axis=0)
    sin = jnp.take(sin_t, positions, axis=0)
    hn = rms_norm(x, layer["norm1_w"], eps)
    qkv = quant.matmul(hn, layer["qkv_w"])
    q, k, v = jnp.split(qkv, [h * hd, (h + g) * hd], axis=-1)
    q = apply_rope(q.reshape(1, 1, h, hd).transpose(0, 2, 1, 3), cos, sin)
    k = apply_rope(k.reshape(1, 1, g, hd).transpose(0, 2, 1, 3), cos, sin)
    v = v.reshape(1, 1, g, hd).transpose(0, 2, 1, 3)
    k_l, v_l = update_layer(k_cache, v_cache, k, v, pos)
    scale = 1.0 / (hd ** 0.5)
    attn = decode_attention(q, k_l, v_l, positions, scale=scale)
    return attn, k_l, v_l, cos, sin


@pytest.mark.parametrize("grouped", [False, True])
def test_fused_step_matches_composed(grouped):
    h, g, hd = 4, 2, 64
    layer, x, k_cache, v_cache = _setup(grouped, h=h, g=g, hd=hd)
    pos = jnp.int32(5)
    ref, k_ref, v_ref, cos, sin = _composed(
        layer, x, k_cache, v_cache, pos, h=h, g=g, hd=hd)

    assert can_fuse_step(layer, x, k_cache=k_cache, v_cache=v_cache)
    with pltpu.force_tpu_interpret_mode():
        attn, k_new, v_new = fused_attn_decode_step(
            layer, x, cos, sin, k_cache, v_cache, pos,
            n_head=h, n_query_groups=g, head_size=hd,
            norm_eps=1e-5, scale=1.0 / (hd ** 0.5),
        )
    np.testing.assert_allclose(np.asarray(attn), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(k_new), np.asarray(k_ref),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(v_new), np.asarray(v_ref),
                               rtol=2e-2, atol=2e-3)


def test_fused_step_sequential_cache_consistency():
    """Three decode steps through the fused kernel match three composed
    steps (cache state threads correctly through the aliased outputs)."""
    h, g, hd = 4, 2, 64
    layer, x, k_cache, v_cache = _setup(False, h=h, g=g, hd=hd, seed=3)
    kf, vf = k_cache, v_cache
    kc, vc = k_cache, v_cache
    rng = np.random.default_rng(7)
    for pos in (3, 4, 5):
        x = jnp.asarray(
            rng.standard_normal((1, 1, 256)).astype(np.float32) * 0.5)
        pos = jnp.int32(pos)
        ref, kc, vc, cos, sin = _composed(layer, x, kc, vc, pos,
                                          h=h, g=g, hd=hd)
        with pltpu.force_tpu_interpret_mode():
            attn, kf, vf = fused_attn_decode_step(
                layer, x, cos, sin, kf, vf, pos,
                n_head=h, n_query_groups=g, head_size=hd,
                norm_eps=1e-5, scale=1.0 / (hd ** 0.5),
            )
        np.testing.assert_allclose(np.asarray(attn), np.asarray(ref),
                                   rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(kf), np.asarray(kc),
                               rtol=2e-2, atol=2e-3)


def test_can_fuse_step_gates():
    layer, x, kc, vc = _setup(False)
    kw = dict(k_cache=kc, v_cache=vc)
    assert can_fuse_step(layer, x, **kw)
    assert not can_fuse_step(layer, x)                         # unknown cache
    assert not can_fuse_step(layer, jnp.zeros((2, 1, 256)), **kw)  # batch > 1
    assert not can_fuse_step(layer, x, window=jnp.int32(4), **kw)
    assert not can_fuse_step(layer, x, softcap=30.0, **kw)
    assert not can_fuse_step(layer, x, key_valid=jnp.ones((1, 16), bool),
                             **kw)
    bf16 = {**layer, "qkv_w": jnp.zeros((256, 512), jnp.bfloat16)}
    assert not can_fuse_step(bf16, x, **kw)                    # unquantized
    # oversized cache blows the resident-set budget
    big_kc = jnp.zeros((1, 8, 8192, 128), jnp.bfloat16)
    assert not can_fuse_step(layer, x, k_cache=big_kc, v_cache=big_kc)
