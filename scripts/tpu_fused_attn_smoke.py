"""Standalone TPU smoke + timing for the fused attention decode-step kernel
at the real serving shapes (backbone 3072d GQA 24/8, decoder 2048d 16/8).

Usage: python scripts/tpu_fused_attn_smoke.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from uniaudio2_tpu.ops import quant
from uniaudio2_tpu.ops.attention import decode_attention
from uniaudio2_tpu.ops.fused_attn_step import (
    can_fuse_step, fused_attn_decode_step,
)
from uniaudio2_tpu.ops.kv_cache import update_layer
from uniaudio2_tpu.ops.norms import rms_norm
from uniaudio2_tpu.ops.rope import apply_rope, rope_cache

SHAPES = {
    "backbone": dict(d=3072, h=24, g=8, hd=128, s=256),
    "decoder": dict(d=2048, h=16, g=8, hd=128, s=8),
}


def run(name, d, h, g, hd, s):
    rng = np.random.default_rng(0)
    n_qkv = (h + 2 * g) * hd
    layer = {
        "norm1_w": jnp.ones((d,), jnp.bfloat16),
        "qkv_w": quant.quantize4(jnp.asarray(
            rng.standard_normal((d, n_qkv)).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)),
        "attn_proj_w": quant.quantize4(jnp.asarray(
            rng.standard_normal((h * hd, d)).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)),
    }
    x = jnp.asarray(rng.standard_normal((1, 1, d)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    k_cache = jnp.zeros((1, g, s, hd), jnp.bfloat16)
    v_cache = jnp.zeros((1, g, s, hd), jnp.bfloat16)
    pos = jnp.int32(min(5, s - 1))
    cos_t, sin_t = rope_cache(s, hd)
    positions = pos + jnp.arange(1, dtype=jnp.int32)
    cos = jnp.take(cos_t, positions, axis=0)
    sin = jnp.take(sin_t, positions, axis=0)
    assert can_fuse_step(layer, x), name

    @jax.jit
    def fused(layer, x, kc, vc, pos):
        return fused_attn_decode_step(
            layer, x, cos, sin, kc, vc, pos,
            n_head=h, n_query_groups=g, head_size=hd,
            norm_eps=1e-5, scale=1.0 / (hd ** 0.5))

    @jax.jit
    def composed(layer, x, kc, vc, pos):
        hn = rms_norm(x, layer["norm1_w"], 1e-5)
        qkv = quant.matmul(hn, layer["qkv_w"])
        q, k, v = jnp.split(qkv, [h * hd, (h + g) * hd], axis=-1)
        q = apply_rope(q.reshape(1, 1, h, hd).transpose(0, 2, 1, 3), cos, sin)
        k = apply_rope(k.reshape(1, 1, g, hd).transpose(0, 2, 1, 3), cos, sin)
        v = v.reshape(1, 1, g, hd).transpose(0, 2, 1, 3)
        k_l, v_l = update_layer(kc, vc, k, v, pos)
        attn = decode_attention(q, k_l, v_l, positions,
                                scale=1.0 / (hd ** 0.5))
        return attn, k_l, v_l

    a1, k1, v1 = fused(layer, x, k_cache, v_cache, pos)
    a2, k2, v2 = composed(layer, x, k_cache, v_cache, pos)
    err = float(jnp.max(jnp.abs(a1.astype(jnp.float32)
                                - a2.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(a2.astype(jnp.float32)))) + 1e-9
    print(json.dumps({"part": f"{name}-maxerr", "abs": round(err, 5),
                      "rel": round(err / ref, 5)}))

    # chained timing, fresh input on the timed call
    def chain(fn):
        @jax.jit
        def loop(layer, x, kc, vc, seed):
            def body(i, c):
                xx, kc, vc = c
                a, kc, vc = fn(layer, xx, kc, vc, pos)
                xx = xx + jnp.sum(a).astype(xx.dtype) * 1e-9
                return xx, kc, vc

            return jax.lax.fori_loop(0, 200, body, (x * (1.0 + seed * 1e-9), kc, vc))
        return loop

    for fname, fn in (("fused", fused), ("composed", composed)):
        loop = chain(fn)
        out = loop(layer, x, k_cache, v_cache, jnp.float32(1))
        np.asarray(out[0])
        t0 = time.perf_counter()
        out = loop(layer, x, k_cache, v_cache, jnp.float32(2))
        np.asarray(out[0])
        dt = time.perf_counter() - t0
        print(json.dumps({"part": f"{name}-{fname}",
                          "us_per_step": round(dt / 200 * 1e6, 1)}))


for name, kw in SHAPES.items():
    run(name, **kw)
