"""Profile the two attention hot shapes vs a Pallas flash kernel (VERDICT r1
item 10): does XLA's fused einsum-attention need replacing?

Shapes (from SURVEY.md / the shipped configs):
  1. backbone prefill  — B=1, H=24, G=8 (GQA), hd=128, T=2048 (largest
     prompt bucket; f32 scores would be 24*2048*2048*4 = 400 MB per layer)
  2. DiT self-attention — B=2 (CFG), H=24, hd=64, T=768 (30 s latent chunk),
     non-causal, 32 layers per CFM step

For each: the production einsum path (`ops/attention.py`, f32 softmax) vs
`jax.experimental.pallas.ops.tpu.flash_attention`. Times are single large
runs (28/32-layer scans) on the real chip; prints one JSON line per variant.
"""


from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp

from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention,
)

from uniaudio2_tpu.ops.attention import causal_attention

LAYERS_BB = 28 * 8  # 8 reps to drown the ~30ms tunnel overhead
LAYERS_DIT = 32 * 8


import numpy as _np


def timed(fn, q, k, v):
    # fresh inputs for the timed run (the remote tunnel caches identical
    # calls) and a host transfer for true synchronisation
    _np.asarray(fn(q, k, v))
    q2 = q + 1e-3
    _np.asarray(q2)
    t0 = time.perf_counter()
    _np.asarray(fn(q2, k, v))
    return time.perf_counter() - t0


def bench_case(name, n_layers, make_qkv, einsum_fn, flash_fn):
    q, k, v = make_qkv()

    @jax.jit
    def loop_einsum(q, k, v):
        def body(i, acc):
            o = einsum_fn(q, k, v)
            return acc + o.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, n_layers, body, jnp.float32(0))

    @jax.jit
    def loop_flash(q, k, v):
        def body(i, acc):
            o = flash_fn(q, k, v)
            return acc + o.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, n_layers, body, jnp.float32(0))

    t_e = timed(loop_einsum, q, k, v)
    print(json.dumps({"case": name, "path": "einsum",
                      "ms_total": round(t_e * 1e3, 2),
                      "ms_per_layer": round(t_e / n_layers * 1e3, 3)}),
          flush=True)
    try:
        t_f = timed(loop_flash, q, k, v)  # noqa: same harness, fresh inputs
        print(json.dumps({"case": name, "path": "flash",
                          "ms_total": round(t_f * 1e3, 2),
                          "ms_per_layer": round(t_f / n_layers * 1e3, 3),
                          "speedup": round(t_e / t_f, 2)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": name, "path": "flash",
                          "error": str(e)[:200]}), flush=True)


def main():
    key = jax.random.PRNGKey(0)

    # ---- 1. backbone prefill (GQA 24q/8kv, hd=128, T=2048) ----
    b, h, g, hd, t = 1, 24, 8, 128, 2048

    def mk_bb():
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, t, hd), jnp.bfloat16)
        k = jax.random.normal(kk, (b, g, t, hd), jnp.bfloat16)
        v = jax.random.normal(kv, (b, g, t, hd), jnp.bfloat16)
        return q, k, v

    def bb_einsum(q, k, v):
        return causal_attention(q, k, v)

    def bb_flash(q, k, v):
        # expand KV groups to query heads (12.6 MB at these shapes)
        rep = h // g
        k_e = jnp.repeat(k, rep, axis=1)
        v_e = jnp.repeat(v, rep, axis=1)
        o = flash_attention(q, k_e, v_e, causal=True,
                            sm_scale=1.0 / (hd ** 0.5))
        return o.transpose(0, 2, 1, 3).reshape(b, t, h * hd)

    bench_case("backbone_prefill_T2048", LAYERS_BB, mk_bb, bb_einsum, bb_flash)

    # ---- 2. DiT self-attention (24 heads, hd=64, T=768, non-causal) ----
    b2, h2, hd2, t2 = 2, 24, 64, 768

    def mk_dit():
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(kq, (b2, h2, t2, hd2), jnp.bfloat16)
        k = jax.random.normal(kk, (b2, h2, t2, hd2), jnp.bfloat16)
        v = jax.random.normal(kv, (b2, h2, t2, hd2), jnp.bfloat16)
        return q, k, v

    def dit_einsum(q, k, v):
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (1.0 / (hd2 ** 0.5))
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    def dit_flash(q, k, v):
        return flash_attention(q, k, v, causal=False,
                               sm_scale=1.0 / (hd2 ** 0.5))

    bench_case("dit_T768", LAYERS_DIT, mk_dit, dit_einsum, dit_flash)


if __name__ == "__main__":
    main()
