"""Compare audio-sampling implementations on TPU (fresh inputs, chained).

Variants on (1, 12300) logits, 8 calls/frame x 128 frames:
  current      — mask-below-kth + full-width gumbel + full argmax
  topk-gather  — top_k values+indices, k-wide gumbel, gather
  approx       — approx_max_k candidates, k-wide gumbel, gather

Usage: python scripts/profile_sampling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from uniaudio2_tpu.ops import sampling

FRAMES = 128
VOCAB = 12300
K = 200


def current(key, logits):
    return sampling.sample_topk(key, logits, K, 0.9,
                                forbid_prefix=jnp.int32(0))


def topk_gather(key, logits):
    scaled = logits.astype(jnp.float32) / 0.9
    ids = jnp.arange(VOCAB, dtype=jnp.int32)
    scaled = jnp.where(ids < 0, -1e30, scaled)
    vals, idxs = jax.lax.top_k(scaled, K)
    g = jax.random.gumbel(key, vals.shape, jnp.float32)
    choice = jnp.argmax(vals + g, axis=-1)
    return jnp.take_along_axis(idxs, choice[..., None], axis=-1)[..., 0]


def approx(key, logits):
    scaled = logits.astype(jnp.float32) / 0.9
    ids = jnp.arange(VOCAB, dtype=jnp.int32)
    scaled = jnp.where(ids < 0, -1e30, scaled)
    vals, idxs = jax.lax.approx_max_k(scaled, K, recall_target=0.95)
    g = jax.random.gumbel(key, vals.shape, jnp.float32)
    choice = jnp.argmax(vals + g, axis=-1)
    return jnp.take_along_axis(idxs, choice[..., None], axis=-1)[..., 0]


def bench(fn, name):
    @jax.jit
    def loop(logits0, seed):
        def body(i, lg):
            key = jax.random.fold_in(jax.random.PRNGKey(1), i + seed)
            s = lg
            for j in range(8):
                tok = fn(jax.random.fold_in(key, j), s)
                s = s + tok.astype(jnp.float32)[..., None] * 1e-9
            return s

        return jax.lax.fori_loop(0, FRAMES, body, logits0)

    lg0 = jax.random.normal(jax.random.PRNGKey(2), (1, VOCAB), jnp.float32)
    out = loop(lg0, jnp.int32(3))
    np.asarray(out)
    t0 = time.perf_counter()
    out = loop(lg0 + 1.0, jnp.int32(9))
    np.asarray(out)
    dt = time.perf_counter() - t0
    print(json.dumps({"part": name,
                      "us_per_call": round(dt / FRAMES / 8 * 1e6, 1),
                      "ms_per_frame": round(dt / FRAMES * 1e3, 3)}))


for name, fn in (("current", current), ("topk-gather", topk_gather),
                 ("approx", approx)):
    bench(fn, name)
