"""Decompose the local-decoder microstep cost on TPU.

Variants of the 8-microstep frame loop (128 frames each, timed once):
  topk200   — production sampling (lax.top_k k=200 + gumbel)
  topk1     — greedy (no top_k, no gumbel): isolates sampling cost
  nosample  — argmax removed too; feeds dec_h back directly (isolates
              the embedding-gather + sampling chain)
Plus an isolated chain of lax.top_k(. , 200)+gumbel+argmax on (1, 4096).
"""


from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.ops import quant

FRAMES = 128


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main():
    cfg = UnifiedModelConfig()
    params = unified.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = quant.quantize_unified_params(params, donate=True)
    h0 = jnp.ones((1, cfg.backbone.n_embd), jnp.bfloat16)

    def loop(topk):
        @jax.jit
        def run(params, h0):
            def body(i, h):
                key = jax.random.fold_in(jax.random.PRNGKey(0), i)
                samples = unified._local_decoder_generate(
                    params, cfg, h, key, temperature=0.9, topk=topk,
                    forbid_prefix=jnp.int32(0), use_cfg=False, cfg_scale=None)
                nh = jnp.take(params["audio_embeddings"], samples[:, 0], axis=0)
                return nh.astype(h.dtype)

            return jax.lax.fori_loop(0, FRAMES, body, h0)
        return run

    for topk in (200, 1):
        dt = timed(loop(topk), params, h0)
        print(json.dumps({"part": f"localdec_topk{topk}",
                          "ms_per_frame": round(dt / FRAMES * 1e3, 3)}),
              flush=True)

    # isolated sampling chain: top_k(200) + gumbel + argmax on (1, 4096)
    n_iter = 2000

    @jax.jit
    def samp_chain(x):
        def body(i, x):
            key = jax.random.fold_in(jax.random.PRNGKey(1), i)
            kth = jax.lax.top_k(x, 200)[0][..., -1:]
            masked = jnp.where(x < kth, -1e30, x)
            g = jax.random.gumbel(key, x.shape, jnp.float32)
            tok = jnp.argmax(masked + g, axis=-1)
            return x * 0.999 + tok.astype(jnp.float32) * 1e-9

        return jax.lax.fori_loop(0, n_iter, body, x)

    x = jnp.ones((1, 4096), jnp.float32)
    dt = timed(samp_chain, x)
    print(json.dumps({"part": "topk200_sample_chain",
                      "us_per_call": round(dt / n_iter * 1e6, 1)}), flush=True)

    @jax.jit
    def argmax_chain(x):
        def body(i, x):
            tok = jnp.argmax(x, axis=-1)
            return x * 0.999 + tok.astype(jnp.float32) * 1e-9

        return jax.lax.fori_loop(0, n_iter, body, x)

    dt = timed(argmax_chain, x)
    print(json.dumps({"part": "argmax_chain",
                      "us_per_call": round(dt / n_iter * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
