"""Apportion the per-frame local-decoder cost (fresh inputs, TPU).

Variants of a FRAMES-iteration chained loop:
  localdec           — as in production (topk-200 sampling per microstep)
  localdec-greedy    — argmax instead of top-k masking (isolates lax.top_k)
  sampling-only      — 8 chained sample_topk on (1, 12300) logits
  decoder-micro      — 8 chained 4-layer decoder steps, no head/sampling

Usage: UA2_BENCH_QUANT=int4all python scripts/profile_localdec_parts.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.models import gpt
from uniaudio2_tpu.models.unified import init_cache
from uniaudio2_tpu.ops import quant, sampling

FRAMES = 128


def timed_fresh(fn, args_a, args_b):
    out = fn(*args_a)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args_b)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return time.perf_counter() - t0


def main():
    cfg = UnifiedModelConfig()
    params = unified.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    qmode = os.environ.get("UA2_BENCH_QUANT", "int4all")
    int4 = ("backbone", "decoder", "understanding_expert",
            "generation_expert", "audio_head", "projection_w")
    params = quant.quantize_unified_params(
        params, donate=True, int4_modules=int4, grouped=qmode.endswith("g"))
    params = unified.prepare_serving_params(params, cfg=cfg)

    def make_loop(topk):
        @jax.jit
        def loop(params, h0, seed):
            def body(i, h):
                key = jax.random.fold_in(jax.random.PRNGKey(0), i + seed)
                samples = unified._local_decoder_generate(
                    params, cfg, h, key, temperature=0.9, topk=topk,
                    forbid_prefix=jnp.int32(0), use_cfg=False, cfg_scale=None)
                return (h + jnp.sum(samples).astype(h.dtype) * 1e-9
                        ).astype(h.dtype)

            return jax.lax.fori_loop(0, FRAMES, body, h0)
        return loop

    dembd = (params["audio_embeddings_proj"].shape[-1]
             if "audio_embeddings_proj" in params
             else cfg.decoder.n_embd)
    h0 = jnp.ones((1, cfg.backbone.n_embd), jnp.bfloat16)
    for name, topk in (("localdec", 200), ("localdec-greedy", 1)):
        loop = make_loop(topk)
        dt = timed_fresh(loop, (params, h0, jnp.int32(3)),
                         (params, h0, jnp.int32(9)))
        print(json.dumps({"part": name,
                          "ms_per_frame": round(dt / FRAMES * 1e3, 3)}))

    # sampling only: 8 chained sample_topk per frame
    vocab = cfg.tokens.audio_vocab
    @jax.jit
    def samp_loop(logits0, seed):
        def body(i, lg):
            key = jax.random.fold_in(jax.random.PRNGKey(1), i + seed)
            s = lg
            for j in range(8):
                tok = sampling.sample_topk(
                    jax.random.fold_in(key, j), s, 200, 0.9,
                    forbid_prefix=jnp.int32(0))
                s = s + tok.astype(jnp.float32)[..., None] * 1e-9
            return s

        return jax.lax.fori_loop(0, FRAMES, body, logits0)

    lg0 = jax.random.normal(jax.random.PRNGKey(2), (1, vocab), jnp.float32)
    dt = timed_fresh(samp_loop, (lg0, jnp.int32(3)), (lg0 + 1.0, jnp.int32(9)))
    print(json.dumps({"part": "sampling-only",
                      "ms_per_frame": round(dt / FRAMES * 1e3, 3)}))

    # decoder microsteps only (no head, no sampling): 8 chained decode_steps
    dcfg = cfg.decoder
    @jax.jit
    def micro_loop(params, h0, seed):
        def body(i, h):
            cache = init_cache(dcfg, 1, 8, dtype=h.dtype)
            hh = h[:, None, :] * (1.0 + seed.astype(h.dtype) * 1e-9)
            for j in range(8):
                hh, cache = gpt.decode_step(params["decoder"], dcfg, hh,
                                            cache, jnp.int32(j))
            return hh[:, 0, :]

        return jax.lax.fori_loop(0, FRAMES, body, h0)

    hd0 = jnp.ones((1, dembd), jnp.bfloat16)
    dt = timed_fresh(micro_loop, (params, hd0, jnp.int32(3)),
                     (params, hd0, jnp.int32(9)))
    print(json.dumps({"part": "decoder-micro",
                      "ms_per_frame": round(dt / FRAMES * 1e3, 3)}))


if __name__ == "__main__":
    main()
