"""Decompose the audio frame loop additively, with FRESH inputs per timed
call (the axon tunnel dedupes identical calls — CLAUDE.md), on real TPU.

Variants, each a single jitted FRAMES-iteration loop:
  A. hidden            — decode_hidden only
  B. hidden+localdec   — plus the 8-microstep local decoder + sampling
  C. full engine loop  — generate_audio (adds phase/output bookkeeping)

Usage: UA2_BENCH_QUANT=int4all python scripts/profile_frame_parts.py
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
from uniaudio2_tpu.engine.decode import DecodeEngine
from uniaudio2_tpu.engine import tasks as taskmod
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.ops import quant

FRAMES = 128
CACHE_LEN = 256


def timed_fresh(fn, make_args, warm_args):
    out = fn(*warm_args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    args = make_args()
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return time.perf_counter() - t0


def main():
    cfg = UnifiedModelConfig()
    params = unified.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    qmode = os.environ.get("UA2_BENCH_QUANT", "int4all")
    if qmode in ("int4all", "int4allg"):
        int4 = ("backbone", "decoder", "understanding_expert",
                "generation_expert", "audio_head", "projection_w")
    elif qmode == "int4":
        int4 = ("decoder", "audio_head", "projection_w")
    else:
        int4 = ()
    params = quant.quantize_unified_params(
        params, donate=True, int4_modules=int4,
        grouped=qmode.endswith("g"))
    params = unified.prepare_serving_params(params, cfg=cfg)

    caches0 = unified.init_caches(cfg, 1, dtype=jnp.bfloat16, seq_len=CACHE_LEN)

    @jax.jit
    def loop_hidden(params, caches, seed):
        tok0 = (seed % 97).astype(jnp.int32) * jnp.ones((1, 1, 9), jnp.int32)
        m = jnp.ones((1, 1, 9), bool)

        def body(i, c):
            tok, caches = c
            h, caches = unified.decode_hidden(
                params, cfg, tok, m, caches, jnp.int32(64) + i)
            tok = (h[:, :9] > 0).astype(jnp.int32)[:, None, :]
            return tok, caches

        tok, caches = jax.lax.fori_loop(0, FRAMES, body, (tok0, caches))
        return tok

    @jax.jit
    def loop_hidden_local(params, caches, seed):
        tok0 = (seed % 97).astype(jnp.int32) * jnp.ones((1, 1, 9), jnp.int32)
        m = jnp.ones((1, 1, 9), bool)
        key0 = jax.random.PRNGKey(0)

        def body(i, c):
            tok, caches = c
            h, caches = unified.decode_hidden(
                params, cfg, tok, m, caches, jnp.int32(64) + i)
            key = jax.random.fold_in(key0, i + seed)
            samples = unified._local_decoder_generate(
                params, cfg, h, key, temperature=0.9, topk=200,
                forbid_prefix=jnp.int32(0), use_cfg=False, cfg_scale=None)
            tok = jnp.concatenate(
                [samples % 97, jnp.zeros((1, 1), jnp.int32)], axis=1
            )[:, None, :]
            return tok, caches

        tok, caches = jax.lax.fori_loop(0, FRAMES, body, (tok0, caches))
        return tok

    for name, fn in (("hidden", loop_hidden), ("hidden+local", loop_hidden_local)):
        dt = timed_fresh(
            fn,
            lambda: (params, caches0, jnp.int32(1)),
            (params, caches0, jnp.int32(7)),
        )
        print(json.dumps({"part": name, "ms_per_frame": round(dt / FRAMES * 1e3, 3)}))

    engine = DecodeEngine(params, cfg, max_frames=FRAMES, buckets=(64,))
    prompt = np.arange(1, 24, dtype=np.int64) % 100
    text = np.arange(5, 17, dtype=np.int64) % 100
    grid, mask = taskmod.prepare_tts(prompt, text, cfg.tokens)
    engine.generate_audio(grid, mask, temperature=0.9, topk=200, seed=3)
    t0 = time.perf_counter()
    engine.generate_audio(grid, mask, temperature=0.9, topk=200, seed=11)
    dt = time.perf_counter() - t0
    print(json.dumps({"part": "full", "ms_per_frame": round(dt / FRAMES * 1e3, 3)}))


if __name__ == "__main__":
    main()
