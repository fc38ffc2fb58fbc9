"""Decompose the per-frame decode cost on real TPU hardware.

Times (single large runs — TPU timing noise ±5%, see CLAUDE.md):
  1. full      — the bench's compiled audio-mode frame loop (ms/frame)
  2. hidden    — backbone+experts only (decode_hidden loop)
  3. localdec  — the 8-microstep local RQ-decoder only
  4. streams   — raw Pallas int8 matmul chain per weight shape (GB/s)

Usage: python scripts/profile_decode.py  (runs on the axon TPU)
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
from uniaudio2_tpu.engine.decode import DecodeEngine
from uniaudio2_tpu.engine import tasks as taskmod
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
    import os
    cfg = UnifiedModelConfig()
    params = unified.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    qmode = os.environ.get("UA2_BENCH_QUANT", "1")
    if qmode == "int4all":
        int4 = ("backbone", "decoder", "understanding_expert",
                "generation_expert", "audio_head", "projection_w")
    elif qmode == "int4":
        int4 = ("decoder", "audio_head", "projection_w")
    else:
        int4 = ()
    params = quant.quantize_unified_params(params, donate=True,
                                           int4_modules=int4)
    if qmode != "0":
        params = unified.prepare_serving_params(params, cfg=cfg)

    # ---- 1. full frame loop (bench path) ----
    engine = DecodeEngine(params, cfg, max_frames=FRAMES, buckets=(64,))
    prompt = np.arange(1, 24, dtype=np.int64) % 100
    text = np.arange(5, 17, dtype=np.int64) % 100
    grid, mask = taskmod.prepare_tts(prompt, text, cfg.tokens)
    dt = timed(lambda: engine.generate_audio(grid, mask, temperature=0.9,
                                             topk=200, seed=1))
    full_ms = dt / FRAMES * 1e3
    print(json.dumps({"part": "full", "ms_per_frame": round(full_ms, 3)}))

    # ---- 2. hidden-only loop (backbone + experts, no heads) ----
    cache_len = 256
    caches = unified.init_caches(cfg, 1, dtype=jnp.bfloat16, seq_len=cache_len)

    @jax.jit
    def hidden_loop(params, caches):
        tok0 = jnp.zeros((1, 1, 9), jnp.int32)
        m = jnp.ones((1, 1, 9), bool)

        def body(i, c):
            tok, caches = c
            h, caches = unified.decode_hidden(
                params, cfg, tok, m, caches, jnp.int32(64) + i)
            tok = (h[:, :9] > 0).astype(jnp.int32)[:, None, :]
            return tok, caches

        return jax.lax.fori_loop(0, FRAMES, body, (tok0, caches))

    dt = timed(hidden_loop, params, caches)
    hidden_ms = dt / FRAMES * 1e3
    print(json.dumps({"part": "hidden", "ms_per_frame": round(hidden_ms, 3)}))

    # ---- 3. local-decoder-only loop ----
    @jax.jit
    def localdec_loop(params, h0):
        def body(i, h):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            samples = unified._local_decoder_generate(
                params, cfg, h, key, temperature=0.9, topk=200,
                forbid_prefix=jnp.int32(0), use_cfg=False, cfg_scale=None)
            nh = jnp.take(params["audio_embeddings"], samples[:, 0], axis=0)
            return nh.astype(h.dtype)

        return jax.lax.fori_loop(0, FRAMES, body, h0)

    h0 = jnp.ones((1, cfg.backbone.n_embd), jnp.bfloat16)
    dt = timed(localdec_loop, params, h0)
    local_ms = dt / FRAMES * 1e3
    print(json.dumps({"part": "localdec", "ms_per_frame": round(local_ms, 3)}))

    # ---- 4. raw int8 matmul stream per shape ----
    shapes = [
        ("bb_qkv", 3072, 5120), ("bb_attnproj", 3072, 3072),
        ("bb_fc", 3072, 8192), ("bb_down", 8192, 3072),
        ("dec_qkv", 2048, 3072), ("dec_fc", 2048, 8192),
        ("dec_down", 8192, 2048), ("audio_head", 2048, 4096),
    ]
    n_iter = 400
    for name, k, n in shapes:
        w = quant.quantize(
            jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
            .astype(jnp.bfloat16))

        @jax.jit
        def chain(x, w=w, k=k):
            def body(i, x):
                y = quant.matmul(x, w)
                # chain dependency back to (1, k)
                if y.shape[-1] >= k:
                    return y[:, :k] * 1e-3
                reps = -(-k // y.shape[-1])
                return jnp.tile(y, (1, reps))[:, :k] * 1e-3

            return jax.lax.fori_loop(0, n_iter, body, x)

        x = jnp.ones((1, k), jnp.bfloat16)
        dt = timed(chain, x)
        gbps = (k * w.values.shape[-1]) * n_iter / dt / 1e9
        print(json.dumps({"part": f"stream_{name}", "shape": [k, n],
                          "GBps": round(gbps, 1)}))

    # sum-of-parts estimate
    print(json.dumps({
        "part": "summary",
        "full_ms": round(full_ms, 3),
        "hidden_ms": round(hidden_ms, 3),
        "localdec_ms": round(local_ms, 3),
        "hidden_plus_local": round(hidden_ms + local_ms, 3),
    }))


if __name__ == "__main__":
    main()
