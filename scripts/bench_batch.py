"""Batched serving throughput (generate_audio_batch) at full scale on TPU.

UA2_BENCH_QUANT as in bench.py (default int4all); UA2_BENCH_BATCH rows;
UA2_BENCH_FRAMES frame budget (the KV cache sizes to bucket+frames);
UA2_ATTN_BLOCK bounds attention reads to the filled cache prefix.
Times one fixed-length batched generation with fresh seeds (see CLAUDE.md
timing rules).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax.numpy as jnp
import jax

from uniaudio2_tpu.utils.prng import configure_serving_prng

configure_serving_prng()  # rbg hardware PRNG; UA2_PRNG_IMPL overrides

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine.decode import DecodeEngine
from uniaudio2_tpu.engine import tasks as taskmod
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.ops.quant import quantize_unified_params

FRAMES = int(os.environ.get("UA2_BENCH_FRAMES", "128"))


def main():
    batch = int(os.environ.get("UA2_BENCH_BATCH", "8"))
    cfg = UnifiedModelConfig()
    params = unified.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    qmode = os.environ.get("UA2_BENCH_QUANT", "int4all")
    if qmode != "0":
        int4 = {
            "int4all": ("backbone", "decoder", "understanding_expert",
                        "generation_expert", "audio_head", "projection_w"),
            "int4": ("decoder", "audio_head", "projection_w"),
        }.get(qmode, ())
        params = quantize_unified_params(params, donate=True, int4_modules=int4)
        params = unified.prepare_serving_params(params, cfg=cfg)
    engine = DecodeEngine(params, cfg, max_frames=FRAMES, buckets=(64,))

    items = []
    rng = np.random.default_rng(0)
    for i in range(batch):
        prompt = rng.integers(1, 100, 20 + i)
        text = rng.integers(1, 100, 10 + i)
        items.append(taskmod.prepare_tts(prompt, text, cfg.tokens))

    def run(seed):
        return engine.generate_audio_batch(
            items, temperature=0.9, topk=50, seed=seed
        )

    run(0)
    t0 = time.perf_counter()
    out = run(1)
    dt = time.perf_counter() - t0
    toks = batch * FRAMES * cfg.tokens.num_codebooks / dt
    print(json.dumps({
        "metric": "batched_decode_audio_tokens_per_sec_per_chip",
        "batch": batch, "quant": qmode,
        "value": round(toks, 2), "unit": "tokens/s",
    }))


if __name__ == "__main__":
    main()
