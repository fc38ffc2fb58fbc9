"""A/B benchmark for prefix-bounded attention reads (UA2_ATTN_BLOCK).

VERDICT r3 item 2: the `attn_block` lever (ops/attention.py prefix_levels,
wired through engine/decode.py) landed at the end of round 3 with a
token-identity test but no TPU measurement. This script measures it on the
REAL generation loop (the S-major lesson: standalone scouts don't count):

    for batch in {1, 8, 16} x max_frames in {128, 500}:
        time generate_audio[_batch] with attn_block in {0, 64[, 128]}

One JSON line per config as it completes (partial results survive a tunnel
outage). Timing rules per CLAUDE.md: fresh seeds per run, median of 3 timed
runs after a warmup, np.asarray() the outputs.

Reference match: the KV-slice optimization intent of `input_pos_maxp1`
(`lit_model.py:141-145,468-471`) — attention cost proportional to filled
length instead of the cache budget.

Usage:  python scripts/bench_attn_block.py [--quick]
  UA2_AB_CONFIGS="1:128,16:500" limits the (batch, frames) matrix.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from uniaudio2_tpu.utils.prng import configure_serving_prng

configure_serving_prng()

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine.decode import DecodeEngine
from uniaudio2_tpu.engine import tasks as taskmod
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.ops.quant import quantize_unified_params


def build_params(cfg):
    params = unified.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    int4 = ("backbone", "decoder", "understanding_expert",
            "generation_expert", "audio_head", "projection_w")
    params = quantize_unified_params(params, donate=True, int4_modules=int4)
    return unified.prepare_serving_params(params, cfg=cfg)


def make_items(cfg, batch):
    rng = np.random.default_rng(0)
    items = []
    for i in range(batch):
        prompt = rng.integers(1, 100, 20 + i)
        text = rng.integers(1, 100, 10 + i)
        items.append(taskmod.prepare_tts(prompt, text, cfg.tokens))
    return items


def run_config(params, cfg, batch, frames, block, n_timed=3):
    engine = DecodeEngine(params, cfg, max_frames=frames, buckets=(64,),
                          attn_block=block)
    items = make_items(cfg, batch)
    if batch == 1:
        g, m = items[0]

        def run(seed):
            out = engine.generate_audio(g, m, temperature=0.9, topk=50,
                                        seed=seed)
            return np.asarray(out[0])
    else:
        def run(seed):
            out = engine.generate_audio_batch(items, temperature=0.9,
                                              topk=50, seed=seed)
            return np.asarray(out[0][0])

    t0 = time.perf_counter()
    run(0)  # compile + warmup
    compile_s = time.perf_counter() - t0
    times = []
    for seed in range(1, 1 + n_timed):
        t0 = time.perf_counter()
        run(seed)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    toks = batch * frames * cfg.tokens.num_codebooks / dt
    print(json.dumps({
        "batch": batch, "frames": frames, "attn_block": block,
        "tokens_per_s": round(toks, 1),
        "ms_per_frame": round(1e3 * dt / frames, 3),
        "runs_s": [round(t, 3) for t in times],
        "compile_s": round(compile_s, 1),
    }), flush=True)
    del engine
    return toks


def main():
    tiny = os.environ.get("UA2_AB_TINY", "0") == "1"
    cfg = UnifiedModelConfig.tiny() if tiny else UnifiedModelConfig()
    params = build_params(cfg)
    spec = os.environ.get(
        "UA2_AB_CONFIGS",
        "1:16,2:16" if tiny else "1:128,1:500,8:128,8:500,16:128,16:500")
    configs = [tuple(int(x) for x in c.split(":")) for c in spec.split(",")]
    for batch, frames in configs:
        blocks = [0, 64] if frames <= 128 else [0, 64, 128]
        for block in blocks:
            run_config(params, cfg, batch, frames, block)


if __name__ == "__main__":
    main()
