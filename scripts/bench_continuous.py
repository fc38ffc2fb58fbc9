"""Continuous vs static batching throughput under varied request lengths.

Serving reality: requests finish at different times. Static batching runs
every batch until its LONGEST row finishes; continuous batching refills
finished slots between segments. With random weights EOS never fires, so
request lengths are simulated by per-request frame caps (uniform spread).

Method: N text-mode requests, lengths uniformly spread in
[min_len, max_len]; both arms pre-warmed (compile excluded); static arm
groups into batches of ROWS and runs each group to its own longest
request (one compiled program per distinct group max — the best case for
static batching); wall-clock compared.

Usage: UA2_BENCH_QUANT=int4all python scripts/bench_continuous.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from uniaudio2_tpu.utils.prng import configure_serving_prng

configure_serving_prng()  # rbg hardware PRNG; UA2_PRNG_IMPL overrides

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine import tasks as taskmod
from uniaudio2_tpu.engine.continuous import ContinuousEngine
from uniaudio2_tpu.engine.decode import DecodeEngine
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.ops import quant

ROWS = 8
N_REQ = int(os.environ.get("UA2_NREQ", "16"))
MIN_LEN, MAX_LEN = 24, 160
BUCKET = 64


def main():
    scale = os.environ.get("UA2_BENCH_SCALE", "full")
    cfg = (UnifiedModelConfig.tiny() if scale == "tiny"
           else UnifiedModelConfig())
    params = unified.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.float32 if scale == "tiny"
                                 else jnp.bfloat16)
    qmode = os.environ.get("UA2_BENCH_QUANT", "int4all")
    if scale != "tiny" and qmode != "0":
        int4 = ("backbone", "decoder", "understanding_expert",
                "generation_expert", "audio_head", "projection_w")
        params = quant.quantize_unified_params(params, donate=True,
                                               int4_modules=int4)
        params = unified.prepare_serving_params(params, cfg=cfg)

    ts = cfg.tokens
    rng = np.random.default_rng(0)
    lengths = np.linspace(MIN_LEN, MAX_LEN, N_REQ).astype(int)
    rng.shuffle(lengths)
    reqs = []
    for i in range(N_REQ):
        prompt = rng.integers(1, 80, size=12)
        text = rng.integers(1, 80, size=16)
        reqs.append(taskmod.prepare_tts(prompt, text, ts))

    # ---- continuous arm ----
    seg = int(os.environ.get("UA2_SEG_FRAMES", "16"))
    ce = ContinuousEngine(
        params, cfg, mode="text", rows=ROWS, bucket=BUCKET,
        seg_frames=seg, cache_len=512, max_frames=int(MAX_LEN),
        topk=50, temperature=0.9,
        cache_dtype=jnp.float32 if scale == "tiny" else jnp.bfloat16,
    )
    # warm both programs (segment + refill)
    wid = ce.submit(reqs[0][0], reqs[0][1], max_frames=int(lengths[0]))
    ce.run_until_drained()
    t0 = time.perf_counter()
    for (g, m), L in zip(reqs, lengths):
        ce.submit(g, m, max_frames=int(L))
    res = ce.run_until_drained()
    dt_cont = time.perf_counter() - t0
    assert len(res) == N_REQ

    # ---- static arm: length-GROUPED batches of ROWS (best practice for
    # static batching), each run to its own longest ----
    total_frames = 0
    by_len = sorted(range(N_REQ), key=lambda j: lengths[j])
    groups = [by_len[i : i + ROWS] for i in range(0, N_REQ, ROWS)]
    engines = {}
    for grp in groups:
        mf = int(max(lengths[j] for j in grp))
        if mf not in engines:
            engines[mf] = DecodeEngine(
                params, cfg, max_frames=mf, buckets=(BUCKET,),
                cache_dtype=jnp.float32 if scale == "tiny" else jnp.bfloat16)
            # warmup/compile
            engines[mf].generate_text_batch(
                [reqs[j] for j in grp], temperature=0.9, topk=50)
    t0 = time.perf_counter()
    for grp in groups:
        mf = int(max(lengths[j] for j in grp))
        engines[mf].generate_text_batch(
            [reqs[j] for j in grp], temperature=0.9, topk=50)
        total_frames += mf * len(grp)
    dt_stat = time.perf_counter() - t0

    # ---- offline in-graph arm: scheduling fully inside one dispatch ----
    offline_reqs = [(g, m, int(L)) for (g, m), L in zip(reqs, lengths)]
    ce.run_offline(offline_reqs)  # compile + warmup
    t0 = time.perf_counter()
    res_off = ce.run_offline(offline_reqs)
    dt_off = time.perf_counter() - t0
    assert len(res_off) == N_REQ

    useful = int(np.sum(lengths))
    print(json.dumps({
        "metric": "continuous_vs_static_batching",
        "seg_frames": seg,
        "requests": N_REQ, "rows": ROWS,
        "useful_frames": useful,
        "continuous_s": round(dt_cont, 3),
        "offline_s": round(dt_off, 3),
        "static_s": round(dt_stat, 3),
        "continuous_frames_per_s": round(useful / dt_cont, 1),
        "offline_frames_per_s": round(useful / dt_off, 1),
        "static_frames_per_s": round(useful / dt_stat, 1),
        "speedup_online": round(dt_stat / dt_cont, 3),
        "speedup_offline": round(dt_stat / dt_off, 3),
    }))


if __name__ == "__main__":
    main()
