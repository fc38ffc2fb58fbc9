"""A/B benchmark + fidelity report for the int8 KV cache (UA2_KV_QUANT).

VERDICT r4 item 1: quantize K/V at write (per-slot absmax scales), read
natively in int8 (ops/attention.py::_attend_prefix_quant), compose with
attn_block and the per-layer list caches — measured on the REAL generation
loop (the S-major lesson: standalone scouts don't count):

  --mode perf (default):
      for batch in {1, 8, 16} x max_frames in {128, 500}:
          time generate_audio[_batch] with kv_quant in {off, on}
      (attn_block stays at its shipped AUTO default so the A/B measures
      the int8 cache against the best bf16 configuration, not a strawman.)

  --mode fidelity:
      full-scale random-weight model, batch-1 greedy (topk=1): token
      overlap int8-cache vs bf16-cache over N prompts (flat random-weight
      logits are the adversarial case), plus decode_attention output SNR
      at the full-scale head geometry — the docs/quant_quality_r3.md
      style of evidence.

One JSON line per config as it completes (partial results survive a tunnel
outage). Timing rules per CLAUDE.md: fresh seeds per run, median of 3 timed
runs after a warmup, np.asarray() the outputs.

Reference capability match: the KVCache of `lit_model.py:814-860`, extended
with the standard TPU-serving int8 cache compression the reference lacks.

Usage:  python scripts/bench_kv_quant.py [--mode perf|fidelity]
  UA2_AB_CONFIGS="1:128,16:500" limits the (batch, frames) matrix.
  UA2_AB_TINY=1 runs the tiny config (CPU smoke).
"""

from __future__ import annotations

import argparse
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


def build_params(cfg, tiny=False):
    dtype = jnp.float32 if tiny else jnp.bfloat16
    params = unified.init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    if tiny:
        return params
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


def run_config(params, cfg, batch, frames, kv_quant, cache_dtype,
               n_timed=3):
    engine = DecodeEngine(params, cfg, max_frames=frames, buckets=(64,),
                          kv_quant=kv_quant, cache_dtype=cache_dtype)
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
        "batch": batch, "frames": frames, "kv_quant": kv_quant,
        "tokens_per_s": round(toks, 1),
        "ms_per_frame": round(1e3 * dt / frames, 3),
        "runs_s": [round(t, 3) for t in times],
        "compile_s": round(compile_s, 1),
    }), flush=True)
    del engine
    return toks


def perf(cfg, tiny):
    params = build_params(cfg, tiny)
    cache_dtype = jnp.float32 if tiny else jnp.bfloat16
    spec = os.environ.get(
        "UA2_AB_CONFIGS",
        "1:16,2:16" if tiny else "1:128,1:500,8:128,8:500,16:128,16:500")
    configs = [tuple(int(x) for x in c.split(":")) for c in spec.split(",")]
    for batch, frames in configs:
        for kv in ("off", "on"):
            run_config(params, cfg, batch, frames, kv, cache_dtype)


def fidelity(cfg, tiny, n_prompts=8):
    """Greedy token overlap int8 vs bf16 cache + attention-output SNR."""
    params = build_params(cfg, tiny)
    cache_dtype = jnp.float32 if tiny else jnp.bfloat16
    frames = 16 if tiny else 128
    eng_bf = DecodeEngine(params, cfg, max_frames=frames, buckets=(64,),
                          kv_quant="off", cache_dtype=cache_dtype)
    eng_q = DecodeEngine(params, cfg, max_frames=frames, buckets=(64,),
                         kv_quant="on", cache_dtype=cache_dtype)
    rng = np.random.default_rng(7)
    total = agree_prefix = total_len = exact = 0
    for i in range(n_prompts):
        prompt = rng.integers(1, 100, 15 + i)
        text = rng.integers(1, 100, 8 + i)
        g, m = taskmod.prepare_tts(prompt, text, cfg.tokens)
        r_bf, _ = eng_bf.generate_audio(g, m, topk=1)
        r_q, _ = eng_q.generate_audio(g, m, topk=1)
        a, b = np.asarray(r_bf), np.asarray(r_q)
        n = min(a.shape[1], b.shape[1])
        pref = 0
        for t in range(n):
            if not np.array_equal(a[:, t], b[:, t]):
                break
            pref += 1
        total += 1
        exact += int(pref == n and a.shape[1] == b.shape[1])
        agree_prefix += pref
        total_len += n
        print(json.dumps({"prompt": i, "len_bf16": int(a.shape[1]),
                          "len_int8": int(b.shape[1]),
                          "agree_prefix_frames": pref}), flush=True)
    # Attention-output SNR at the serving head geometry, filled cache.
    bb = cfg.backbone
    b_, g_, hd = 4, bb.n_query_groups, bb.head_size
    h = bb.n_head
    s = 512
    from uniaudio2_tpu.ops.attention import decode_attention
    from uniaudio2_tpu.ops.kv_cache import quantize_slots
    kk, kv_, kq = jax.random.split(jax.random.PRNGKey(0), 3)
    k = jax.random.normal(kk, (b_, g_, s, hd), jnp.float32)
    v = jax.random.normal(kv_, (b_, g_, s, hd), jnp.float32)
    q = jax.random.normal(kq, (b_, h, 1, hd), jnp.float32)
    pos = jnp.asarray([s - 2], jnp.int32)
    ref = np.asarray(decode_attention(q, k, v, pos), np.float32)
    out = np.asarray(
        decode_attention(q, quantize_slots(k), quantize_slots(v), pos),
        np.float32)
    snr = 10 * np.log10(np.sum(ref ** 2) / (np.sum((out - ref) ** 2) + 1e-30))
    print(json.dumps({
        "mode": "fidelity", "prompts": total, "exact_matches": exact,
        "greedy_prefix_agreement": round(agree_prefix / max(total_len, 1), 4),
        "attn_out_snr_db": round(float(snr), 2),
        "geometry": {"b": b_, "groups": g_, "heads": h, "hd": hd, "s": s},
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="perf", choices=["perf", "fidelity"])
    args = ap.parse_args()
    tiny = os.environ.get("UA2_AB_TINY", "0") == "1"
    cfg = UnifiedModelConfig.tiny() if tiny else UnifiedModelConfig()
    if args.mode == "perf":
        perf(cfg, tiny)
    else:
        fidelity(cfg, tiny)


if __name__ == "__main__":
    main()
