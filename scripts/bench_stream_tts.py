"""Streaming TTS time-to-first-audio (VERDICT r4 weak-item 4).

`engine/stream_tts.py` + `codec/streaming_decoder.py` are
correctness-golden (bit-identical to offline, `test_stream_tts.py`) but the
metric streaming exists for — TTFA — was never measured. This script times
the real pipeline on one chip:

    TTFA        = request start -> first host-visible waveform samples
                  (LLM reason phase + first codec window of semantic
                  frames + first chunk solve + SQ decode)
    decomposed  : t_sem_start (reason phase), t_win_filled (LLM streaming
                  the first window), first solve
    stream RTF  = total wall clock / audio seconds (vs 0.120 offline)

Phases are SCHEDULED (first dur*5Hz frames treated as reason, the rest as
semantic, codes mod 8192): a random-weight model cannot emit the
reason-EOS switch, and the machinery's timing is phase-independent (every
LLM frame costs the same compute; the codec consumes a synthetic stream in
`bench_tts_e2e.py` the same way). One JSON line per
(utterance_s, window_s) config; window 30 = offline-bit-identical default,
window 8 = the low-latency profile (`stream_tts(window_seconds=8)`).

Timing rules per CLAUDE.md: compile warmup first, 3 timed runs with fresh
prompts/seeds, medians reported alongside raw runs.

    python scripts/bench_stream_tts.py                # TPU full scale
    UA2_BENCH_SCALE=tiny PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/bench_stream_tts.py            # smoke

Reference match: latency-first capability beyond the reference's strictly
offline two-stage TTS (`multi_task_inference.py:408-553`), measured like
one (chunk loop: `reason_tokenizer.py:144-203`).
"""

from __future__ import annotations

import dataclasses
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TINY = os.environ.get("UA2_BENCH_SCALE") == "tiny"
if TINY:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

if TINY:
    jax.config.update("jax_platforms", "cpu")

from uniaudio2_tpu.utils.prng import configure_serving_prng

configure_serving_prng()

from uniaudio2_tpu.codec.decoder import (
    CodecConfig, CodecDecoder, init_decode_params,
)
from uniaudio2_tpu.codec.streaming_decoder import StreamingCodecDecoder
from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine import tasks as taskmod
from uniaudio2_tpu.engine.continuous import ContinuousEngine
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.ops.quant import quantize_unified_params

REASON_HZ, SEMANTIC_HZ = 5.0, 12.5


def build():
    if TINY:
        cfg = UnifiedModelConfig.tiny()
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        ccfg = CodecConfig.tiny()
        cparams = init_decode_params(jax.random.PRNGKey(1), ccfg)
        cache_dtype = jnp.float32
    else:
        cfg = UnifiedModelConfig()
        params = unified.init_params(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
        int4 = ("backbone", "decoder", "understanding_expert",
                "generation_expert", "audio_head", "projection_w")
        params = quantize_unified_params(params, donate=True,
                                         int4_modules=int4)
        params = unified.prepare_serving_params(params, cfg=cfg)
        ccfg = CodecConfig()
        cparams = init_decode_params(jax.random.PRNGKey(1), ccfg,
                                     dtype=jnp.bfloat16)
        cache_dtype = jnp.bfloat16
    return cfg, params, ccfg, cparams, cache_dtype


def run_stream(engine, decoder, ccfg, cparams, cfg, *, dur_s, seed):
    """One streamed utterance with scheduled phases; returns timing dict."""
    reason_n = int(dur_s * REASON_HZ)
    sem_n = int(dur_s * SEMANTIC_HZ)
    rng = np.random.default_rng(seed)
    prompt = rng.integers(1, 100, 20)
    text = rng.integers(1, 100, 12)
    grid, mask = taskmod.prepare_tts(prompt, text, cfg.tokens)
    card_mod = ccfg.rec_codebook_size
    sd = StreamingCodecDecoder(cparams, ccfg, num_steps=10, seed=seed,
                               decoder=decoder)
    t0 = time.perf_counter()
    stamps = {}
    fed = 0
    samples = 0
    n_total = reason_n + sem_n
    for i, (phase, frame) in enumerate(
            engine.stream(grid, mask, n_total)):
        if i < reason_n:
            continue          # scheduled reason phase
        if "sem_start_s" not in stamps:
            stamps["sem_start_s"] = time.perf_counter() - t0
        codes = (frame.astype(np.int64) % card_mod)[:, None]
        wav = sd.feed(codes)
        fed += 1
        if fed == ccfg.window_rec_frames and "win_filled_s" not in stamps:
            stamps["win_filled_s"] = time.perf_counter() - t0
        if wav.shape[-1] and "ttfa_s" not in stamps:
            stamps["ttfa_s"] = time.perf_counter() - t0
        samples += wav.shape[-1]
        if fed >= sem_n:
            break
    tail = sd.flush()
    samples += tail.shape[-1]
    if "ttfa_s" not in stamps:    # short clip: first audio at flush
        stamps["ttfa_s"] = time.perf_counter() - t0
        stamps["ttfa_at_flush"] = True
    total = time.perf_counter() - t0
    stamps["total_s"] = total
    stamps["audio_s"] = samples / ccfg.sample_rate
    stamps["rtf"] = total / max(stamps["audio_s"], 1e-9)
    return stamps


def main():
    cfg, params, ccfg, cparams, cache_dtype = build()
    durations = [1.0] if TINY else [10.0, 30.0, 60.0]
    windows = [ccfg.window_seconds] if TINY else [30.0, 8.0]
    max_frames = int(max(durations) * (REASON_HZ + SEMANTIC_HZ)) + 2
    cache_len = -(-(64 + max_frames + 1) // 256) * 256
    engine = ContinuousEngine(
        params, cfg, mode="audio", rows=1, bucket=64,
        seg_frames=4 if TINY else 16, cache_len=cache_len,
        max_frames=max_frames, temperature=0.9, topk=50,
        cache_dtype=cache_dtype)
    for win_s in windows:
        wcfg = dataclasses.replace(ccfg, window_seconds=win_s)
        decoder = CodecDecoder(cparams, wcfg)
        # warmup: compile LLM segment/drain + chunk + SQ programs
        run_stream(engine, decoder, wcfg, cparams, cfg,
                   dur_s=durations[-1], seed=0)
        for dur in durations:
            runs = [run_stream(engine, decoder, wcfg, cparams, cfg,
                               dur_s=dur, seed=1 + r) for r in range(3)]
            def med(k):
                vals = [r[k] for r in runs if k in r]
                return round(statistics.median(vals), 3) if vals else None
            print(json.dumps({
                "metric": "stream_tts_ttfa",
                "utterance_s": dur, "window_s": win_s,
                "ttfa_s": med("ttfa_s"),
                "sem_start_s": med("sem_start_s"),
                "win_filled_s": med("win_filled_s"),
                "total_s": med("total_s"),
                "rtf": med("rtf"),
                "ttfa_at_flush": any(r.get("ttfa_at_flush") for r in runs),
                "runs_ttfa_s": [round(r["ttfa_s"], 3) for r in runs],
            }), flush=True)


if __name__ == "__main__":
    main()
