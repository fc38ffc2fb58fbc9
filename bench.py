"""Benchmark: steady-state autoregressive decode throughput of the unified
audio LM (the hot loop of every task — reference `generate_frame`,
`llm_models/model_new.py:568-645`, driven from eager Python at
`evaluation/asr_task.py:667-682`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: audio tokens/sec/chip at batch 1 (each frame = 8 audio codebook
tokens + 1 text token; we count the 8 audio tokens, matching BASELINE.md
"audio-tokens/sec/chip (decode)").

Baseline: the reference publishes no numbers (BASELINE.md). The denominator
used for ``vs_baseline`` is an 80 tokens/s (=10 frames/s) estimate of the
eager PyTorch reference on an A100-class chip: each frame runs a 28-layer
3B-parameter incremental step plus 8 *sequential* 4-layer local-decoder
steps and a host-synchronised sampling round-trip per token
(9 kernel-launch-bound module calls/frame). The target from BASELINE.json is
>2x, i.e. vs_baseline > 2.0.

Scale: full Model_stage3 shapes (28L/3072 backbone, 3+2L experts, 4L/2048
local decoder, bf16) by default; UA2_BENCH_SCALE=tiny for a quick CPU check.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.models import unified

BASELINE_AUDIO_TOKENS_PER_S = 80.0

WARMUP_FRAMES = 16
MEASURE_FRAMES = 96


def main():
    scale = os.environ.get("UA2_BENCH_SCALE", "full")
    if scale == "tiny":
        cfg = UnifiedModelConfig.tiny()
    else:
        cfg = UnifiedModelConfig()

    key = jax.random.PRNGKey(0)
    params = unified.init_params(key, cfg, dtype=jnp.bfloat16)
    caches = unified.init_caches(cfg, 1, dtype=jnp.bfloat16)
    par = cfg.tokens.parallel_number

    @jax.jit
    def frame_step(params, tokens, mask, caches, pos, step_key):
        frame, caches = unified.decode_frame(
            params, cfg, tokens, mask, caches, pos, step_key,
            temperature=0.9, topk=50, forbid_prefix=jnp.int32(0),
        )
        # feed the frame back (audio-active mask), as the two-phase loop does
        fb = jnp.concatenate([frame[:, 1:], frame[:, :1]], axis=1)[:, None, :]
        return fb, caches

    tokens = jnp.zeros((1, 1, par), jnp.int32)
    mask = jnp.concatenate(
        [jnp.ones((1, 1, par - 1), bool), jnp.zeros((1, 1, 1), bool)], axis=-1
    )
    step_key = jax.random.PRNGKey(1)

    pos = 0
    for _ in range(WARMUP_FRAMES):
        tokens, caches = frame_step(params, tokens, mask, caches, jnp.int32(pos), step_key)
        pos += 1
    jax.block_until_ready(tokens)

    t0 = time.perf_counter()
    for _ in range(MEASURE_FRAMES):
        tokens, caches = frame_step(params, tokens, mask, caches, jnp.int32(pos), step_key)
        pos += 1
    jax.block_until_ready(tokens)
    dt = time.perf_counter() - t0

    frames_per_s = MEASURE_FRAMES / dt
    audio_tokens_per_s = frames_per_s * cfg.tokens.num_codebooks
    print(json.dumps({
        "metric": "decode_audio_tokens_per_sec_per_chip",
        "value": round(audio_tokens_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(audio_tokens_per_s / BASELINE_AUDIO_TOKENS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
