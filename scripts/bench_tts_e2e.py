"""TTS end-to-end RTF on one chip (BASELINE north star: RTF < 0.3).

Ten seconds of generated audio costs, at the shipped rates
(`reason_tokenizer.py:27-33`): 5 Hz x 10 = 50 reason frames + 12.5 Hz x 10
= 125 semantic frames = 175 LLM decode frames (each frame costs the same
compute regardless of phase), then one codec decode of the 125-frame
semantic stream to 24 kHz wav. This script times both stages at full scale
with fresh inputs and prints RTF = (t_stage1 + t_stage2) / 10s.

UA2_BENCH_QUANT as in bench.py (default int4all).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine.decode import DecodeEngine
from uniaudio2_tpu.engine import tasks as taskmod
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.ops.quant import quantize_unified_params

AUDIO_SECONDS = 10.0
REASON_HZ, SEMANTIC_HZ = 5.0, 12.5


def main():
    frames = int(AUDIO_SECONDS * (REASON_HZ + SEMANTIC_HZ))  # 175
    sem_frames = int(AUDIO_SECONDS * SEMANTIC_HZ)            # 125

    # ---- stage 1: LLM two-phase decode ----
    cfg = UnifiedModelConfig()
    params = unified.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    qmode = os.environ.get("UA2_BENCH_QUANT", "int4all")
    if qmode != "0":
        all_mods = ("backbone", "decoder", "understanding_expert",
                    "generation_expert", "audio_head", "projection_w")
        int4 = {
            "int4all": all_mods,
            "int4allg": all_mods,
            "int4": ("decoder", "audio_head", "projection_w"),
        }.get(qmode, ())
        params = quantize_unified_params(params, donate=True,
                                         int4_modules=int4,
                                         grouped=qmode.endswith("g"))
        params = unified.prepare_serving_params(params, cfg=cfg)
    engine = DecodeEngine(params, cfg, max_frames=frames, buckets=(64,))
    prompt = np.arange(1, 24, dtype=np.int64) % 100
    text = np.arange(5, 17, dtype=np.int64) % 100
    grid, mask = taskmod.prepare_tts(prompt, text, cfg.tokens)
    engine.generate_audio(grid, mask, temperature=0.9, topk=50, seed=0)
    t0 = time.perf_counter()
    engine.generate_audio(grid, mask, temperature=0.9, topk=50, seed=1)
    t1 = time.perf_counter() - t0

    # ---- stage 2: codec decode of the semantic stream ----
    from uniaudio2_tpu.codec.decoder import (
        CodecConfig, CodecDecoder, init_decode_params,
    )

    ccfg = CodecConfig()
    cparams = init_decode_params(jax.random.PRNGKey(1), ccfg, dtype=jnp.bfloat16)
    dec = CodecDecoder(cparams, ccfg)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 8192, (8, sem_frames))
    np.asarray(dec.decode(codes, num_steps=10))  # compile + warmup
    codes2 = rng.integers(0, 8192, (8, sem_frames))
    t0 = time.perf_counter()
    np.asarray(dec.decode(codes2, num_steps=10))
    t2 = time.perf_counter() - t0

    rtf = (t1 + t2) / AUDIO_SECONDS
    print(json.dumps({
        "metric": "tts_e2e_rtf", "quant": qmode,
        "stage1_s": round(t1, 3), "stage2_s": round(t2, 3),
        "audio_s": AUDIO_SECONDS, "value": round(rtf, 4), "unit": "RTF",
    }))


if __name__ == "__main__":
    main()
