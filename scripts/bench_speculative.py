"""Speculative-decoding cost model benchmark (VERDICT r3 item 4).

Acceptance RATES are unmeasurable on random weights (argmax chains are
chaos — docs/quant_quality_r3.md), so this measures what IS measurable
now: the per-round machinery cost at full scale, and reports projected
speedup as a function of the acceptance probability α once real
checkpoints provide it.

Method: run `SpeculativeEngine` twice per k —
  draft == target   -> every frame accepted  (emits k+1 frames/round)
  draft = unrelated -> ~nothing accepted     (emits 1 frame/round)
Both runs execute the IDENTICAL per-round program (k draft steps + 1
draft ingest + one T=k+1 target verify + 1 fresh local decode), so
round time = generation time / rounds, cross-checked between the two
acceptance extremes. Plain greedy decode with the target params is the
baseline frame time.

Projection: with per-frame acceptance probability α (iid),
E[frames/round] = 1 + sum_{i=1..k} α^i, so
    speedup(α, k) = (1 + Σ α^i) · t_frame_plain / t_round(k).

    python scripts/bench_speculative.py              # TPU full scale
    UA2_BENCH_SCALE=tiny PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/bench_speculative.py --ks 2   # CPU smoke

Reference match: the `generate_frame` hot loop (`model_new.py:568-645`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ks", type=int, nargs="+", default=[2, 4, 8])
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--alphas", type=float, nargs="+",
                   default=[0.5, 0.7, 0.8, 0.9, 0.95])
    args = p.parse_args(argv)

    tiny = os.environ.get("UA2_BENCH_SCALE") == "tiny"
    if tiny:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax
    import jax.numpy as jnp

    if tiny:
        jax.config.update("jax_platforms", "cpu")

    from uniaudio2_tpu.utils.prng import configure_serving_prng

    configure_serving_prng()

    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.engine import tasks as taskmod
    from uniaudio2_tpu.engine.decode import DecodeEngine
    from uniaudio2_tpu.engine.speculative import SpeculativeEngine
    from uniaudio2_tpu.models import unified

    if tiny:
        cfg = UnifiedModelConfig.tiny()
        frames = 12
        cache_dtype = jnp.float32
        target = unified.init_params(jax.random.PRNGKey(0), cfg)
        draft = target
        other = unified.init_params(jax.random.PRNGKey(7), cfg)
        buckets = (32,)
    else:
        cfg = UnifiedModelConfig()
        frames = args.frames
        cache_dtype = jnp.bfloat16
        buckets = (64,)
        from uniaudio2_tpu.ops.quant import quantize_unified_params

        int4 = ("backbone", "decoder", "understanding_expert",
                "generation_expert", "audio_head", "projection_w")
        # int4all draft + int8 target: the natural serving configuration
        base = unified.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.bfloat16)
        draft = quantize_unified_params(
            jax.tree.map(lambda a: a, base), int4_modules=int4)
        draft = unified.prepare_serving_params(draft, cfg=cfg)
        target = quantize_unified_params(base, donate=True)
        target = unified.prepare_serving_params(target, cfg=cfg)
        ob = unified.init_params(jax.random.PRNGKey(7), cfg,
                                 dtype=jnp.bfloat16)
        other = quantize_unified_params(ob, donate=True, int4_modules=int4)
        other = unified.prepare_serving_params(other, cfg=cfg)

    # fresh prompt content per timed call: greedy ignores the sampling seed,
    # and the remote-TPU tunnel caches identical calls (CLAUDE.md timing
    # protocol) — a timed run that repeats the warmup's inputs is bogus.
    hi = 30 if tiny else 100
    rng = np.random.default_rng(0)

    def fresh_task():
        prompt = rng.integers(1, hi, 5 if tiny else 23)
        text = rng.integers(1, hi, 7 if tiny else 12)
        return taskmod.prepare_tts(prompt, text, cfg.tokens)

    # ---- plain greedy baseline (target params) ----------------------------
    ref = DecodeEngine(target, cfg, max_frames=frames,
                       cache_dtype=cache_dtype, buckets=buckets)
    g, m = fresh_task()
    ref.generate_audio(g, m, topk=1, seed=0)
    g, m = fresh_task()
    t0 = time.perf_counter()
    out = ref.generate_audio(g, m, topk=1, seed=1)
    np.asarray(out[0])
    t_frame = (time.perf_counter() - t0) / frames
    print(json.dumps({
        "metric": "plain_greedy_frame_ms",
        "value": round(1e3 * t_frame, 3),
    }), flush=True)
    del ref

    for k in args.ks:
        rounds_ms = {}
        for name, d in (("accept_all", draft), ("reject_all", other)):
            eng = SpeculativeEngine(d, target, cfg, k=k, max_frames=frames,
                                    cache_dtype=cache_dtype,
                                    buckets=buckets)
            g, m = fresh_task()
            eng.generate_audio(g, m)           # compile + warmup
            g, m = fresh_task()
            t0 = time.perf_counter()
            out = eng.generate_audio(g, m)
            np.asarray(out[0])
            dt = time.perf_counter() - t0
            st = eng.last_stats
            rounds_ms[name] = 1e3 * dt / max(st["rounds"], 1)
            rounds_ms[name + "_stats"] = st
            del eng
        t_round = rounds_ms["accept_all"]      # same program either way
        proj = {}
        for a in args.alphas:
            exp_frames = 1 + sum(a ** i for i in range(1, k + 1))
            proj[str(a)] = round(exp_frames * 1e3 * t_frame / t_round, 3)
        print(json.dumps({
            "metric": "speculative_round_cost",
            "k": k,
            "round_ms_accept_all": round(rounds_ms["accept_all"], 2),
            "round_ms_reject_all": round(rounds_ms["reject_all"], 2),
            "accept_all_rate":
                rounds_ms["accept_all_stats"]["acceptance_rate"],
            "reject_all_rate":
                rounds_ms["reject_all_stats"]["acceptance_rate"],
            "plain_frame_ms": round(1e3 * t_frame, 3),
            "projected_speedup_vs_alpha": proj,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
