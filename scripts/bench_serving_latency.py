"""Online-arrival serving latency benchmark (VERDICT r3 item 5).

Poisson arrivals into `engine/continuous.py::ContinuousEngine.step_online`
(the online serving discipline: admit-at-segment-boundary, fused refill,
segment-granular emission), reporting per offered load:

    TTFT p50/p99   — submit -> first host-visible frame (wall clock; frames
                     become visible at segment boundaries, so seg_frames
                     sets the floor)
    TPOT p50/p99   — (done - first) / (frames - 1)
    goodput        — completed audio tokens/s over the busy makespan
    completed / offered

plus the batch-1 isolated floor (a rows=1 engine decoding one request with
nothing else running — the latency-optimal, throughput-poor point).

Timing rules per CLAUDE.md: every request uses fresh prompt content, one
warmup request compiles the segment/drain programs before the clock
starts. The arrival process is seeded and replayed identically across
loads' request sets.

    python scripts/bench_serving_latency.py                 # TPU full scale
    UA2_BENCH_SCALE=tiny PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/bench_serving_latency.py --loads 2 --requests 6

Reference match: serving capability beyond `multi_task_inference.py`'s
one-utterance loop (sanctioned TPU-native addition — measured like one).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pct(xs, q):
    return float(np.percentile(np.asarray(xs), q)) if xs else float("nan")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=8)
    p.add_argument("--seg-frames", type=int, default=8)
    p.add_argument("--max-frames", type=int, default=96)
    p.add_argument("--cache-len", type=int, default=1024)
    p.add_argument("--requests", type=int, default=48,
                   help="requests per load point")
    p.add_argument("--loads", type=float, nargs="+",
                   default=[0.5, 1.0, 2.0, 4.0, 8.0],
                   help="offered loads (requests/s)")
    p.add_argument("--quant", default="int4all")
    p.add_argument("--topk", type=int, default=50)
    p.add_argument("--ladder", default="auto",
                   help="segment ladder: auto | off | '2,4,8' "
                        "(r5 TTFT-tail lever; 'off' = fixed r4 behavior)")
    p.add_argument("--reactive", default=None,
                   help="row-free-reactive program: on | off | auto "
                        "(default env UA2_SEG_REACTIVE; measured off)")
    p.add_argument("--windows", type=int, default=None,
                   help="cache windows: 1 = r4 drain-then-reset, 2 = "
                        "overlapped drain (default env UA2_WINDOWS)")
    p.add_argument("--diag", action="store_true",
                   help="per-step timing classified by scheduler program + "
                        "worst-request TTFT decomposition (straggler hunt)")
    p.add_argument("--skip-floor", action="store_true")
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
    from uniaudio2_tpu.engine.continuous import ContinuousEngine
    from uniaudio2_tpu.models import unified

    if tiny:
        cfg = UnifiedModelConfig.tiny()
        args.rows = min(args.rows, 2)
        args.max_frames = 8
        args.seg_frames = 4
        args.cache_len = 256
        cache_dtype = jnp.float32
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
    else:
        cfg = UnifiedModelConfig()
        cache_dtype = jnp.bfloat16
        params = unified.init_params(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
        if args.quant != "0":
            from uniaudio2_tpu.ops.quant import quantize_unified_params

            int4 = ("backbone", "decoder", "understanding_expert",
                    "generation_expert", "audio_head", "projection_w")
            params = quantize_unified_params(
                params, donate=True,
                int4_modules=int4 if args.quant.startswith("int4") else (),
                grouped=args.quant.endswith("g"))
            params = unified.prepare_serving_params(params, cfg=cfg)

    ncb = cfg.tokens.num_codebooks
    rng = np.random.default_rng(0)

    def make_request(i):
        prompt = rng.integers(1, 100, int(rng.integers(12, 40)))
        text = rng.integers(1, 100, int(rng.integers(8, 24)))
        return taskmod.prepare_tts(prompt, text, cfg.tokens)

    def fresh_engine(rows):
        eng = ContinuousEngine(
            params, cfg, mode="audio", rows=rows, bucket=64,
            seg_frames=args.seg_frames, cache_len=args.cache_len,
            max_frames=args.max_frames, temperature=0.9, topk=args.topk,
            cache_dtype=cache_dtype, seg_ladder=args.ladder,
            seg_reactive=args.reactive, windows=args.windows)
        eng.warmup()   # AOT-compile all scheduler programs off the clock
        return eng

    # ---- batch-1 isolated floor -------------------------------------------
    if args.skip_floor:
        eng1 = None
    else:
        eng1 = fresh_engine(1)
    if eng1 is not None:
        g, m = make_request(-1)
        eng1.submit(g, m)                   # warmup: compiles segment+drain
        eng1.run_until_drained()
        eng1.timings.clear()
        g, m = make_request(-2)
        rid = eng1.submit(g, m)
        eng1.run_until_drained()
        t = eng1.timings[rid]
        floor = {
            "metric": "serving_batch1_floor",
            "ttft_ms": round(1e3 * (t["first"] - t["submitted"]), 1),
            "tpot_ms": round(1e3 * (t["done"] - t["first"])
                             / max(t["frames"] - 1, 1), 2),
            "seg_frames": args.seg_frames,
        }
        print(json.dumps(floor), flush=True)
        del eng1

    # ---- Poisson load sweep ------------------------------------------------
    eng = fresh_engine(args.rows)
    g, m = make_request(-3)                 # warmup compile for B rows
    eng.submit(g, m)
    eng.run_until_drained()

    for load in args.loads:
        eng.timings.clear()
        eng.stats = {k: 0 for k in eng.stats}
        eng._overlap = None
        eng._flip = False
        eng._state = eng._fresh_state(eng._cache_dtype)
        eng._pos_host = eng.bucket
        arr_rng = np.random.default_rng(1234)
        gaps = arr_rng.exponential(1.0 / load, size=args.requests)
        arrivals = np.cumsum(gaps)
        reqs = [make_request(i) for i in range(args.requests)]

        t0 = time.monotonic()
        submitted = 0
        done = 0
        rids = []
        steps = []      # (t_start, dur_s, kind) per step_online call (--diag)
        while done < args.requests:
            now = time.monotonic() - t0
            while submitted < args.requests and arrivals[submitted] <= now:
                g, m = reqs[submitted]
                rids.append(eng.submit(g, m))
                submitted += 1
            if args.diag:
                pre = dict(eng.stats)
                pre_pos = eng._pos_host
                t_call = time.monotonic()
                out = eng.step_online()
                dur = time.monotonic() - t_call
                kind = ";".join(f"{k}+{eng.stats[k] - pre[k]}"
                                for k in eng.stats if eng.stats[k] > pre[k])
                steps.append((t_call - t0, dur,
                              f"{kind or 'idle'} d_pos={eng._pos_host - pre_pos}"))
            else:
                out = eng.step_online()
            done += len(out)
            if not out and submitted < args.requests and not any(
                    s.request_id >= 0 for s in eng._slots) \
                    and eng._overlap is None and eng._queue.empty():
                time.sleep(max(arrivals[submitted] - (
                    time.monotonic() - t0), 0.0))
        makespan = time.monotonic() - t0

        ts = [eng.timings[r] for r in rids]
        ttft = [t["first"] - t["submitted"] for t in ts if "first" in t]
        tpot = [(t["done"] - t["first"]) / max(t["frames"] - 1, 1)
                for t in ts if "done" in t and "first" in t]
        frames_done = sum(t.get("frames", 0) for t in ts)
        print(json.dumps({
            "metric": "serving_online_latency",
            "offered_load_rps": load,
            "requests": args.requests,
            "rows": args.rows,
            "ttft_ms_p50": round(1e3 * pct(ttft, 50), 1),
            "ttft_ms_p99": round(1e3 * pct(ttft, 99), 1),
            "tpot_ms_p50": round(1e3 * pct(tpot, 50), 2),
            "tpot_ms_p99": round(1e3 * pct(tpot, 99), 2),
            "goodput_tokens_per_s": round(frames_done * ncb / makespan, 1),
            "makespan_s": round(makespan, 2),
            "segments": eng.stats["segments"],
            "reactive": eng.stats["reactive"],
            "resets": eng.stats["resets"],
            "drains": eng.stats["drains"],
            "overlaps": eng.stats["overlaps"],
            "ladder": list(eng.seg_ladder),
            "windows": eng.max_windows,
        }), flush=True)
        if args.diag:
            worst = sorted(steps, key=lambda s: -s[1])[:12]
            for tt, dur, kind in sorted(worst):
                print(f"  step t={tt:8.3f}s dur={1e3 * dur:8.1f}ms  {kind}",
                      flush=True)
            by_ttft = sorted(
                (t for t in ts if "first" in t),
                key=lambda t: t["submitted"] - t["first"])[:6]
            for t in by_ttft:
                sub = t["submitted"] - t0
                adm = t.get("admitted", float("nan")) - t["submitted"]
                fst = t["first"] - t["submitted"]
                print(f"  req submit={sub:8.3f}s wait_admit={1e3*adm:7.1f}ms "
                      f"ttft={1e3*fst:7.1f}ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
