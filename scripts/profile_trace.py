"""Capture + parse a device trace of the decode frame loop (per-op table).

Reproduces the round-2 per-kernel analysis (docs/profile_decode_r2.md) as a
committed tool: runs the bench's compiled audio frame loop under
`jax.profiler.trace`, then parses the perfetto JSON and prints device time
grouped by op, with per-frame attribution.

    UA2_BENCH_QUANT=int4all python scripts/profile_trace.py

Writes the raw trace under /tmp/ua2_trace (open in perfetto for detail).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FRAMES = 16
TRACE_DIR = "/tmp/ua2_trace"


def main():
    if len(sys.argv) > 1:  # parse-only: path to an existing trace.json.gz
        return parse(sys.argv[1])
    import jax
    import jax.numpy as jnp

    from uniaudio2_tpu.utils.prng import configure_serving_prng

    configure_serving_prng()  # rbg hardware PRNG; UA2_PRNG_IMPL overrides

    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.engine import tasks as taskmod
    from uniaudio2_tpu.engine.decode import DecodeEngine
    from uniaudio2_tpu.models import unified
    from uniaudio2_tpu.ops import quant

    cfg = UnifiedModelConfig()
    params = unified.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16)
    qmode = os.environ.get("UA2_BENCH_QUANT", "int4all")
    if qmode in ("int4all", "int4allg"):
        int4 = ("backbone", "decoder", "understanding_expert",
                "generation_expert", "audio_head", "projection_w")
    elif qmode == "int4":
        int4 = ("decoder", "audio_head", "projection_w")
    else:
        int4 = ()
    params = quant.quantize_unified_params(
        params, donate=True, int4_modules=int4, grouped=qmode.endswith("g"))
    params = unified.prepare_serving_params(params, cfg=cfg)
    engine = DecodeEngine(params, cfg, max_frames=FRAMES, buckets=(64,),
                          approx_topk=os.environ.get("UA2_BENCH_APPROX", "1") != "0")

    task = os.environ.get("UA2_PROFILE_TASK", "tts")
    if task == "asr":
        # text-mode frame loop (ASR): audio-token prompt, no local decoder
        rng = np.random.default_rng(0)
        grid, mask = taskmod.prepare_asr(
            np.arange(1, 12, dtype=np.int64) % 100,
            rng.integers(0, 100, (10, 8)), rng.integers(0, 200, (24, 8)),
            cfg.tokens,
        )

        def run(seed):
            return engine.generate_text(grid, mask, temperature=0.9,
                                        topk=50, seed=seed)

        run(0)
        os.makedirs(TRACE_DIR, exist_ok=True)
        with jax.profiler.trace(TRACE_DIR):
            out = run(1)
            np.asarray(out)
        files = sorted(glob.glob(
            os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True),
            key=os.path.getmtime)
        if not files:
            print("no trace file found under", TRACE_DIR)
            return 1
        return parse(files[-1])

    prompt = np.arange(1, 24, dtype=np.int64) % 100
    text = np.arange(5, 17, dtype=np.int64) % 100
    grid, mask = taskmod.prepare_tts(prompt, text, cfg.tokens)

    batch = int(os.environ.get("UA2_PROFILE_BATCH", "1"))
    if batch > 1:
        items = [(grid, mask)] * batch

        def run(seed):
            outs = engine.generate_audio_batch(
                items, temperature=0.9, topk=50, seed=seed)
            return outs[0]
    else:
        def run(seed):
            return engine.generate_audio(grid, mask, temperature=0.9,
                                         topk=50, seed=seed)

    run(0)  # compile + warm
    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        out = run(1)
        np.asarray(out[0])

    files = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not files:
        print("no trace file found under", TRACE_DIR)
        return 1
    return parse(files[-1])


def parse(path):
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # The "XLA Ops" device lane is NESTED (while > bodies > fusions): compute
    # per-op SELF time (dur minus children) with a stack sweep, then group by
    # op class (name with the .NNN id stripped).
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_names.items() if "TPU" in n}
    evs = [dict(ev) for ev in trace.get("traceEvents", [])
           if ev.get("ph") == "X" and "dur" in ev
           and ev.get("pid") in device_pids]
    # keep the leaf-op lane: the one holding the most events
    lanes = defaultdict(int)
    for ev in evs:
        lanes[(ev["pid"], ev["tid"])] += 1
    lane = max(lanes, key=lanes.get)
    evs = [ev for ev in evs if (ev["pid"], ev["tid"]) == lane]
    evs.sort(key=lambda e: (e["ts"], -e["dur"]))
    stack, done = [], []
    for ev in evs:
        while stack and ev["ts"] >= stack[-1]["ts"] + stack[-1]["dur"] - 1e-9:
            done.append(stack.pop())
        if stack:
            stack[-1]["_child"] = stack[-1].get("_child", 0.0) + ev["dur"]
        stack.append(ev)
    done.extend(stack)

    agg = defaultdict(lambda: [0, 0.0])
    for ev in done:
        cls = re.sub(r"\.\d+", "", ev["name"])
        agg[cls][0] += 1
        agg[cls][1] += max(ev["dur"] - ev.get("_child", 0.0), 0.0)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    total = sum(v[1] for _, v in rows)
    # steady-state: the while loop's total (inclusive) time per frame
    while_ms = sum(ev["dur"] for ev in done
                   if ev["name"].startswith("while.")) / 1e3
    print(f"{'op class (self time)':48s} {'calls':>7s} {'us/call':>8s} "
          f"{'ms/frame':>9s} {'%':>5s}")
    for name, (calls, dur) in rows[:30]:
        print(f"{name[:48]:48s} {calls:7d} {dur / calls:8.2f} "
              f"{dur / 1e3 / FRAMES:9.4f} {100 * dur / total:5.1f}")
    print(f"{'TOTAL (device self)':48s} {'':7s} {'':8s} "
          f"{total / 1e3 / FRAMES:9.3f}")
    print(f"decode while loop (steady-state): {while_ms:.2f} ms total, "
          f"{while_ms / FRAMES:.3f} ms/frame "
          f"(the rest is one-shot prefill, amortized over long runs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
