"""Copy-census of the compiled batched decode program (VERDICT r3 item 3).

The r3 batch-16 trace (docs/profile_decode_r3.md) attributes ~0.40 ms/frame
to ~21 FULL (16, 8, 256, 128) cache-buffer copies (XLA while-state
double-buffering of the per-layer list caches) plus 0.59 ms of small async
slices. This script AOT-compiles the real batched generation program and
counts `copy`/`copy-start` HLO ops by shape so the copies can be attributed
to specific buffers (and the effect of candidate fixes measured at the HLO
level before paying a TPU A/B).

    python scripts/analyze_decode_copies.py --batch 16 --frames 128
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/analyze_decode_copies.py --cpu ...
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--quant", default="int4all")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--dump", default="/tmp/decode_hlo.txt")
    args = p.parse_args()

    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from uniaudio2_tpu.utils.prng import configure_serving_prng

    configure_serving_prng()

    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.engine.decode import DecodeEngine
    from uniaudio2_tpu.engine import tasks as taskmod
    from uniaudio2_tpu.models import unified
    from uniaudio2_tpu.ops.quant import quantize_unified_params

    cfg = UnifiedModelConfig.tiny() if os.environ.get(
        "UA2_BENCH_SCALE") == "tiny" else UnifiedModelConfig()
    params = unified.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16)
    if args.quant != "0":
        int4 = {
            "int4all": ("backbone", "decoder", "understanding_expert",
                        "generation_expert", "audio_head", "projection_w"),
            "int4": ("decoder", "audio_head", "projection_w"),
        }.get(args.quant, ())
        params = quantize_unified_params(params, donate=True,
                                         int4_modules=int4)
        params = unified.prepare_serving_params(params, cfg=cfg)
    engine = DecodeEngine(params, cfg, max_frames=args.frames, buckets=(64,))

    rng = np.random.default_rng(0)
    items = [
        taskmod.prepare_tts(rng.integers(1, 100, 20 + i),
                            rng.integers(1, 100, 10 + i), cfg.tokens)
        for i in range(args.batch)
    ]
    g, m, lens, bucket = engine._pack_left(items)
    fn = engine._get_batched("audio", bucket, args.batch, 0.9, 50)
    key = jax.random.PRNGKey(0)
    lowered = fn.lower(engine.params, g, m, lens, key, jnp.float32(1.0))
    compiled = lowered.compile()
    try:
        text = compiled.as_text()
    except Exception as e:  # remote backends may withhold optimized HLO
        print(f"as_text failed: {e}")
        return 1
    with open(args.dump, "w") as f:
        f.write(text)
    print(f"wrote {len(text) / 1e6:.1f} MB of HLO to {args.dump}")

    # census: copy ops by result shape, split by while-body vs elsewhere
    in_body = False
    counts = collections.Counter()
    op_re = re.compile(r"^\s*(%?[\w.-]+)\s*=\s*(\S+?)\s+(copy|copy-start|"
                       r"copy-done|dynamic-update-slice|fusion)\(")
    for line in text.splitlines():
        if line.startswith("%while_body") or ("while_body" in line
                                              and line.endswith("{")):
            in_body = True
        elif line.startswith("}"):
            in_body = False
        mt = op_re.match(line)
        if mt:
            shape, op = mt.group(2), mt.group(3)
            if op in ("copy", "copy-start", "copy-done"):
                counts[(op, shape, in_body)] += 1
    total = 0
    for (op, shape, body), n in sorted(counts.items(),
                                       key=lambda kv: -kv[1]):
        where = "body" if body else "top"
        print(f"{n:5d}  {op:10s} {where:4s} {shape}")
        total += n
    print(f"total copy ops: {total}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
