"""Checkpoint parity audit: converter -> greedy decode -> token-ID diff.

The BASELINE fidelity row ("bit-identical greedy token IDs vs the
reference") is unprovable in this zero-egress environment — no reference
checkpoints can be downloaded. This script is the ready-to-run audit for
the day weights land (VERDICT r2 item 9): it loads a reference-format
checkpoint through the converter, greedy-decodes a pinned prompt set, and
diffs the token IDs against recorded reference outputs.

THE ONE COMMAND once real weights + recorded reference outputs exist:

    python scripts/parity_audit.py \
        --checkpoint /path/to/ep5.checkpoint \
        --train_config /path/to/train_config.yaml \
        --expected reference_outputs.json

To *produce* `reference_outputs.json`, run the reference repo's generators
greedy (temperature irrelevant at argmax; seed 888, `multi_task_inference
.py:162`) on the same pinned prompts and save the token-ID lists — or run
this script with ``--record`` against a checkpoint already trusted.

Self-check today (no weights needed — synthetic reference-shaped state
dict, real layer depths at tiny widths, exercised end to end on CPU):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/parity_audit.py --synthetic

Exit code 0 = all prompts token-identical (or recorded); 1 = any diff.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pinned_prompts(ts):
    """Deterministic prompt set covering both decode modes and the task
    grid builders. Token ids are tiny (< any real vocab)."""
    from uniaudio2_tpu.engine import tasks

    out = {}
    out["tts_short"] = ("audio", tasks.prepare_tts(
        np.asarray([2, 11, 5, 7]), np.asarray([9, 3, 14, 6, 8]), ts))
    out["tts_long"] = ("audio", tasks.prepare_tts(
        (np.arange(1, 23) * 3) % 60, (np.arange(2, 34) * 5) % 60, ts))
    out["asr"] = ("text", tasks.prepare_asr(
        (np.arange(1, 10) * 7) % 60,
        np.asarray([[(i * 13 + q) % 50 for q in range(8)] for i in range(6)]),
        np.asarray([[(i * 17 + q) % 60 for q in range(8)] for i in range(15)]),
        ts))
    return out


def synthetic_setup():
    """Real reference depths at tiny widths + a synthetic reference-format
    state dict (same scheme the converter-inventory tests pin)."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    import test_convert_inventory as inv
    from uniaudio2_tpu import config as cfgmod
    from uniaudio2_tpu.config import UnifiedModelConfig

    common = dict(block_size=512, vocab_size=100, padded_vocab_size=128,
                  n_head=4, n_query_groups=2, rope_base=10000.0,
                  rope_adjustments=None)
    cfgmod.register_config("audit-backbone", n_layer=28, n_embd=32,
                           intermediate_size=64, **common)
    cfgmod.register_config("audit-decoder", n_layer=4, n_embd=16,
                           intermediate_size=32, **common)
    cfgmod.register_config("audit-und", n_layer=3, n_embd=32,
                           intermediate_size=64, **common)
    cfgmod.register_config("audit-gen", n_layer=2, n_embd=32,
                           intermediate_size=64, **common)
    cfg = UnifiedModelConfig(
        llm_name="audit-backbone", decoder_name="audit-decoder",
        understanding_expert_name="audit-und",
        generation_expert_name="audit-gen", max_seq_len=256,
    )
    return cfg, inv._reference_state_dict(cfg)


def decode_all(cfg, params, *, max_frames: int):
    import jax.numpy as jnp
    from uniaudio2_tpu.engine.decode import DecodeEngine

    eng = DecodeEngine(params, cfg, max_frames=max_frames,
                       cache_dtype=jnp.float32, buckets=(64, 128))
    results = {}
    for name, (mode, (grid, mask)) in pinned_prompts(cfg.tokens).items():
        if mode == "text":
            toks = eng.generate_text(grid, mask, topk=1)
            results[name] = {"text": np.asarray(toks).tolist()}
        else:
            reason, semantic = eng.generate_audio(grid, mask, topk=1)
            results[name] = {"reason": np.asarray(reason).tolist(),
                             "semantic": np.asarray(semantic).tolist()}
    return results


def diff(expected: dict, got: dict) -> int:
    bad = 0
    for name, exp in expected.items():
        g = got.get(name)
        if g is None:
            print(f"[FAIL] {name}: missing from this run")
            bad += 1
            continue
        for stream, e in exp.items():
            ga = np.asarray(g.get(stream, []))
            ea = np.asarray(e)
            if ga.shape != ea.shape or not np.array_equal(ga, ea):
                where = "shape" if ga.shape != ea.shape else (
                    f"first diff at {np.argwhere(ga != ea)[0].tolist()}")
                print(f"[FAIL] {name}.{stream}: {ea.shape} vs {ga.shape} "
                      f"({where})")
                bad += 1
            else:
                print(f"[ok]   {name}.{stream}: {ea.shape} identical")
    return bad


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", help="reference-format .checkpoint/.pt/"
                   ".npz (module. prefixes handled by the converter)")
    p.add_argument("--train_config", help="reference train-config yaml")
    p.add_argument("--synthetic", action="store_true",
                   help="run against a synthetic reference-shaped state "
                   "dict (no weights needed; end-to-end self-check)")
    p.add_argument("--expected", help="recorded reference token-ID json")
    p.add_argument("--record", help="write this run's token IDs as json")
    p.add_argument("--max_frames", type=int, default=16)
    args = p.parse_args(argv)

    import jax
    from uniaudio2_tpu.convert import torch_to_jax as cvt

    if args.synthetic:
        cfg, sd = synthetic_setup()
        params, missing = cvt.convert_unified(sd, cfg)
        assert not missing, f"synthetic dict incomplete: {missing[:5]}"
        params = cvt.to_jax(params)
    else:
        assert args.checkpoint and args.train_config, (
            "--checkpoint + --train_config (or --synthetic)")
        import yaml
        from uniaudio2_tpu.config import UnifiedModelConfig

        with open(args.train_config, encoding="utf-8") as f:
            cfg = UnifiedModelConfig.from_train_yaml(yaml.safe_load(f))
        sd = cvt.load_torch_state_dict(args.checkpoint)
        params, missing = cvt.convert_unified(sd, cfg)
        if missing:
            print(f"[audit] {len(missing)} keys missing "
                  f"(first: {missing[:3]})", file=sys.stderr)
        params = cvt.to_jax(params)

    got = decode_all(cfg, params, max_frames=args.max_frames)

    if args.record:
        with open(args.record, "w", encoding="utf-8") as f:
            json.dump(got, f)
        print(f"[audit] recorded {len(got)} prompt outputs -> {args.record}")
        return 0
    if args.expected:
        with open(args.expected, encoding="utf-8") as f:
            expected = json.load(f)
        bad = diff(expected, got)
        print(f"[audit] {len(expected) - bad}/{len(expected)} prompts "
              f"token-identical")
        return 1 if bad else 0

    # no expected set: determinism self-check (greedy must be exact)
    again = decode_all(cfg, params, max_frames=args.max_frames)
    bad = diff(got, again)
    print("[audit] determinism self-check",
          "PASSED" if bad == 0 else "FAILED")
    for name, streams in got.items():
        sizes = {k: np.asarray(v).shape for k, v in streams.items()}
        print(f"  {name}: {sizes}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
