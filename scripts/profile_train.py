"""Capture + parse a device trace of the TRAINING step (per-op table).

Same parser as scripts/profile_trace.py (nesting-aware self time), pointed
at the jitted train step from scripts/bench_train.py's largest-fitting
single-chip config. Used to size the round-4 MFU levers (the local
decoder's 8-long attention, remat recompute, optimizer traffic).

    python scripts/profile_train.py                 # TPU, 2 traced steps
    python scripts/profile_train.py --batch 4       # smaller batch

Writes the raw trace under /tmp/ua2_train_trace (open in perfetto).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import profile_trace

TRACE_DIR = "/tmp/ua2_train_trace"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--backbone-layers", type=int, default=2)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--vocab", type=int, default=32256)
    p.add_argument("--steps", type=int, default=2, help="traced steps")
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--audio-capacity", type=int, default=None)
    p.add_argument("--optimizer", default="adamw",
                   choices=("adamw", "adafactor", "adamw_lean"))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from uniaudio2_tpu.config import UnifiedModelConfig, register_config
    from uniaudio2_tpu.models import unified
    from uniaudio2_tpu.train import trainer, schedule

    register_config(
        "bench-train-backbone", block_size=131072,
        vocab_size=args.vocab - 256,
        padded_vocab_size=args.vocab, n_layer=args.backbone_layers,
        n_embd=3072, n_head=24, n_query_groups=8,
        intermediate_size=8192, rope_base=500000.0,
    )
    cfg = UnifiedModelConfig(
        llm_name="bench-train-backbone",
        decoder_name="Llama-3.2-300M",
        understanding_expert_name="Llama-3.2-Understanding",
        generation_expert_name="Llama-3.2-Generation",
        max_seq_len=args.seq + 1,
    )
    b, s = args.batch, args.seq
    params = unified.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16)
    tx = trainer.make_optimizer(
        schedule.warmup_lr(1e-4, warmup_steps=2000), grad_clip=1.0,
        optimizer=args.optimizer)
    state = trainer.init_train_state(params, tx)
    step_fn = jax.jit(
        trainer.build_train_step(cfg, tx, prefix_lm=True,
                                 remat=not args.no_remat,
                                 audio_capacity=args.audio_capacity),
        donate_argnums=(0,),
    )

    par = cfg.tokens.parallel_number
    ncb = cfg.tokens.num_codebooks

    def make_batch(seed):
        r = np.random.default_rng(seed)
        grid = r.integers(0, 100, size=(b, s + 1, par)).astype(np.int32)
        gmask = np.zeros((b, s + 1, par), bool)
        gmask[:, : s // 2, -1] = True
        gmask[:, s // 2:, :ncb] = True
        tmask = np.zeros((b, s), bool)
        tmask[:, 1: s // 2] = True
        amask = np.zeros((b, s), bool)
        amask[:, s // 2: s - 1] = True
        return trainer.Batch(
            grid=jnp.asarray(grid), grid_mask=jnp.asarray(gmask),
            text_loss_mask=jnp.asarray(tmask),
            audio_loss_mask=jnp.asarray(amask))

    state, metrics = step_fn(state, make_batch(0))  # compile + warm
    jax.block_until_ready(metrics["loss"])

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        for i in range(args.steps):
            state, metrics = step_fn(state, make_batch(i + 1))
        np.asarray(metrics["loss"])

    files = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not files:
        print("no trace file found under", TRACE_DIR)
        return 1
    # the parser divides per-"frame"; one frame := one train step
    profile_trace.FRAMES = args.steps
    return profile_trace.parse(files[-1])


if __name__ == "__main__":
    raise SystemExit(main())
