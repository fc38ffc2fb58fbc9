"""Single-chip training-step throughput + MFU (VERDICT r2 item 5).

Times the fully-jitted training step (forward + losses + backward + AdamW)
of the unified audio LM and reports frame-positions/s, stream-tokens/s
(x9 parallel streams), achieved model FLOP/s and MFU against the v5e-class
bf16 peak (197 TFLOP/s).

Full-scale Model_stage3 cannot train on ONE 16 GiB chip: the AdamW
bf16 param+grad+2-moment floor (8 bytes/param) of the NON-backbone
parameters alone (wte/lm_head/audio tables/experts/decoder ≈ 2.0 B
params) is ≈16 G before any backbone layer or activation — measured
17.23 G planned at 2 backbone layers / batch 1 / seq 512 at full vocab.
The default measurement is therefore the largest-fitting honest config:
full 3072/2048 widths, real expert/decoder depths and audio tables, text
vocab scaled 128256→32256 (--vocab; the output JSON carries
vocab_scaled), 2 backbone layers, batch 1 x seq 512, remat on. Scale-to-
full is by sharding, not by chip: the full-scale 8-device sharded step is
compile-checked by `scripts/check_multichip_compile.py`. Memory-floor
analysis + measured table: docs/bench_train_r3.md.

MFU convention: model FLOPs = 6 * N_matmul * frame_positions (fwd 2NT +
bwd 4NT), counting matmul/embedding-free parameters only; remat's
recompute overhead is NOT credited (standard MFU), so remat runs show
lower MFU by design. The local decoder runs only on audio-loss positions —
the estimate counts it on the audio fraction of the batch.

    python scripts/bench_train.py                    # TPU, largest-fitting
    UA2_BENCH_SCALE=tiny PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/bench_train.py --steps 2      # CPU smoke

Prints ONE JSON line. Committed results: docs/bench_train_r3.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16_PEAK = 197e12


def matmul_params(params) -> int:
    """Parameters that participate in matmuls (>=2-D leaves, embedding
    tables included — they act as output projections via the tied heads;
    norm vectors excluded)."""
    import jax

    return sum(
        int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(params)
        if hasattr(a, "shape") and len(a.shape) >= 2
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--backbone-layers", type=int, default=2)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--vocab", type=int, default=32256,
                   help="padded text vocab for the bench config. The real "
                        "128256-row wte+lm_head alone put the AdamW state+"
                        "grad floor (8 bytes/param bf16) past one 16 GiB "
                        "chip at ANY backbone depth (measured 17.2G at "
                        "2L/b1/s512); audio tables stay full-size. "
                        "Single-chip numbers are therefore vocab-scaled "
                        "and labeled as such; AdamW-parity full-model "
                        "training is the sharded path.")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--remat-backbone", type=int, default=None,
                   help="selective remat: checkpoint only K backbone "
                        "layers (the rest store activations). Spare-HBM "
                        "-> MFU trade (docs/bench_train_r5.md)")
    p.add_argument("--no-remat-small", action="store_true",
                   help="store activations in the small stacks (experts + "
                        "local decoder) instead of rematting them")
    p.add_argument("--no-chunked-ce", action="store_true",
                   help="dense logits CE (the chunked logit-free CE is the "
                        "default; it removes the (B*S, V) logit temps)")
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--audio-capacity", type=int, default=None,
                   help="static per-row audio-step capacity: run the local "
                        "decoder + audio CE only on gathered audio rows "
                        "(trainer.audio_gather_indices). The bench batch "
                        "has s//2-1 audio rows, so s//2 is exact-parity. "
                        "The MFU convention already credits the decoder on "
                        "the audio fraction only, so this flag raises MFU "
                        "by removing real waste, not by recounting.")
    p.add_argument("--optimizer",
                   choices=("adamw", "adafactor", "adamw_lean"),
                   default="adamw",
                   help="adamw_lean (train/lean_opt.py: int8 first moment "
                        "+ factored second moment, leaf-serialized update, "
                        "~5 bytes/param state+grad) is the optimizer that "
                        "fits a >=8-layer-backbone geometry on ONE 16 GiB "
                        "chip; plain AdamW's bf16 param+grad+2-moment "
                        "floor of the non-backbone parameters alone "
                        "(~2B params) exceeds HBM at any backbone depth "
                        "(measured: 17.2G at 2L/b1/s512 full vocab), and "
                        "optax adafactor's update OOMs on f32 temporaries "
                        "(42.3G planned at 8L). AdamW-parity full-model "
                        "training is the sharded path "
                        "(check_multichip_compile.py).")
    args = p.parse_args(argv)

    tiny = os.environ.get("UA2_BENCH_SCALE") == "tiny"
    if tiny:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax
    import jax.numpy as jnp

    if tiny:
        jax.config.update("jax_platforms", "cpu")

    from uniaudio2_tpu.config import UnifiedModelConfig, register_config
    from uniaudio2_tpu.models import unified
    from uniaudio2_tpu.train import trainer, schedule

    if tiny:
        cfg = UnifiedModelConfig.tiny()
        b, s = 2, 32
    else:
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

    # CPU's dot thunk rejects bf16xbf16->f32; the tiny smoke runs f32
    params = unified.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.float32 if tiny else jnp.bfloat16)
    n_mat = matmul_params(params)

    tx = trainer.make_optimizer(
        schedule.warmup_lr(1e-4, warmup_steps=2000), grad_clip=1.0,
        accum_steps=args.accum, optimizer=args.optimizer)
    state = trainer.init_train_state(params, tx)
    step_fn = jax.jit(
        trainer.build_train_step(cfg, tx, prefix_lm=True,
                                 remat=not args.no_remat,
                                 remat_backbone=args.remat_backbone,
                                 remat_small=(False if args.no_remat_small
                                              else None),
                                 chunked_ce=not args.no_chunked_ce,
                                 audio_capacity=args.audio_capacity),
        donate_argnums=(0,),
    )

    par = cfg.tokens.parallel_number
    ncb = cfg.tokens.num_codebooks
    rng = np.random.default_rng(0)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        grid = r.integers(0, 100, size=(b, s + 1, par)).astype(np.int32)
        gmask = np.zeros((b, s + 1, par), bool)
        gmask[:, : s // 2, -1] = True          # conditioning: text
        gmask[:, s // 2 :, :ncb] = True        # target: audio frames
        tmask = np.zeros((b, s), bool)
        tmask[:, 1 : s // 2] = True
        amask = np.zeros((b, s), bool)
        amask[:, s // 2 : s - 1] = True
        return trainer.Batch(
            grid=jnp.asarray(grid), grid_mask=jnp.asarray(gmask),
            text_loss_mask=jnp.asarray(tmask),
            audio_loss_mask=jnp.asarray(amask))

    # compile + warmup (fresh inputs each timed step: the remote-TPU tunnel
    # caches identical calls — CLAUDE.md measurement protocol)
    state, metrics = step_fn(state, make_batch(0))
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step_fn(state, make_batch(i + 1))
    loss = float(np.asarray(metrics["loss"]))   # forces full sync
    dt = (time.perf_counter() - t0) / args.steps

    positions = b * s
    pos_per_s = positions / dt
    # model FLOPs: backbone+experts see every position; the local decoder
    # (+audio head) runs on audio-loss positions only (half the batch here)
    dec_leaves = {"decoder", "audio_head", "projection_w"}
    n_dec = sum(
        int(np.prod(a.shape))
        for k in dec_leaves if k in params
        for a in jax.tree_util.tree_leaves(params[k])
        if hasattr(a, "shape") and len(a.shape) >= 2)
    audio_frac = 0.5
    flops_per_pos = 6 * (n_mat - n_dec) + 6 * n_dec * audio_frac
    achieved = flops_per_pos * pos_per_s
    mfu = achieved / V5E_BF16_PEAK

    print(json.dumps({
        "metric": "train_frame_positions_per_sec_per_chip",
        "value": round(pos_per_s, 1),
        "unit": "positions/s",
        "stream_tokens_per_s": round(pos_per_s * par, 1),
        "model_tflops_per_s": round(achieved / 1e12, 2),
        "mfu_vs_v5e_bf16": round(mfu, 4),
        "matmul_params_b": round(n_mat / 1e9, 3),
        "config": {
            "backbone_layers": cfg.backbone.n_layer, "batch": b, "seq": s,
            "remat": not args.no_remat, "accum": args.accum,
            "optimizer": args.optimizer, "padded_vocab": args.vocab,
            "remat_backbone": args.remat_backbone,
            "remat_small": not args.no_remat_small,
            "chunked_ce": not args.no_chunked_ce,
            "audio_capacity": args.audio_capacity,
            "vocab_scaled": args.vocab != 128256,
        },
        "loss": round(loss, 4),
        "step_ms": round(dt * 1e3, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
