"""Training entry point.

The reference ships FSDP training *utilities* but no training script
(SURVEY.md §0: "no training entry script included"). This provides the
implied trainer with the reference's knobs (`llm_utils/arguments.py:12-77`):
``--data-parallel {sdp,fsdp,hsdp}``, ``--batch_scale``, ``--learning_rate``
``--warmup_steps``, ``--grad_clip``, ``--grad_accum``,
``--activation-checkpointing``, bf16 params, token-space cards — mapped to
the TPU-native stack: mesh + NamedSharding parallelism, optax AdamW +
WarmupLR, Orbax epoch checkpoints with auto-resume, Reporter logging.

Run: ``python -m uniaudio2_tpu.train.train --train_data_jsons 'data/*.json'
--exp_dir exp/run1 ...``
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Optional

import numpy as np


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the unified audio LM (TPU)")
    p.add_argument("--train_data_jsons", type=str, nargs="+", required=True)
    p.add_argument("--valid_data_jsons", type=str, nargs="*", default=[])
    p.add_argument("--exp_dir", type=str, required=True)
    p.add_argument("--llm_train_config", type=str, default=None,
                   help="yaml with llm_name/local_model/token cards")
    p.add_argument("--text_tokenizer_path", type=str, default=None)
    p.add_argument("--n_epoch", type=int, default=5)
    p.add_argument("--batch_scale", type=int, default=2048)
    p.add_argument("--max_length", type=int, default=2048)
    p.add_argument("--min_length", type=int, default=2)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=10000)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--data-parallel", dest="data_parallel", type=str,
                   default="fsdp", choices=["sdp", "fsdp", "hsdp"])
    p.add_argument("--tensor-parallel", dest="tensor_parallel", type=int,
                   default=1)
    p.add_argument("--activation-checkpointing", dest="remat",
                   action="store_true", default=True)
    p.add_argument("--no-activation-checkpointing", dest="remat",
                   action="store_false")
    p.add_argument("--prefix_lm", action="store_true", default=False)
    p.add_argument("--audio-capacity", dest="audio_capacity", type=int,
                   default=None,
                   help="static per-row audio-step capacity: run the local "
                        "decoder + audio CE on gathered audio rows only "
                        "(trainer.audio_gather_indices; exact-loss when >= "
                        "every row's audio count — set it to the bucket's "
                        "max audio span). Measured +60%% step throughput "
                        "on half-audio batches (docs/profile_train_r3.md)")
    p.add_argument("--no-chunked-ce", dest="chunked_ce",
                   action="store_false", default=True,
                   help="dense-logits CE (the chunked logit-free CE is "
                        "the default — train/chunked_ce.py)")
    p.add_argument("--optimizer", type=str, default="adamw",
                   choices=["adamw", "adamw_lean", "adafactor"],
                   help="adamw_lean (train/lean_opt.py): int8 first moment "
                        "+ factored second moment at ~1 byte/param state — "
                        "the single-chip-memory configuration "
                        "(docs/bench_train_r4.md); adamw is the sharded-"
                        "path default")
    p.add_argument("--mixed-precision", dest="precision", type=str,
                   default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--print_freq", type=int, default=100)
    p.add_argument("--save_interval", type=int, default=0,
                   help="extra mid-epoch checkpoints every N steps (0=off)")
    p.add_argument("--seed", type=int, default=999)
    p.add_argument("--tensorboard", action="store_true", default=False)
    p.add_argument("--wandb", action="store_true", default=False)
    p.add_argument("--debug_steps", type=int, default=0,
                   help="stop each epoch after N steps (CI smoke)")
    p.add_argument("--distributed", action="store_true", default=False,
                   help="multi-host pod: call jax.distributed.initialize() "
                        "(coordinator/process env-configured) before device "
                        "discovery; data jsons shard by process index")
    return p


def main(argv: Optional[list] = None) -> None:
    args = get_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax

    if args.distributed:
        # multi-host: every process sees its local devices; the mesh below
        # spans the whole pod (reference's torch.distributed analog,
        # SURVEY.md §2.9 — collectives are compiler-emitted over ICI/DCN)
        jax.distributed.initialize()
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.data import batching, loading
    from uniaudio2_tpu.models import unified
    from uniaudio2_tpu.parallel import mesh as meshlib
    from uniaudio2_tpu.train import checkpoint as ckpt
    from uniaudio2_tpu.train import schedule, trainer
    from uniaudio2_tpu.train.reporter import Reporter

    # --- config / model ---
    if args.llm_train_config:
        import yaml

        with open(args.llm_train_config, encoding="utf-8") as f:
            cfg = UnifiedModelConfig.from_train_yaml(yaml.safe_load(f))
    else:
        cfg = UnifiedModelConfig()
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32

    # --- mesh ---
    n_dev = len(jax.devices())
    tp = max(args.tensor_parallel, 1)
    assert n_dev % tp == 0
    rest = n_dev // tp
    if args.data_parallel == "sdp":
        m = meshlib.build_mesh(replica=rest, tp=tp)
    elif args.data_parallel == "fsdp":
        m = meshlib.build_mesh(fsdp=rest, tp=tp)
    else:
        r = meshlib._largest_divisor_leq(rest, int(np.sqrt(rest)))
        m = meshlib.build_mesh(replica=r, fsdp=rest // r, tp=tp)
    logging.info("mesh: %s", m)

    params = unified.init_params(jax.random.PRNGKey(args.seed), cfg, dtype=dtype)
    params = meshlib.shard_params(params, m, use_tp=tp > 1)

    tx = trainer.make_optimizer(
        schedule.warmup_lr(args.learning_rate, args.warmup_steps),
        weight_decay=args.weight_decay, grad_clip=args.grad_clip,
        accum_steps=args.grad_accum, optimizer=args.optimizer,
        # the fused lean-update kernel is a single-device op (a pallas_call
        # cannot be sharded by the SPMD partitioner) — sharded runs keep
        # the XLA per-leaf chain
        lean_fused="off" if n_dev > 1 else None,
    )
    state = trainer.init_train_state(params, tx)
    reporter = Reporter(
        use_tensorboard=args.tensorboard,
        tb_dir=os.path.join(args.exp_dir, "tb"), use_wandb=args.wandb,
    )
    state, start_epoch, rep_state = ckpt.maybe_resume(args.exp_dir, state)
    if rep_state:
        reporter.load_state_dict(rep_state)
    step_fn = jax.jit(
        trainer.build_train_step(cfg, tx, prefix_lm=args.prefix_lm,
                                 remat=args.remat,
                                 chunked_ce=args.chunked_ce,
                                 audio_capacity=args.audio_capacity),
        donate_argnums=(0,),
    )

    # --- data ---
    if args.text_tokenizer_path:
        from uniaudio2_tpu.text.tokenizer import TextTokenizer

        tok = TextTokenizer(args.text_tokenizer_path)
    else:
        # pre-tokenized text files: whitespace-separated integer ids
        class _IntTok:
            def tokenize(self, text):
                return [int(t) for t in text.split()]

        logging.warning("no --text_tokenizer_path; treating text files as "
                        "pre-tokenized integer ids")
        tok = _IntTok()
    train_jsons = loading.find_data_jsons(args.train_data_jsons)
    data, text_data, _ = loading.load_all_tasks(train_jsons)
    data.update(text_data)
    batcher = batching.LengthBatcher(
        data, cfg.tokens, batch_scale=args.batch_scale, text_tokenizer=tok,
        max_length=args.max_length, min_length=args.min_length,
        seed=args.seed,
    )
    batch_sharding = NamedSharding(m, P(("replica", "fsdp")))

    def put(batch):
        n = batch["grid"].shape[0]
        # pad batch dim to the data-parallel size multiple
        dp = m.shape["replica"] * m.shape["fsdp"]
        if n % dp:
            padn = dp - n % dp
            for k in ("grid", "grid_mask", "text_loss_mask", "audio_loss_mask"):
                pad = np.zeros((padn,) + batch[k].shape[1:], batch[k].dtype)
                batch[k] = np.concatenate([batch[k], pad], 0)
        return trainer.Batch(
            grid=jax.device_put(batch["grid"], batch_sharding),
            grid_mask=jax.device_put(batch["grid_mask"], batch_sharding),
            text_loss_mask=jax.device_put(batch["text_loss_mask"], batch_sharding),
            audio_loss_mask=jax.device_put(batch["audio_loss_mask"], batch_sharding),
        )

    # --- loop ---
    for epoch in range(start_epoch, args.n_epoch):
        sub = reporter.start_epoch("train", epoch)
        for i, raw in enumerate(batcher.batches(epoch=epoch)):
            state, metrics = step_fn(state, put(raw))
            sub.register({k: float(v) for k, v in metrics.items()})
            if args.print_freq and (i + 1) % args.print_freq == 0:
                logging.info(sub.window_message())
            if args.debug_steps and i + 1 >= args.debug_steps:
                break
        stats = reporter.finish_epoch(sub)
        logging.info("epoch %d: %s", epoch,
                     {k: round(v, 4) for k, v in stats.items()})
        path = ckpt.save_checkpoint(
            args.exp_dir, epoch, state, reporter.state_dict()
        )
        logging.info("saved %s", path)


if __name__ == "__main__":
    main()
