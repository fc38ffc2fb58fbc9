"""Training step and state for the unified audio LM.

The reference ships FSDP training *utilities* but no training entry script
(SURVEY.md §0/§2.6). This module provides the TPU-native training core the
utilities imply: a functional train state, an optax AdamW optimizer with
clipping / weight decay / gradient accumulation
(reference `llm_utils/arguments.py:56-68`), and a single jit-compiled
SPMD train step whose parallelism comes entirely from sharding annotations
(`parallel/mesh.py`) — the XLA equivalent of `--data-parallel {fsdp,sdp,hsdp}`.

Batch layout (built by the data pipeline from the task grids):
    grid:            (B, S+1, 9) int32 teacher-forcing token grid
    grid_mask:       (B, S+1, 9) bool stream-activity mask
    text_loss_mask:  (B, S) bool — steps whose *next* token is a text target
    audio_loss_mask: (B, S) bool — steps whose next frame is an audio target
Inputs are ``grid[:, :-1]``; labels are ``grid[:, 1:]`` (audio streams) and
``grid[:, 1:, -1]`` (text stream) — the standard next-step factorization the
reference implements with its `labels` argument.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.train import losses
from uniaudio2_tpu.train.masks import prefix_lm_mask

Params = Dict[str, Any]


class TrainState(NamedTuple):
    params: Params
    opt_state: optax.OptState
    step: jax.Array


class Batch(NamedTuple):
    grid: jax.Array              # (B, S+1, 9) int32
    grid_mask: jax.Array         # (B, S+1, 9) bool
    text_loss_mask: jax.Array    # (B, S) bool
    audio_loss_mask: jax.Array   # (B, S) bool


def make_optimizer(
    schedule: optax.Schedule,
    *,
    weight_decay: float = 0.01,
    grad_clip: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.95,
    accum_steps: int = 1,
    optimizer: str = "adamw",
    lean_fused: Optional[str] = None,
) -> optax.GradientTransformation:
    """AdamW + global-norm clipping (+ optional gradient accumulation),
    matching the reference's training knobs (`arguments.py:56-68`).

    ``optimizer="adamw_lean"`` (train/lean_opt.py) keeps AdamW's update
    shape at ~5 bytes/param state+grad (int8 block-quantized first moment,
    factored second moment, leaf-serialized update) — the configuration
    that fits a >=8-layer-backbone geometry on ONE 16 GiB chip
    (docs/bench_train_r4.md). ``optimizer="adafactor"`` (optax) also
    shrinks state but its update materialises f32 temporaries for every
    parameter at once and OOMs at depth (docs/bench_train_r3.md:66-70);
    with plain AdamW the bf16 param+grad+2-moment floor of the
    non-backbone parameters alone (embedding/audio tables ≈ 2 B params)
    exceeds a 16 GiB chip. The sharded (FSDP) path is the AdamW-parity
    mode (scripts/check_multichip_compile.py)."""
    if optimizer == "adamw_lean":
        from uniaudio2_tpu.train.lean_opt import adamw_lean

        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            adamw_lean(schedule, b1=b1, b2=b2, weight_decay=weight_decay,
                       fused=lean_fused),
        )
    elif optimizer == "adafactor":
        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adafactor(schedule, decay_rate=b2,
                            weight_decay_rate=weight_decay or None,
                            clipping_threshold=None),
        )
    else:
        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay),
        )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def init_train_state(
    params: Params, tx: optax.GradientTransformation
) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.int32(0))


def audio_gather_indices(
    audio_loss_mask: jax.Array, capacity: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-row positions of the first ``capacity`` audio-loss steps.

    The reference gathers audio steps with a boolean index before its local
    decoder (`model_new.py:449`) — a data-dependent shape. The TPU-native
    equivalent is a STATIC capacity: a stable argsort floats each row's
    audio positions (in order) to the front, truncated to C.

    Returns:
        idx (B, C) int32 gather positions, valid (B, C) bool. Rows with
        fewer than C audio steps are padded (idx points at arbitrary
        non-audio steps, valid=False). Rows with MORE than C audio steps
        lose the tail from the loss — choose C >= the bucket's max audio
        span for exact parity with the dense path.
    """
    b, s = audio_loss_mask.shape
    capacity = min(capacity, s)
    order = jnp.argsort(jnp.logical_not(audio_loss_mask), axis=1,
                        stable=True)
    idx = order[:, :capacity].astype(jnp.int32)
    count = audio_loss_mask.sum(axis=1, dtype=jnp.int32)
    valid = jnp.arange(capacity, dtype=jnp.int32)[None, :] < count[:, None]
    return idx, valid


def loss_fn(
    params: Params,
    cfg: UnifiedModelConfig,
    batch: Batch,
    *,
    prefix_lm: bool = False,
    residual_weights: Sequence[float] = (1.0,) * 7,
    chunked_ce: bool = True,
    remat: bool = False,
    remat_backbone: Optional[int] = None,
    remat_small: Optional[bool] = None,
    audio_capacity: Optional[int] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """``chunked_ce`` (default) computes both CE losses from hidden states
    via the logit-free chunked path (`train/chunked_ce.py`) — float-
    identical losses/grads without the (B·S, 128256) + (B·S, 8, 12300)
    logit temps. Falls back to dense logits when the backbone configures
    ``final_logit_softcapping`` (the fused path does not softcap).

    ``remat`` (fused path only) applies PER-LAYER activation checkpointing
    inside every transformer stack (`gpt.forward(remat=True)`) and leaves
    the chunked CE outside: per-layer is the granularity that actually
    bounds peak memory (one outer `jax.checkpoint` around the whole loss
    still materialises every layer's intermediates simultaneously during
    the recompute — and, wrapped around the chunked-CE scan, reproducibly
    crashes the remote-TPU AOT compiler). The dense path keeps the
    whole-loss checkpointing in `build_train_step`."""
    tokens = batch.grid[:, :-1]
    audio_labels = batch.grid[:, 1:, : cfg.tokens.num_codebooks]
    text_labels = batch.grid[:, 1:, -1]
    extra_mask = None
    if prefix_lm:
        # prefix = conditioning steps before the generated (loss) segment;
        # use the union of text/audio loss masks as the target segment.
        seg = jnp.logical_or(batch.text_loss_mask, batch.audio_loss_mask)
        extra_mask = prefix_lm_mask(seg, prefix_lm=True)
    if chunked_ce and cfg.backbone.final_logit_softcapping is None:
        a_labels, a_mask, dec_pos = audio_labels, batch.audio_loss_mask, None
        dropped = None
        if audio_capacity is not None:
            # run the local decoder + audio CE only on (up to C) audio rows
            dec_pos, valid = audio_gather_indices(
                batch.audio_loss_mask, audio_capacity)
            a_labels = jnp.take_along_axis(
                audio_labels, dec_pos[:, :, None], axis=1)
            a_mask = valid
            # audio-loss steps silently dropped by an undersized capacity:
            # rows with more audio steps than C lose the tail from BOTH the
            # loss numerator and denominator, so the loss value alone cannot
            # reveal the misconfiguration — surface it as a metric
            # (ADVICE r3 item 1).
            count = batch.audio_loss_mask.sum(axis=1, dtype=jnp.int32)
            dropped = jnp.maximum(count - audio_capacity, 0).sum()
        h_final, dec_h = unified.forward(
            params, cfg, tokens, audio_labels, batch.grid_mask,
            extra_mask=extra_mask, return_hidden=True, remat_layers=remat,
            remat_backbone=remat_backbone, remat_small=remat_small,
            decoder_positions=dec_pos,
        )
        loss, metrics = losses.unified_loss_fused(
            h_final, params["backbone"]["lm_head_w"], dec_h,
            params["audio_head"], text_labels, a_labels,
            batch.text_loss_mask, a_mask, residual_weights,
        )
        if dropped is not None:
            metrics["audio_dropped"] = dropped
        return loss, metrics
    text_logits, audio_logits = unified.forward(
        params, cfg, tokens, audio_labels, batch.grid_mask,
        extra_mask=extra_mask,
    )
    return losses.unified_loss(
        text_logits, audio_logits, text_labels, audio_labels,
        batch.text_loss_mask, batch.audio_loss_mask, residual_weights,
    )


def build_train_step(
    cfg: UnifiedModelConfig,
    tx: optax.GradientTransformation,
    *,
    prefix_lm: bool = False,
    residual_weights: Sequence[float] = (1.0,) * 7,
    remat: bool = True,
    remat_backbone: Optional[int] = None,
    remat_small: Optional[bool] = None,
    chunked_ce: bool = True,
    audio_capacity: Optional[int] = None,
):
    """Returns ``train_step(state, batch) -> (state, metrics)``, jittable.

    ``remat`` wraps the loss in `jax.checkpoint` (activation checkpointing,
    reference `--activation-checkpointing`, `arguments.py:68`).
    ``remat_backbone`` / ``remat_small`` (fused path only): selective
    overrides — checkpoint only k backbone layers / disable remat on the
    small stacks, trading spare HBM back into MFU (the r5 sweep,
    docs/bench_train_r5.md; see `unified.forward`).
    ``chunked_ce``: see `loss_fn`.
    ``audio_capacity``: static per-row audio-step capacity; runs the local
    decoder + audio CE only on gathered audio rows (`audio_gather_indices`)
    instead of densely over every position. Exact-loss-equivalent when
    >= every row's audio count (see docs/profile_train_r3.md for the
    measured step-time effect on the half-audio bench batch). Fused path
    only.
    """

    fused = chunked_ce and cfg.backbone.final_logit_softcapping is None

    def _loss(params, batch):
        return loss_fn(
            params, cfg, batch, prefix_lm=prefix_lm,
            residual_weights=residual_weights, chunked_ce=chunked_ce,
            remat=remat and fused,
            remat_backbone=remat_backbone if fused else None,
            remat_small=remat_small if fused else None,
            audio_capacity=audio_capacity if fused else None,
        )

    # fused path: remat is applied INSIDE loss_fn to the model forward only
    grad_source = jax.checkpoint(_loss) if (remat and not fused) else _loss

    def train_step(state: TrainState, batch: Batch):
        (loss, metrics), grads = jax.value_and_grad(grad_source, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
