"""Unified multi-stream audio language model.

TPU-native re-design of the reference's shipped model `Model_stage3`
(`/root/reference/llm_models/model_new.py:334-687`): a Llama-3.2-class global
backbone, a 3-layer *understanding* expert and a 2-layer *generation* expert
(both continuous-in/continuous-out), and a 4-layer local RQ-decoder that emits
8 audio codebooks per frame plus one text token (9 parallel streams).

Topology per step (reference `forward`, `model_new.py:402-454`):

    audio streams (8 cb)  --offset-embed--> masked-sum --> understanding expert
    text stream           --wte-----------------------+
                                                       v
                          mux by step kind  -->  global backbone
                                                       |
                              audio steps -> generation expert -> re-mux
                                                       |
                    h_final --> lm_head (text logits)  |
                    h_final --> local RQ-decoder: 8 sequential codebook steps

Everything is functional: parameters and KV caches are pytrees; the whole
frame step (backbone + experts + text sample + 8 local-decoder steps) is one
jit-compiled function with no host synchronisation, replacing the reference's
eager per-frame Python (`model_new.py:568-645`).
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import GPTConfig, UnifiedModelConfig
from uniaudio2_tpu.models import gpt
from uniaudio2_tpu.ops.kv_cache import KVCache, init_cache
from uniaudio2_tpu.ops.quant import (
    QuantizedLinear, QuantizedLinear4, QuantizedLinear4G, dequantize,
    dequantize4, dequantize4_grouped, matmul,
)
from uniaudio2_tpu.ops.sampling import cfg_mix, sample_topk

Params = Dict[str, Any]


class UnifiedCaches(NamedTuple):
    """KV caches for the three sequence-length-2048 stacks
    (reference `setup_caches`, `model_new.py:554-565`). The local decoder's
    8-step cache is created fresh inside each frame step."""

    backbone: KVCache
    understanding: KVCache
    generation: KVCache


def init_params(
    key: jax.Array, cfg: UnifiedModelConfig, dtype=jnp.float32
) -> Params:
    kb, kd, ku, kg, ke, kp, kh = jax.random.split(key, 7)
    bcfg, dcfg = cfg.backbone, cfg.decoder
    audio_vocab = cfg.tokens.audio_vocab
    ncb = cfg.tokens.num_codebooks

    def normal(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    return {
        "backbone": gpt.init_params(kb, bcfg, dtype),
        "decoder": gpt.init_params(kd, dcfg, dtype),
        "understanding_expert": gpt.init_params(ku, cfg.understanding_expert, dtype),
        "generation_expert": gpt.init_params(kg, cfg.generation_expert, dtype),
        # one big table with per-codebook offset k*audio_vocab
        # (reference model_new.py:347,665-673)
        "audio_embeddings": normal(ke, (audio_vocab * ncb, bcfg.n_embd)),
        "projection_w": normal(kp, (bcfg.n_embd, dcfg.n_embd)),
        "audio_head": normal(kh, (ncb, dcfg.n_embd, audio_vocab)),
    }


def init_caches(
    cfg: UnifiedModelConfig, batch: int, dtype=jnp.bfloat16,
    seq_len: Optional[int] = None, as_lists: bool = False,
) -> UnifiedCaches:
    """``seq_len`` overrides the config cap so the decode engine can size the
    cache to the actual bucket+frames budget — attention traffic then scales
    with the real sequence instead of always paying the 2048 ceiling (the
    static-shape analog of the reference's `input_pos_maxp1` slicing,
    `lit_model.py:141-145`).

    ``as_lists`` builds per-layer cache buffers to pair with unrolled
    per-layer weights (`ops/kv_cache.py` — removes the stacked-slice cache
    copies that dominate batched decode glue)."""
    s = seq_len or cfg.max_seq_len
    return UnifiedCaches(
        backbone=init_cache(cfg.backbone, batch, s, dtype, as_lists),
        understanding=init_cache(
            cfg.understanding_expert, batch, s, dtype, as_lists),
        generation=init_cache(
            cfg.generation_expert, batch, s, dtype, as_lists),
    )


def _qkv_chunk_width(gcfg, cap: int) -> "int | None":
    """Largest chunk width <= ``cap`` under the fused QKV kernel's
    eligibility rules (`ops/qkv_step.can_fuse`): every chunk must hold
    whole heads of exactly ONE of the q/k/v streams, so the width must
    divide both the q block (H*hd) and the k/v blocks (G*hd). E.g. the
    local decoder's 512-wide kv streams cap its qkv at 512 even when
    SERVING_CHUNK is 1024."""
    import math

    q_cols = gcfg.n_head * gcfg.head_size
    kv_cols = gcfg.n_query_groups * gcfg.head_size
    bc = math.gcd(math.gcd(q_cols, kv_cols), cap)
    return bc if bc >= 128 and bc % gcfg.head_size == 0 else None


def prepare_serving_params(params: Params, dtype=jnp.bfloat16,
                           unroll: bool = True,
                           cfg: "object | None" = None) -> Params:
    """Serving-time layout transforms (decode-throughput; semantics
    unchanged):

    1. Fold ``audio_embeddings @ projection_w`` into one gathered table.
       Inside the local RQ-decoder's 8 sequential microsteps the input is
       either the frame hidden state (microstep 0) or an audio-token
       embedding (microsteps 1..7), each pushed through the 3072->2048
       projection (reference `model_new.py:630-643`). The projection is
       linear, so for the embedding case it can be folded into the table
       once — removing a matmul (and its weight read + serial dependency)
       from 7 of the 8 microsteps per frame. ~400 MB of HBM at bf16;
       exactness is bf16 rounding of the same product.
    2. Unstack layer-stacked weights into per-layer buffers (and the
       stacked ``audio_head`` into per-codebook heads) so the decode loops
       unroll instead of `lax.scan`-slicing — each Pallas matmul then reads
       its weight straight from HBM with no materialized slice copy
       (`gpt.unstack_layers`; measured 1.7x weight-stream bandwidth).
    3. Chunk-major re-layout of the quantized output-chunked weights
       (`ops/quant.chunk_major`): every kernel block fetch becomes one
       contiguous DMA instead of K strided 512-byte bursts. Single-chip
       serving layout (like the unroll); disable with UA2_CHUNK_MAJOR=0.
    """
    emb = params["audio_embeddings"]
    w = params["projection_w"]
    if isinstance(w, QuantizedLinear):
        w = dequantize(w, jnp.float32)
    elif isinstance(w, QuantizedLinear4):
        w = dequantize4(w, jnp.float32)
    elif isinstance(w, QuantizedLinear4G):
        w = dequantize4_grouped(w, jnp.float32)

    @jax.jit
    def fold(emb, w):
        return jnp.einsum(
            "vd,de->ve", emb.astype(jnp.float32), w.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(dtype)

    out = dict(params)
    out["audio_embeddings_proj"] = fold(emb, w)
    if unroll:
        for sub in ("backbone", "decoder", "understanding_expert",
                    "generation_expert"):
            out[sub] = gpt.unstack_layers(out[sub])
        head = out["audio_head"]
        if not isinstance(head, list):
            ncb = jax.tree_util.tree_leaves(head)[0].shape[0]
            out["audio_head"] = [
                jax.tree_util.tree_map(lambda a: a[i], head)
                for i in range(ncb)
            ]
    if os.environ.get("UA2_INT4I", "1") != "0" and unroll:
        # Row-interleaved int4 re-layout: every int4 leaf (K-split and
        # column-packed alike) becomes `QuantizedLinearI4*`, whose kernels
        # replace the int32 nibble shift chain (~1.0 ms/frame of unhidden
        # VPU time, docs/profile_decode_r3.md) with one hardware bitcast.
        # Same quantized values + scales — a pure byte-order transform.
        # Disable with UA2_INT4I=0.
        from uniaudio2_tpu.ops.quant import to_interleaved

        ileaves = ("qkv_w", "attn_proj_w", "fc1_w", "fc2_w", "mlp_proj_w",
                   "lm_head_w")
        for sub in ("backbone", "decoder", "understanding_expert",
                    "generation_expert"):
            gp = dict(out[sub])
            if "lm_head_w" in gp:
                gp["lm_head_w"] = to_interleaved(gp["lm_head_w"])
            gp["layers"] = [
                {k: (to_interleaved(v) if k in ileaves else v)
                 for k, v in layer.items()}
                for layer in gp["layers"]
            ]
            out[sub] = gp
        out["audio_head"] = [to_interleaved(h) for h in out["audio_head"]]
        if hasattr(out.get("projection_w"), "values"):
            out["projection_w"] = to_interleaved(out["projection_w"])
    if os.environ.get("UA2_CHUNK_MAJOR", "1") != "0" and unroll:
        from uniaudio2_tpu.ops.quant import chunk_major

        from uniaudio2_tpu.ops.quant import SERVING_CHUNK

        # output-axis-chunked kernel operands only; mlp_proj_w stays
        # row-chunked (the fused kernel's W3 blocks are full-width
        # contiguous already) and stacked training layers are untouched.
        # fc1/fc2 may take a wider chunk than the rest (UA2_MLP_CHUNK —
        # the fused SwiGLU kernel raises its scoped-VMEM limit to match);
        # qkv_w takes the widest stream-aligned width when ``cfg`` is
        # given, else a conservative 512 (the fused QKV gate needs whole
        # streams per chunk — `_qkv_chunk_width`).
        mlp_bc = os.environ.get("UA2_MLP_CHUNK")
        base = {"fc1_w": int(mlp_bc), "fc2_w": int(mlp_bc)} if mlp_bc \
            else {}
        chunked = ("qkv_w", "attn_proj_w", "fc1_w", "fc2_w", "lm_head_w")
        for sub in ("backbone", "decoder", "understanding_expert",
                    "generation_expert"):
            widths = dict(base)
            gcfg = getattr(cfg, sub, None)
            widths["qkv_w"] = (_qkv_chunk_width(gcfg, SERVING_CHUNK)
                               if gcfg is not None
                               else min(SERVING_CHUNK, 512))
            gp = dict(out[sub])
            if "lm_head_w" in gp:
                gp["lm_head_w"] = chunk_major(gp["lm_head_w"])
            gp["layers"] = [
                {k: (chunk_major(v, widths.get(k)) if k in chunked else v)
                 for k, v in layer.items()}
                for layer in gp["layers"]
            ]
            out[sub] = gp
        # the audio_head GEMV profiles under the layer kernels at the
        # default width (65% of HBM peak, docs/profile_decode_r3.md): its
        # 12800-wide storage is not a power-of-two multiple, so widening
        # via the global default pads (+4-12% dead bytes). Pick the widest
        # PADDING-FREE divisor instead (2560 for the serving card; int8
        # halves the cap for VMEM). 1460->1476 tok/s measured.
        # UA2_HEAD_CHUNK overrides.
        def head_width(h):
            env = os.environ.get("UA2_HEAD_CHUNK")
            if env:
                return int(env)
            if not hasattr(h, "values") or h.values.ndim != 2:
                return None
            stored = h.values.shape[-1]
            from uniaudio2_tpu.ops.quant import (QuantizedLinearI4,
                                                 QuantizedLinearI4G)
            cap = 2560 if isinstance(h, (QuantizedLinearI4,
                                         QuantizedLinearI4G)) else 1280
            for bc in (2560, 2048, 1600, 1280, 1024, 512):
                if bc <= cap and stored % bc == 0:
                    return bc
            return None
        out["audio_head"] = [chunk_major(h, head_width(h))
                             for h in out["audio_head"]]
    return out


# ---------------------------------------------------------------------------
# Embedding / muxing helpers
# ---------------------------------------------------------------------------


def _embed_audio_streams(
    params: Params, cfg: UnifiedModelConfig, tokens: jax.Array
) -> jax.Array:
    """(B, S, K) audio ids -> (B, S, K, D) via per-codebook offsets
    (reference `_embed_audio_tokens` / `_embed_local_audio`,
    `model_new.py:653-673`; K is 8 for the input streams, 7 for the local
    decoder's shifted codebooks)."""
    k = tokens.shape[-1]
    offsets = jnp.arange(k, dtype=tokens.dtype) * cfg.tokens.audio_vocab
    return jnp.take(params["audio_embeddings"], tokens + offsets, axis=0)


def _fuse_input(
    params: Params, cfg: UnifiedModelConfig, tokens: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Shared stream-fusion front half of every forward flavour.

    Args:
        tokens: (B, S, 9) int; streams [0..7] audio codebooks, [8] text.
        mask: (B, S, 9) bool; True = stream active at this step.
    Returns:
        (audio_input, text_embeds, audio_step_mask, text_step_mask) where
        audio_input is the masked codebook-sum (B, S, D) and the step masks
        are (B, S, 1) floats.
    """
    dtype = params["audio_embeddings"].dtype
    audio_embeds = _embed_audio_streams(params, cfg, tokens[:, :, :-1])
    audio_stream_mask = mask[:, :, :-1, None].astype(dtype)
    audio_input = (audio_embeds * audio_stream_mask).sum(axis=2)  # (B,S,D)
    text_embeds = gpt.embed(params["backbone"], tokens[:, :, -1])
    audio_step_mask = mask[:, :, 0:1].astype(dtype)
    text_step_mask = mask[:, :, -1:].astype(dtype)
    return audio_input, text_embeds, audio_step_mask, text_step_mask


# ---------------------------------------------------------------------------
# Full-sequence forward (training semantics of reference `forward`,
# model_new.py:402-454)
# ---------------------------------------------------------------------------


def forward(
    params: Params,
    cfg: UnifiedModelConfig,
    tokens: jax.Array,
    labels: jax.Array,
    tokens_mask: jax.Array,
    *,
    extra_mask: Optional[jax.Array] = None,
    return_hidden: bool = False,
    remat_layers: bool = False,
    remat_backbone: "Optional[int]" = None,
    remat_small: Optional[bool] = None,
    decoder_positions: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Training forward.

    Mirrors `Model_stage3.forward` but returns *dense* local-decoder logits:
    the reference gathers only audio steps with a boolean index
    (`model_new.py:449` — data-dependent shape, hostile to XLA); here the
    local decoder by default runs at every step and the loss masks
    non-audio steps instead (same gradients, static shapes).

    ``decoder_positions`` (B, C) int32 recovers the reference's gather with
    a STATIC capacity C: the local decoder (and audio head / CE) runs only
    on the gathered rows — on mixed text+audio batches this cuts the
    decoder's work by the non-audio fraction (the decoder MLPs are ~40 % of
    the dense train step's device time, docs/profile_train_r3.md). The
    caller supplies per-row audio-step positions padded to C (see
    `trainer.audio_gather_indices`) and masks the loss with the matching
    validity mask; rows beyond C are dropped from the loss, so C must be
    >= the per-row audio count for exact parity with the dense path.

    Args:
        tokens: (B, S, 9); teacher-forced input grid (last dim: 8 audio + text).
        labels: (B, S, 8) next-step audio targets (codebooks) aligned so that
            labels[:, t] are the codes emitted *at* step t+1 of the grid, i.e.
            the reference's `labels` argument.
        tokens_mask: (B, S+1, 9) bool (one step longer: the reference slices
            `[:, :-1]` for inputs, `model_new.py:424-428`).
        remat_layers: per-layer activation checkpointing in every
            transformer stack (see `gpt.forward`).
        remat_backbone: override for the BACKBONE stack only — an int
            checkpoints that many of its layers (selective remat,
            `gpt.forward`); None follows ``remat_layers``.
        remat_small: override for the small stacks (experts + local
            decoder); None follows ``remat_layers``. The selective-remat
            sweep (docs/bench_train_r5.md) trades spare HBM back into MFU
            through these two knobs.
        return_hidden: return pre-head hidden states instead of logits —
            ``(h_final (B, S, D), dec_h (B·S, 8, D_dec))`` — for the
            chunked (logit-free) CE path (`train/chunked_ce.py`).
    Returns:
        text_logits (B, S, V_text), audio_logits (B, S, 8, V_audio) —
        or the hidden-state pair under ``return_hidden``.
    """
    remat_bb = remat_layers if remat_backbone is None else remat_backbone
    remat_sm = remat_layers if remat_small is None else remat_small
    in_mask = tokens_mask[:, :-1, :]
    audio_input, text_embeds, a_mask, t_mask = _fuse_input(
        params, cfg, tokens, in_mask
    )
    h_audio = gpt.forward(
        params["understanding_expert"], cfg.understanding_expert, audio_input,
        extra_mask=extra_mask, remat=remat_sm,
    )
    backbone_input = h_audio * a_mask + text_embeds * t_mask
    h = gpt.forward(params["backbone"], cfg.backbone, backbone_input,
                    extra_mask=extra_mask, remat=remat_bb)
    h_gen = gpt.forward(
        params["generation_expert"], cfg.generation_expert, h * a_mask,
        extra_mask=extra_mask, remat=remat_sm,
    )
    h_final = h_gen * a_mask + h * t_mask
    dec_in, dec_labels = h_final, labels
    if decoder_positions is not None:
        idx = decoder_positions[:, :, None]
        dec_in = jnp.take_along_axis(h_final, idx, axis=1)       # (B, C, D)
        dec_labels = jnp.take_along_axis(labels, idx, axis=1)    # (B, C, 8)
    if return_hidden:
        dec_h = _local_decoder_teacher_forced(
            params, cfg, dec_in, dec_labels, return_hidden=True,
            remat=remat_sm)
        return h_final, dec_h
    text_logits = gpt.lm_head(params["backbone"], h_final, cfg.backbone)

    audio_logits = _local_decoder_teacher_forced(params, cfg, dec_in,
                                                 dec_labels)
    return text_logits, audio_logits


def _local_decoder_teacher_forced(
    params: Params, cfg: UnifiedModelConfig, h_final: jax.Array,
    labels: jax.Array, return_hidden: bool = False, remat: bool = False,
) -> jax.Array:
    """Local RQ-decoder over every timestep in parallel (training).

    Input sequence per step t: ``[h_final[t]; embed(labels[t, 0:7])]`` — an
    8-long causal sequence scored by the per-codebook heads via einsum
    (reference `model_new.py:447-453`). Steps are folded into the batch so the
    decoder sees (B*S, 8, D): one big MXU-friendly batch instead of a gather.
    """
    b, s, d_b = h_final.shape
    ncb = cfg.tokens.num_codebooks
    local_embeds = _embed_audio_streams(params, cfg, labels[:, :, : ncb - 1])
    curr = jnp.concatenate([h_final[:, :, None, :], local_embeds], axis=2)
    curr = curr.reshape(b * s, ncb, d_b)
    proj = matmul(curr, params["projection_w"])
    dec_h = gpt.forward(params["decoder"], cfg.decoder, proj, remat=remat)
    if return_hidden:
        return dec_h                     # (B·S, ncb, D_dec), pre-head
    logits = jnp.einsum(
        "bnd,ndv->bnv", dec_h, params["audio_head"],
        preferred_element_type=jnp.float32,
    )
    return logits.reshape(b, s, ncb, -1)


def forward_text(
    params: Params,
    cfg: UnifiedModelConfig,
    tokens: jax.Array,
    tokens_mask: jax.Array,
) -> jax.Array:
    """Text-logits-only forward (reference `forward_text`,
    `model_new.py:509-552`; mask is not shifted)."""
    audio_input, text_embeds, a_mask, t_mask = _fuse_input(
        params, cfg, tokens, tokens_mask
    )
    h_audio = gpt.forward(
        params["understanding_expert"], cfg.understanding_expert, audio_input
    )
    backbone_input = h_audio * a_mask + text_embeds * t_mask
    h = gpt.forward(params["backbone"], cfg.backbone, backbone_input)
    h_gen = gpt.forward(params["generation_expert"], cfg.generation_expert, h * a_mask)
    h_final = h_gen * a_mask + h * t_mask
    return gpt.lm_head(params["backbone"], h_final, cfg.backbone)


# ---------------------------------------------------------------------------
# Prefill (fills the three KV caches over a padded prompt block)
# ---------------------------------------------------------------------------


def prefill(
    params: Params,
    cfg: UnifiedModelConfig,
    tokens: jax.Array,
    tokens_mask: jax.Array,
    caches: UnifiedCaches,
    key_valid: Optional[jax.Array] = None,
) -> UnifiedCaches:
    """Run the prompt (B, S, 9) through experts+backbone at positions [0, S),
    filling the caches (reference `forward_prefix`, `model_new.py:456-507`;
    the local decoder is skipped — its outputs are unused during prefill).

    S may be a padded bucket length; causal masking keeps padded tail
    positions from affecting valid ones, and sequential decode overwrites
    them before they are ever attended.
    """
    audio_input, text_embeds, a_mask, t_mask = _fuse_input(
        params, cfg, tokens, tokens_mask
    )
    extra = None
    if key_valid is not None:
        # (B, S) slot validity -> (B, 1->T, S) key mask for every query
        extra = key_valid[:, None, :]
    h_audio, und_cache = gpt.prefill(
        params["understanding_expert"], cfg.understanding_expert,
        audio_input, caches.understanding, extra_mask=extra,
    )
    backbone_input = h_audio * a_mask + text_embeds * t_mask
    h, bb_cache = gpt.prefill(
        params["backbone"], cfg.backbone, backbone_input, caches.backbone,
        extra_mask=extra,
    )
    _, gen_cache = gpt.prefill(
        params["generation_expert"], cfg.generation_expert, h * a_mask,
        caches.generation, extra_mask=extra,
    )
    return UnifiedCaches(bb_cache, und_cache, gen_cache)


# ---------------------------------------------------------------------------
# One autoregressive frame (reference `generate_frame`, model_new.py:568-645)
# ---------------------------------------------------------------------------


def decode_hidden(
    params: Params,
    cfg: UnifiedModelConfig,
    tokens: jax.Array,
    tokens_mask: jax.Array,
    caches: UnifiedCaches,
    pos: jax.Array,
    key_valid: Optional[jax.Array] = None,
    attn_block: Optional[int] = None,
    kv_write: str = "inline",
) -> Tuple[jax.Array, UnifiedCaches]:
    """Shared expert/backbone half of one AR step: (B, 1, 9) tokens at
    ``pos`` -> (last hidden state (B, D), updated caches). Used by both the
    fully-compiled frame loop and the host-driven beam/ngram decoders (which
    need raw logits between steps). ``attn_block`` bounds attention reads
    to the filled cache prefix; ``kv_write`` selects per-layer inline cache
    writes or the coalesced deferred frame write (see `gpt.decode_step`)."""
    audio_input, text_embeds, a_mask, t_mask = _fuse_input(
        params, cfg, tokens, tokens_mask
    )
    h_audio, und_cache = gpt.decode_step(
        params["understanding_expert"], cfg.understanding_expert,
        audio_input, caches.understanding, pos, key_valid=key_valid,
        attn_block=attn_block, kv_write=kv_write,
    )
    backbone_input = h_audio * a_mask + text_embeds * t_mask
    h, bb_cache = gpt.decode_step(
        params["backbone"], cfg.backbone, backbone_input, caches.backbone, pos,
        key_valid=key_valid, attn_block=attn_block, kv_write=kv_write,
    )
    h_gen, gen_cache = gpt.decode_step(
        params["generation_expert"], cfg.generation_expert, h * a_mask,
        caches.generation, pos, key_valid=key_valid, attn_block=attn_block,
        kv_write=kv_write,
    )
    h_final = h_gen * a_mask + h * t_mask
    return h_final[:, -1, :], UnifiedCaches(bb_cache, und_cache, gen_cache)


def decode_frame(
    params: Params,
    cfg: UnifiedModelConfig,
    tokens: jax.Array,
    tokens_mask: jax.Array,
    caches: UnifiedCaches,
    pos: jax.Array,
    key: jax.Array,
    *,
    temperature: float,
    topk: int,
    forbid_prefix: jax.Array,
    use_cfg: bool = False,
    cfg_scale: Optional[jax.Array] = None,
    key_valid: Optional[jax.Array] = None,
    sample_text: bool = True,
    sample_audio: bool = True,
    approx_topk: bool = False,
    attn_block: Optional[int] = None,
    kv_write: str = "inline",
) -> Tuple[jax.Array, UnifiedCaches]:
    """One AR step: consume the previous frame's (B, 1, 9) tokens at position
    ``pos``, return the next frame's (B, 9) tokens [text, cb0..cb7] — note the
    reference returns text first (`model_new.py:624`).

    ``forbid_prefix`` is a traced scalar: 0 during the reasoning phase,
    ``audio_reason_card`` during the semantic phase (two-phase audio decode,
    reference `tts_task.py:261-266`).

    With ``use_cfg`` the batch is interleaved [cond_0, uncond_0, cond_1,
    uncond_1, ...] row pairs (2 rows per utterance — the single-utterance
    case is B=2); per pair the logits are mixed with `cfg_mix` and the
    sampled token is broadcast to both rows (reference `model_new.py:618-637`,
    batch-2 trick `tts_task.py:232-236`).

    ``sample_text`` / ``sample_audio`` gate the two output heads: the
    reference always runs BOTH per frame and throws one away — text tasks
    never read the 8 local-decoder tokens (`asr_task.py:673-680`) and
    two-phase audio tasks never read the text token (`tts_task.py:275-277`).
    Skipping the unused head removes its entire weight traffic from the
    bandwidth-bound frame (~45 % for text decoding, ~6 % for audio); the
    skipped streams return zeros.
    """
    b = tokens.shape[0]
    last_h, new_caches = decode_hidden(params, cfg, tokens, tokens_mask, caches, pos,
                                       key_valid=key_valid,
                                       attn_block=attn_block,
                                       kv_write=kv_write)
    bb_cache, und_cache, gen_cache = (
        new_caches.backbone, new_caches.understanding, new_caches.generation
    )

    if key.ndim == 2:
        # per-row key streams (B, 2): each row's randomness depends only on
        # its own key, never on batch composition (server reproducibility)
        key_text = jax.vmap(jax.random.fold_in, (0, None))(key, 0)
        key_audio = jax.vmap(jax.random.fold_in, (0, None))(key, 1)
    else:
        key_text, key_audio = jax.random.split(key)
    if sample_text:
        text_logits = gpt.lm_head(params["backbone"], last_h, cfg.backbone)  # (B, V_text)
        if use_cfg:
            lg = text_logits.reshape(b // 2, 2, -1)
            mixed = cfg_mix(lg[:, 0], lg[:, 1], cfg_scale)
            kt = key_text[0::2] if key_text.ndim == 2 else key_text
            text_sample = sample_topk(kt, mixed, topk, temperature,
                                      approx=approx_topk)
            text_sample = jnp.repeat(text_sample, 2, axis=0)  # (B,)
        else:
            text_sample = sample_topk(key_text, text_logits, topk, temperature,
                                      approx=approx_topk)
    else:
        text_sample = jnp.zeros((b,), jnp.int32)

    if sample_audio:
        audio_samples = _local_decoder_generate(
            params, cfg, last_h, key_audio,
            temperature=temperature, topk=topk, forbid_prefix=forbid_prefix,
            use_cfg=use_cfg, cfg_scale=cfg_scale, approx_topk=approx_topk,
        )
    else:
        audio_samples = jnp.zeros((b, cfg.tokens.num_codebooks), jnp.int32)
    frame = jnp.concatenate([text_sample[:, None], audio_samples], axis=1)
    return frame, UnifiedCaches(bb_cache, und_cache, gen_cache)


def _local_decoder_generate(
    params: Params,
    cfg: UnifiedModelConfig,
    last_h: jax.Array,
    key: jax.Array,
    *,
    temperature: float,
    topk: int,
    forbid_prefix: jax.Array,
    use_cfg: bool,
    cfg_scale: Optional[jax.Array],
    approx_topk: bool = False,
) -> jax.Array:
    """8 sequential local-decoder steps with a fresh 8-slot KV cache
    (the reference resets the decoder cache every frame,
    `model_new.py:629-643`). Implemented as `lax.scan` over codebooks with the
    stacked `audio_head` as scan inputs — one compiled step body.

    With serving params (`prepare_serving_params`) the per-microstep
    3072->2048 projection of the sampled token's embedding is a single
    pre-folded table gather; only microstep 0 (the frame hidden state) still
    multiplies by ``projection_w``.

    Returns (B, 8) sampled codebook ids."""
    b = last_h.shape[0]
    dcfg = cfg.decoder
    ncb = cfg.tokens.num_codebooks
    dec_cache = init_cache(dcfg, b, ncb, dtype=last_h.dtype)
    audio_vocab = cfg.tokens.audio_vocab
    cb_offsets = jnp.arange(ncb, dtype=jnp.int32) * audio_vocab
    if key.ndim == 2:   # (B, 2) per-row keys -> (ncb, B, 2)
        keys = jax.vmap(
            lambda i: jax.vmap(jax.random.fold_in, (0, None))(key, i)
        )(jnp.arange(ncb))
    else:
        keys = jax.random.split(key, ncb)
    proj_table = params.get("audio_embeddings_proj")

    # Per-pair forbid_prefix for interleaved CFG rows (pairs share phase
    # state by construction — both rows are fed the same sampled frame).
    fp_pair = forbid_prefix
    if use_cfg and getattr(forbid_prefix, "ndim", 0) >= 1 \
            and forbid_prefix.shape and forbid_prefix.shape[0] == b:
        fp_pair = forbid_prefix[::2]

    def step(carry, xs):
        curr_h, cache = carry
        head_i, offset_i, key_i, i = xs
        if proj_table is None:
            proj = matmul(curr_h, params["projection_w"])
        else:
            proj = curr_h  # already in decoder space (folded table / h0 proj)
        dec_h, cache = gpt.decode_step(params["decoder"], dcfg, proj, cache, i)
        logits = matmul(dec_h[:, -1, :], head_i, out_dtype=jnp.float32)
        if use_cfg:
            lg = logits.reshape(b // 2, 2, -1)
            mixed = cfg_mix(lg[:, 0], lg[:, 1], cfg_scale)
            ki = key_i[0::2] if key_i.ndim == 2 else key_i
            sample = sample_topk(
                ki, mixed, topk, temperature, forbid_prefix=fp_pair,
                approx=approx_topk,
            )
            sample = jnp.repeat(sample, 2, axis=0)  # (B,)
        else:
            sample = sample_topk(
                key_i, logits, topk, temperature,
                forbid_prefix=forbid_prefix, approx=approx_topk,
            )
        table = params["audio_embeddings"] if proj_table is None else proj_table
        next_h = jnp.take(table, sample + offset_i, axis=0)
        return (next_h[:, None, :], cache), sample

    h0 = last_h
    if proj_table is not None:
        h0 = matmul(last_h, params["projection_w"]).astype(proj_table.dtype)
    heads = params["audio_head"]
    if isinstance(heads, list):
        # unrolled serving form (see `prepare_serving_params`): per-codebook
        # head buffers, trace-time loop — no scan-slice copies of the 8x-read
        # decoder/head weights
        carry = (h0[:, None, :], dec_cache)
        samples = []
        for i in range(ncb):
            carry, s = step(
                carry, (heads[i], cb_offsets[i], keys[i], jnp.int32(i))
            )
            samples.append(s)
        return jnp.stack(samples, axis=1)  # (B, 8)
    xs = (heads, cb_offsets, keys, jnp.arange(ncb, dtype=jnp.int32))
    (_, _), samples = jax.lax.scan(step, (h0[:, None, :], dec_cache), xs)
    return samples.T  # (B, 8)
