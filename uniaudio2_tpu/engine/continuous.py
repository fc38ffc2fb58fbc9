"""Continuous batching: slot-level admission into a running batched decode.

The static batched path (`decode.py::_build_generate_batched`) runs one
fixed request set to completion — short rows idle while the longest row
finishes. This module adds iteration-level scheduling (the vLLM-class
serving discipline) on top of the same compiled-loop design:

* the decode loop runs in SEGMENTS (`seg_frames` frames per compiled
  call) over a B-row batch with per-row two-phase/EOS/budget state; the
  ONLINE scheduler picks each boundary's segment length from an adaptive
  LADDER (short right after an admission so the new request's first
  frames surface in ~2 frames, medium while a free row awaits arrivals,
  full when saturated) and switches to a row-free-REACTIVE program (early
  exit the frame a row completes) when a request is queued behind a full
  batch — the round-5 TTFT-tail levers (docs/serving_latency_r5.md);
  correctness is segmentation-invariant (the PRNG advances per frame, not
  per segment), tested by token identity across ladder settings;
* refills are FUSED into the segment program: up to B queued prompts are
  written into freed rows in a `lax.cond`-guarded prologue, then the
  segment decodes — one host dispatch per boundary. A refill writes the
  new prompt's K/V so the prompt ENDS at the current shared decode
  position (left-packed: RoPE is relative, so ending the prompt at the
  current position reproduces batch-start geometry exactly) and flips the
  row's ``valid_from`` cache mask;
* once the queue is empty the host issues ONE `drain` call — a
  `while_loop` that decodes until every row hits EOS / its frame budget /
  the cache end — so the tail costs a single dispatch (host round trips
  through the remote-TPU tunnel cost ~60 ms each; see
  `scripts/bench_continuous.py`);
* when every slot drains and queued work remains unadmittable, the
  shared position resets to the prompt bucket (cache slots are a bounded
  budget; admission requires ``remaining frames >= request.max_frames``).

All per-frame outputs leave the device as ONE packed int32 slab
(B, K, ncb+3): [text, audio x ncb, phase, done] — one transfer per call.

Correctness invariant (tested): a request admitted into a running batch
produces token-identical greedy output to the same request decoded alone.

CFG (``use_cfg=True``, audio mode): rows are [cond, uncond] *pairs* —
admission writes a request's prompt into row 2p and its pad-substituted
negative prompt (reference `tts_task.py:171-189`) into row 2p+1 in the
same refill prologue, per-pair logits are mixed inside
`unified.decode_frame` (`model_new.py:619-637` semantics) and the sampled
frame is broadcast to both rows, so pairs stay in lockstep and free
together. Sampling parameters are per-engine, like one compiled program
(requests wanting different temperature/topk go to different
`ContinuousEngine`s or the `BatchingServer`).
"""

from __future__ import annotations

import queue
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine.decode import PHASE_DROPPED, PHASE_REASON, \
    PHASE_SEMANTIC, split_two_phase
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.models.unified import UnifiedCaches
from uniaudio2_tpu.ops.kv_cache import QuantKV

Params = Dict[str, Any]


class SlotState(NamedTuple):
    """Device-side per-batch decode state threaded through segments."""

    pos: jax.Array             # i32 scalar: next decode position (shared)
    active: jax.Array          # (B,) bool — slot holds a live request
    frame_tokens: jax.Array    # (B, 1, 9)
    frame_mask: jax.Array      # (B, 1, 9)
    is_reason: jax.Array       # (B,) bool
    forbid_prefix: jax.Array   # (B,) i32
    valid_from: jax.Array      # (B,) i32 — first valid cache slot per row
    stop_at: jax.Array         # (B,) i32 — force-finish position (budget)
    key: jax.Array
    caches: UnifiedCaches


def _refill_one(params: Params, cfg: UnifiedModelConfig, s: SlotState,
                row: jax.Array, grid: jax.Array, grid_mask: jax.Array,
                length: jax.Array, max_frames: jax.Array,
                bucket: int, attn_block: int = 0) -> SlotState:
    """Write one queued request's prompt into ``row``. Grid slot i maps to
    position start+i with the LAST real token (slot bucket-1) landing at
    s.pos — it is fed as the first frame input there by the decode loop,
    mirroring the static batched start (grid[:, -1:] fed at slot bucket-1,
    decode.py:283,308)."""
    start = s.pos - jnp.int32(bucket - 1)   # position of grid slot 0
    cache_len = s.caches.backbone.max_seq
    slot_idx = jnp.arange(cache_len, dtype=jnp.int32)
    valid_from_row = s.pos - length + 1     # first real-token position
    key_valid_row = (slot_idx[None, :] >= valid_from_row)[..., :]

    def _row_slice(a, batch_axis):
        return jax.lax.dynamic_slice_in_dim(a, row, 1, axis=batch_axis)

    def _row_splice(a, p, batch_axis):
        return jax.lax.dynamic_update_slice_in_dim(a, p, row,
                                                   axis=batch_axis)

    # batch axis: values (…, B, G, S, hd) -> ndim-4; QuantKV scales drop
    # the trailing head axis -> ndim-3 (stacked and per-layer list forms)
    def _entry(op):
        def apply(e, *rest):
            if isinstance(e, QuantKV):
                return QuantKV(
                    op(e.q, *(r.q for r in rest), e.q.ndim - 4),
                    op(e.s, *(r.s for r in rest), e.s.ndim - 3))
            return op(e, *rest, e.ndim - 4)
        return apply

    def slice_cache(c):
        return jax.tree_util.tree_map(
            _entry(_row_slice), c, is_leaf=lambda x: isinstance(x, QuantKV))

    def splice_cache(full, part):
        return jax.tree_util.tree_map(
            _entry(_row_splice), full, part,
            is_leaf=lambda x: isinstance(x, QuantKV))

    row_caches = slice_cache(s.caches)
    # run the bucket-1 prompt prefix through the decode path at offset
    # positions [start, start+bucket-1); causal masking keeps pad slots
    # from contaminating real ones, and key_valid hides them after
    _, row_caches = unified.decode_hidden(
        params, cfg, grid[:, :-1], grid_mask[:, :-1], row_caches,
        start, key_valid=key_valid_row, attn_block=attn_block,
    )
    caches = splice_cache(s.caches, row_caches)

    def set_row(a, v):
        return jax.lax.dynamic_update_slice_in_dim(
            a, jnp.asarray(v, a.dtype)[None], row, axis=0)

    return s._replace(
        caches=caches,
        active=set_row(s.active, True),
        frame_tokens=jax.lax.dynamic_update_slice_in_dim(
            s.frame_tokens, grid[:, -1:], row, axis=0),
        frame_mask=jax.lax.dynamic_update_slice_in_dim(
            s.frame_mask, grid_mask[:, -1:], row, axis=0),
        is_reason=set_row(s.is_reason, True),
        forbid_prefix=set_row(s.forbid_prefix, 0),
        valid_from=set_row(s.valid_from, valid_from_row),
        stop_at=set_row(s.stop_at, s.pos + max_frames),
    )


def _make_frame_body(cfg: UnifiedModelConfig, *, mode: str,
                     temperature: float, topk: int,
                     use_cfg: bool = False, cfg_scale: float = 1.0,
                     attn_block: int = 0, kv_write: str = "inline"):
    """One decode frame over the batch -> (state, per-row packed outputs
    (B, ncb+3) int32: [text, audio x ncb, phase, done]). With ``use_cfg``
    the rows are interleaved [cond, uncond] pairs (guidance mixing inside
    `decode_frame`; both rows receive the same sampled frame)."""
    ts = cfg.tokens
    ncb = ts.num_codebooks

    def frame_body(params: Params, s: SlotState, slot_idx: jax.Array):
        b = s.active.shape[0]
        key, sub = jax.random.split(s.key)
        key_valid = slot_idx[None, :] >= s.valid_from[:, None]
        frame, caches = unified.decode_frame(
            params, cfg, s.frame_tokens, s.frame_mask, s.caches, s.pos,
            sub, temperature=temperature, topk=topk,
            forbid_prefix=s.forbid_prefix[:, None],
            use_cfg=use_cfg, cfg_scale=jnp.float32(cfg_scale),
            key_valid=key_valid, attn_block=attn_block,
            kv_write=kv_write,
            sample_text=mode == "text", sample_audio=mode == "audio",
        )
        text_tok = frame[:, 0]
        audio_toks = frame[:, 1:]
        cap_hit = s.pos + 1 >= s.stop_at        # (B,) budget exhausted

        if mode == "text":
            eos_now = text_tok == ts.text_eos
            done_now = s.active & (eos_now | cap_hit)
            active = s.active & ~done_now
            emit = jnp.where(s.active & ~eos_now, text_tok, -1)
            fb_tokens = jnp.concatenate(
                [jnp.zeros((b, ncb), jnp.int32), text_tok[:, None]], 1
            )[:, None, :]
            fb_mask = jnp.concatenate(
                [jnp.zeros((b, ncb), bool), jnp.ones((b, 1), bool)], 1
            )[:, None, :]
            packed = jnp.concatenate([
                emit[:, None], jnp.zeros((b, ncb), jnp.int32),
                jnp.full((b, 1), PHASE_DROPPED, jnp.int32),
                done_now[:, None].astype(jnp.int32),
            ], axis=1)
            new = s._replace(
                pos=s.pos + 1, active=active, frame_tokens=fb_tokens,
                frame_mask=fb_mask, key=key, caches=caches,
            )
            return new, packed

        sem_eos = jnp.all(
            audio_toks == (ts.semantic_eos + ts.audio_reason_card), axis=1
        )
        reason_eos_frame = jnp.all(audio_toks == ts.reason_eos, axis=1)
        switch = s.is_reason & reason_eos_frame
        done_now = s.active & (sem_eos | cap_hit)
        active = s.active & ~done_now
        save_now = s.active & ~switch & ~sem_eos
        new_is_reason = s.is_reason & ~switch
        phase = jnp.where(
            save_now,
            jnp.where(new_is_reason, PHASE_REASON, PHASE_SEMANTIC),
            PHASE_DROPPED,
        )
        new_forbid = jnp.where(
            switch, jnp.int32(ts.audio_reason_card), s.forbid_prefix
        )
        fb_tokens = jnp.concatenate(
            [audio_toks, text_tok[:, None]], 1)[:, None, :]
        fb_mask = jnp.concatenate(
            [jnp.ones((b, ncb), bool), jnp.zeros((b, 1), bool)], 1
        )[:, None, :]
        packed = jnp.concatenate([
            jnp.where(s.active, text_tok, -1)[:, None], audio_toks,
            phase[:, None], done_now[:, None].astype(jnp.int32),
        ], axis=1)
        new = s._replace(
            pos=s.pos + 1, active=active, frame_tokens=fb_tokens,
            frame_mask=fb_mask, is_reason=new_is_reason,
            forbid_prefix=new_forbid, key=key, caches=caches,
        )
        return new, packed

    return frame_body


def _build_segment(cfg: UnifiedModelConfig, *, mode: str, bucket: int,
                   seg_frames: int, temperature: float, topk: int,
                   use_cfg: bool = False, cfg_scale: float = 1.0,
                   attn_block: int = 0, kv_write: str = "inline"):
    """Fused refill prologue + K decode frames. ``r_rows[i] < 0`` marks an
    unused refill lane (the `lax.cond` skips its prefill entirely). A CFG
    request simply occupies two lanes (cond row 2p, uncond row 2p+1)."""
    frame_body = _make_frame_body(cfg, mode=mode, temperature=temperature,
                                  topk=topk, use_cfg=use_cfg,
                                  cfg_scale=cfg_scale, attn_block=attn_block,
                                  kv_write=kv_write)

    def segment(params: Params, s: SlotState, r_rows: jax.Array,
                r_grids: jax.Array, r_masks: jax.Array, r_lens: jax.Array,
                r_caps: jax.Array):
        cache_len = s.caches.backbone.max_seq
        slot_idx = jnp.arange(cache_len, dtype=jnp.int32)
        n_lanes = r_rows.shape[0]

        def apply(i, s):
            return jax.lax.cond(
                r_rows[i] >= 0,
                lambda s: _refill_one(
                    params, cfg, s, jnp.maximum(r_rows[i], 0),
                    jax.lax.dynamic_slice_in_dim(r_grids, i, 1, axis=0),
                    jax.lax.dynamic_slice_in_dim(r_masks, i, 1, axis=0),
                    r_lens[i], r_caps[i], bucket, attn_block),
                lambda s: s,
                s,
            )

        s = jax.lax.fori_loop(0, n_lanes, apply, s)

        def body(carry, _):
            s = carry
            return frame_body(params, s, slot_idx)

        s, slab = jax.lax.scan(body, s, None, length=seg_frames)
        return s, jnp.transpose(slab, (1, 0, 2))  # (B, K, ncb+3)

    return segment


def _build_segment_reactive(cfg: UnifiedModelConfig, *, mode: str,
                            seg_frames: int, temperature: float, topk: int,
                            use_cfg: bool = False, cfg_scale: float = 1.0,
                            attn_block: int = 0, kv_write: str = "inline"):
    """Row-free-reactive segment: decode up to ``seg_frames`` frames but
    RETURN EARLY the moment any row completes. Used when the queue holds a
    request waiting for a row — the host then admits at the exact frame the
    row frees instead of up to a full segment later (the TTFT-p99
    slot-wait component, docs/serving_latency_r4.md). No refill prologue:
    this program only runs when nothing is admissible. Returns
    (state, slab (B, seg_frames, C), n_steps)."""
    ncb = cfg.tokens.num_codebooks
    frame_body = _make_frame_body(cfg, mode=mode, temperature=temperature,
                                  topk=topk, use_cfg=use_cfg,
                                  cfg_scale=cfg_scale, attn_block=attn_block,
                                  kv_write=kv_write)

    def segment(params: Params, s: SlotState):
        cache_len = s.caches.backbone.max_seq
        slot_idx = jnp.arange(cache_len, dtype=jnp.int32)
        b = s.active.shape[0]
        slab0 = jnp.zeros((b, seg_frames, ncb + 3), jnp.int32)

        def cond(c):
            step, s, _, freed = c
            return ((step < seg_frames) & ~freed
                    & jnp.any(s.active) & (s.pos < cache_len - 1))

        def body(c):
            step, s, slab, freed = c
            s, packed = frame_body(params, s, slot_idx)
            slab = jax.lax.dynamic_update_slice_in_dim(
                slab, packed[:, None, :], step, axis=1)
            freed = freed | jnp.any(packed[:, ncb + 2] > 0)
            return step + 1, s, slab, freed

        steps, s, slab, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), s, slab0, jnp.bool_(False)))
        return s, slab, steps

    return segment


def _build_drain(cfg: UnifiedModelConfig, *, mode: str, drain_cap: int,
                 temperature: float, topk: int,
                 use_cfg: bool = False, cfg_scale: float = 1.0,
                 attn_block: int = 0, kv_write: str = "inline"):
    """Decode until every row is inactive or the cache budget ends — the
    whole tail in one dispatch. Returns (state, slab (B, drain_cap, C),
    n_steps)."""
    ncb = cfg.tokens.num_codebooks
    frame_body = _make_frame_body(cfg, mode=mode, temperature=temperature,
                                  topk=topk, use_cfg=use_cfg,
                                  cfg_scale=cfg_scale, attn_block=attn_block,
                                  kv_write=kv_write)

    def drain(params: Params, s: SlotState):
        cache_len = s.caches.backbone.max_seq
        slot_idx = jnp.arange(cache_len, dtype=jnp.int32)
        b = s.active.shape[0]
        slab0 = jnp.zeros((b, drain_cap, ncb + 3), jnp.int32)

        def cond(c):
            step, s, _ = c
            return (jnp.any(s.active)
                    & (step < drain_cap)
                    & (s.pos < cache_len - 1))

        def body(c):
            step, s, slab = c
            s, packed = frame_body(params, s, slot_idx)
            slab = jax.lax.dynamic_update_slice_in_dim(
                slab, packed[:, None, :], step, axis=1)
            return step + 1, s, slab

        steps, s, slab = jax.lax.while_loop(
            cond, body, (jnp.int32(0), s, slab0))
        return s, slab, steps

    return drain


def _build_offline(cfg: UnifiedModelConfig, *, mode: str, bucket: int,
                   out_cap: int, temperature: float, topk: int,
                   use_cfg: bool = False, cfg_scale: float = 1.0,
                   attn_block: int = 0, kv_write: str = "inline"):
    """Fully in-graph continuous batching over a fixed request list: ONE
    dispatch decodes Q requests through B rows, admitting the next queued
    prompt into a row the frame after the row frees (refill-on-completion
    inside the `while_loop`). This is the offline/batch-eval throughput
    path — the host never intervenes, so scheduling costs zero round trips
    (the segment/drain path above exists for ONLINE serving where requests
    arrive over time).

    Returns (slab (Q, out_cap, ncb+3), n_frames (Q,)). Rows dump inactive
    frames into a scratch request index Q."""
    ncb = cfg.tokens.num_codebooks
    pair = 2 if use_cfg else 1
    frame_body = _make_frame_body(cfg, mode=mode, temperature=temperature,
                                  topk=topk, use_cfg=use_cfg,
                                  cfg_scale=cfg_scale, attn_block=attn_block,
                                  kv_write=kv_write)

    def offline(params: Params, s: SlotState, q_grids: jax.Array,
                q_masks: jax.Array, q_lens: jax.Array, q_caps: jax.Array):
        # with use_cfg, q_grids/q_masks are (Q, 2, bucket, 9): [cond, uncond]
        n_q = q_grids.shape[0]
        b = s.active.shape[0]
        cache_len = s.caches.backbone.max_seq
        slot_idx = jnp.arange(cache_len, dtype=jnp.int32)
        rows_idx = jnp.arange(b, dtype=jnp.int32)

        class C(NamedTuple):
            s: SlotState
            next_q: jax.Array      # i32
            row_req: jax.Array     # (B,) i32, -1 = empty
            row_frame: jax.Array   # (B,) i32 frames emitted for the row
            out: jax.Array         # (Q+1, out_cap, ncb+3)
            n_frames: jax.Array    # (Q,)

        def admit_row(p, c):
            r = p * pair          # CFG: admit into the pair (2p, 2p+1)
            can = ((c.row_req[r] < 0)
                   & (c.next_q < n_q)
                   & (cache_len - 1 - c.s.pos
                      >= q_caps[jnp.minimum(c.next_q, n_q - 1)]))

            def do(c):
                qi = jnp.minimum(c.next_q, n_q - 1)
                if use_cfg:
                    s = _refill_one(
                        params, cfg, c.s, r,
                        jax.lax.dynamic_slice_in_dim(q_grids[:, 0], qi, 1, 0),
                        jax.lax.dynamic_slice_in_dim(q_masks[:, 0], qi, 1, 0),
                        q_lens[qi], q_caps[qi], bucket, attn_block)
                    s = _refill_one(
                        params, cfg, s, r + 1,
                        jax.lax.dynamic_slice_in_dim(q_grids[:, 1], qi, 1, 0),
                        jax.lax.dynamic_slice_in_dim(q_masks[:, 1], qi, 1, 0),
                        q_lens[qi], q_caps[qi], bucket, attn_block)
                else:
                    s = _refill_one(
                        params, cfg, c.s, r,
                        jax.lax.dynamic_slice_in_dim(q_grids, qi, 1, axis=0),
                        jax.lax.dynamic_slice_in_dim(q_masks, qi, 1, axis=0),
                        q_lens[qi], q_caps[qi], bucket, attn_block)
                return c._replace(
                    s=s, next_q=c.next_q + 1,
                    row_req=c.row_req.at[r].set(qi),
                    row_frame=c.row_frame.at[r].set(0),
                )

            return jax.lax.cond(can, do, lambda c: c, c)

        def cond(c):
            return (c.next_q < n_q) | jnp.any(c.s.active)

        def body(c):
            # reset the shared position when the batch fully drains but the
            # next request's budget no longer fits (bounded cache window)
            need_reset = (~jnp.any(c.s.active)
                          & (c.next_q < n_q)
                          & (cache_len - 1 - c.s.pos
                             < q_caps[jnp.minimum(c.next_q, n_q - 1)]))
            s = c.s._replace(pos=jnp.where(need_reset, jnp.int32(bucket),
                                           c.s.pos))
            c = c._replace(s=s)
            # single gate per frame: the per-row admission conds (each
            # carrying a prefill branch) only run when a slot is free AND
            # work is queued — on most frames this is one cheap branch
            c = jax.lax.cond(
                jnp.any(c.row_req[::pair] < 0) & (c.next_q < n_q),
                lambda c: jax.lax.fori_loop(
                    0, b // pair, lambda p, c: admit_row(p, c), c),
                lambda c: c,
                c,
            )
            s, packed = frame_body(params, c.s, slot_idx)
            req = jnp.where(c.row_req >= 0, c.row_req, n_q)  # (B,)
            frame = jnp.minimum(c.row_frame, out_cap - 1)
            out = c.out.at[req, frame].set(packed)
            emitted = (c.row_req >= 0).astype(jnp.int32)
            row_frame = c.row_frame + emitted
            done = packed[:, ncb + 2] > 0
            # odd CFG rows carry row_req -1; never let them index n_frames
            n_frames = c.n_frames.at[
                jnp.where(done & (c.row_req >= 0), c.row_req, n_q)
            ].set(jnp.minimum(row_frame, out_cap), mode="drop")
            row_req = jnp.where(done, -1, c.row_req)
            return C(s, c.next_q, row_req, row_frame, out, n_frames)

        c0 = C(
            s=s, next_q=jnp.int32(0),
            row_req=jnp.full((b,), -1, jnp.int32),
            row_frame=jnp.zeros((b,), jnp.int32),
            out=jnp.zeros((n_q + 1, out_cap, ncb + 3), jnp.int32),
            n_frames=jnp.zeros((n_q,), jnp.int32),
        )
        c = jax.lax.while_loop(cond, body, c0)
        return c.out[:n_q], c.n_frames

    return offline


@dataclass
class _Slot:
    request_id: int = -1
    max_frames: int = 0
    text: List[int] = field(default_factory=list)
    audio: List[np.ndarray] = field(default_factory=list)
    phase: List[int] = field(default_factory=list)


@dataclass
class _Window:
    """One shared-position cache window: device state + host mirrors.

    The engine normally runs ONE window; under ``windows=2`` a second
    (overlap) window exists transiently while the first drains — new
    arrivals admit into the fresh window instead of waiting out the old
    one's tail (docs/serving_latency_r5.md)."""

    state: SlotState
    pos: int                    # host mirror of state.pos (no device reads)
    slots: List[_Slot]


@dataclass
class _Request:
    rid: int
    grid: np.ndarray
    mask: np.ndarray
    max_frames: int
    neg_grid: Optional[np.ndarray] = None
    neg_mask: Optional[np.ndarray] = None


class ContinuousEngine:
    """Host-side iteration-level scheduler over the fused segment + drain
    programs.

    Usage:
        eng = ContinuousEngine(params, cfg, mode="text", rows=4)
        rid = eng.submit(grid, mask)            # from engine/tasks.py
        results = eng.run_until_drained()       # {rid: tokens | (r, s)}
    """

    def __init__(self, params: Params, cfg: UnifiedModelConfig, *,
                 mode: str = "text", rows: int = 4, bucket: int = 64,
                 seg_frames: int = 16, cache_len: int = 512,
                 max_frames: int = 128, temperature: float = 0.9,
                 topk: int = 1, seed: int = 888,
                 use_cfg: bool = False, cfg_scale: float = 1.0,
                 cache_dtype=jnp.bfloat16,
                 attn_block: "Optional[int]" = None,
                 seg_ladder: "Optional[str]" = None,
                 seg_reactive: "Optional[str]" = None,
                 windows: "Optional[int]" = None,
                 kv_quant: "Optional[str]" = None,
                 kv_write: "Optional[str]" = None):
        assert mode in ("text", "audio")
        if use_cfg:
            assert mode == "audio", "CFG guides audio generation (TTS/TTA)"
            assert rows % 2 == 0, "CFG rows come in [cond, uncond] pairs"
        self.params = params
        self.cfg = cfg
        self.mode = mode
        from uniaudio2_tpu.engine.decode import resolve_kv_write
        # deferred KV writes require the STACKED cache layout (the frame
        # write is one coalesced dynamic_update_slice across all layers)
        self.kv_write = resolve_kv_write(kv_write)
        self._cache_lists = isinstance(
            params.get("backbone", {}).get("layers"), list
        ) and self.kv_write != "deferred"
        self.rows = rows
        self.use_cfg = use_cfg
        self._pair = 2 if use_cfg else 1
        self.bucket = bucket
        self.seg_frames = seg_frames
        self.cache_len = cache_len
        self.max_frames = max_frames
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._results: Dict[int, Any] = {}
        # wall-clock request lifecycle (online-serving latency accounting):
        # rid -> {submitted, first, done, frames}; "first" is stamped when
        # the request's first frame becomes host-visible (segment/drain
        # boundary — that IS the user-visible TTFT of this architecture)
        self.timings: Dict[int, Dict[str, float]] = {}
        self._next_rid = 0
        # same auto policy as DecodeEngine (r4 A/B table,
        # docs/profile_decode_r4.md); resolved against this engine's
        # cache budget (ADVICE r3 item 2: prefix bounding now covers the
        # continuous-batching loops, not just the compiled frame loops)
        if attn_block is None:
            import os as _os
            env = _os.environ.get("UA2_ATTN_BLOCK", "auto")
            attn_block = -1 if env == "auto" else int(env)
        from uniaudio2_tpu.engine.decode import (
            resolve_attn_block, resolve_kv_quant,
        )
        self.attn_block = resolve_attn_block(int(attn_block), cache_len)
        # int8 KV cache, same per-program policy as DecodeEngine (measured
        # AUTO: on at batch >= 8 or cache >= 512 — docs/kv_quant_r5.md);
        # the online rows=8/cache-1024 config is squarely in the win region
        # and halves the cache footprint per row
        cache_dtype = resolve_kv_quant(kv_quant, cache_len, cache_dtype,
                                       batch=rows)
        # Adaptive segment ladder (round-5 TTFT lever, measured in
        # docs/serving_latency_r5.md): the scheduler picks a segment length
        # per boundary — SHORT on a segment that carries an admission (the
        # new request's first frames surface in ~2 frames instead of a
        # full segment), FULL otherwise (steady-state TPOT stays at the
        # fixed-segment cost). The measured r5 A/B rejected a MEDIUM rung
        # while free rows await arrivals: it put every steady-state token
        # on half-length segments (+40 % TPOT) for ~20 ms of boundary
        # wait — explicit ladders like "2,4,8" still express it. "off"/a
        # single length reproduces the fixed-segment r4 behavior.
        self.seg_ladder = self._resolve_ladder(seg_ladder, seg_frames)
        self._segments: Dict[int, Any] = {}
        for k in self.seg_ladder:
            self._segments[k] = jax.jit(_build_segment(
                cfg, mode=mode, bucket=bucket, seg_frames=k,
                temperature=temperature, topk=topk, use_cfg=use_cfg,
                cfg_scale=cfg_scale, attn_block=self.attn_block,
                kv_write=self.kv_write),
                donate_argnums=(1,))
        self._segment = self._segments[self.seg_ladder[-1]]
        # Row-free-reactive program: early-exit decode while a request
        # queues behind a full batch. Measured OFF by default: at 8 req/s
        # the scheduler re-enters it every boundary (49 bursts/91 segments)
        # and the short effective segments cost more dispatch than the
        # row-free event saves — TTFT p50 407 ms vs 142 ms with plain full
        # segments (docs/serving_latency_r5.md).
        self._reactive = None
        if self._resolve_reactive(seg_reactive):
            self._reactive = jax.jit(_build_segment_reactive(
                cfg, mode=mode, seg_frames=seg_frames,
                temperature=temperature, topk=topk, use_cfg=use_cfg,
                cfg_scale=cfg_scale, attn_block=self.attn_block,
                kv_write=self.kv_write),
                donate_argnums=(1,))
        self._drain = jax.jit(_build_drain(
            cfg, mode=mode, drain_cap=cache_len - bucket,
            temperature=temperature, topk=topk, use_cfg=use_cfg,
            cfg_scale=cfg_scale, attn_block=self.attn_block,
            kv_write=self.kv_write),
            donate_argnums=(1,))
        self._key = jax.random.PRNGKey(seed)
        self._cache_dtype = cache_dtype
        # Overlapped drain windows (round-5 TTFT-p99 lever,
        # docs/serving_latency_r5.md): with windows=2, a budget-blocked
        # arrival admits into a FRESH second cache window immediately and
        # its segments interleave with the old window's remaining rows,
        # instead of waiting out a full drain (up to max_frames ≈ 1 s of
        # TTFT — the measured p99 tail). The int8 KV cache's 1.94×
        # compression funds the transient second cache set.
        if windows is None:
            import os as _os
            windows = int(_os.environ.get("UA2_WINDOWS", "2"))
        assert windows in (1, 2), f"windows={windows}: only 1 or 2"
        self.max_windows = windows
        self._win = _Window(self._fresh_state(cache_dtype), self.bucket,
                            [_Slot() for _ in range(rows // self._pair)])
        self._overlap: "Optional[_Window]" = None
        self._flip = False
        self.stats = {"segments": 0, "drains": 0, "refills": 0, "resets": 0,
                      "reactive": 0, "overlaps": 0}
        self._temperature = temperature
        self._topk = topk
        self._cfg_scale = cfg_scale

    # -- per-window host-state proxies (primary window). Benchmarks and
    # tests address the engine's single-window fields directly; under
    # overlap these always mean the PRIMARY (draining) window.
    @property
    def _state(self) -> SlotState:
        return self._win.state

    @_state.setter
    def _state(self, v: SlotState) -> None:
        self._win.state = v

    @property
    def _pos_host(self) -> int:
        return self._win.pos

    @_pos_host.setter
    def _pos_host(self, v: int) -> None:
        self._win.pos = v

    @property
    def _slots(self) -> List[_Slot]:
        return self._win.slots

    @staticmethod
    def _resolve_ladder(spec: Optional[str], seg_frames: int) -> tuple:
        """Parse the segment-length ladder: "off"/"0" -> fixed segments,
        "auto"/None -> (2, seg_frames) (short rung used ONLY on segments
        that carry an admission — the measured r5 policy), or explicit
        "2,4,8" (3+ rungs restore the mid-rung-while-rows-free behavior).
        Entries are deduped, capped at ``seg_frames``, sorted. Env
        default: ``UA2_SEG_LADDER``."""
        import os as _os
        if spec is None:
            spec = _os.environ.get("UA2_SEG_LADDER", "auto")
        spec = str(spec).strip().lower()
        if spec in ("off", "0", ""):
            return (seg_frames,)
        if spec == "auto":
            ks = (2, seg_frames)
        else:
            try:
                ks = tuple(int(x) for x in spec.split(","))
            except ValueError:
                raise ValueError(
                    f"UA2_SEG_LADDER={spec!r}: expected 'auto', 'off', or "
                    "a comma-separated length list like '2,4,8'")
        ks = sorted({max(1, min(int(k), seg_frames)) for k in ks})
        return tuple(ks) or (seg_frames,)

    @staticmethod
    def _resolve_reactive(spec: Optional[str]) -> bool:
        """Row-free-reactive gate: "on"/"1" builds the early-exit program,
        "off"/"0"/"auto"/None leaves it out (measured default — the r5
        A/B showed reactive thrash at saturation, docs/serving_latency_r5
        .md). Env default: ``UA2_SEG_REACTIVE``."""
        import os as _os
        if spec is None:
            spec = _os.environ.get("UA2_SEG_REACTIVE", "auto")
        spec = str(spec).strip().lower()
        if spec in ("on", "1"):
            return True
        if spec in ("off", "0", "auto", ""):
            return False
        raise ValueError(
            f"UA2_SEG_REACTIVE={spec!r}: expected on/off/auto")

    def _fresh_state(self, cache_dtype=jnp.bfloat16) -> SlotState:
        b = self.rows
        caches = unified.init_caches(self.cfg, b, dtype=cache_dtype,
                                     seq_len=self.cache_len,
                                     as_lists=self._cache_lists)
        self._key, sub = jax.random.split(self._key)
        return SlotState(
            pos=jnp.int32(self.bucket),
            active=jnp.zeros((b,), bool),
            frame_tokens=jnp.zeros((b, 1, 9), jnp.int32),
            frame_mask=jnp.zeros((b, 1, 9), bool),
            is_reason=jnp.ones((b,), bool),
            forbid_prefix=jnp.zeros((b,), jnp.int32),
            valid_from=jnp.full((b,), self.cache_len, jnp.int32),
            stop_at=jnp.zeros((b,), jnp.int32),
            key=sub,
            caches=caches,
        )

    # -- client API --------------------------------------------------------

    def submit(self, grid: np.ndarray, mask: np.ndarray,
               max_frames: Optional[int] = None,
               neg_grid: Optional[np.ndarray] = None,
               neg_mask: Optional[np.ndarray] = None) -> int:
        """Enqueue one request (grid from `engine/tasks.py`). Returns id.
        Under ``use_cfg`` a negative (pad-substituted, same-length) prompt
        is required (`tasks.build_cfg_negative_grid`)."""
        assert grid.shape[0] <= self.bucket, (
            f"prompt ({grid.shape[0]}) exceeds bucket ({self.bucket})")
        if self.use_cfg:
            assert neg_grid is not None and neg_mask is not None, (
                "use_cfg engines need a negative prompt per request")
            assert neg_grid.shape == grid.shape, (
                "CFG negative prompt must match the prompt length "
                "(pad-substitution, tts_task.py:171-189)")
        else:
            assert neg_grid is None and neg_mask is None
        mf = max_frames or self.max_frames
        assert mf <= self.cache_len - 1 - self.bucket, (
            f"max_frames ({mf}) can never fit the cache budget "
            f"({self.cache_len - 1 - self.bucket} frames after the bucket)")
        rid = self._next_rid
        self._next_rid += 1
        self.timings[rid] = {"submitted": time.monotonic()}
        self._queue.put(_Request(
            rid, np.asarray(grid), np.asarray(mask), mf,
            None if neg_grid is None else np.asarray(neg_grid),
            None if neg_mask is None else np.asarray(neg_mask)))
        return rid

    def run_offline(self, requests, max_frames: Optional[int] = None
                    ) -> List[Any]:
        """Fully in-graph continuous batching over a known request list
        (offline batch-eval throughput mode): ONE device dispatch decodes
        all ``requests`` (list of (grid, mask) or (grid, mask, max_frames);
        under ``use_cfg``: (grid, mask, neg_grid, neg_mask[, max_frames]))
        with in-loop refill-on-completion. Returns results in input order
        (same formats as `run_until_drained`)."""
        prepared = []
        for item in requests:
            g, m = item[0], item[1]
            if self.use_cfg:
                ng, nm = item[2], item[3]
                assert ng.shape == g.shape
                mf = item[4] if len(item) > 4 else (
                    max_frames or self.max_frames)
                neg = (np.asarray(ng), np.asarray(nm))
            else:
                mf = item[2] if len(item) > 2 else (
                    max_frames or self.max_frames)
                neg = None
            assert g.shape[0] <= self.bucket
            assert mf <= self.cache_len - 1 - self.bucket
            prepared.append((np.asarray(g), np.asarray(m), int(mf), neg))
        # longest-processing-time-first admission: rows stay balanced and
        # the makespan tail (one long request decoding alone) shrinks
        order = sorted(range(len(prepared)),
                       key=lambda i: -prepared[i][2])
        prepared = [prepared[i] for i in order]
        n_q = len(prepared)
        out_cap = max(mf for _, _, mf, _ in prepared)
        key = (n_q, out_cap)
        if getattr(self, "_offline_key", None) != key:
            self._offline_key = key
            self._offline = jax.jit(_build_offline(
                self.cfg, mode=self.mode, bucket=self.bucket,
                out_cap=out_cap, temperature=self._temperature,
                topk=self._topk, use_cfg=self.use_cfg,
                cfg_scale=self._cfg_scale, attn_block=self.attn_block,
                kv_write=self.kv_write))
        pair = self._pair
        qshape = ((n_q, 2, self.bucket, 9) if self.use_cfg
                  else (n_q, self.bucket, 9))
        grids = np.zeros(qshape, np.int64)
        masks = np.zeros(qshape, bool)
        lens = np.zeros((n_q,), np.int32)
        caps = np.zeros((n_q,), np.int32)
        for i, (g, m, mf, neg) in enumerate(prepared):
            L = g.shape[0]
            if self.use_cfg:
                grids[i, 0, self.bucket - L:] = g
                masks[i, 0, self.bucket - L:] = m
                grids[i, 1, self.bucket - L:] = neg[0]
                masks[i, 1, self.bucket - L:] = neg[1]
            else:
                grids[i, self.bucket - L:] = g
                masks[i, self.bucket - L:] = m
            lens[i] = L
            caps[i] = mf
        state = self._fresh_state(self._cache_dtype)
        slab, n_frames = self._offline(
            self.params, state, jnp.asarray(grids), jnp.asarray(masks),
            jnp.asarray(lens), jnp.asarray(caps))
        slab = np.asarray(slab)
        n_frames = np.asarray(n_frames)
        ncb = self.cfg.tokens.num_codebooks
        results = [None] * n_q
        for i in range(n_q):
            n = int(n_frames[i]) or prepared[i][2]
            n = min(n, prepared[i][2])
            if self.mode == "text":
                toks = slab[i, :n, 0]
                out = toks[toks >= 0].astype(np.int64)
            else:
                out = split_two_phase(
                    slab[i, :n, 1 : 1 + ncb].astype(np.int64),
                    slab[i, :n, 1 + ncb].astype(np.int64), n,
                    self.cfg.tokens.audio_reason_card,
                )
            results[order[i]] = out  # undo the LPT permutation
        return results

    def stream(self, grid: np.ndarray, mask: np.ndarray,
               max_frames: Optional[int] = None):
        """Generator over one request's frames as they are produced (audio
        mode, single-slot engine): yields (phase, audio_frame (8,)) per
        generated frame, segment by segment — the LLM half of streaming
        TTS (`engine/stream_tts.py`). Phases follow `decode.PHASE_*`;
        semantic-phase codes still carry the +audio_reason_card offset."""
        assert self.mode == "audio" and self.rows == 1, (
            "stream() needs a rows=1 audio-mode engine")
        assert not self.use_cfg, "stream() does not support CFG pairs"
        assert self._queue.empty() and self._slots[0].request_id < 0
        mf = max_frames or self.max_frames
        self.submit(grid, mask, mf)
        ncb = self.cfg.tokens.num_codebooks
        emitted = 0
        done = False
        try:
            while not done:
                refills = self._gather_refills()
                if not refills and self._slots[0].request_id < 0:
                    if not self._queue.empty():
                        # request not admissible at this position (cache
                        # budget spent by earlier streams): reset and retry
                        self._state = self._fresh_state(self._cache_dtype)
                        self._pos_host = self.bucket
                        self.stats["resets"] += 1
                        continue
                    break
                self._state, slab = self._segment(
                    self.params, self._state, *self._refill_args(refills))
                self.stats["segments"] += 1
                self._pos_host += self.seg_frames
                slab = np.asarray(slab)
                for kf in range(slab.shape[1]):
                    if emitted >= mf:
                        done = True
                        break
                    yield (int(slab[0, kf, 1 + ncb]),
                           slab[0, kf, 1 : 1 + ncb])
                    emitted += 1
                    if slab[0, kf, 2 + ncb]:
                        done = True
                        break
        finally:
            self._slots[0] = _Slot()

    def step_online(self) -> Dict[int, Any]:
        """One ONLINE scheduling iteration: admit whatever is admissible
        from the queue, run one segment if there is any work, and return
        the requests completed by it ({rid: result}). Returns {} without
        touching the device when idle (the caller decides to sleep until
        the next arrival). Wall-clock lifecycle per request is recorded in
        `self.timings` (submitted/first/done/frames) — the data source for
        TTFT/TPOT serving benchmarks (`scripts/bench_serving_latency.py`).
        """
        if self._overlap is not None:
            self._step_overlap()
            done, self._results = self._results, {}
            return done
        win = self._win
        refills = self._gather_refills(win)
        busy = any(s.request_id >= 0 for s in win.slots)
        if not refills and not busy:
            if self._queue.empty():
                if self._remaining(win) < self.max_frames:
                    # proactive: refresh a nearly-spent window while idle
                    # (the caller sleeps anyway) so the next arrival admits
                    # instantly instead of paying the reset on its TTFT
                    self._reset(win)
                return {}
            # queued work exists but is not admissible at this position
            # (cache budget spent): reset the window and retry next call
            self._reset(win)
            return {}
        if not refills and not self._queue.empty():
            head: _Request = self._queue.queue[0]
            if self._remaining(win) < head.max_frames:
                if self.max_windows > 1:
                    # budget-blocked with rows still running: open a FRESH
                    # overlap window and admit the arrival there NOW; the
                    # old window's tail interleaves segment-for-segment
                    # instead of holding the arrival's TTFT for a full
                    # drain (the measured p99 tail,
                    # docs/serving_latency_r5.md)
                    self._overlap = _Window(
                        self._fresh_state(self._cache_dtype), self.bucket,
                        [_Slot() for _ in range(self.rows // self._pair)])
                    self.stats["overlaps"] += 1
                    self._step_overlap()
                else:
                    # single-window: fast-forward the in-flight rows in ONE
                    # compiled drain (no per-segment host round trips), then
                    # the next call resets and admits
                    self._run_drain(win)
            elif self._reactive is not None:
                # row-blocked: decode reactively so the row-free event
                # surfaces at the exact frame it happens
                if not self._run_reactive(win):
                    self._run_segment(win, refills, self.seg_ladder[-1])
            else:
                self._run_segment(win, refills, self._pick_seg(win, refills))
        else:
            self._run_segment(win, refills, self._pick_seg(win, refills))
        done, self._results = self._results, {}
        return done

    def _step_overlap(self) -> None:
        """One scheduling iteration while two windows are live: the fresh
        (admitting) window and the old (draining) window alternate
        segments, so arrivals behind a spent window start decoding in ~2
        segments while the old tail still makes full-rate progress. The
        old window retires the moment its last row completes."""
        ow = self._overlap
        old_busy = any(s.request_id >= 0 for s in self._win.slots)
        if not old_busy:
            # old window fully drained: the overlap becomes primary
            self._win = ow
            self._overlap = None
            refills = self._gather_refills(ow)
            if refills or any(s.request_id >= 0 for s in ow.slots):
                self._run_segment(ow, refills, self._pick_seg(ow, refills))
            return
        if not self._flip:
            # the fresh window's turn (refills are gathered only on its
            # own turn — popped requests ride this segment's prologue)
            refills = self._gather_refills(ow)
            if refills or any(s.request_id >= 0 for s in ow.slots):
                self._run_segment(ow, refills, self._pick_seg(ow, refills))
                self._flip = True
                return
        self._run_segment(self._win, [], self.seg_ladder[-1])
        self._flip = False

    def run_until_drained(self) -> Dict[int, Any]:
        """Process queue + in-flight work to completion; return results:
        mode=text -> 1-D token array per request id; mode=audio ->
        (reason (8, T1), semantic (8, T2)) per request id."""
        while self._overlap is not None:
            # retire any live overlap window first (mixed step_online /
            # run_until_drained use): alternation always makes progress
            self._step_overlap()
        win = self._win
        while not self._queue.empty() or any(
                s.request_id >= 0 for s in win.slots):
            refills = self._gather_refills(win)
            busy = any(s.request_id >= 0 for s in win.slots)
            if not refills and not busy:
                if self._queue.empty():
                    break
                # queued work exists but nothing is admissible here: reset
                self._reset(win)
                continue
            if self._queue.empty() and not refills:
                self._run_drain(win)
            else:
                self._run_segment(win, refills, self._pick_seg(win, refills))
        out, self._results = self._results, {}
        return out

    # -- scheduling --------------------------------------------------------

    def _remaining(self, win: "Optional[_Window]" = None) -> int:
        win = self._win if win is None else win
        return self.cache_len - 1 - win.pos

    def _reset(self, win: "_Window") -> None:
        win.state = self._fresh_state(self._cache_dtype)
        win.pos = self.bucket
        self.stats["resets"] += 1

    def _gather_refills(self, win: "Optional[_Window]" = None):
        """Pop admissible queued requests into free slots (host bookkeeping
        only; the device writes happen inside the next segment call)."""
        win = self._win if win is None else win
        refills = []
        for r, slot in enumerate(win.slots):
            if slot.request_id >= 0 or self._queue.empty():
                continue
            req: _Request = self._queue.queue[0]
            if self._remaining(win) < req.max_frames:
                continue
            self._queue.get()
            win.slots[r] = _Slot(request_id=req.rid,
                                 max_frames=req.max_frames)
            refills.append((r, req))
            self.stats["refills"] += 1
            t = self.timings.get(req.rid)
            if t is not None:   # admission wait = admitted - submitted
                t["admitted"] = time.monotonic()
        return refills

    def _refill_args(self, refills):
        n = self.rows
        rows = np.full((n,), -1, np.int32)
        grids = np.zeros((n, self.bucket, 9), np.int64)
        masks = np.zeros((n, self.bucket, 9), bool)
        lens = np.zeros((n,), np.int32)
        caps = np.zeros((n,), np.int32)
        lane = 0
        for r, req in refills:
            # a CFG request takes two lanes: cond row 2p, uncond row 2p+1
            prompts = [(req.grid, req.mask)]
            if self.use_cfg:
                prompts.append((req.neg_grid, req.neg_mask))
            for j, (g, m) in enumerate(prompts):
                L = g.shape[0]
                rows[lane] = r * self._pair + j
                grids[lane, self.bucket - L:] = g
                masks[lane, self.bucket - L:] = m
                lens[lane] = L
                caps[lane] = req.max_frames
                lane += 1
        return (jnp.asarray(rows), jnp.asarray(grids), jnp.asarray(masks),
                jnp.asarray(lens), jnp.asarray(caps))

    def _pick_seg(self, win: "_Window", refills) -> int:
        """Segment length for this boundary: shortest on a segment that
        carries an admission (first frames surface fast), longest when
        nothing admits (steady-state TPOT at the fixed-segment cost). A
        3+-rung ladder additionally uses the middle rung while a free row
        could take an arrival (bounds the boundary wait — measured not
        worth its TPOT cost as a default, docs/serving_latency_r5.md)."""
        if len(self.seg_ladder) == 1:
            return self.seg_ladder[-1]
        if refills:
            return self.seg_ladder[0]
        if len(self.seg_ladder) > 2 and any(
                s.request_id < 0 for s in win.slots):
            return self.seg_ladder[1]
        return self.seg_ladder[-1]

    def _run_segment(self, win: "_Window", refills,
                     k: Optional[int] = None):
        k = self.seg_frames if k is None else k
        win.state, slab = self._segments[k](
            self.params, win.state, *self._refill_args(refills))
        self.stats["segments"] += 1
        win.pos += k
        self._harvest(win, np.asarray(slab))

    def _run_reactive(self, win: "_Window") -> bool:
        """One reactive decode burst; False when it made no progress (the
        caller then falls back to a plain segment)."""
        win.state, slab, steps = self._reactive(self.params, win.state)
        self.stats["reactive"] += 1
        steps = int(steps)
        win.pos += steps
        if steps:
            self._harvest(win, np.asarray(slab)[:, :steps])
        return steps > 0

    def warmup(self) -> None:
        """Execute every scheduler program once (all ladder segments, the
        reactive segment, the drain) with no active rows, then reset the
        window. AOT ``lower().compile()`` alone is NOT enough: the first
        real ``__call__`` of each program still pays dispatch setup
        (re-trace + executable bind — ~70 ms on CPU, 1-2 s through the
        remote-TPU tunnel), which surfaced as TTFT p99 stragglers in the
        r5 ladder A/B (docs/serving_latency_r5.md). Running each program
        on live state moves that cost off the latency clock."""
        r = self._refill_args([])
        for fn in self._segments.values():
            self._state, slab = fn(self.params, self._state, *r)
            np.asarray(slab)
        if self._reactive is not None:
            self._state, slab, _ = self._reactive(self.params, self._state)
            np.asarray(slab)
        self._state, slab, _ = self._drain(self.params, self._state)
        np.asarray(slab)
        # the no-op segments advanced pos/PRNG: restore a fresh window
        self._state = self._fresh_state(self._cache_dtype)
        self._pos_host = self.bucket

    def _run_drain(self, win: "Optional[_Window]" = None):
        win = self._win if win is None else win
        win.state, slab, steps = self._drain(self.params, win.state)
        self.stats["drains"] += 1
        steps = int(steps)
        win.pos += steps
        self._harvest(win, np.asarray(slab)[:, :steps])

    def _harvest(self, win: "_Window", slab: np.ndarray):
        ncb = self.cfg.tokens.num_codebooks
        now = time.monotonic()
        for u, slot in enumerate(win.slots):
            if slot.request_id < 0:
                continue
            r = u * self._pair      # CFG reads the cond row of the pair
            had_frames = len(slot.text)
            for kf in range(slab.shape[1]):
                slot.text.append(int(slab[r, kf, 0]))
                slot.audio.append(slab[r, kf, 1 : 1 + ncb])
                slot.phase.append(int(slab[r, kf, 1 + ncb]))
                if slab[r, kf, 2 + ncb]:
                    self._stamp(slot, had_frames, now)
                    self._finalize(win, u)
                    break
            else:
                self._stamp(slot, had_frames, now)
                if len(slot.text) >= slot.max_frames:
                    self._finalize(win, u)

    def _stamp(self, slot: _Slot, had_frames: int, now: float) -> None:
        t = self.timings.get(slot.request_id)
        if t is not None and had_frames == 0 and slot.text:
            t.setdefault("first", now)

    def _finalize(self, win: "_Window", r: int):
        slot = win.slots[r]
        t = self.timings.get(slot.request_id)
        if t is not None:
            t["done"] = time.monotonic()
            t["frames"] = min(len(slot.phase),
                              slot.max_frames or self.max_frames)
        mf = slot.max_frames or self.max_frames
        slot.text = slot.text[:mf]
        slot.audio = slot.audio[:mf]
        slot.phase = slot.phase[:mf]
        if self.mode == "text":
            toks = np.asarray([t for t in slot.text if t >= 0], np.int64)
            self._results[slot.request_id] = toks
        else:
            audio = np.stack(slot.audio) if slot.audio else \
                np.zeros((0, self.cfg.tokens.num_codebooks), np.int64)
            phase = np.asarray(slot.phase, np.int64)
            n = len(slot.phase)
            self._results[slot.request_id] = split_two_phase(
                audio, phase, n, self.cfg.tokens.audio_reason_card
            )
        win.slots[r] = _Slot()
