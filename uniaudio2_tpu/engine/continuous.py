"""Continuous batching: slot-level admission into a running batched decode.

The static batched path (`decode.py::_build_generate_batched`) runs one
fixed request set to completion — short rows idle while the longest row
finishes. This module adds iteration-level scheduling (the vLLM-class
serving discipline) on top of the same compiled-loop design:

* the decode loop runs in fixed-size SEGMENTS (`seg_frames` frames per
  compiled call) over a B-row batch with per-row two-phase/EOS state;
* between segments the host harvests finished rows and REFILLS empty
  slots with queued requests — a refill writes the new prompt's K/V so
  the prompt ENDS at the current shared decode position (left-packed:
  RoPE is relative, so ending the prompt at slot ``pos-1`` reproduces
  batch-start geometry exactly), and flips that row's ``valid_from``
  cache mask;
* when every slot drains, the shared position resets to the prompt
  bucket (cache slots are a bounded budget; admission requires
  ``remaining frames >= request.max_frames``).

Everything device-side is two jitted programs per (mode, sampling)
configuration — `segment` (K decode frames, state in/state out) and
`refill` (one row's offset prefill + state splice) — so the host never
touches the hot loop; it only schedules between segment boundaries.

Correctness invariant (tested): a request admitted into a running batch
produces token-identical greedy output to the same request decoded alone.

CFG pairs are not supported here (use the static batched path for CFG
generation); sampling parameters are per-engine, like one compiled
program (requests wanting different temperature/topk go to different
`ContinuousEngine`s or the `BatchingServer`).
"""

from __future__ import annotations

import queue
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine.decode import PHASE_DROPPED, PHASE_REASON, \
    PHASE_SEMANTIC, split_two_phase
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.models.unified import UnifiedCaches

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
    key: jax.Array
    caches: UnifiedCaches


def _build_segment(cfg: UnifiedModelConfig, *, mode: str, seg_frames: int,
                   temperature: float, topk: int):
    """K decode frames over the batch; returns per-frame outputs + state.

    Inactive rows still flow through the model (static shapes) but their
    K/V never becomes valid for themselves (valid_from stays at cache_len)
    and their outputs are masked to -1 / dropped."""
    ts = cfg.tokens
    ncb = ts.num_codebooks

    def segment(params: Params, s: SlotState):
        cache_len = s.caches.backbone.k.shape[3]
        b = s.active.shape[0]
        slot_idx = jnp.arange(cache_len, dtype=jnp.int32)

        def body(carry, _):
            s = carry
            key, sub = jax.random.split(s.key)
            key_valid = slot_idx[None, :] >= s.valid_from[:, None]
            frame, caches = unified.decode_frame(
                params, cfg, s.frame_tokens, s.frame_mask, s.caches, s.pos,
                sub, temperature=temperature, topk=topk,
                forbid_prefix=s.forbid_prefix[:, None],
                key_valid=key_valid,
                sample_text=mode == "text", sample_audio=mode == "audio",
            )
            text_tok = frame[:, 0]
            audio_toks = frame[:, 1:]

            if mode == "text":
                eos_now = text_tok == ts.text_eos
                active = s.active & ~eos_now
                emit = jnp.where(s.active & ~eos_now, text_tok, -1)
                done_now = s.active & eos_now
                fb_tokens = jnp.concatenate(
                    [jnp.zeros((b, ncb), jnp.int32), text_tok[:, None]], 1
                )[:, None, :]
                fb_mask = jnp.concatenate(
                    [jnp.zeros((b, ncb), bool), jnp.ones((b, 1), bool)], 1
                )[:, None, :]
                out = (emit, jnp.zeros((b, ncb), jnp.int32),
                       jnp.full((b,), PHASE_DROPPED, jnp.int32), done_now)
                new = s._replace(
                    pos=s.pos + 1, active=active, frame_tokens=fb_tokens,
                    frame_mask=fb_mask, key=key, caches=caches,
                )
                return new, out

            sem_eos = jnp.all(
                audio_toks == (ts.semantic_eos + ts.audio_reason_card), axis=1
            )
            reason_eos_frame = jnp.all(audio_toks == ts.reason_eos, axis=1)
            switch = s.is_reason & reason_eos_frame
            done_now = s.active & sem_eos
            active = s.active & ~sem_eos
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
            out = (jnp.where(s.active, text_tok, -1), audio_toks, phase,
                   done_now)
            new = s._replace(
                pos=s.pos + 1, active=active, frame_tokens=fb_tokens,
                frame_mask=fb_mask, is_reason=new_is_reason,
                forbid_prefix=new_forbid, key=key, caches=caches,
            )
            return new, out

        s, (text_seg, audio_seg, phase_seg, done_seg) = jax.lax.scan(
            body, s, None, length=seg_frames
        )
        # scan stacks on axis 0 -> (K, B, ...): transpose to (B, K, ...)
        return s, (text_seg.T, jnp.transpose(audio_seg, (1, 0, 2)),
                   phase_seg.T, done_seg.T)

    return segment


def _build_refill(cfg: UnifiedModelConfig, *, bucket: int):
    """Write one queued request's prompt into row ``row`` so that the
    prompt's last-but-one token sits at position ``pos-2`` and its last
    token becomes the row's next frame input at ``pos-1``... precisely:
    with next decode position P (state.pos), the prompt's K/V occupy
    positions [P-L, P-1) and the prompt's last token is fed at P-1 by the
    segment loop (matching `_build_generate_batched`'s left-packed start
    where the last real token sits at slot bucket-1 == first decode pos).
    """

    def refill(params: Params, s: SlotState, row: jax.Array,
               grid: jax.Array, grid_mask: jax.Array, length: jax.Array):
        # grid: (1, bucket, 9) LEFT-padded, real length `length`. Grid slot
        # i maps to position start+i with the LAST real token (slot
        # bucket-1) landing at s.pos — it is fed as the first frame input
        # there by the segment loop, mirroring the static batched start
        # (grid[:, -1:] fed at slot bucket-1, decode.py:283,308).
        start = s.pos - jnp.int32(bucket - 1)   # position of grid slot 0
        cache_len = s.caches.backbone.k.shape[3]
        slot_idx = jnp.arange(cache_len, dtype=jnp.int32)
        valid_from_row = s.pos - length + 1     # first real-token position
        key_valid_row = (slot_idx[None, :] >= valid_from_row)[..., :]

        def slice_cache(c):
            return UnifiedCaches(*[
                type(k)(
                    jax.lax.dynamic_slice_in_dim(k.k, row, 1, axis=1),
                    jax.lax.dynamic_slice_in_dim(k.v, row, 1, axis=1),
                ) for k in c
            ])

        def splice_cache(full, part):
            return UnifiedCaches(*[
                type(f)(
                    jax.lax.dynamic_update_slice_in_dim(f.k, p.k, row, axis=1),
                    jax.lax.dynamic_update_slice_in_dim(f.v, p.v, row, axis=1),
                ) for f, p in zip(full, part)
            ])

        row_caches = slice_cache(s.caches)
        # run the bucket-1 prompt prefix through the decode path at offset
        # positions [start, start+bucket-1); causal masking keeps pad slots
        # from contaminating real ones, and key_valid hides them after
        _, row_caches = unified.decode_hidden(
            params, cfg, grid[:, :-1], grid_mask[:, :-1], row_caches,
            start, key_valid=key_valid_row,
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
        )

    return refill


@dataclass
class _Slot:
    request_id: int = -1
    max_frames: int = 0
    text: List[int] = field(default_factory=list)
    audio: List[np.ndarray] = field(default_factory=list)
    phase: List[int] = field(default_factory=list)


@dataclass
class _Request:
    rid: int
    grid: np.ndarray
    mask: np.ndarray
    max_frames: int


class ContinuousEngine:
    """Host-side iteration-level scheduler over the segment/refill programs.

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
                 cache_dtype=jnp.bfloat16):
        assert mode in ("text", "audio")
        self.params = params
        self.cfg = cfg
        self.mode = mode
        self.rows = rows
        self.bucket = bucket
        self.seg_frames = seg_frames
        self.cache_len = cache_len
        self.max_frames = max_frames
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._slots = [_Slot() for _ in range(rows)]
        self._results: Dict[int, Any] = {}
        self._next_rid = 0
        self._segment = jax.jit(_build_segment(
            cfg, mode=mode, seg_frames=seg_frames,
            temperature=temperature, topk=topk), donate_argnums=(1,))
        self._refill = jax.jit(_build_refill(cfg, bucket=bucket),
                               donate_argnums=(1,))
        self._key = jax.random.PRNGKey(seed)
        self._state = self._fresh_state(cache_dtype)
        self.stats = {"segments": 0, "refills": 0, "resets": 0}
        self._cache_dtype = cache_dtype

    def _fresh_state(self, cache_dtype=jnp.bfloat16) -> SlotState:
        b = self.rows
        caches = unified.init_caches(self.cfg, b, dtype=cache_dtype,
                                     seq_len=self.cache_len)
        self._key, sub = jax.random.split(self._key)
        return SlotState(
            pos=jnp.int32(self.bucket),
            active=jnp.zeros((b,), bool),
            frame_tokens=jnp.zeros((b, 1, 9), jnp.int32),
            frame_mask=jnp.zeros((b, 1, 9), bool),
            is_reason=jnp.ones((b,), bool),
            forbid_prefix=jnp.zeros((b,), jnp.int32),
            valid_from=jnp.full((b,), self.cache_len, jnp.int32),
            key=sub,
            caches=caches,
        )

    # -- client API --------------------------------------------------------

    def submit(self, grid: np.ndarray, mask: np.ndarray,
               max_frames: Optional[int] = None) -> int:
        """Enqueue one request (grid from `engine/tasks.py`). Returns id."""
        assert grid.shape[0] <= self.bucket, (
            f"prompt ({grid.shape[0]}) exceeds bucket ({self.bucket})")
        mf = max_frames or self.max_frames
        assert mf <= self.cache_len - 1 - self.bucket, (
            f"max_frames ({mf}) can never fit the cache budget "
            f"({self.cache_len - 1 - self.bucket} frames after the bucket)")
        rid = self._next_rid
        self._next_rid += 1
        self._queue.put(_Request(rid, np.asarray(grid), np.asarray(mask), mf))
        return rid

    def run_until_drained(self) -> Dict[int, Any]:
        """Process queue + in-flight work to completion; return results:
        mode=text -> 1-D token array per request id; mode=audio ->
        (reason (8, T1), semantic (8, T2)) per request id."""
        while not self._queue.empty() or any(
                s.request_id >= 0 for s in self._slots):
            self._admit()
            self._step_segment()
        out, self._results = self._results, {}
        return out

    # -- scheduling --------------------------------------------------------

    def _remaining(self) -> int:
        return self.cache_len - 1 - int(self._state.pos)

    def _admit(self):
        for r, slot in enumerate(self._slots):
            if slot.request_id >= 0 or self._queue.empty():
                continue
            req: _Request = self._queue.queue[0]
            if self._remaining() < req.max_frames:
                continue  # not enough cache budget at this position
            self._queue.get()
            g = np.zeros((self.bucket, 9), np.int64)
            m = np.zeros((self.bucket, 9), bool)
            L = req.grid.shape[0]
            g[self.bucket - L:] = req.grid
            m[self.bucket - L:] = req.mask
            self._state = self._refill(
                self.params, self._state, jnp.int32(r),
                jnp.asarray(g)[None], jnp.asarray(m)[None], jnp.int32(L),
            )
            self._slots[r] = _Slot(request_id=req.rid,
                                   max_frames=req.max_frames)
            self.stats["refills"] += 1
        # nothing runnable and nothing admitted at this position -> reset
        if (not any(s.request_id >= 0 for s in self._slots)
                and not self._queue.empty()):
            self._state = self._fresh_state(self._cache_dtype)
            self.stats["resets"] += 1
            self._admit()

    def _step_segment(self):
        if not any(s.request_id >= 0 for s in self._slots):
            return
        if self._remaining() <= 0:
            # cache exhausted: finalize whatever is still running as-is
            for r, slot in enumerate(self._slots):
                if slot.request_id >= 0:
                    self._finalize(r)
            return
        self._state, (text_seg, audio_seg, phase_seg, done_seg) = \
            self._segment(self.params, self._state)
        self.stats["segments"] += 1
        text_seg = np.asarray(text_seg)
        audio_seg = np.asarray(audio_seg)
        phase_seg = np.asarray(phase_seg)
        done_seg = np.asarray(done_seg)
        for r, slot in enumerate(self._slots):
            if slot.request_id < 0:
                continue
            for kf in range(text_seg.shape[1]):
                slot.text.append(int(text_seg[r, kf]))
                slot.audio.append(audio_seg[r, kf])
                slot.phase.append(int(phase_seg[r, kf]))
                if done_seg[r, kf]:
                    self._finalize(r)
                    break
            else:
                if len(slot.text) >= slot.max_frames:
                    self._finalize(r)

    def _finalize(self, r: int):
        slot = self._slots[r]
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
        self._slots[r] = _Slot()
