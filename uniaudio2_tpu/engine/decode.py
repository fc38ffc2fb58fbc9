"""Compiled autoregressive decode engine.

The reference drives generation from eager Python — one `generate_frame` call
per frame with host-side phase logic, EOS checks and list appends
(`evaluation/asr_task.py:667-682`, `evaluation/tts_task.py:253-282`). On TPU
that costs a host round-trip per frame. Here the *entire* generation — prefill,
frame loop, two-phase reason→semantic switching, EOS detection, and output
buffering — is one `jax.jit`-compiled program built around
`jax.lax.while_loop`; the host reads back only the final token buffers.

Shape policy: prompts are padded to static bucket lengths (one compile per
bucket) and the frame loop runs to a static ``max_frames`` bound with an
early-exit predicate. The data-dependent pieces of the reference (true prompt
length, the reasoning→semantic `forbid_prefix` flip, `save_flag`) are traced
scalars carried through the loop.

Output protocol (two-phase audio mode): every generated frame is written into
a ``(max_frames, 8)`` buffer with a per-frame phase tag
(0 = dropped / phase-switch frame, 1 = reasoning, 2 = semantic). Host-side
`split_two_phase` reproduces the reference's list semantics
(`tts_task.py:261-284`), including dropping the leading BOS frame of each
phase and subtracting ``audio_reason_card`` from semantic codes.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.models import gpt, unified
from uniaudio2_tpu.models.unified import UnifiedCaches
from uniaudio2_tpu.ops.kv_cache import QuantKV


def _shard_caches(caches, cache_sharding):
    """Apply the tp cache shardings. ``cache_sharding`` maps the VALUES
    rank (5 stacked / 4 per-layer) to a NamedSharding over the kv-group
    axis; a QuantKV's scale tensor drops the trailing head axis, so its
    group axis matches the spec of rank ``ndim + 1``."""
    wsc = jax.lax.with_sharding_constraint

    def entry(e):
        if isinstance(e, QuantKV):
            return QuantKV(wsc(e.q, cache_sharding[e.q.ndim]),
                           wsc(e.s, cache_sharding[e.s.ndim + 1]))
        return wsc(e, cache_sharding[e.ndim])

    return jax.tree_util.tree_map(
        entry, caches, is_leaf=lambda x: isinstance(x, QuantKV))


def _serving_jit(fn):
    """`jax.jit` with XLA compiler options from ``UA2_XLA_OPTS``
    ("k=v,k2=v2"). Needed because backend-plugin flags (e.g. the
    `xla_tpu_copy_elision_analysis_allowance` copy-insertion cap probed
    in docs/profile_decode_r4.md §3) are rejected by the LOCAL
    ``XLA_FLAGS`` parser under the remote-TPU tunnel — per-jit
    compiler_options travel with the compile request and are validated
    by the backend that owns them."""
    opts = os.environ.get("UA2_XLA_OPTS", "")
    if not opts.strip():
        return jax.jit(fn)
    parsed: Dict[str, Any] = {}
    for kv in opts.split(","):
        kv = kv.strip()
        if not kv:
            continue  # tolerate trailing/duplicate commas
        k, sep, v = kv.partition("=")
        k, v = k.strip(), v.strip()
        if not sep or not k or not v:
            raise ValueError(
                f"UA2_XLA_OPTS: malformed segment {kv!r} "
                "(expected comma-separated key=value pairs)")
        lv = v.lower()
        if lv in ("true", "false"):
            parsed[k] = lv == "true"
        else:
            try:
                parsed[k] = int(v)
            except ValueError:
                try:
                    parsed[k] = float(v)
                except ValueError:
                    parsed[k] = v
    return jax.jit(fn, compiler_options=parsed)

Params = Dict[str, Any]

# Prompt bucket lengths: one XLA program per bucket, reused across calls.
DEFAULT_BUCKETS = (64, 128, 256, 512, 1024, 2048)

PHASE_DROPPED = 0
PHASE_REASON = 1
PHASE_SEMANTIC = 2


def resolve_kv_quant(mode: Optional[str], cache_len: int, cache_dtype,
                     batch: int = 1):
    """Resolve the int8-KV-cache switch for one compiled program.

    ``mode``: "on"/"1"/"int8" force the quantized cache, "off"/"0" force
    the given ``cache_dtype``, "auto"/None read ``UA2_KV_QUANT`` (default
    auto). AUTO policy from the round-5 TPU A/B on the real generation
    loop (docs/kv_quant_r5.md): int8 KV wins every BATCHED config —
    +2.4 % at batch 8 and +5.7-6.4 % at batch 16 even at the short
    256-slot budget (attention reads scale with batch; the bf16->int8
    byte halving beats the extra quantize arithmetic) — and wins batch-1
    at long budgets (+1.9 % at cache 768) while costing a within-noise
    -0.3 % at batch-1 cache 256. AUTO therefore turns on when
    ``batch >= 8`` OR ``cache_len >= 512``."""
    if mode is None:
        mode = os.environ.get("UA2_KV_QUANT", "auto")
    mode = str(mode).strip().lower()
    aliases = {"0": "off", "off": "off", "1": "on", "on": "on",
               "int8": "on", "auto": "auto"}
    if mode not in aliases:
        raise ValueError(
            f"UA2_KV_QUANT={mode!r}: expected on/1/int8, off/0, or auto")
    mode = aliases[mode]
    if mode == "on" or (mode == "auto"
                        and (cache_len >= 512 or batch >= 8)
                        and cache_dtype != jnp.int8):
        return jnp.int8
    return cache_dtype


def resolve_kv_write(mode: Optional[str]) -> str:
    """Resolve the cache-write discipline: "inline" (default — each layer
    writes its K/V slot before attending) or "deferred" (attention reads
    the cache prefix plus the fresh K/V as an extra softmax column, and
    the whole frame's K/V land in ONE coalesced stacked write —
    `gpt.decode_step(kv_write="deferred")`). None reads ``UA2_KV_WRITE``
    (default inline). Unrecognized values raise."""
    if mode is None:
        mode = os.environ.get("UA2_KV_WRITE", "inline")
    mode = str(mode).strip().lower()
    if mode not in ("inline", "deferred"):
        raise ValueError(
            f"UA2_KV_WRITE={mode!r}: expected inline or deferred")
    return mode


def resolve_attn_block(attn_block: Optional[int], cache_len: int) -> int:
    """Resolve the prefix-bounded-attention block for one compiled program.

    ``attn_block < 0`` means AUTO: block 128 when the program's cache
    budget is >= 512 slots, off below. Policy from the round-4 TPU A/B on
    the real generation loop (docs/profile_decode_r4.md): at cache 256 the
    per-layer `lax.switch` overhead loses 2-6% at every batch size; at
    cache 768 it wins +22% at batch 16, +4.7% at batch 8, and is
    noise-level (+1.9%) at batch 1; block 128 >= block 64 at every
    measured point."""
    if attn_block is None:
        attn_block = -1
    if attn_block < 0:
        return 128 if cache_len >= 512 else 0
    return attn_block


def pick_bucket(length: int, buckets=DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if length <= b:
            return b
    raise ValueError(
        f"prompt length {length} exceeds the largest bucket {buckets[-1]} "
        f"(the reference caps its KV cache at 2048, model_new.py:560)"
    )


class _LoopState(NamedTuple):
    step: jax.Array             # i32: frames emitted so far
    pos: jax.Array              # i32: next absolute position to write
    finished: jax.Array         # bool
    frame_tokens: jax.Array     # (B, 1, 9) feedback tokens
    frame_mask: jax.Array       # (B, 1, 9) feedback mask
    is_reason: jax.Array        # bool: still in reasoning phase
    forbid_prefix: jax.Array    # i32: 0 or audio_reason_card
    key: jax.Array              # PRNG
    caches: UnifiedCaches
    audio_out: jax.Array        # (max_frames, 8) i32
    phase_out: jax.Array        # (max_frames,) i32
    text_out: jax.Array         # (max_frames,) i32


def _build_generate(
    cfg: UnifiedModelConfig,
    *,
    mode: str,                 # "text" | "audio"
    bucket: int,
    max_frames: int,
    temperature: float,
    topk: int,
    use_cfg: bool,
    cache_dtype=jnp.bfloat16,
    cache_sharding=None,
    approx_topk: bool = False,
    cache_lists: bool = False,
    attn_block: int = 0,
    kv_quant: Optional[str] = None,
    kv_write: str = "inline",
):
    """Construct the jittable full-generation function for one configuration."""
    ts = cfg.tokens
    ncb = ts.num_codebooks
    batch = 2 if use_cfg else 1

    # Size the KV caches to this program's actual budget (prompt bucket +
    # frame cap, 256-aligned) instead of the 2048 ceiling: decode attention
    # reads the whole static cache every step, so this directly scales the
    # per-frame HBM traffic with the real workload.
    cache_len = min(cfg.max_seq_len, -(-(bucket + max_frames) // 256) * 256)
    attn_block = resolve_attn_block(attn_block, cache_len)
    cache_dtype = resolve_kv_quant(kv_quant, cache_len, cache_dtype,
                                   batch=batch)

    def generate(
        params: Params,
        grid: jax.Array,        # (B, bucket, 9) int32, padded prompt
        grid_mask: jax.Array,   # (B, bucket, 9) bool
        prompt_len: jax.Array,  # i32 scalar: true prompt length L
        key: jax.Array,
        cfg_scale: jax.Array,   # f32 scalar (ignored unless use_cfg)
    ):
        caches = unified.init_caches(cfg, batch, dtype=cache_dtype,
                                     seq_len=cache_len,
                                     as_lists=cache_lists)
        if cache_sharding is not None:
            caches = _shard_caches(caches, cache_sharding)
        # Prefill positions [0, bucket-1) with grid[:, :-1] (reference
        # forward_prefix consumes tokens[:, :-1], asr_task.py:658).
        caches = unified.prefill(
            params, cfg, grid[:, :-1], grid_mask[:, :-1], caches
        )
        # First decode input: the last *real* prompt token, at pos L-1.
        last_idx = (prompt_len - 1).astype(jnp.int32)
        first_tokens = jax.lax.dynamic_slice_in_dim(grid, last_idx, 1, axis=1)
        first_mask = jax.lax.dynamic_slice_in_dim(grid_mask, last_idx, 1, axis=1)

        state = _LoopState(
            step=jnp.int32(0),
            pos=last_idx.astype(jnp.int32),
            finished=jnp.asarray(False),
            frame_tokens=first_tokens,
            frame_mask=first_mask,
            is_reason=jnp.asarray(True),
            forbid_prefix=jnp.int32(0),
            key=key,
            caches=caches,
            audio_out=jnp.zeros((max_frames, ncb), jnp.int32),
            phase_out=jnp.zeros((max_frames,), jnp.int32),
            text_out=jnp.full((max_frames,), -1, jnp.int32),
        )

        def cond(s: _LoopState):
            in_range = jnp.logical_and(
                s.step < max_frames, s.pos < cache_len - 1
            )
            return jnp.logical_and(in_range, jnp.logical_not(s.finished))

        def body(s: _LoopState) -> _LoopState:
            key, sub = jax.random.split(s.key)
            frame, caches = unified.decode_frame(
                params, cfg, s.frame_tokens, s.frame_mask, s.caches, s.pos,
                sub, temperature=temperature, topk=topk,
                forbid_prefix=s.forbid_prefix,
                use_cfg=use_cfg, cfg_scale=cfg_scale,
                sample_text=mode == "text", sample_audio=mode == "audio",
                approx_topk=approx_topk, attn_block=attn_block,
                kv_write=kv_write,
            )
            text_tok = frame[0, 0]          # row 0 = conditioned
            audio_toks = frame[0, 1:]       # (8,)

            if mode == "text":
                finished = text_tok == ts.text_eos
                text_out = s.text_out.at[s.step].set(
                    jnp.where(finished, -1, text_tok)
                )
                # Feedback: zero audio, text-only mask (asr_task.py:673-680).
                fb_tokens = jnp.concatenate(
                    [jnp.zeros((batch, ncb), jnp.int32),
                     jnp.broadcast_to(text_tok, (batch,))[:, None]], axis=1,
                )[:, None, :]
                fb_mask = jnp.concatenate(
                    [jnp.zeros((batch, ncb), bool), jnp.ones((batch, 1), bool)],
                    axis=1,
                )[:, None, :]
                return s._replace(
                    step=s.step + 1, pos=s.pos + 1, finished=finished,
                    frame_tokens=fb_tokens, frame_mask=fb_mask, key=key,
                    caches=caches, text_out=text_out,
                )

            # ---- two-phase audio mode (tts_task.py:253-282) ----
            sem_eos = jnp.all(audio_toks == (ts.semantic_eos + ts.audio_reason_card))
            reason_eos_frame = jnp.all(audio_toks == ts.reason_eos)
            switch = jnp.logical_and(s.is_reason, reason_eos_frame)
            finished = sem_eos
            # the reference saves every frame except the REOS switch frame
            # and the SEOS stop frame (its save_flag is cleared on the switch
            # frame and restored before the next one, tts_task.py:264-273)
            save_now = jnp.logical_and(
                jnp.logical_not(switch), jnp.logical_not(finished)
            )
            new_is_reason = jnp.logical_and(s.is_reason, jnp.logical_not(switch))
            phase = jnp.where(
                save_now,
                jnp.where(new_is_reason, PHASE_REASON, PHASE_SEMANTIC),
                PHASE_DROPPED,
            )
            audio_out = s.audio_out.at[s.step].set(audio_toks)
            phase_out = s.phase_out.at[s.step].set(phase)
            text_out = s.text_out.at[s.step].set(text_tok)
            new_forbid = jnp.where(
                switch, jnp.int32(ts.audio_reason_card), s.forbid_prefix
            )
            # Feedback: raw audio tokens, audio-only mask (tts_task.py:275-277).
            fb_tokens = jnp.concatenate(
                [jnp.broadcast_to(audio_toks, (batch, ncb)),
                 jnp.broadcast_to(text_tok, (batch,))[:, None]], axis=1,
            )[:, None, :]
            fb_mask = jnp.concatenate(
                [jnp.ones((batch, ncb), bool), jnp.zeros((batch, 1), bool)],
                axis=1,
            )[:, None, :]
            return s._replace(
                step=s.step + 1, pos=s.pos + 1, finished=finished,
                frame_tokens=fb_tokens, frame_mask=fb_mask,
                is_reason=new_is_reason,
                forbid_prefix=new_forbid, key=key, caches=caches,
                audio_out=audio_out, phase_out=phase_out, text_out=text_out,
            )

        final = jax.lax.while_loop(cond, body, state)
        return final.text_out, final.audio_out, final.phase_out, final.step

    return generate


class _BatchState(NamedTuple):
    step: jax.Array             # i32
    finished: jax.Array         # (B,) bool
    frame_tokens: jax.Array     # (B, 1, 9)
    frame_mask: jax.Array       # (B, 1, 9)
    is_reason: jax.Array        # (B,) bool
    forbid_prefix: jax.Array    # (B,) i32
    key: jax.Array
    caches: UnifiedCaches
    audio_out: jax.Array        # (B, max_frames, 8)
    phase_out: jax.Array        # (B, max_frames)
    text_out: jax.Array         # (B, max_frames)


def _build_generate_batched(
    cfg: UnifiedModelConfig,
    *,
    mode: str,                 # "text" | "audio"
    bucket: int,
    n_rows: int,
    max_frames: int,
    temperature: float,
    topk: int,
    use_cfg: bool = False,
    cache_dtype=jnp.bfloat16,
    cache_sharding=None,
    approx_topk: bool = False,
    cache_lists: bool = False,
    attn_block: int = 0,
    kv_quant: Optional[str] = None,
    kv_write: str = "inline",
):
    """Batched multi-utterance generation: B independent rows decode in one
    compiled loop with per-row EOS / two-phase state.

    Ragged prompts are LEFT-padded to a shared bucket, so every row's last
    real token sits at slot ``bucket-1`` and decoding is contiguous for all
    rows; RoPE is relative, so the per-row shift preserves attention geometry
    exactly. A per-row ``key_valid`` mask hides the left-padding cache slots
    in both prefill and decode. This is the throughput path the reference
    lacks entirely — its Generators are strictly batch 1 (`asr_task.py:186`).

    With ``use_cfg`` the rows are interleaved [cond_i, uncond_i] pairs
    (``n_rows`` counts rows, i.e. 2x the utterances — reference batch-2 CFG
    trick `tts_task.py:232-236` generalised to many utterances); samples are
    mixed per pair inside `unified.decode_frame`, so paired rows stay in
    lockstep and the caller reads every even row.
    """
    ts = cfg.tokens
    ncb = ts.num_codebooks
    if use_cfg:
        assert n_rows % 2 == 0, "CFG rows come in [cond, uncond] pairs"
    cache_len = min(
        max(cfg.max_seq_len, bucket + max_frames + 1),
        -(-(bucket + max_frames + 1) // 256) * 256,
    )
    attn_block = resolve_attn_block(attn_block, cache_len)
    cache_dtype = resolve_kv_quant(kv_quant, cache_len, cache_dtype,
                                   batch=n_rows)

    def generate(
        params: Params,
        grid: jax.Array,        # (B, bucket, 9) LEFT-padded
        grid_mask: jax.Array,   # (B, bucket, 9)
        prompt_lens: jax.Array,  # (B,) i32
        key: jax.Array,
        cfg_scale: jax.Array,   # f32 scalar (ignored unless use_cfg)
    ):
        b = n_rows
        caches = unified.init_caches(cfg, b, dtype=cache_dtype,
                                     seq_len=cache_len,
                                     as_lists=cache_lists)
        if cache_sharding is not None:
            caches = _shard_caches(caches, cache_sharding)
        slot = jnp.arange(cache_len, dtype=jnp.int32)
        pad = (bucket - prompt_lens)[:, None]      # (B, 1) left-pad widths
        key_valid = slot[None, :] >= pad           # pad slots invalid forever
        caches = unified.prefill(
            params, cfg, grid[:, :-1], grid_mask[:, :-1], caches,
            key_valid=key_valid[:, : bucket - 1],
        )
        first_tokens = grid[:, -1:]   # every row's last real token
        first_mask = grid_mask[:, -1:]

        state = _BatchState(
            step=jnp.int32(0),
            finished=jnp.zeros((b,), bool),
            frame_tokens=first_tokens,
            frame_mask=first_mask,
            is_reason=jnp.ones((b,), bool),
            forbid_prefix=jnp.zeros((b,), jnp.int32),
            key=key,
            caches=caches,
            audio_out=jnp.zeros((b, max_frames, ncb), jnp.int32),
            phase_out=jnp.zeros((b, max_frames), jnp.int32),
            text_out=jnp.full((b, max_frames), -1, jnp.int32),
        )

        def cond(s: _BatchState):
            in_range = jnp.logical_and(
                s.step < max_frames, bucket + s.step < cache_len - 1
            )
            return jnp.logical_and(in_range, jnp.logical_not(jnp.all(s.finished)))

        def body(s: _BatchState) -> _BatchState:
            if s.key.ndim == 2:
                # per-row keys (B, 2): each row's sample stream is a pure
                # function of (its seed, step, codebook) — independent of
                # batch composition (VERDICT r2 item 8)
                key = s.key
                sub = jax.vmap(jax.random.fold_in, (0, None))(s.key, s.step)
            else:
                key, sub = jax.random.split(s.key)
            pos = jnp.int32(bucket - 1) + s.step
            frame, caches = unified.decode_frame(
                params, cfg, s.frame_tokens, s.frame_mask, s.caches, pos,
                sub, temperature=temperature, topk=topk,
                forbid_prefix=s.forbid_prefix[:, None],
                use_cfg=use_cfg, cfg_scale=cfg_scale,
                key_valid=key_valid,
                sample_text=mode == "text", sample_audio=mode == "audio",
                approx_topk=approx_topk, attn_block=attn_block,
                kv_write=kv_write,
            )
            text_tok = frame[:, 0]          # (B,)
            audio_toks = frame[:, 1:]       # (B, 8)

            if mode == "text":
                eos_now = text_tok == ts.text_eos
                finished = jnp.logical_or(s.finished, eos_now)
                emit = jnp.where(
                    jnp.logical_or(s.finished, eos_now), -1, text_tok
                )
                text_out = s.text_out.at[:, s.step].set(emit)
                fb_tokens = jnp.concatenate(
                    [jnp.zeros((b, ncb), jnp.int32), text_tok[:, None]], 1
                )[:, None, :]
                fb_mask = jnp.concatenate(
                    [jnp.zeros((b, ncb), bool), jnp.ones((b, 1), bool)], 1
                )[:, None, :]
                return s._replace(
                    step=s.step + 1, finished=finished,
                    frame_tokens=fb_tokens, frame_mask=fb_mask, key=key,
                    caches=caches, text_out=text_out,
                )

            sem_eos = jnp.all(
                audio_toks == (ts.semantic_eos + ts.audio_reason_card), axis=1
            )
            reason_eos_frame = jnp.all(audio_toks == ts.reason_eos, axis=1)
            switch = jnp.logical_and(s.is_reason, reason_eos_frame)
            finished = jnp.logical_or(s.finished, sem_eos)
            # save everything except switch/stop frames (see unbatched note)
            save_now = ~switch & ~sem_eos & ~s.finished
            new_is_reason = s.is_reason & ~switch
            phase = jnp.where(
                save_now,
                jnp.where(new_is_reason, PHASE_REASON, PHASE_SEMANTIC),
                PHASE_DROPPED,
            )
            audio_out = s.audio_out.at[:, s.step].set(audio_toks)
            phase_out = s.phase_out.at[:, s.step].set(phase)
            text_out = s.text_out.at[:, s.step].set(text_tok)
            new_forbid = jnp.where(
                switch, jnp.int32(ts.audio_reason_card), s.forbid_prefix
            )
            fb_tokens = jnp.concatenate(
                [audio_toks, text_tok[:, None]], 1
            )[:, None, :]
            fb_mask = jnp.concatenate(
                [jnp.ones((b, ncb), bool), jnp.zeros((b, 1), bool)], 1
            )[:, None, :]
            return s._replace(
                step=s.step + 1, finished=finished,
                frame_tokens=fb_tokens, frame_mask=fb_mask,
                is_reason=new_is_reason,
                forbid_prefix=new_forbid, key=key, caches=caches,
                audio_out=audio_out, phase_out=phase_out, text_out=text_out,
            )

        final = jax.lax.while_loop(cond, body, state)
        return final.text_out, final.audio_out, final.phase_out, final.step

    return generate


class DecodeEngine:
    """Caches jit-compiled generation programs keyed by
    (mode, bucket, sampling config) and exposes host-friendly entry points.

    This is the TPU equivalent of the per-task Generator decode loops
    (`evaluation/*.py`); the prompt-grid *construction* lives in
    `engine/tasks.py` and stays on the host (pure numpy).
    """

    def __init__(
        self,
        params: Params,
        cfg: UnifiedModelConfig,
        *,
        max_frames: int = 500,   # reference cap (tts_task.py:222)
        cache_dtype=jnp.bfloat16,
        buckets: Tuple[int, ...] = DEFAULT_BUCKETS,
        mesh=None,
        use_tp: bool = False,
        approx_topk: bool = True,
        attn_block: Optional[int] = None,
        kv_quant: Optional[str] = None,
        kv_write: Optional[str] = None,
    ):
        """``kv_quant`` ("auto"/"on"/"off", default env ``UA2_KV_QUANT`` or
        auto) selects the int8 KV cache per compiled program
        (`resolve_kv_quant`): int8 values + per-slot scales, read natively
        by int8 MXU contractions (`ops/attention.py`) — halves cache HBM
        traffic and doubles servable rows/context per chip.

        ``mesh``: optional `jax.sharding.Mesh` for multi-chip serving —
        parameters are placed by `parallel/mesh.py`'s specs (FSDP over the
        `fsdp` axis, attention-head/MLP-hidden tensor parallelism over `tp`
        when ``use_tp``), the KV caches are sharded over `tp` on the
        kv-group axis, and XLA SPMD inserts the collectives inside the
        compiled generation loops. Single-chip when None.

        ``approx_topk`` (default ON, r3): sampled paths use TPU-native
        `lax.approx_max_k` at recall 0.95 — a total-variation shift below
        ~1e-3 at serving temperatures for ~3.4% end-to-end throughput
        (1286 -> 1330 tok/s batch-1); greedy (topk=1) is argmax either way,
        so token-identity guarantees are unaffected. Pass False for exact
        `lax.top_k` sampling.

        ``attn_block`` (default from env ``UA2_ATTN_BLOCK``; "auto"/unset =
        per-program policy, 0 = off, N = explicit block) bounds
        decode-attention READS to the smallest block multiple covering the
        current position (`ops/attention.py prefix_levels`): early steps
        stream only the filled cache prefix, so attention traffic scales
        with actual context instead of the (bucket+max_frames) budget.
        Token-identical; pays one `lax.switch` per layer-step. AUTO
        enables block 128 only for programs whose cache budget is >= 512
        slots — the measured crossover on the real loop (r4 A/B, block 128
        at cache 768: +22% batch-16 / +4.7% batch-8 / noise at batch-1;
        at cache 256 every batch size lost 2-6% to the switch —
        docs/profile_decode_r4.md)."""
        self.cfg = cfg
        self.max_frames = max_frames
        self.cache_dtype = cache_dtype
        if attn_block is None:
            env = os.environ.get("UA2_ATTN_BLOCK", "auto")
            attn_block = -1 if env == "auto" else int(env)
        self.attn_block = int(attn_block)
        self.kv_quant = kv_quant
        self.kv_write = resolve_kv_write(kv_write)
        self.buckets = tuple(b for b in buckets if b <= cfg.max_seq_len) or (
            cfg.max_seq_len,
        )
        self._compiled: Dict[Tuple, Any] = {}
        self.approx_topk = approx_topk
        # unrolled per-layer weights pair with per-layer cache buffers
        # (`ops/kv_cache.py`): removes the stacked-slice cache copies that
        # dominate batched decode glue (~1.7 ms/frame at batch 16).
        # Deferred KV writes instead require the STACKED layout (the frame
        # write is one dynamic_update_slice across all layers, and reads
        # are free static slices — no per-layer `.at[i].set` ever happens).
        self._cache_lists = isinstance(
            params.get("backbone", {}).get("layers"), list
        ) and self.kv_write != "deferred"
        self._cache_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from uniaudio2_tpu.parallel import mesh as meshlib

            params = meshlib.shard_params(params, mesh, use_tp=use_tp)
            # shard kv groups over tp: cache leaves are (L, B, G, S, hd)
            # stacked or (B, G, S, hd) per-layer lists
            tp = "tp" if use_tp else None
            self._cache_sharding = {
                5: NamedSharding(mesh, PartitionSpec(None, None, tp)),
                4: NamedSharding(mesh, PartitionSpec(None, tp)),
            }
        self.params = params

    def _get(self, mode: str, bucket: int, temperature: float, topk: int,
             use_cfg: bool):
        key = (mode, bucket, float(temperature), int(topk), bool(use_cfg),
               self.approx_topk)
        if key not in self._compiled:
            fn = _build_generate(
                self.cfg, mode=mode, bucket=bucket,
                max_frames=self.max_frames, temperature=temperature,
                topk=topk, use_cfg=use_cfg, cache_dtype=self.cache_dtype,
                cache_sharding=self._cache_sharding,
                approx_topk=self.approx_topk,
                cache_lists=self._cache_lists,
                attn_block=self.attn_block,
                kv_quant=self.kv_quant,
                kv_write=self.kv_write,
            )
            self._compiled[key] = _serving_jit(fn)
        return self._compiled[key]

    def _pad_grid(
        self, grid: np.ndarray, mask: np.ndarray, use_cfg: bool,
        neg_grid: Optional[np.ndarray], neg_mask: Optional[np.ndarray],
    ) -> Tuple[jax.Array, jax.Array, int, int]:
        length = grid.shape[0]
        bucket = pick_bucket(length, self.buckets)
        par = self.cfg.tokens.parallel_number
        batch = 2 if use_cfg else 1
        g = np.zeros((batch, bucket, par), np.int32)
        m = np.zeros((batch, bucket, par), bool)
        g[0, :length] = grid
        m[0, :length] = mask
        if use_cfg:
            assert neg_grid is not None and neg_grid.shape[0] == length, (
                "CFG negative prompt must have the same length as the prompt "
                "(the reference builds it by pad-substitution, "
                "tts_task.py:171-189)"
            )
            g[1, :length] = neg_grid
            m[1, :length] = neg_mask
        return jnp.asarray(g), jnp.asarray(m), length, bucket

    # ------------------------------------------------------------------
    # Public entry points
    # ------------------------------------------------------------------

    def generate_text(
        self,
        grid: np.ndarray,
        mask: np.ndarray,
        *,
        temperature: float = 0.9,
        topk: int = 1,
        seed: int = 888,
        no_repeat_ngram: int = 0,
    ) -> np.ndarray:
        """Text-output decode (ASR / captioning / QA). Returns the generated
        text token ids (1-D, EOS excluded). With ``no_repeat_ngram`` > 0 the
        host-driven blocked-sampling path is used (reference
        `generate_asr_with_ngram_sampling`, `asr_task.py:329`)."""
        if no_repeat_ngram > 0:
            return self._generate_text_host(
                grid, mask, temperature=temperature, topk=topk, seed=seed,
                no_repeat_ngram=no_repeat_ngram,
            )
        g, m, length, bucket = self._pad_grid(grid, mask, False, None, None)
        fn = self._get("text", bucket, temperature, topk, False)
        text_out, _, _, n = fn(
            self.params, g, m, jnp.int32(length),
            jax.random.PRNGKey(seed), jnp.float32(1.0),
        )
        text = np.asarray(text_out)
        n = int(n)
        toks = text[:n]
        return toks[toks >= 0]

    # ------------------------------------------------------------------
    # Batched multi-utterance decoding
    # ------------------------------------------------------------------

    def _get_batched(self, mode, bucket, n_rows, temperature, topk,
                     use_cfg=False):
        key = ("batched", mode, bucket, n_rows, float(temperature), int(topk),
               bool(use_cfg), self.approx_topk)
        if key not in self._compiled:
            fn = _build_generate_batched(
                self.cfg, mode=mode, bucket=bucket, n_rows=n_rows,
                max_frames=self.max_frames, temperature=temperature,
                topk=topk, use_cfg=use_cfg, cache_dtype=self.cache_dtype,
                cache_sharding=self._cache_sharding,
                approx_topk=self.approx_topk,
                cache_lists=self._cache_lists,
                attn_block=self.attn_block,
                kv_quant=self.kv_quant,
                kv_write=self.kv_write,
            )
            self._compiled[key] = _serving_jit(fn)
        return self._compiled[key]

    def _pack_left(self, items):
        """[(grid (S_i, 9), mask)] -> left-padded (B, bucket, 9) arrays."""
        par = self.cfg.tokens.parallel_number
        lengths = [g.shape[0] for g, _ in items]
        bucket = pick_bucket(max(lengths), self.buckets)
        b = len(items)
        grid = np.zeros((b, bucket, par), np.int32)
        mask = np.zeros((b, bucket, par), bool)
        for i, (g, m) in enumerate(items):
            grid[i, bucket - g.shape[0]:] = g
            mask[i, bucket - g.shape[0]:] = m
        return (jnp.asarray(grid), jnp.asarray(mask),
                jnp.asarray(lengths, jnp.int32), bucket)

    @staticmethod
    def _row_keys(seeds) -> jax.Array:
        """(B,) seeds -> (B, 2) per-row PRNG keys (each row's sample stream
        is then a function of its own seed only, not of batch composition;
        logits can still differ across *buckets*, so reproducibility is
        bucket-for-bucket)."""
        return jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])

    def generate_text_batch(
        self,
        items,
        *,
        temperature: float = 0.9,
        topk: int = 1,
        seed: int = 888,
        seeds=None,
    ):
        """Decode B prompts concurrently (ASR over a directory etc.).

        Args:
            items: list of (grid (S_i, 9), mask) pairs from `engine/tasks.py`.
            seeds: optional per-item seeds; with them each row consumes its
                own PRNG stream (same item + seed -> same tokens whatever
                else is in the batch). Without, the whole batch shares one
                stream seeded by ``seed``.
        Returns:
            list of 1-D generated-token arrays (EOS excluded), input order.
        """
        g, m, lens, bucket = self._pack_left(items)
        fn = self._get_batched("text", bucket, len(items), temperature, topk)
        key = (self._row_keys(seeds) if seeds is not None
               else jax.random.PRNGKey(seed))
        if seeds is not None:
            assert len(seeds) == len(items)
        text_out, _, _, n = fn(self.params, g, m, lens, key, jnp.float32(1.0))
        text = np.asarray(text_out)
        n = int(n)
        out = []
        for row in text[:, :n]:
            out.append(row[row >= 0])
        return out

    def generate_audio_batch(
        self,
        items,
        *,
        temperature: float = 0.9,
        topk: int = 200,
        seed: int = 888,
        seeds=None,
        use_cfg: bool = False,
        cfg_scale: float = 1.0,
        neg_items=None,
    ):
        """Two-phase audio decode over B prompts concurrently.

        With ``use_cfg``, ``neg_items`` supplies each item's negative (pad-
        substituted) prompt (reference `prepare_tts_task_for_cfg`,
        `tts_task.py:171-189`); rows are interleaved [cond_i, uncond_i] and
        decoded as 2B rows in one program.

        ``seeds`` (one per item) switches to per-row PRNG streams — see
        `generate_text_batch`; under CFG each [cond, uncond] pair shares the
        item's key (sampling reads the cond row's stream).

        Returns a list of (reason (8, T1_i), semantic (8, T2_i)) per item.
        """
        if use_cfg:
            assert neg_items is not None and len(neg_items) == len(items), (
                "CFG needs one negative prompt per item"
            )
            rows = []
            for (g, m), (ng, nm) in zip(items, neg_items):
                assert ng.shape == g.shape, (
                    "CFG negative prompt must have the same length as the "
                    "prompt (pad-substitution, tts_task.py:171-189)"
                )
                rows.extend([(g, m), (ng, nm)])
        else:
            rows = items
        g, m, lens, bucket = self._pack_left(rows)
        fn = self._get_batched("audio", bucket, len(rows), temperature, topk,
                               use_cfg=use_cfg)
        if seeds is not None:
            assert len(seeds) == len(items)
            row_seeds = ([s for s in seeds for _ in range(2)]
                         if use_cfg else list(seeds))
            key = self._row_keys(row_seeds)
        else:
            key = jax.random.PRNGKey(seed)
        _, audio_out, phase_out, n = fn(
            self.params, g, m, lens, key, jnp.float32(cfg_scale),
        )
        audio = np.asarray(audio_out)
        phases = np.asarray(phase_out)
        n = int(n)
        stride = 2 if use_cfg else 1
        return [
            split_two_phase(audio[i * stride], phases[i * stride], n,
                            self.cfg.tokens.audio_reason_card)
            for i in range(len(items))
        ]

    # ------------------------------------------------------------------
    # Host-driven single-step decoding (ngram blocking / beam search).
    # The reference's beam search calls a method that does not exist
    # (`asr_task.py:593`, SURVEY.md §7 "known defects"); this is the working
    # single-step-logits API it needed: prefill + per-step text logits, with
    # the host supplying the search control.
    # ------------------------------------------------------------------

    def _get_host_step(self, bucket: int, batch: int):
        key = ("host", bucket, batch)
        if key not in self._compiled:
            cfg = self.cfg

            host_dtype = resolve_kv_quant(
                self.kv_quant, cfg.max_seq_len, self.cache_dtype,
                batch=batch)

            def prefill_fn(params, grid, grid_mask):
                caches = unified.init_caches(cfg, batch, dtype=host_dtype,
                                             as_lists=self._cache_lists)
                return unified.prefill(
                    params, cfg, grid[:, :-1], grid_mask[:, :-1], caches
                )

            # host-driven steps use the full max_seq_len cache: prefix
            # bounding applies there too (ADVICE r3 item 2)
            host_blk = resolve_attn_block(self.attn_block, cfg.max_seq_len)

            def step_fn(params, tokens, mask, caches, pos):
                last_h, caches = unified.decode_hidden(
                    params, cfg, tokens, mask, caches, pos,
                    attn_block=host_blk, kv_write=self.kv_write,
                )
                return gpt.lm_head(params["backbone"], last_h, cfg.backbone), caches

            def reorder_fn(caches, order):
                # stacked value leaves are (L, B, G, S, hd); per-layer list
                # leaves are (B, G, S, hd); QuantKV scales drop the trailing
                # head axis — the batch axis is always ndim-4 (values) /
                # ndim-3 (scales)
                def entry(c):
                    if isinstance(c, QuantKV):
                        return QuantKV(jnp.take(c.q, order, axis=c.q.ndim - 4),
                                       jnp.take(c.s, order, axis=c.s.ndim - 3))
                    return jnp.take(c, order, axis=c.ndim - 4)

                return jax.tree_util.tree_map(
                    entry, caches, is_leaf=lambda x: isinstance(x, QuantKV))

            self._compiled[key] = (
                _serving_jit(prefill_fn), _serving_jit(step_fn),
                _serving_jit(reorder_fn)
            )
        return self._compiled[key]

    def _text_feedback(self, text_tokens: np.ndarray):
        """(B,) text ids -> (B, 1, 9) tokens + text-only mask."""
        b = text_tokens.shape[0]
        par = self.cfg.tokens.parallel_number
        toks = np.zeros((b, 1, par), np.int32)
        toks[:, 0, -1] = text_tokens
        m = np.zeros((b, 1, par), bool)
        m[:, :, -1] = True
        return jnp.asarray(toks), jnp.asarray(m)

    def _generate_text_host(
        self, grid, mask, *, temperature, topk, seed, no_repeat_ngram
    ) -> np.ndarray:
        ts = self.cfg.tokens
        length = grid.shape[0]
        bucket = pick_bucket(length, self.buckets)
        par = ts.parallel_number
        g = np.zeros((1, bucket, par), np.int32)
        m = np.zeros((1, bucket, par), bool)
        g[0, :length], m[0, :length] = grid, mask
        prefill_fn, step_fn, _ = self._get_host_step(bucket, 1)
        caches = prefill_fn(self.params, jnp.asarray(g), jnp.asarray(m))

        rng = np.random.default_rng(seed)
        out: list = []
        tokens = jnp.asarray(g[:, length - 1 : length])
        tmask = jnp.asarray(m[:, length - 1 : length])
        pos = length - 1
        for _ in range(self.max_frames):
            logits, caches = step_fn(self.params, tokens, tmask, caches, jnp.int32(pos))
            lg = np.asarray(logits[0], np.float64) / max(temperature, 1e-6)
            if no_repeat_ngram > 1 and len(out) >= no_repeat_ngram - 1:
                banned = _banned_ngram_tokens(out, no_repeat_ngram)
                lg[list(banned)] = -np.inf
            if topk > 1:
                kth = np.partition(lg, -topk)[-topk]
                lg[lg < kth] = -np.inf
                gumbel = rng.gumbel(size=lg.shape)
                tok = int(np.argmax(lg + gumbel))
            else:
                tok = int(np.argmax(lg))
            if tok == ts.text_eos:
                break
            out.append(tok)
            tokens, tmask = self._text_feedback(np.asarray([tok]))
            pos += 1
            if pos >= self.cfg.max_seq_len - 1:
                break
        return np.asarray(out, np.int64)

    def generate_text_beam(
        self,
        grid: np.ndarray,
        mask: np.ndarray,
        *,
        beam_size: int = 4,
        length_penalty: float = 1.0,
        max_steps: Optional[int] = None,
    ) -> np.ndarray:
        """Beam search over the text stream (the working replacement for the
        reference's broken `generate_asr_beam_search`, `asr_task.py:438-596`;
        length-penalised scoring per `:523`)."""
        ts = self.cfg.tokens
        length = grid.shape[0]
        bucket = pick_bucket(length, self.buckets)
        par = ts.parallel_number
        g = np.zeros((beam_size, bucket, par), np.int32)
        m = np.zeros((beam_size, bucket, par), bool)
        g[:, :length], m[:, :length] = grid, mask
        prefill_fn, step_fn, reorder_fn = self._get_host_step(bucket, beam_size)
        caches = prefill_fn(self.params, jnp.asarray(g), jnp.asarray(m))

        scores = np.full((beam_size,), -np.inf)
        scores[0] = 0.0  # all beams identical at step 0
        seqs: list = [[] for _ in range(beam_size)]
        alive = np.ones((beam_size,), bool)
        finished: list = []  # (score, seq)

        tokens = jnp.asarray(g[:, length - 1 : length])
        tmask = jnp.asarray(m[:, length - 1 : length])
        pos = length - 1
        steps = max_steps or self.max_frames
        for _ in range(steps):
            logits, caches = step_fn(self.params, tokens, tmask, caches, jnp.int32(pos))
            logp = np.asarray(
                jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            )
            total = scores[:, None] + np.where(alive[:, None], logp, -np.inf)
            flat = total.reshape(-1)
            top = np.argpartition(flat, -beam_size)[-beam_size:]
            top = top[np.argsort(flat[top])[::-1]]
            v = logp.shape[-1]
            new_seqs, new_scores, order, next_toks = [], [], [], []
            for idx in top:
                b_idx, tok = int(idx // v), int(idx % v)
                cand_seq = seqs[b_idx] + [tok]
                cand_score = float(flat[idx])
                if tok == ts.text_eos:
                    lp = max(len(cand_seq) - 1, 1) ** length_penalty
                    finished.append((cand_score / lp, seqs[b_idx]))
                    continue
                new_seqs.append(cand_seq)
                new_scores.append(cand_score)
                order.append(b_idx)
                next_toks.append(tok)
            if not new_seqs:
                break
            while len(new_seqs) < beam_size:  # refill slots with worst beam
                new_seqs.append(new_seqs[-1])
                new_scores.append(-np.inf)
                order.append(order[-1])
                next_toks.append(next_toks[-1])
            seqs = new_seqs
            scores = np.asarray(new_scores)
            caches = reorder_fn(caches, jnp.asarray(order, jnp.int32))
            tokens, tmask = self._text_feedback(np.asarray(next_toks))
            pos += 1
            if pos >= self.cfg.max_seq_len - 1:
                break
            if finished and len(finished) >= beam_size:
                break
        if not finished:
            finished = [
                (s / max(len(q), 1) ** length_penalty, q)
                for s, q in zip(scores, seqs)
            ]
        best = max(finished, key=lambda x: x[0])[1]
        return np.asarray(best, np.int64)

    def generate_audio(
        self,
        grid: np.ndarray,
        mask: np.ndarray,
        *,
        temperature: float = 0.9,
        topk: int = 200,
        seed: int = 888,
        use_cfg: bool = False,
        cfg_scale: float = 1.0,
        neg_grid: Optional[np.ndarray] = None,
        neg_mask: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Two-phase audio decode (TTS/TTA/TTM/LTS/s2s). Returns
        (reason (8, T1), semantic (8, T2)) numpy arrays, matching the
        reference's return convention (`tts_task.py:283-285`)."""
        g, m, length, bucket = self._pad_grid(
            grid, mask, use_cfg, neg_grid, neg_mask
        )
        fn = self._get("audio", bucket, temperature, topk, use_cfg)
        _, audio_out, phase_out, n = fn(
            self.params, g, m, jnp.int32(length),
            jax.random.PRNGKey(seed), jnp.float32(cfg_scale),
        )
        return split_two_phase(
            np.asarray(audio_out), np.asarray(phase_out), int(n),
            self.cfg.tokens.audio_reason_card,
        )


def _banned_ngram_tokens(history, n: int):
    """Next tokens that would complete an already-seen n-gram."""
    banned = set()
    prefix = tuple(history[-(n - 1):])
    for i in range(len(history) - n + 1):
        if tuple(history[i : i + n - 1]) == prefix:
            banned.add(history[i + n - 1])
    return banned


def split_two_phase(
    audio_out: np.ndarray, phase_out: np.ndarray, n_steps: int,
    reason_card: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reproduce the reference's phase-split postprocessing
    (`tts_task.py:261-285`): collect saved reasoning / semantic frames, drop
    the first frame of each phase (the generated BOS frame), subtract the
    reasoning-card offset from semantic codes, and return (8, T) layouts."""
    phases = phase_out[:n_steps]
    frames = audio_out[:n_steps]
    reason = frames[phases == PHASE_REASON][1:]
    semantic = frames[phases == PHASE_SEMANTIC][1:] - reason_card
    return reason.T.astype(np.int64), semantic.T.astype(np.int64)
