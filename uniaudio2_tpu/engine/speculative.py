"""Speculative decoding for the unified audio LM (VERDICT r3 item 4).

Batch-1 decode runs at 94-95% of the weight-stream roofline
(docs/profile_decode_r3.md), so the remaining batch-1 multiplier is
drafting: a cheap DRAFT model proposes k frames autoregressively, the
TARGET model verifies all of them in ONE multi-position forward, and the
longest agreeing prefix is accepted. The natural configuration here is
int4 draft / bf16-or-int8 target over the SAME weights (self-drafting
via quantization), or a shallower draft once distilled checkpoints exist.

Frame-level scheme (each "token" of this model is a 9-stream frame whose
8 audio codebooks come from a sequential local decoder):

    round:
      1. draft k frames f_0..f_{k-1} greedily (k cheap frame steps), plus
         one extra draft step that only INGESTS f_{k-1}'s feedback into
         the draft cache (keeps the draft cache gap-free for any accept
         length).
      2. target verify: one T=k+1 step over inputs [f_-1, f_0..f_{k-1}]
         -> target hiddens h_0..h_k and cache writes at positions
         p..p+k; the local decoder re-scores each drafted frame
         TEACHER-FORCED (microstep i conditions on the DRAFTED codebook
         i-1), so all k frames verify in parallel batched rows.
      3. n_acc = longest prefix where target argmax == drafted frame
         (all 8 codebooks in audio mode; the text token in text mode).
      4. ONE fresh frame from the target at h_{n_acc}: the correction at
         the first mismatch, or the bonus frame when everything matched —
         a plain sequential local decode (it is a new frame, so it cannot
         be teacher-forced).
      5. emit n_acc+1 frames through the exact per-frame state machine of
         the plain loop (two-phase switch / EOS / budget); pos advances
         by n_acc+1. KV "rewind" is free: the caches are static buffers
         masked by position, and every slot <= the new pos was written
         with accepted-prefix inputs, while stale slots beyond it are
         overwritten by the next round before they can ever be attended.

Exactness: with GREEDY sampling (the mode implemented), the emitted
stream is bit-identical to the target model's plain greedy decode for ANY
draft — acceptance only short-circuits computation, never changes it
(tested with draft==target, an unrelated random draft, and a perturbed
draft; `tests/test_speculative.py`). Sampled (temperature>0) speculative
decoding needs per-token rejection sampling to preserve the target
distribution — deferred until acceptance rates are measurable on real
checkpoints (random-weight argmax chains are chaos,
docs/quant_quality_r3.md), like the acceptance-rate studies themselves.

Reference match: accelerates the `generate_frame` hot loop
(`llm_models/model_new.py:568-645`) — a TPU-native serving addition with
no reference counterpart.
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine.decode import (
    DEFAULT_BUCKETS, PHASE_DROPPED, PHASE_REASON, PHASE_SEMANTIC,
    pick_bucket, resolve_attn_block, split_two_phase,
)
from uniaudio2_tpu.models import gpt, unified
from uniaudio2_tpu.models.unified import UnifiedCaches, _fuse_input
from uniaudio2_tpu.ops.kv_cache import init_cache
from uniaudio2_tpu.ops.quant import matmul

Params = Dict[str, Any]


def _decode_hidden_all(
    params: Params,
    cfg: UnifiedModelConfig,
    tokens: jax.Array,          # (B, T, 9)
    tokens_mask: jax.Array,     # (B, T, 9)
    caches: UnifiedCaches,
    pos: jax.Array,
    attn_block: int = 0,
) -> Tuple[jax.Array, UnifiedCaches]:
    """`unified.decode_hidden` for T>1 query steps, returning EVERY
    position's final hidden state (B, T, D) — the verify pass needs all of
    them, not just the last."""
    audio_input, text_embeds, a_mask, t_mask = _fuse_input(
        params, cfg, tokens, tokens_mask
    )
    h_audio, und = gpt.decode_step(
        params["understanding_expert"], cfg.understanding_expert,
        audio_input, caches.understanding, pos, attn_block=attn_block)
    backbone_input = h_audio * a_mask + text_embeds * t_mask
    h, bb = gpt.decode_step(
        params["backbone"], cfg.backbone, backbone_input, caches.backbone,
        pos, attn_block=attn_block)
    h_gen, gen = gpt.decode_step(
        params["generation_expert"], cfg.generation_expert, h * a_mask,
        caches.generation, pos, attn_block=attn_block)
    h_final = h_gen * a_mask + h * t_mask
    return h_final, UnifiedCaches(bb, und, gen)


def _local_decoder_score(
    params: Params,
    cfg: UnifiedModelConfig,
    last_h: jax.Array,          # (N, D_backbone)
    frames: jax.Array,          # (N, 8) drafted codebooks (teacher forcing)
    forbid_prefix: jax.Array,   # (N,) int32
) -> jax.Array:
    """Target argmax for every codebook of N frames in parallel: microstep
    i conditions on the DRAFTED codebook i-1 (teacher forcing), so the
    whole k-frame verify is one batched 8-microstep pass instead of k
    sequential frame decodes. Mirrors `_local_decoder_generate`'s layout
    handling (folded projection table / per-codebook head lists /
    quantized weights). Returns (N, 8) argmax ids under the forbid mask."""
    n = last_h.shape[0]
    dcfg = cfg.decoder
    ncb = cfg.tokens.num_codebooks
    audio_vocab = cfg.tokens.audio_vocab
    cache = init_cache(dcfg, n, ncb, dtype=last_h.dtype)
    proj_table = params.get("audio_embeddings_proj")
    heads = params["audio_head"]

    if proj_table is not None:
        curr = matmul(last_h, params["projection_w"]).astype(
            proj_table.dtype)[:, None, :]
    else:
        curr = last_h[:, None, :]
    out = []
    vocab_idx = None
    for i in range(ncb):
        if proj_table is None:
            proj = matmul(curr, params["projection_w"])
        else:
            proj = curr
        dec_h, cache = gpt.decode_step(params["decoder"], dcfg, proj,
                                       cache, jnp.int32(i))
        head_i = heads[i]
        logits = matmul(dec_h[:, -1, :], head_i, out_dtype=jnp.float32)
        if vocab_idx is None:
            vocab_idx = jnp.arange(logits.shape[-1], dtype=jnp.int32)
        masked = jnp.where(vocab_idx[None, :] < forbid_prefix[:, None],
                           -jnp.inf, logits)
        out.append(jnp.argmax(masked, axis=-1).astype(jnp.int32))
        # teacher forcing: feed the DRAFTED codebook i, not the argmax
        table = params["audio_embeddings"] if proj_table is None \
            else proj_table
        curr = jnp.take(table, frames[:, i] + i * audio_vocab,
                        axis=0)[:, None, :]
    return jnp.stack(out, axis=1)   # (N, 8)


class _SpecState(NamedTuple):
    step: jax.Array             # i32: frames emitted (incl. dropped tags)
    pos: jax.Array              # i32: next position to write
    finished: jax.Array         # bool
    frame_tokens: jax.Array     # (1, 1, 9) feedback
    frame_mask: jax.Array       # (1, 1, 9)
    is_reason: jax.Array        # bool
    forbid_prefix: jax.Array    # i32
    draft_caches: UnifiedCaches
    target_caches: UnifiedCaches
    audio_out: jax.Array        # (out_cap, 8)
    phase_out: jax.Array        # (out_cap,)
    text_out: jax.Array         # (out_cap,)
    rounds: jax.Array           # i32: speculation rounds executed
    drafted: jax.Array          # i32: total drafted frames (= rounds*k)
    accepted: jax.Array         # i32: total accepted drafted frames


def _build_spec_generate(
    cfg: UnifiedModelConfig,
    *,
    mode: str,                  # "text" | "audio"
    bucket: int,
    max_frames: int,
    k: int,
    cache_dtype=jnp.bfloat16,
    attn_block: int = -1,
):
    """Compiled speculative generation (greedy). ``params`` is a dict
    {"draft": draft_params, "target": target_params}."""
    ts = cfg.tokens
    ncb = ts.num_codebooks
    cache_len = min(cfg.max_seq_len, -(-(bucket + max_frames + k + 1)
                                       // 256) * 256)
    attn_block = resolve_attn_block(attn_block, cache_len)
    out_cap = max_frames + k + 1    # emit slack; step caps at max_frames

    def fb_audio(audio_toks):
        toks = jnp.concatenate(
            [audio_toks[None, :], jnp.zeros((1, 1), jnp.int32)], axis=1
        )[:, None, :]
        mask = jnp.concatenate(
            [jnp.ones((1, ncb), bool), jnp.zeros((1, 1), bool)], axis=1
        )[:, None, :]
        return toks, mask

    def fb_text(text_tok):
        toks = jnp.concatenate(
            [jnp.zeros((1, ncb), jnp.int32),
             text_tok.reshape(1, 1)], axis=1)[:, None, :]
        mask = jnp.concatenate(
            [jnp.zeros((1, ncb), bool), jnp.ones((1, 1), bool)], axis=1
        )[:, None, :]
        return toks, mask

    def generate(params, grid, grid_mask, prompt_len, key, cfg_scale):
        del key, cfg_scale      # greedy; API symmetry with DecodeEngine
        draft_p, target_p = params["draft"], params["target"]
        d_lists = isinstance(draft_p.get("backbone", {}).get("layers"),
                             list)
        t_lists = isinstance(target_p.get("backbone", {}).get("layers"),
                             list)
        d_caches = unified.init_caches(cfg, 1, dtype=cache_dtype,
                                       seq_len=cache_len, as_lists=d_lists)
        t_caches = unified.init_caches(cfg, 1, dtype=cache_dtype,
                                       seq_len=cache_len, as_lists=t_lists)
        d_caches = unified.prefill(draft_p, cfg, grid[:, :-1],
                                   grid_mask[:, :-1], d_caches)
        t_caches = unified.prefill(target_p, cfg, grid[:, :-1],
                                   grid_mask[:, :-1], t_caches)
        last_idx = (prompt_len - 1).astype(jnp.int32)
        first_tokens = jax.lax.dynamic_slice_in_dim(grid, last_idx, 1, 1)
        first_mask = jax.lax.dynamic_slice_in_dim(grid_mask, last_idx, 1, 1)

        state = _SpecState(
            step=jnp.int32(0), pos=last_idx.astype(jnp.int32),
            finished=jnp.asarray(False),
            frame_tokens=first_tokens, frame_mask=first_mask,
            is_reason=jnp.asarray(True), forbid_prefix=jnp.int32(0),
            draft_caches=d_caches, target_caches=t_caches,
            audio_out=jnp.zeros((out_cap, ncb), jnp.int32),
            phase_out=jnp.zeros((out_cap,), jnp.int32),
            text_out=jnp.full((out_cap,), -1, jnp.int32),
            rounds=jnp.int32(0), drafted=jnp.int32(0),
            accepted=jnp.int32(0),
        )

        def cond(s: _SpecState):
            in_range = jnp.logical_and(
                s.step < max_frames, s.pos < cache_len - (k + 1)
            )
            return jnp.logical_and(in_range, jnp.logical_not(s.finished))

        def draft_one(carry, _):
            """One greedy draft frame step + its local phase bookkeeping."""
            toks, mask, caches, pos, is_reason, forbid = carry
            frame, caches = unified.decode_frame(
                draft_p, cfg, toks, mask, caches, pos,
                jax.random.PRNGKey(0), temperature=1.0, topk=1,
                forbid_prefix=forbid, sample_text=mode == "text",
                sample_audio=mode == "audio", attn_block=attn_block,
            )
            text_tok = frame[0, 0]
            audio_toks = frame[0, 1:]
            if mode == "text":
                toks, mask = fb_text(text_tok)
                new_reason, new_forbid = is_reason, forbid
            else:
                reason_eos = jnp.all(audio_toks == ts.reason_eos)
                switch = jnp.logical_and(is_reason, reason_eos)
                new_reason = jnp.logical_and(is_reason,
                                             jnp.logical_not(switch))
                new_forbid = jnp.where(switch,
                                       jnp.int32(ts.audio_reason_card),
                                       forbid)
                toks, mask = fb_audio(audio_toks)
            out = (frame[0], forbid)    # frame + the forbid it was DRAWN under
            return (toks, mask, caches, pos + 1, new_reason, new_forbid), out

        def body(s: _SpecState) -> _SpecState:
            # ---- 1. draft k frames + ingest the k-th feedback ----------
            carry = (s.frame_tokens, s.frame_mask, s.draft_caches, s.pos,
                     s.is_reason, s.forbid_prefix)
            carry, (draft_frames, frame_forbids) = jax.lax.scan(
                draft_one, carry, None, length=k)
            d_toks, d_mask, d_caches, _, _, _ = carry
            _, d_caches = unified.decode_hidden(
                draft_p, cfg, d_toks, d_mask, d_caches, s.pos + k,
                attn_block=attn_block)
            # draft_frames: (k, 9); frame_forbids: (k,)

            # ---- 2. target verify over T = k+1 positions ---------------
            # inputs: [f_-1 (current feedback), f_0..f_{k-1}]
            if mode == "text":
                fbs = jax.vmap(lambda f: fb_text(f[0]))(draft_frames)
            else:
                fbs = jax.vmap(lambda f: fb_audio(f[1:]))(draft_frames)
            v_toks = jnp.concatenate(
                [s.frame_tokens, fbs[0][:, 0, 0][None]], axis=1)
            v_mask = jnp.concatenate(
                [s.frame_mask, fbs[1][:, 0, 0][None]], axis=1)
            h_all, t_caches = _decode_hidden_all(
                target_p, cfg, v_toks, v_mask, s.target_caches, s.pos,
                attn_block=attn_block)     # (1, k+1, D)
            h_all = h_all[0]               # (k+1, D)

            if mode == "text":
                t_logits = gpt.lm_head(target_p["backbone"], h_all[:k],
                                       cfg.backbone)
                t_argmax = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)
                match = t_argmax == draft_frames[:, 0]       # (k,)
            else:
                t_audio = _local_decoder_score(
                    target_p, cfg, h_all[:k], draft_frames[:, 1:],
                    frame_forbids)                           # (k, 8)
                match = jnp.all(t_audio == draft_frames[:, 1:], axis=1)

            # ---- 3. longest accepted prefix -----------------------------
            n_acc = jnp.argmin(
                jnp.concatenate([match, jnp.asarray([False])])
            ).astype(jnp.int32)            # k when all match

            # ---- 4. fresh frame from the target at h[n_acc] -------------
            # state after the accepted prefix (forbid may flip inside it)
            def acc_state(j, c):
                is_r, forbid, fin = c
                use = j < n_acc
                if mode == "text":
                    tok = draft_frames[j, 0]
                    fin_j = tok == ts.text_eos
                    return (is_r, forbid,
                            jnp.logical_or(fin, jnp.logical_and(use, fin_j)))
                audio = draft_frames[j, 1:]
                sem_eos = jnp.all(audio == ts.semantic_eos
                                  + ts.audio_reason_card)
                reason_eos = jnp.all(audio == ts.reason_eos)
                switch = jnp.logical_and(is_r, reason_eos)
                is_r = jnp.where(use, jnp.logical_and(
                    is_r, jnp.logical_not(switch)), is_r)
                forbid = jnp.where(
                    jnp.logical_and(use, switch),
                    jnp.int32(ts.audio_reason_card), forbid)
                fin = jnp.logical_or(fin, jnp.logical_and(use, sem_eos))
                return (is_r, forbid, fin)

            is_r_acc, forbid_acc, fin_acc = jax.lax.fori_loop(
                0, k, acc_state,
                (s.is_reason, s.forbid_prefix, jnp.asarray(False)))

            h_fresh = jax.lax.dynamic_slice_in_dim(h_all, n_acc, 1, 0)
            if mode == "text":
                fr_logits = gpt.lm_head(target_p["backbone"], h_fresh,
                                        cfg.backbone)
                fresh_text = jnp.argmax(
                    fr_logits, axis=-1)[0].astype(jnp.int32)
                fresh_frame = jnp.concatenate(
                    [fresh_text[None], jnp.zeros((ncb,), jnp.int32)])
            else:
                fresh_audio = unified._local_decoder_generate(
                    target_p, cfg, h_fresh, jax.random.PRNGKey(0),
                    temperature=1.0, topk=1, forbid_prefix=forbid_acc,
                    use_cfg=False, cfg_scale=None,
                )[0].astype(jnp.int32)     # (8,)
                fresh_frame = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32), fresh_audio])

            # ---- 5. emit accepted frames + the fresh frame --------------
            class Emit(NamedTuple):
                step: jax.Array
                pos: jax.Array
                finished: jax.Array
                is_reason: jax.Array
                forbid: jax.Array
                audio_out: jax.Array
                phase_out: jax.Array
                text_out: jax.Array
                fb: Tuple[jax.Array, jax.Array]
                applied: jax.Array

            def emit_one(j, e: Emit) -> Emit:
                frame = jnp.where(j < n_acc, draft_frames[
                    jnp.minimum(j, k - 1)], fresh_frame)
                apply = jnp.logical_and(
                    jnp.logical_and(j <= n_acc,
                                    jnp.logical_not(e.finished)),
                    jnp.logical_and(e.step < max_frames,
                                    e.pos < cache_len - 1))
                text_tok = frame[0]
                audio_toks = frame[1:]
                if mode == "text":
                    fin = text_tok == ts.text_eos
                    emit_tok = jnp.where(fin, -1, text_tok)
                    text_out = e.text_out.at[e.step].set(
                        jnp.where(apply, emit_tok, e.text_out[e.step]))
                    fb = fb_text(text_tok)
                    return Emit(
                        step=e.step + apply, pos=e.pos + apply,
                        finished=jnp.logical_or(
                            e.finished, jnp.logical_and(apply, fin)),
                        is_reason=e.is_reason, forbid=e.forbid,
                        audio_out=e.audio_out, phase_out=e.phase_out,
                        text_out=text_out,
                        fb=(jnp.where(apply, fb[0], e.fb[0]),
                            jnp.where(apply, fb[1], e.fb[1])),
                        applied=e.applied + apply)
                sem_eos = jnp.all(audio_toks == ts.semantic_eos
                                  + ts.audio_reason_card)
                reason_eos = jnp.all(audio_toks == ts.reason_eos)
                switch = jnp.logical_and(e.is_reason, reason_eos)
                save = jnp.logical_and(jnp.logical_not(switch),
                                       jnp.logical_not(sem_eos))
                new_reason = jnp.logical_and(e.is_reason,
                                             jnp.logical_not(switch))
                phase = jnp.where(
                    save, jnp.where(new_reason, PHASE_REASON,
                                    PHASE_SEMANTIC), PHASE_DROPPED)
                audio_out = e.audio_out.at[e.step].set(
                    jnp.where(apply, audio_toks, e.audio_out[e.step]))
                phase_out = e.phase_out.at[e.step].set(
                    jnp.where(apply, phase, e.phase_out[e.step]))
                fb = fb_audio(audio_toks)
                return Emit(
                    step=e.step + apply, pos=e.pos + apply,
                    finished=jnp.logical_or(
                        e.finished, jnp.logical_and(apply, sem_eos)),
                    is_reason=jnp.where(apply, new_reason, e.is_reason),
                    forbid=jnp.where(
                        jnp.logical_and(apply, switch),
                        jnp.int32(ts.audio_reason_card), e.forbid),
                    audio_out=audio_out, phase_out=phase_out,
                    text_out=e.text_out,
                    fb=(jnp.where(apply, fb[0], e.fb[0]),
                        jnp.where(apply, fb[1], e.fb[1])),
                    applied=e.applied + apply)

            e0 = Emit(step=s.step, pos=s.pos, finished=s.finished,
                      is_reason=s.is_reason, forbid=s.forbid_prefix,
                      audio_out=s.audio_out, phase_out=s.phase_out,
                      text_out=s.text_out,
                      fb=(s.frame_tokens, s.frame_mask),
                      applied=jnp.int32(0))
            e = jax.lax.fori_loop(0, k + 1, emit_one, e0)

            return s._replace(
                step=e.step, pos=e.pos, finished=e.finished,
                frame_tokens=e.fb[0], frame_mask=e.fb[1],
                is_reason=e.is_reason, forbid_prefix=e.forbid,
                draft_caches=d_caches, target_caches=t_caches,
                audio_out=e.audio_out, phase_out=e.phase_out,
                text_out=e.text_out,
                rounds=s.rounds + 1, drafted=s.drafted + k,
                accepted=s.accepted + n_acc,
            )

        final = jax.lax.while_loop(cond, body, state)
        stats = jnp.stack([final.rounds, final.drafted, final.accepted])
        return (final.text_out, final.audio_out, final.phase_out,
                final.step, stats)

    return generate


class SpeculativeEngine:
    """Greedy speculative decode engine: same host API shape as
    `DecodeEngine` for the single-utterance entries, plus per-call
    acceptance statistics in ``self.last_stats``.

    ``draft_params`` and ``target_params`` may use different layouts /
    quantizations (e.g. int4all serving draft + int8 serving target). The
    output is bit-identical to plain greedy decoding with
    ``target_params`` for ANY draft."""

    def __init__(
        self,
        draft_params: Params,
        target_params: Params,
        cfg: UnifiedModelConfig,
        *,
        k: int = 4,
        max_frames: int = 500,
        cache_dtype=jnp.bfloat16,
        buckets: Tuple[int, ...] = DEFAULT_BUCKETS,
        attn_block: Optional[int] = None,
    ):
        self.cfg = cfg
        self.k = int(k)
        self.max_frames = max_frames
        self.cache_dtype = cache_dtype
        self.buckets = tuple(b for b in buckets if b <= cfg.max_seq_len) \
            or (cfg.max_seq_len,)
        if attn_block is None:
            env = os.environ.get("UA2_ATTN_BLOCK", "auto")
            attn_block = -1 if env == "auto" else int(env)
        self.attn_block = int(attn_block)
        self.params = {"draft": draft_params, "target": target_params}
        self._compiled: Dict[Tuple, Any] = {}
        self.last_stats: Optional[Dict[str, int]] = None

    def _get(self, mode: str, bucket: int):
        key = (mode, bucket)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(_build_spec_generate(
                self.cfg, mode=mode, bucket=bucket,
                max_frames=self.max_frames, k=self.k,
                cache_dtype=self.cache_dtype, attn_block=self.attn_block))
        return self._compiled[key]

    def _run(self, mode, grid, mask):
        length = grid.shape[0]
        bucket = pick_bucket(length, self.buckets)
        par = self.cfg.tokens.parallel_number
        g = np.zeros((1, bucket, par), np.int32)
        m = np.zeros((1, bucket, par), bool)
        g[0, :length] = grid
        m[0, :length] = mask
        fn = self._get(mode, bucket)
        text_out, audio_out, phase_out, n, stats = fn(
            self.params, jnp.asarray(g), jnp.asarray(m),
            jnp.int32(length), jax.random.PRNGKey(0), jnp.float32(1.0))
        stats = np.asarray(stats)
        self.last_stats = {
            "rounds": int(stats[0]), "drafted": int(stats[1]),
            "accepted": int(stats[2]),
            "acceptance_rate": float(stats[2]) / max(int(stats[1]), 1),
        }
        return text_out, audio_out, phase_out, int(n)

    def generate_text(self, grid, mask, **_) -> np.ndarray:
        text_out, _, _, n = self._run("text", grid, mask)
        toks = np.asarray(text_out)[:n]
        return toks[toks >= 0]

    def generate_audio(self, grid, mask, **_):
        _, audio_out, phase_out, n = self._run("audio", grid, mask)
        return split_two_phase(
            np.asarray(audio_out), np.asarray(phase_out), n,
            self.cfg.tokens.audio_reason_card)
