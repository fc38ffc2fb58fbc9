"""Task prompt-grid construction (host-side, pure numpy).

Builds the (S, 9) token grid + mask that conditions the unified model, with
exactly the reference's framing semantics:

* ``text_pad`` / ``audio_pad`` stream packing (`evaluation/asr_task.py:262-275`)
* reason/semantic BOS/EOS framing and the ``+ audio_reason_card`` semantic
  offset (`asr_task.py:306-313`, `audio_understanding.py:220-231`)
* ``<key>...</key>`` special-token wrapping of non-``text_seq`` text segments
  (`audio_understanding.py:209-218`)
* audio-prompt re-framing with ``audio_prompt_bos/eos``
  (`audio_understanding.py:195-202,259-265`)
* the generic multi-key conditioner `get_condition_seq`
  (`audio_understanding.py:233-281`) which subsumes every per-task
  ``prepare_*`` helper in `evaluation/*.py`
* CFG negative prompts by pad-token substitution (`tts_task.py:171-189`)

Also carries the task-format DSL verbatim-in-semantics
(`llm_utils/task_definition.py:48-257`): per-task key order, key types and
loss keys.

These are pure data transforms — goldenable and independent of JAX.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from uniaudio2_tpu.config import TokenSpace

# ---------------------------------------------------------------------------
# Task-format DSL (semantics of llm_utils/task_definition.py:48-257)
# ---------------------------------------------------------------------------


def _fmt(keys, types, loss_key):
    return {"keys": list(keys), "type": list(types), "features": [],
            "loss_key": list(loss_key)}


TASK_FORMATS: Dict[str, Dict[str, List[str]]] = {
    "text_only": _fmt(["text_seq"], ["text"], ["text_seq"]),
    "audio_only": _fmt(["reason_seq", "semantic_seq"], ["audio", "audio"],
                       ["reason_seq", "semantic_seq"]),
    "reason_to_semantic": _fmt(["reason_seq", "semantic_seq"],
                               ["audio", "audio"], ["semantic_seq"]),
    "semantic_to_reason": _fmt(["semantic_seq", "reason_seq"],
                               ["audio", "audio"], ["reason_seq"]),
    "semantic_copy": _fmt(["reason_seq", "semantic_seq", "semantic_seq2"],
                          ["audio"] * 3, ["semantic_seq2"]),
    "reason_copy": _fmt(["reason_seq", "semantic_seq", "reason_seq2"],
                        ["audio"] * 3, ["reason_seq2"]),
    "ASR": _fmt(["reason_seq", "semantic_seq", "transcription_seq"],
                ["audio", "audio", "text"], ["transcription_seq"]),
    "Yue_ASR": _fmt(["reason_seq", "semantic_seq", "transcription_seq"],
                    ["audio", "audio", "text"], ["transcription_seq"]),
    "D_ASR": _fmt(["reason_seq", "semantic_seq", "transcription_seq"],
                  ["audio", "audio", "text"], ["transcription_seq"]),
    "lyric_recognition": _fmt(["reason_seq", "semantic_seq", "lyric_seq"],
                              ["audio", "audio", "text"], ["lyric_seq"]),
    "audio_caption": _fmt(["reason_seq", "semantic_seq", "caption_seq"],
                          ["audio", "audio", "text"], ["caption_seq"]),
    "music_caption": _fmt(["reason_seq", "semantic_seq", "caption_seq"],
                          ["audio", "audio", "text"], ["caption_seq"]),
    "TTS": _fmt(["transcription_seq", "reason_seq", "semantic_seq"],
                ["text", "audio", "audio"], ["reason_seq", "semantic_seq"]),
    "Yue_TTS": _fmt(["transcription_seq", "reason_seq", "semantic_seq"],
                    ["text", "audio", "audio"], ["reason_seq", "semantic_seq"]),
    "TTA": _fmt(["caption_seq", "reason_seq", "semantic_seq"],
                ["text", "audio", "audio"], ["reason_seq", "semantic_seq"]),
    "TTM": _fmt(["caption_seq", "reason_seq", "semantic_seq"],
                ["text", "audio", "audio"], ["reason_seq", "semantic_seq"]),
    "LTS": _fmt(["lyric_seq", "reason_seq", "semantic_seq"],
                ["text", "audio", "audio"], ["reason_seq", "semantic_seq"]),
    "InstructTTS": _fmt(
        ["caption_seq", "transcription_seq", "reason_seq", "semantic_seq"],
        ["text", "text", "audio", "audio"], ["reason_seq", "semantic_seq"]),
    "prompt_instruct_tts": _fmt(
        ["audio_prompt_seq", "caption_seq", "transcription_seq",
         "reason_seq", "semantic_seq"],
        ["audio_prompt", "text", "text", "audio", "audio"],
        ["reason_seq", "semantic_seq"]),
    "speech_edit": _fmt(
        ["text_seq", "reason_seq_1", "semantic_seq_1",
         "reason_seq_2", "semantic_seq_2"],
        ["text", "audio", "audio", "audio", "audio"],
        ["reason_seq_2", "semantic_seq_2"]),
    "speech_denoise": _fmt(
        ["reason_seq_1", "semantic_seq_1", "reason_seq_2", "semantic_seq_2"],
        ["audio"] * 4, ["reason_seq_2", "semantic_seq_2"]),
    "speech_ss": _fmt(
        ["reason_seq_mix", "semantic_seq_mix", "reason_seq_1",
         "semantic_seq_1", "reason_seq_2", "semantic_seq_2"],
        ["audio"] * 6,
        ["reason_seq_1", "semantic_seq_1", "reason_seq_2", "semantic_seq_2"]),
    "music_ss": _fmt(
        ["reason_seq_mix", "semantic_seq_mix", "reason_seq_1",
         "semantic_seq_1", "reason_seq_2", "semantic_seq_2"],
        ["audio"] * 6,
        ["reason_seq_1", "semantic_seq_1", "reason_seq_2", "semantic_seq_2"]),
    "speech_s2t": _fmt(["reason_seq", "semantic_seq", "text_seq"],
                       ["audio", "audio", "text"], ["text_seq"]),
    "speech_s2s": _fmt(
        ["reason_seq_1", "semantic_seq_1", "reason_seq_2", "semantic_seq_2"],
        ["audio"] * 4, ["reason_seq_2", "semantic_seq_2"]),
    "audio_understanding": _fmt(
        ["text_seq_question", "reason_seq", "semantic_seq", "text_seq_answer"],
        ["text", "audio", "audio", "text"], ["text_seq_answer"]),
}


# ---------------------------------------------------------------------------
# Stream packing primitives
# ---------------------------------------------------------------------------


def text_pad(x: np.ndarray, ts: TokenSpace) -> np.ndarray:
    """(T,) text ids -> (T, 9) grid rows: audio streams = empty_token,
    text stream = x (reference `text_pad`, asr_task.py:262-268)."""
    x = np.asarray(x, np.int64).reshape(-1)
    rows = np.full((len(x), ts.parallel_number), ts.empty_token, np.int64)
    rows[:, -1] = x
    return rows


def audio_pad(x: np.ndarray, ts: TokenSpace) -> np.ndarray:
    """(T, 8) audio codes -> (T, 9): text stream = empty_token
    (reference `audio_pad`, asr_task.py:270-275)."""
    x = np.asarray(x, np.int64)
    rows = np.full((x.shape[0], ts.parallel_number), ts.empty_token, np.int64)
    rows[:, :-1] = x
    return rows


def _text_mask(n: int, ts: TokenSpace) -> np.ndarray:
    m = np.zeros((n, ts.parallel_number), bool)
    m[:, -1] = True
    return m


def _audio_mask(n: int, ts: TokenSpace) -> np.ndarray:
    m = np.zeros((n, ts.parallel_number), bool)
    m[:, :-1] = True
    return m


def reason_bos_eos(x: np.ndarray, ts: TokenSpace) -> np.ndarray:
    """Frame (T, 8) reasoning codes with reason BOS/EOS rows
    (audio_understanding.py:220-224)."""
    x = np.asarray(x, np.int64)
    bos = np.full((1, x.shape[1]), ts.reason_bos, np.int64)
    eos = np.full((1, x.shape[1]), ts.reason_eos, np.int64)
    return np.concatenate([bos, x, eos], axis=0)


def semantic_bos_eos(x: np.ndarray, ts: TokenSpace) -> np.ndarray:
    """Frame (T, 8) semantic codes with semantic BOS/EOS rows, then shift the
    whole segment by ``audio_reason_card`` (audio_understanding.py:226-231)."""
    x = np.asarray(x, np.int64)
    bos = np.full((1, x.shape[1]), ts.semantic_bos, np.int64)
    eos = np.full((1, x.shape[1]), ts.semantic_eos, np.int64)
    return np.concatenate([bos, x, eos], axis=0) + ts.audio_reason_card


def audio_prompt_bos_eos(x: np.ndarray, ts: TokenSpace) -> np.ndarray:
    """Replace the first/last frames of an (already semantic-framed) segment
    with audio-prompt delimiters (audio_understanding.py:195-202)."""
    x = np.asarray(x, np.int64)
    bos = np.full((1, x.shape[1]), ts.audio_prompt_bos, np.int64)
    eos = np.full((1, x.shape[1]), ts.audio_prompt_eos, np.int64)
    return np.concatenate([bos, x[1:-1], eos], axis=0)


def add_special_token(key: str, ids: np.ndarray, ts: TokenSpace) -> np.ndarray:
    """Wrap a text segment with its ``<key>`` / ``</key>`` special tokens;
    plain ``text_seq*`` segments pass through (audio_understanding.py:209-218)."""
    if key.startswith("text_seq"):
        return np.asarray(ids, np.int64).reshape(-1)
    base = key.replace("_seq", "")
    # strip trailing indices like transcription_seq_1 -> transcription
    while base and (base[-1].isdigit() or base.endswith("_")):
        base = base[:-1]
    start = ts.special("<" + base + ">")
    end = ts.special("</" + base + ">")
    ids = np.asarray(ids, np.int64).reshape(-1)
    return np.concatenate([[start], ids, [end]])


# ---------------------------------------------------------------------------
# Generic conditioner (reference get_condition_seq,
# audio_understanding.py:233-281)
# ---------------------------------------------------------------------------


def build_condition_grid(
    task_prompt: np.ndarray,
    d: Mapping[str, np.ndarray],
    keys: Sequence[str],
    types: Sequence[str],
    ts: TokenSpace,
) -> Tuple[np.ndarray, np.ndarray]:
    """Build the (S, 9) conditioning grid + mask.

    Args:
        task_prompt: (P,) tokenized task-instruction text.
        d: per-key data — text keys map to 1-D id arrays; audio keys map to
           (T, 8) code arrays (time-major, codebooks last).
        keys/types: conditioning key order and types, usually a prefix of a
           TASK_FORMATS entry.
    """
    seqs: List[np.ndarray] = [text_pad(task_prompt, ts)]
    masks: List[np.ndarray] = [_text_mask(seqs[0].shape[0], ts)]
    for key, tp in zip(keys, types):
        data = np.asarray(d[key])
        if tp == "text":
            data = add_special_token(key, data, ts)
            rows = text_pad(data, ts)
            masks.append(_text_mask(rows.shape[0], ts))
        elif tp == "audio_prompt":
            data = semantic_bos_eos(data, ts)
            data = audio_prompt_bos_eos(data, ts)
            rows = audio_pad(data, ts)
            masks.append(_audio_mask(rows.shape[0], ts))
        else:  # "audio"
            if key.startswith("reason_seq"):
                data = reason_bos_eos(data, ts)
            else:
                data = semantic_bos_eos(data, ts)
            rows = audio_pad(data, ts)
            masks.append(_audio_mask(rows.shape[0], ts))
        seqs.append(rows)
    grid = np.concatenate(seqs, axis=0).astype(np.int64)
    mask = np.concatenate(masks, axis=0)
    return grid, mask


def build_cfg_negative_grid(
    task_prompt: np.ndarray,
    d: Mapping[str, np.ndarray],
    keys: Sequence[str],
    types: Sequence[str],
    ts: TokenSpace,
) -> Tuple[np.ndarray, np.ndarray]:
    """Negative (unconditioned) prompt for classifier-free guidance: same
    shape as the positive grid, every text-stream value replaced by
    ``text_pad_token`` (reference `prepare_tts_task_for_cfg`,
    tts_task.py:171-189)."""
    neg_prompt = np.full_like(np.asarray(task_prompt, np.int64), ts.text_pad_token)
    neg_d = {}
    for key, tp in zip(keys, types):
        data = np.asarray(d[key])
        if tp == "text":
            # pad-substitute *after* special-token framing length is added:
            # the reference wraps first, then substitutes (tts_task.py:181-182)
            framed = add_special_token(key, data, ts)
            neg_d[key] = np.full_like(framed, ts.text_pad_token)
        else:
            neg_d[key] = data
    # re-run the builder but avoid re-wrapping the already-framed text keys
    seqs: List[np.ndarray] = [text_pad(neg_prompt, ts)]
    masks: List[np.ndarray] = [_text_mask(len(neg_prompt), ts)]
    for key, tp in zip(keys, types):
        data = neg_d[key]
        if tp == "text":
            rows = text_pad(data, ts)
            masks.append(_text_mask(rows.shape[0], ts))
        elif tp == "audio_prompt":
            data = semantic_bos_eos(data, ts)
            data = audio_prompt_bos_eos(data, ts)
            rows = audio_pad(data, ts)
            masks.append(_audio_mask(rows.shape[0], ts))
        else:
            if key.startswith("reason_seq"):
                data = reason_bos_eos(data, ts)
            else:
                data = semantic_bos_eos(data, ts)
            rows = audio_pad(data, ts)
            masks.append(_audio_mask(rows.shape[0], ts))
        seqs.append(rows)
    return np.concatenate(seqs, axis=0).astype(np.int64), np.concatenate(masks, axis=0)


# ---------------------------------------------------------------------------
# Per-task convenience wrappers (the reference's prepare_* helpers)
# ---------------------------------------------------------------------------


def prepare_asr(task_prompt, reason, semantic, ts) -> Tuple[np.ndarray, np.ndarray]:
    """prompt ‖ reason(+bos/eos) ‖ semantic(+bos/eos, +offset)
    (reference `prepare_asr_task`, asr_task.py:299-326)."""
    return build_condition_grid(
        task_prompt, {"reason_seq": reason, "semantic_seq": semantic},
        ["reason_seq", "semantic_seq"], ["audio", "audio"], ts,
    )


def prepare_tts(task_prompt, text_ids, ts) -> Tuple[np.ndarray, np.ndarray]:
    """prompt ‖ <transcription> text </transcription>
    (reference `prepare_tts_task`, tts_task.py:192-205)."""
    return build_condition_grid(
        task_prompt, {"transcription_seq": text_ids},
        ["transcription_seq"], ["text"], ts,
    )


def prepare_tts_cfg_negative(task_prompt, text_ids, ts):
    return build_cfg_negative_grid(
        task_prompt, {"transcription_seq": text_ids},
        ["transcription_seq"], ["text"], ts,
    )


def condition_prefix(task: str) -> Tuple[List[str], List[str]]:
    """The conditioning prefix of a task format = all keys except the
    generated loss keys (e.g. speech_s2s conditions on the first 2 of 4 keys,
    `multi_task_inference.py:420-421`)."""
    fmt = TASK_FORMATS[task]
    n_gen = len(fmt["loss_key"])
    return fmt["keys"][:-n_gen] if n_gen else fmt["keys"], (
        fmt["type"][:-n_gen] if n_gen else fmt["type"]
    )
