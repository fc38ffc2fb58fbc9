"""Text-only evaluation harnesses: perplexity and free-form QA.

Parity with the reference's text sanity harnesses
(`/root/reference/evaluation/text_llama.py` / `text_llm.py` /
`text_mllm.py` / `text_mllm_qa.py` — SURVEY.md §2.7: they exercise
`forward_text` for perplexity and text generation on the unified model).

* ``text_perplexity`` — teacher-forced NLL/PPL of text sequences through the
  full unified stack (text stream active, audio streams masked), batched.
* ``generate_text_answer`` — prompt -> sampled/greedy continuation via the
  compiled decode engine.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine import tasks as taskmod
from uniaudio2_tpu.engine.decode import DecodeEngine
from uniaudio2_tpu.models import unified


def text_perplexity(
    params,
    cfg: UnifiedModelConfig,
    token_seqs: Sequence[Sequence[int]],
) -> Dict[str, float]:
    """Corpus perplexity over text-only sequences (BOS..EOS included)."""
    total_nll = 0.0
    total_tokens = 0

    @jax.jit
    def nll_fn(tokens, mask):
        logits = unified.forward_text(params, cfg, tokens, mask)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = tokens[:, 1:, -1]
        gold = jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        valid = mask[:, 1:, -1]
        return -(gold * valid).sum(), valid.sum()

    par = cfg.tokens.parallel_number
    for seq in token_seqs:
        ids = np.asarray(seq, np.int32)
        s = len(ids)
        if s < 2:
            continue
        grid = np.zeros((1, s, par), np.int32)
        grid[0, :, -1] = ids
        mask = np.zeros((1, s, par), bool)
        mask[0, :, -1] = True
        nll, n = nll_fn(jnp.asarray(grid), jnp.asarray(mask))
        total_nll += float(nll)
        total_tokens += int(n)
    avg = total_nll / max(total_tokens, 1)
    return {
        "nll": avg,
        "ppl": math.exp(min(avg, 50.0)),
        "tokens": total_tokens,
    }


def generate_text_answer(
    engine: DecodeEngine,
    prompt_ids: Sequence[int],
    *,
    temperature: float = 0.9,
    topk: int = 50,
    seed: int = 888,
) -> np.ndarray:
    """Free-form text continuation of a text-only prompt (the reference's
    `generate_text`, `text_mllm_qa.py:223`)."""
    ids = np.asarray(prompt_ids, np.int64)
    grid = taskmod.text_pad(ids, engine.cfg.tokens)
    mask = np.zeros_like(grid, bool)
    mask[:, -1] = True
    return engine.generate_text(
        grid, mask, temperature=temperature, topk=topk, seed=seed
    )
