"""Text-only perplexity / QA harness on the tiny unified model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine.decode import DecodeEngine
from uniaudio2_tpu.engine.text_eval import generate_text_answer, text_perplexity
from uniaudio2_tpu.models import unified


@pytest.fixture(scope="module")
def tiny():
    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_text_perplexity(tiny):
    cfg, params = tiny
    seqs = [[1, 5, 9, 13, 2], [1, 7, 7, 2]]
    out = text_perplexity(params, cfg, seqs)
    assert out["tokens"] == 4 + 3
    assert np.isfinite(out["nll"]) and out["ppl"] > 1.0
    # a random model should be near-uniform over the padded vocab
    assert out["ppl"] < cfg.backbone.padded_vocab_size * 3


def test_generate_text_answer(tiny):
    cfg, params = tiny
    eng = DecodeEngine(params, cfg, max_frames=5, cache_dtype=jnp.float32,
                       buckets=(64,))
    out = generate_text_answer(eng, [1, 5, 9], topk=5, seed=1)
    assert out.ndim == 1
