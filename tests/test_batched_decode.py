"""Batched multi-utterance decoding: ragged-prompt left padding must match
the single-utterance path exactly (greedy), and per-row EOS/two-phase state
must be independent."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine.decode import DecodeEngine
from uniaudio2_tpu.engine import tasks as tm
from uniaudio2_tpu.models import unified


@pytest.fixture(scope="module")
def eng():
    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    return DecodeEngine(params, cfg, max_frames=6, cache_dtype=jnp.float32,
                        buckets=(64,))


def _items(eng, n, seed=0):
    rng = np.random.default_rng(seed)
    items = []
    for i in range(n):
        grid, mask = tm.prepare_asr(
            np.array([1, 2, 3]),
            rng.integers(0, 30, (3 + i, 8)),
            rng.integers(0, 60, (5 + 2 * i, 8)),
            eng.cfg.tokens,
        )
        items.append((grid, mask))
    return items


def test_batched_text_matches_single_greedy(eng):
    """Left-padded batched greedy decode must reproduce each row's
    single-utterance greedy output token for token (RoPE relative shift +
    key_valid masking = exact equivalence)."""
    items = _items(eng, 3)
    batched = eng.generate_text_batch(items, topk=1, temperature=1.0)
    for (grid, mask), got in zip(items, batched):
        single = eng.generate_text(grid, mask, topk=1, temperature=1.0)
        np.testing.assert_array_equal(got, single)


def test_batched_audio_shapes(eng):
    items = _items(eng, 2, seed=3)
    outs = eng.generate_audio_batch(items, topk=5)
    assert len(outs) == 2
    for reason, semantic in outs:
        assert reason.shape[0] == 8
        assert semantic.shape[0] == 8
