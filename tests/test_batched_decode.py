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


def _cfg_items(eng, n, seed=0):
    """(item, neg_item) pairs from the TTS CFG pad-substitution helper."""
    rng = np.random.default_rng(seed)
    ts = eng.cfg.tokens
    items, negs = [], []
    for i in range(n):
        prompt = rng.integers(1, 20, (3 + i,))
        text = rng.integers(1, 20, (4 + i,))
        items.append(tm.prepare_tts(prompt, text, ts))
        negs.append(tm.prepare_tts_cfg_negative(prompt, text, ts))
    return items, negs


def test_batched_cfg_single_matches_unbatched_cfg(eng):
    """generate_audio_batch(use_cfg=True) with one item must reproduce the
    unbatched CFG path's greedy tokens (VERDICT r1 item 6: CFG composing with
    the batched loop — reference batch-2 trick, tts_task.py:232-236)."""
    items, negs = _cfg_items(eng, 1)
    (grid, mask), (ng, nm) = items[0], negs[0]
    single = eng.generate_audio(
        grid, mask, topk=1, temperature=1.0, use_cfg=True, cfg_scale=1.5,
        neg_grid=ng, neg_mask=nm,
    )
    batched = eng.generate_audio_batch(
        items, topk=1, temperature=1.0, use_cfg=True, cfg_scale=1.5,
        neg_items=negs,
    )
    for got, want in zip(batched[0], single):
        np.testing.assert_array_equal(got, want)


def test_batched_cfg_pairs_independent(eng):
    """Two CFG utterances in one batch must each match their own B=1 run
    (per-pair mixing; no cross-pair leakage)."""
    items, negs = _cfg_items(eng, 2, seed=7)
    batched = eng.generate_audio_batch(
        items, topk=1, temperature=1.0, use_cfg=True, cfg_scale=1.5,
        neg_items=negs,
    )
    for i in range(2):
        solo = eng.generate_audio_batch(
            [items[i]], topk=1, temperature=1.0, use_cfg=True, cfg_scale=1.5,
            neg_items=[negs[i]],
        )
        for got, want in zip(batched[i], solo[0]):
            np.testing.assert_array_equal(got, want)


def test_list_caches_token_identical_to_stacked():
    """The per-layer list-cache serving layout (`ops/kv_cache.py`) is a pure
    layout change: greedy decode must be token-identical to the stacked
    cache form on the same unrolled params."""
    import jax

    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.engine import tasks as tm
    from uniaudio2_tpu.engine.decode import DecodeEngine
    from uniaudio2_tpu.models import unified

    cfg = UnifiedModelConfig.tiny()
    params = unified.prepare_serving_params(
        unified.init_params(jax.random.PRNGKey(0), cfg), cfg=cfg,
        dtype=jnp.float32)
    grid, mask = tm.prepare_tts(np.array([1, 5, 6]), np.array([1, 10, 2]),
                                cfg.tokens)
    items = [(grid, mask)] * 3

    outs = {}
    for lists in (True, False):
        eng = DecodeEngine(params, cfg, max_frames=6,
                           cache_dtype=jnp.float32, buckets=(64,))
        assert eng._cache_lists  # unrolled params -> lists by default
        eng._cache_lists = lists
        r, s = eng.generate_audio(grid, mask, topk=1)
        br = eng.generate_audio_batch(items, topk=1)
        outs[lists] = (r, s, br)
    np.testing.assert_array_equal(outs[True][0], outs[False][0])
    np.testing.assert_array_equal(outs[True][1], outs[False][1])
    for (ra, sa), (rb, sb) in zip(outs[True][2], outs[False][2]):
        np.testing.assert_array_equal(ra, rb)
        np.testing.assert_array_equal(sa, sb)


def test_prefix_bounded_attention_token_identical():
    """`attn_block` (prefix-bounded attention reads) is a pure read-traffic
    optimization: greedy decode must be token-identical to full-cache
    reads, single and batched (ragged prompts), with sampling too."""
    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    grid, mask = tm.prepare_tts(np.array([1, 5, 6]), np.array([1, 10, 2]),
                                cfg.tokens)

    outs = {}
    for blk in (0, 16):
        eng = DecodeEngine(params, cfg, max_frames=6,
                           cache_dtype=jnp.float32, buckets=(64,),
                           attn_block=blk)
        r, s = eng.generate_audio(grid, mask, topk=1)
        rs, ss = eng.generate_audio(grid, mask, topk=8, temperature=0.9,
                                    seed=7)
        items = _items(eng, 3)
        bt = eng.generate_text_batch(items, topk=1, temperature=1.0)
        outs[blk] = (r, s, rs, ss, bt)
    np.testing.assert_array_equal(outs[0][0], outs[16][0])
    np.testing.assert_array_equal(outs[0][1], outs[16][1])
    np.testing.assert_array_equal(outs[0][2], outs[16][2])
    np.testing.assert_array_equal(outs[0][3], outs[16][3])
    for a, b in zip(outs[0][4], outs[16][4]):
        np.testing.assert_array_equal(a, b)
