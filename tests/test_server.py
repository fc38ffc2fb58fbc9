"""Dynamic-batching server: batched results must equal per-request engine
calls (greedy), mixed modes/params group correctly, errors propagate."""

import threading

import numpy as np
import jax.numpy as jnp
import pytest

import jax

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine import tasks
from uniaudio2_tpu.engine.decode import DecodeEngine
from uniaudio2_tpu.engine.server import BatchingServer
from uniaudio2_tpu.models import unified


@pytest.fixture(scope="module")
def engine():
    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    return DecodeEngine(params, cfg, max_frames=6,
                        cache_dtype=jnp.float32, buckets=(32,))


def _grids(cfg_tokens, n):
    out = []
    for i in range(n):
        prompt = (np.arange(1, 4 + i) * 3) % 50
        text = (np.arange(2, 7) + i) % 50
        out.append(tasks.prepare_tts(prompt, text, cfg_tokens))
    return out


def test_batched_greedy_matches_unbatched(engine):
    ts = engine.cfg.tokens
    items = _grids(ts, 3)
    expected = [
        engine.generate_text(g, m, topk=1, seed=888) for g, m in items
    ]
    with BatchingServer(engine, max_batch=4, max_wait_ms=50.0) as srv:
        futs = [srv.submit("text", g, m, topk=1, seed=888) for g, m in items]
        got = [f.result(timeout=300) for f in futs]
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(g))
    assert srv.stats["requests"] == 3
    # all three should have ridden one batched launch (same key, < max_batch
    # so launched by the wait timer)
    assert srv.stats["batches"] == 1
    assert srv.stats["batched_requests"] == 3


def test_mixed_param_groups_and_audio_mode(engine):
    ts = engine.cfg.tokens
    (g1, m1), (g2, m2) = _grids(ts, 2)
    with BatchingServer(engine, max_batch=4, max_wait_ms=20.0) as srv:
        f_text = srv.submit("text", g1, m1, topk=1)
        f_audio = srv.submit("audio", g2, m2, topk=5, seed=7)
        text = f_text.result(timeout=300)
        reason, semantic = f_audio.result(timeout=300)
    assert np.asarray(text).ndim == 1
    assert np.asarray(reason).shape[0] == ts.num_codebooks
    assert np.asarray(semantic).shape[0] == ts.num_codebooks
    assert srv.stats["batches"] == 2  # incompatible keys never co-batch


def test_full_batch_launches_without_wait(engine):
    ts = engine.cfg.tokens
    items = _grids(ts, 4)
    with BatchingServer(engine, max_batch=2, max_wait_ms=10_000.0) as srv:
        futs = [srv.submit("text", g, m, topk=1) for g, m in items]
        got = [f.result(timeout=300) for f in futs]
    assert len(got) == 4
    assert srv.stats["batches"] == 2  # two full batches, no timer needed


def test_concurrent_submitters(engine):
    ts = engine.cfg.tokens
    items = _grids(ts, 6)
    results = [None] * 6

    with BatchingServer(engine, max_batch=3, max_wait_ms=30.0) as srv:
        def worker(i):
            g, m = items[i]
            results[i] = srv.submit("text", g, m, topk=1).result(timeout=300)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    expected = [engine.generate_text(g, m, topk=1) for g, m in items]
    for e, r in zip(expected, results):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(r))


def test_error_propagates(engine):
    with BatchingServer(engine, max_batch=2, max_wait_ms=5.0) as srv:
        bad = np.zeros((5, 3), np.int64)  # wrong stream count -> engine error
        f = srv.submit("text", bad, np.ones((5, 3), bool), topk=1)
        with pytest.raises(Exception):
            f.result(timeout=300)


def test_per_request_seed_batch_invariant(engine):
    """Same request + seed -> same tokens whether batched alone or with
    others (per-row PRNG streams, VERDICT r2 item 8)."""
    ts = engine.cfg.tokens
    items = _grids(ts, 4)
    g, m = items[1]

    with BatchingServer(engine, max_batch=1, max_wait_ms=1.0) as srv:
        solo = srv.submit("text", g, m, temperature=0.9, topk=5,
                          seed=7).result(timeout=300)
    with BatchingServer(engine, max_batch=4, max_wait_ms=10_000.0) as srv:
        futs = [
            srv.submit("text", gg, mm, temperature=0.9, topk=5, seed=100 + i)
            for i, (gg, mm) in enumerate(items)
        ]
        futs[1] = srv.submit("text", g, m, temperature=0.9, topk=5, seed=7)
        # resubmitting replaced the future; drain all five (batch of 4 + 1)
        got = [f.result(timeout=300) for f in futs]
    np.testing.assert_array_equal(np.asarray(solo), np.asarray(got[1]))


def test_per_row_seeds_direct_engine(engine):
    """generate_*_batch(seeds=...): a row's sampled stream depends only on
    its own seed, and distinct seeds give distinct streams."""
    ts = engine.cfg.tokens
    items = _grids(ts, 3)
    g, m = items[0]

    solo = engine.generate_text_batch([(g, m)], temperature=0.9, topk=5,
                                      seeds=[42])
    batched = engine.generate_text_batch(items, temperature=0.9, topk=5,
                                         seeds=[42, 1, 2])
    np.testing.assert_array_equal(solo[0], batched[0])

    solo_a = engine.generate_audio_batch([(g, m)], temperature=0.9, topk=5,
                                         seeds=[42])
    batched_a = engine.generate_audio_batch(items, temperature=0.9, topk=5,
                                            seeds=[42, 1, 2])
    np.testing.assert_array_equal(solo_a[0][0], batched_a[0][0])
    np.testing.assert_array_equal(solo_a[0][1], batched_a[0][1])

    other = engine.generate_text_batch([(g, m)], temperature=0.9, topk=5,
                                       seeds=[43])
    assert not np.array_equal(solo[0], other[0])
