"""Continuous batching: a request admitted into a RUNNING batch must
produce token-identical greedy output to the same request decoded alone
(the refill writes a left-packed prompt at the current shared position —
RoPE relative-shift invariance makes the geometry exact)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine import tasks
from uniaudio2_tpu.engine.continuous import ContinuousEngine
from uniaudio2_tpu.engine.decode import DecodeEngine
from uniaudio2_tpu.models import unified


@pytest.fixture(scope="module")
def setup():
    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    ref = DecodeEngine(params, cfg, max_frames=8,
                       cache_dtype=jnp.float32, buckets=(32,))
    return cfg, params, ref


def _requests(ts, n):
    reqs = []
    for i in range(n):
        prompt = (np.arange(1, 4 + (i % 3)) * 5 + i) % 50
        text = (np.arange(2, 8) * 3 + i) % 50
        reqs.append(tasks.prepare_tts(prompt, text, ts))
    return reqs


def test_text_staggered_matches_unbatched(setup):
    cfg, params, ref = setup
    reqs = _requests(cfg.tokens, 5)
    expected = [np.asarray(ref.generate_text(g, m, topk=1)) for g, m in reqs]

    ce = ContinuousEngine(
        params, cfg, mode="text", rows=2, bucket=32, seg_frames=4,
        cache_len=256, max_frames=8, topk=1, cache_dtype=jnp.float32,
    )
    rids = [ce.submit(g, m) for g, m in reqs]
    results = ce.run_until_drained()
    assert set(results) == set(rids)
    for rid, exp in zip(rids, expected):
        np.testing.assert_array_equal(results[rid], exp)
    # 5 requests through 2 rows forces refills into a RUNNING batch
    assert ce.stats["refills"] == 5
    assert ce.stats["segments"] >= 2


def test_audio_staggered_matches_unbatched(setup):
    cfg, params, ref = setup
    reqs = _requests(cfg.tokens, 3)
    expected = [ref.generate_audio(g, m, topk=1) for g, m in reqs]

    ce = ContinuousEngine(
        params, cfg, mode="audio", rows=2, bucket=32, seg_frames=4,
        cache_len=256, max_frames=8, topk=1, cache_dtype=jnp.float32,
    )
    rids = [ce.submit(g, m) for g, m in reqs]
    results = ce.run_until_drained()
    for rid, (er, es) in zip(rids, expected):
        rr, rs = results[rid]
        np.testing.assert_array_equal(rr, np.asarray(er))
        np.testing.assert_array_equal(rs, np.asarray(es))


def test_cache_budget_reset(setup):
    cfg, params, ref = setup
    reqs = _requests(cfg.tokens, 3)
    expected = [np.asarray(ref.generate_text(g, m, topk=1))[:8]
                for g, m in reqs]
    # budget: cache 64, bucket 32 -> 31 frames headroom; 16-frame budget
    # requests exhaust it after one wave -> scheduler must reset
    ce = ContinuousEngine(
        params, cfg, mode="text", rows=1, bucket=32, seg_frames=4,
        cache_len=64, max_frames=8, topk=1, cache_dtype=jnp.float32,
        seed=888,
    )
    rids = [ce.submit(g, m, max_frames=16) for g, m in reqs]
    results = ce.run_until_drained()
    for rid, exp in zip(rids, expected):
        np.testing.assert_array_equal(results[rid][:8], exp)
    assert ce.stats["resets"] >= 1


def test_submit_rejects_unservable(setup):
    cfg, params, _ = setup
    ce = ContinuousEngine(params, cfg, mode="text", rows=1, bucket=32,
                          cache_len=64, cache_dtype=jnp.float32)
    g, m = _requests(cfg.tokens, 1)[0]
    with pytest.raises(AssertionError):
        ce.submit(g, m, max_frames=64)


def test_offline_in_graph_matches_unbatched(setup):
    """The fully in-graph offline path (refill-on-completion inside the
    while_loop, one dispatch) matches isolated greedy decode, including a
    mid-run in-graph position reset."""
    cfg, params, ref = setup
    reqs = _requests(cfg.tokens, 6)
    expected = [np.asarray(ref.generate_text(g, m, topk=1)) for g, m in reqs]

    ce = ContinuousEngine(
        params, cfg, mode="text", rows=2, bucket=32, cache_len=80,
        max_frames=8, topk=1, cache_dtype=jnp.float32,
    )
    # per-request caps sized so the 80-slot cache forces in-graph resets
    results = ce.run_offline([(g, m, 8) for g, m in reqs])
    assert len(results) == 6
    for got, exp in zip(results, expected):
        np.testing.assert_array_equal(got, exp)


def test_offline_audio_mode(setup):
    cfg, params, ref = setup
    reqs = _requests(cfg.tokens, 3)
    expected = [ref.generate_audio(g, m, topk=1) for g, m in reqs]
    ce = ContinuousEngine(
        params, cfg, mode="audio", rows=2, bucket=32, cache_len=256,
        max_frames=8, topk=1, cache_dtype=jnp.float32,
    )
    results = ce.run_offline([(g, m, 8) for g, m in reqs])
    for (rr, rs), (er, es) in zip(results, expected):
        np.testing.assert_array_equal(rr, np.asarray(er))
        np.testing.assert_array_equal(rs, np.asarray(es))


def _cfg_requests(ts, n):
    reqs = []
    for i in range(n):
        prompt = (np.arange(1, 4 + (i % 3)) * 5 + i) % 50
        text = (np.arange(2, 8) * 3 + i) % 50
        g, m = tasks.prepare_tts(prompt, text, ts)
        ng, nm = tasks.prepare_tts_cfg_negative(prompt, text, ts)
        reqs.append((g, m, ng, nm))
    return reqs


def test_cfg_staggered_matches_static(setup):
    """CFG through continuous batching: [cond, uncond] admitted as an
    atomic pair must be greedy-token-identical to the static batched CFG
    path (VERDICT r2 item 4)."""
    cfg, params, ref = setup
    reqs = _cfg_requests(cfg.tokens, 3)
    expected = [
        ref.generate_audio(g, m, topk=1, use_cfg=True, cfg_scale=1.5,
                           neg_grid=ng, neg_mask=nm)
        for g, m, ng, nm in reqs
    ]

    # 2 rows = ONE pair slot: 3 requests force staggered pair admission
    ce = ContinuousEngine(
        params, cfg, mode="audio", rows=2, bucket=32, seg_frames=4,
        cache_len=256, max_frames=8, topk=1, use_cfg=True, cfg_scale=1.5,
        cache_dtype=jnp.float32,
    )
    rids = [ce.submit(g, m, neg_grid=ng, neg_mask=nm)
            for g, m, ng, nm in reqs]
    results = ce.run_until_drained()
    assert ce.stats["refills"] == 3
    for rid, (er, es) in zip(rids, expected):
        rr, rs = results[rid]
        np.testing.assert_array_equal(rr, np.asarray(er))
        np.testing.assert_array_equal(rs, np.asarray(es))


def test_cfg_offline_matches_static(setup):
    cfg, params, ref = setup
    reqs = _cfg_requests(cfg.tokens, 4)
    expected = [
        ref.generate_audio(g, m, topk=1, use_cfg=True, cfg_scale=1.5,
                           neg_grid=ng, neg_mask=nm)
        for g, m, ng, nm in reqs
    ]
    ce = ContinuousEngine(
        params, cfg, mode="audio", rows=2, bucket=32, cache_len=256,
        max_frames=8, topk=1, use_cfg=True, cfg_scale=1.5,
        cache_dtype=jnp.float32,
    )
    results = ce.run_offline([(g, m, ng, nm, 8) for g, m, ng, nm in reqs])
    for (rr, rs), (er, es) in zip(results, expected):
        np.testing.assert_array_equal(rr, np.asarray(er))
        np.testing.assert_array_equal(rs, np.asarray(es))


def test_cfg_submit_requires_negative(setup):
    cfg, params, _ = setup
    ce = ContinuousEngine(params, cfg, mode="audio", rows=2, bucket=32,
                          cache_len=128, use_cfg=True,
                          cache_dtype=jnp.float32)
    g, m = _requests(cfg.tokens, 1)[0]
    with pytest.raises(AssertionError):
        ce.submit(g, m)


def test_attn_block_token_identical_in_continuous(setup):
    """Prefix-bounded attention reads (attn_block) must not change tokens
    through the continuous-batching loops (segments + drain + in-loop
    refill prefills) — ADVICE r3 item 2 plumbed it into this engine."""
    cfg, params, _ = setup
    reqs = _requests(cfg.tokens, 4)
    outs = {}
    for blk in (0, 64):
        ce = ContinuousEngine(
            params, cfg, mode="text", rows=2, bucket=32, seg_frames=4,
            cache_len=256, max_frames=8, topk=1, cache_dtype=jnp.float32,
            attn_block=blk,
        )
        rids = [ce.submit(g, m) for g, m in reqs]
        res = ce.run_until_drained()
        outs[blk] = [np.asarray(res[r]) for r in rids]
    for a, b in zip(outs[0], outs[64]):
        np.testing.assert_array_equal(a, b)


def test_resolve_attn_block_policy():
    """Auto enables block 128 only at cache budgets >= 512 (the measured
    crossover: cache 256 loses 2-6%, cache 768 wins up to +22% —
    docs/profile_decode_r4.md)."""
    from uniaudio2_tpu.engine.decode import resolve_attn_block

    assert resolve_attn_block(-1, 256) == 0
    assert resolve_attn_block(-1, 512) == 128
    assert resolve_attn_block(-1, 768) == 128
    assert resolve_attn_block(None, 256) == 0
    assert resolve_attn_block(0, 2048) == 0      # explicit off wins
    assert resolve_attn_block(64, 256) == 64     # explicit block wins


def test_step_online_and_timings(setup):
    """Online serving API: step_online admits + decodes one segment per
    call, returns completions, and records the wall-clock lifecycle
    (submitted/first/done/frames) used by the latency bench."""
    cfg, params, ref = setup
    reqs = _requests(cfg.tokens, 3)
    expected = [ref.generate_text(g, m, topk=1) for g, m in reqs]

    ce = ContinuousEngine(
        params, cfg, mode="text", rows=2, bucket=32, seg_frames=4,
        cache_len=256, max_frames=8, topk=1, cache_dtype=jnp.float32,
    )
    assert ce.step_online() == {}        # idle: no device work
    rids = [ce.submit(g, m) for g, m in reqs]
    results = {}
    for _ in range(50):
        results.update(ce.step_online())
        if len(results) == 3:
            break
    assert set(results) == set(rids)
    for rid, exp in zip(rids, expected):
        np.testing.assert_array_equal(results[rid], exp)
    for rid in rids:
        t = ce.timings[rid]
        assert t["submitted"] <= t["first"] <= t["done"]
        assert t["frames"] >= 1


def test_resolve_seg_ladder():
    """Ladder parsing: auto scales with seg_frames, off pins fixed
    segments, explicit lists are deduped/capped/sorted, junk raises."""
    resolve = ContinuousEngine._resolve_ladder
    assert resolve("auto", 8) == (2, 8)      # admission-only short rung
    assert resolve("auto", 4) == (2, 4)
    assert resolve("off", 8) == (8,)
    assert resolve("0", 8) == (8,)
    assert resolve("2,8,4,8", 8) == (2, 4, 8)
    assert resolve("16", 8) == (8,)      # capped at seg_frames
    with pytest.raises(ValueError):
        resolve("fast,slow", 8)
    reactive = ContinuousEngine._resolve_reactive
    assert reactive("on") and reactive("1")
    assert not reactive("off") and not reactive("auto") and not reactive(None)
    with pytest.raises(ValueError):
        reactive("maybe")


def test_online_ladder_token_identity(setup):
    """The adaptive ladder + reactive segment must not change tokens: the
    PRNG advances per frame, not per segment, so any boundary schedule
    yields the same streams. 3 requests through 2 rows exercises the
    queued-behind-full-batch path (reactive program) under 'auto'."""
    cfg, params, ref = setup
    reqs = _requests(cfg.tokens, 3)

    def run(ladder, reactive=None):
        ce = ContinuousEngine(
            params, cfg, mode="text", rows=2, bucket=32, seg_frames=4,
            cache_len=256, max_frames=8, topk=1, cache_dtype=jnp.float32,
            seg_ladder=ladder, seg_reactive=reactive,
        )
        rids = [ce.submit(g, m) for g, m in reqs]
        results = {}
        for _ in range(100):
            results.update(ce.step_online())
            if len(results) == len(rids):
                break
        return [results[r] for r in rids], ce.stats

    fixed, stats_fixed = run("off")
    auto, stats_auto = run("auto")
    mid, stats_mid = run("2,4,8", reactive="on")
    short, _ = run("1,2")
    assert stats_fixed["reactive"] == 0
    assert stats_auto["reactive"] == 0   # reactive defaults off (measured)
    assert stats_mid["reactive"] >= 1    # request queued behind full rows
    for a, b, c, d in zip(fixed, auto, mid, short):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)
        np.testing.assert_array_equal(a, d)


def test_online_overlap_windows_token_identity(setup):
    """windows=2 (overlapped drain): a budget-blocked arrival admits into
    a FRESH second cache window while the old window's rows finish,
    instead of waiting out a full drain. Token streams must be identical
    to the windows=1 drain-then-reset schedule (same PRNG split order:
    the overlap's fresh state is the same split the reset would take)."""
    cfg, params, ref = setup
    reqs = _requests(cfg.tokens, 3)
    # cache 64, bucket 32 -> 31-frame budget. r1 (cap 8) frees its row at
    # pos 40; r3 (cap 24) then needs 24 > 23 remaining while r2 (cap 24)
    # is still decoding -> budget-blocked with busy rows = overlap trigger
    caps = [8, 24, 24]

    def run(windows):
        ce = ContinuousEngine(
            params, cfg, mode="text", rows=2, bucket=32, seg_frames=4,
            cache_len=64, max_frames=24, topk=1, cache_dtype=jnp.float32,
            windows=windows,
        )
        rids = [ce.submit(g, m, max_frames=c)
                for (g, m), c in zip(reqs, caps)]
        results = {}
        for _ in range(200):
            results.update(ce.step_online())
            if len(results) == len(rids):
                break
        assert len(results) == len(rids)
        return [results[r] for r in rids], ce.stats

    one, stats_one = run(1)
    two, stats_two = run(2)
    assert stats_one["overlaps"] == 0
    assert stats_one["drains"] >= 1      # r4 behavior: drain then reset
    assert stats_two["overlaps"] >= 1    # arrival rode the fresh window
    assert stats_two["drains"] == 0
    for a, b in zip(one, two):
        np.testing.assert_array_equal(a, b)


def test_online_overlap_windows_cfg_pairs(setup):
    """Overlapped drain windows compose with CFG [cond, uncond] pair
    admission: pair slots in the fresh window, identical token streams
    to the windows=1 schedule."""
    cfg, params, ref = setup
    reqs = _cfg_requests(cfg.tokens, 3)
    caps = [8, 24, 24]

    def run(windows):
        ce = ContinuousEngine(
            params, cfg, mode="audio", rows=4, bucket=32, seg_frames=4,
            cache_len=64, max_frames=24, topk=1, use_cfg=True,
            cfg_scale=1.5, cache_dtype=jnp.float32, windows=windows,
        )
        rids = [ce.submit(g, m, max_frames=c, neg_grid=ng, neg_mask=nm)
                for (g, m, ng, nm), c in zip(reqs, caps)]
        results = {}
        for _ in range(200):
            results.update(ce.step_online())
            if len(results) == len(rids):
                break
        assert len(results) == len(rids)
        return [results[r] for r in rids], ce.stats

    one, stats_one = run(1)
    two, stats_two = run(2)
    assert stats_two["overlaps"] >= 1
    for (ar, as_), (br, bs) in zip(one, two):
        np.testing.assert_array_equal(np.asarray(ar), np.asarray(br))
        np.testing.assert_array_equal(np.asarray(as_), np.asarray(bs))


def test_overlap_then_run_until_drained(setup):
    """run_until_drained retires a live overlap window first (mixed
    step_online / run_until_drained use) and completes everything."""
    cfg, params, ref = setup
    reqs = _requests(cfg.tokens, 3)
    ce = ContinuousEngine(
        params, cfg, mode="text", rows=2, bucket=32, seg_frames=4,
        cache_len=64, max_frames=24, topk=1, cache_dtype=jnp.float32,
        windows=2,
    )
    rids = [ce.submit(g, m, max_frames=c)
            for (g, m), c in zip(reqs, [8, 24, 24])]
    results = {}
    while ce._overlap is None:
        results.update(ce.step_online())
    results.update(ce.run_until_drained())
    assert set(results) == set(rids)
    assert ce._overlap is None


def test_warmup_precompiles(setup):
    """warmup() AOT-compiles every scheduler program; the subsequent
    online run then hits only cached executables (no lazy compile in the
    latency-measured path)."""
    cfg, params, ref = setup
    ce = ContinuousEngine(
        params, cfg, mode="text", rows=2, bucket=32, seg_frames=4,
        cache_len=256, max_frames=8, topk=1, cache_dtype=jnp.float32,
        seg_ladder="auto",
    )
    ce.warmup()
    g, m = _requests(cfg.tokens, 1)[0]
    exp = ref.generate_text(g, m, topk=1)
    rid = ce.submit(g, m)
    results = {}
    for _ in range(50):
        results.update(ce.step_online())
        if results:
            break
    np.testing.assert_array_equal(results[rid], exp)
