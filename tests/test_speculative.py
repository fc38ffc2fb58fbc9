"""Speculative decoding (`engine/speculative.py`): greedy output must be
BIT-IDENTICAL to the target model's plain greedy decode for ANY draft —
a perfect draft (all frames accepted, rewind length k), an unrelated
random draft (mostly rejected, rewind length 0), and a mid-quality mix —
which exercises the KV rewind at every accept length. Also checks the
acceptance statistics and the two-phase/EOS handling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine import tasks
from uniaudio2_tpu.engine.decode import DecodeEngine
from uniaudio2_tpu.engine.speculative import SpeculativeEngine
from uniaudio2_tpu.models import unified


@pytest.fixture(scope="module")
def setup():
    cfg = UnifiedModelConfig.tiny()
    target = unified.init_params(jax.random.PRNGKey(0), cfg)
    other = unified.init_params(jax.random.PRNGKey(7), cfg)
    ref = DecodeEngine(target, cfg, max_frames=12,
                       cache_dtype=jnp.float32, buckets=(32,))
    return cfg, target, other, ref


def _req(ts, i=0):
    prompt = (np.arange(1, 6) * 3 + i) % 50
    text = (np.arange(2, 9) * 5 + i) % 50
    return tasks.prepare_tts(prompt, text, ts)


@pytest.mark.parametrize("mode", ["audio", "text"])
@pytest.mark.parametrize("draft_kind", ["same", "random"])
def test_greedy_equivalence(setup, mode, draft_kind, request):
    cfg, target, other, ref = setup
    draft = target if draft_kind == "same" else other
    eng = SpeculativeEngine(draft, target, cfg, k=3, max_frames=12,
                            cache_dtype=jnp.float32, buckets=(32,))
    for i in range(3):
        g, m = _req(cfg.tokens, i)
        if mode == "audio":
            exp = ref.generate_audio(g, m, topk=1)
            got = eng.generate_audio(g, m)
            np.testing.assert_array_equal(got[0], exp[0])
            np.testing.assert_array_equal(got[1], exp[1])
        else:
            exp = ref.generate_text(g, m, topk=1)
            got = eng.generate_text(g, m)
            np.testing.assert_array_equal(got, exp)
        stats = eng.last_stats
        assert stats["rounds"] >= 1
        if draft_kind == "same":
            # a perfect draft must accept every drafted frame
            assert stats["accepted"] == stats["drafted"]
            assert stats["acceptance_rate"] == 1.0


def test_rewind_at_every_accept_length(setup):
    """A draft that equals the target except for a random parameter
    perturbation produces intermediate acceptance — over several prompts
    and k=2..4 this sweeps accept lengths 0..k. Output must stay
    bit-identical to the plain greedy decode at every one."""
    cfg, target, other, ref = setup
    # mid-quality draft: average of target and unrelated params
    mixed = jax.tree.map(
        lambda a, b: (a + b) / 2 if a.dtype.kind == "f" else a,
        target, other)
    seen = set()
    for k in (2, 3, 4):
        eng = SpeculativeEngine(mixed, target, cfg, k=k, max_frames=12,
                                cache_dtype=jnp.float32, buckets=(32,))
        for i in range(4):
            g, m = _req(cfg.tokens, i)
            exp = ref.generate_audio(g, m, topk=1)
            got = eng.generate_audio(g, m)
            np.testing.assert_array_equal(got[0], exp[0])
            np.testing.assert_array_equal(got[1], exp[1])
            st = eng.last_stats
            seen.add((st["drafted"] - st["accepted"]) // st["rounds"])
            assert 0 <= st["accepted"] <= st["drafted"]
    # the sweep actually exercised multiple distinct accept patterns
    assert len(seen) >= 2


def test_quantized_draft_layouts(setup):
    """int4 serving-layout draft + f32 training-layout target: the layout
    mix the speculative engine is designed for (cheap draft, exact
    target)."""
    cfg, target, other, ref = setup
    from uniaudio2_tpu.ops.quant import quantize_unified_params

    qdraft = quantize_unified_params(
        jax.tree.map(lambda a: a, target),
        int4_modules=("decoder", "audio_head", "projection_w"))
    qdraft = unified.prepare_serving_params(qdraft, dtype=jnp.float32,
                                            cfg=cfg)
    eng = SpeculativeEngine(qdraft, target, cfg, k=3, max_frames=12,
                            cache_dtype=jnp.float32, buckets=(32,))
    g, m = _req(cfg.tokens, 1)
    exp = ref.generate_audio(g, m, topk=1)
    got = eng.generate_audio(g, m)
    np.testing.assert_array_equal(got[0], exp[0])
    np.testing.assert_array_equal(got[1], exp[1])
