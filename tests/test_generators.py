"""Task-runner layer + host-driven decode modes (ngram blocking, beam
search) on the tiny unified model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine.decode import DecodeEngine, _banned_ngram_tokens
from uniaudio2_tpu.engine.generators import (
    TaskRunner, prompt_key_for_task, select_prompt,
)
from uniaudio2_tpu.models import unified


class MockTok:
    def tokenize(self, text):
        return [1, 2, 3]

    def decode(self, ids):
        return " ".join(str(int(i)) for i in np.asarray(ids).reshape(-1))


@pytest.fixture(scope="module")
def runner():
    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    eng = DecodeEngine(params, cfg, max_frames=6, cache_dtype=jnp.float32,
                       buckets=(64,))
    return TaskRunner(eng, MockTok())


def _codes(t, hi=30, seed=0):
    return np.random.default_rng(seed).integers(0, hi, (t, 8))


def test_prompt_key_mapping():
    assert prompt_key_for_task("yue_tts") == "Yue_TTS"
    assert prompt_key_for_task("ASR") == "ASR"
    assert prompt_key_for_task("InstructTTS") == "InstructTTS"
    assert prompt_key_for_task("speech_s2t") == "speech_s2t"


def test_select_prompt_from_json(tmp_path):
    p = tmp_path / "prompts.json"
    p.write_text('{"ASR": ["transcribe this"], "TTS": ["speak this"]}')
    assert select_prompt("asr", prompt_json=str(p)) == "transcribe this"
    assert select_prompt("x", prompt_text=" inline ") == "inline"


def test_asr_and_caption_run(runner):
    text = runner.asr("p", _codes(4), _codes(6), seed=1)
    assert isinstance(text, str)
    text2 = runner.caption("p", _codes(4), _codes(6), music=True, seed=1)
    assert isinstance(text2, str)


def test_tts_and_s2s_run(runner):
    r, s = runner.tts("p", np.array([5, 6, 7]), topk=5, seed=2)
    assert r.shape[0] == 8 and s.shape[0] == 8
    r2, s2 = runner.speech_s2s("p", _codes(3), _codes(5), topk=5, seed=2)
    assert r2.shape[0] == 8


def test_banned_ngram_helper():
    hist = [1, 2, 3, 1, 2]
    assert _banned_ngram_tokens(hist, 3) == {3}
    assert _banned_ngram_tokens([1, 1, 1], 2) == {1}


def test_ngram_blocked_decode_runs(runner):
    text = runner.asr(
        "p", _codes(4), _codes(6), decode_type="ngram", topk=5,
        max_repeat_ngram=2, seed=3,
    )
    assert isinstance(text, str)


def test_beam_matches_greedy_at_beam1(runner):
    eng = runner.engine
    from uniaudio2_tpu.engine import tasks as tm
    grid, mask = tm.prepare_asr(
        np.array([1, 2, 3]), _codes(4), _codes(6), eng.cfg.tokens
    )
    greedy = eng.generate_text(grid, mask, topk=1, temperature=1.0)
    beam1 = eng.generate_text_beam(grid, mask, beam_size=1)
    np.testing.assert_array_equal(greedy, beam1)


def test_beam_multi_runs(runner):
    eng = runner.engine
    from uniaudio2_tpu.engine import tasks as tm
    grid, mask = tm.prepare_asr(
        np.array([1, 2, 3]), _codes(4), _codes(6), eng.cfg.tokens
    )
    out = eng.generate_text_beam(grid, mask, beam_size=3, length_penalty=1.0)
    assert out.ndim == 1
