"""Metrics (WER / normalizers / edit distance), data-prep tooling, and the
audio-prompt sampler."""

import json
import os

import numpy as np
import pytest

from uniaudio2_tpu.metrics import wer as werlib
from uniaudio2_tpu.data import prep
from uniaudio2_tpu.data.audio_prompt import AudioPromptSampler, clip_by_length


def test_edit_distance_counts():
    s, d, i, c = werlib.edit_distance("abc", "abc")
    assert (s, d, i, c) == (0, 0, 0, 3)
    s, d, i, c = werlib.edit_distance(list("kitten"), list("sitting"))
    assert s + d + i == 3
    s, d, i, c = werlib.edit_distance(["a", "b"], [])
    assert d == 2 and s == 0 and i == 0


def test_wer_english():
    refs = {"u1": "Hello, World!", "u2": "the cat sat"}
    hyps = {"u1": "hello world", "u2": "the cat sat down"}
    res = werlib.compute_wer(refs, hyps, lang="en")
    # u1 exact after normalization; u2 has one insertion over 3 ref words
    assert res.wer == pytest.approx(1 / 5)
    assert "WER" in str(res)


def test_wer_chinese_char_level():
    refs = {"u": "你好 world"}
    hyps = {"u": "你 好 world"}
    res = werlib.compute_wer(refs, hyps, lang="cn")
    assert res.wer == 0.0  # CJK chars are units regardless of spacing
    assert werlib.cn_normalize("你好ab cd") == ["你", "好", "ab", "cd"]


def test_scp_scoring(tmp_path):
    ref = tmp_path / "ref.scp"
    hyp = tmp_path / "hyp.scp"
    ref.write_text("a hello world\nb foo bar\n")
    hyp.write_text("a hello world\nb foo baz\n")
    res = werlib.score_files(str(ref), str(hyp))
    assert res.wer == pytest.approx(1 / 4)


def test_create_data_json(tmp_path):
    out = str(tmp_path / "tts.json")
    obj = prep.create_data_json(
        "TTS", out,
        {"transcription_seq": "t.txt", "reason_seq": "r.pt",
         "semantic_seq": "s.pt"},
        repeat_num=2,
    )
    loaded = json.load(open(out))
    assert loaded["task"] == "TTS"
    assert loaded["repeat_num"] == 2
    assert loaded["keys"]["reason_seq"] == "r.pt"
    with pytest.raises(ValueError):
        prep.create_data_json("TTS", out, {"reason_seq": "r.pt"})


def test_scp_utils(tmp_path):
    a = tmp_path / "a.scp"
    b = tmp_path / "b.scp"
    a.write_text("u1 x\nu2 y\n")
    b.write_text("u3 z\n")
    keys = tmp_path / "keys.scp"
    keys.write_text("u1\n")
    out = str(tmp_path / "f.scp")
    assert prep.filter_scp(str(a), str(keys), out) == 1
    assert prep.read_scp(out) == {"u1": "x"}
    shards = prep.merge_then_split([str(a), str(b)], str(tmp_path / "m"), 2)
    total = sum(len(prep.read_scp(s)) for s in shards)
    assert total == 3
    s2u = tmp_path / "spk2utt"
    s2u.write_text("spk1 u1 u2 u3\nspk2 u4\n")
    out2 = str(tmp_path / "s2u.out")
    assert prep.select_spk2utt(str(s2u), out2, min_utts=2, max_utts=2) == 1
    assert prep.read_scp(out2) == {"spk1": "u1 u2"}


def test_audio_prompt_sampler():
    rng = np.random.default_rng(0)
    data = {
        "PromptTTS_a": {"task": "PromptTTS", "audio_prompt_seq": "spk1",
                        "semantic_seq": rng.integers(0, 9, (8, 100))},
        "PromptTTS_b": {"task": "PromptTTS", "audio_prompt_seq": "spk1",
                        "semantic_seq": rng.integers(0, 9, (8, 40))},
        "TTS_c": {"task": "TTS"},
    }
    sampler = AudioPromptSampler(data, prompt_seconds=3.0, seed=1)
    assert sampler.speakers == ["spk1"]
    assert sampler.find_length() == 37
    clip = sampler.sample("spk1")
    assert clip.shape[1] == 8 and clip.shape[0] <= 37
    direct = sampler.sample(rng.integers(0, 9, (60, 8)))
    assert direct.shape == (37, 8)


def test_prompt_bank_covers_all_cli_tasks():
    from uniaudio2_tpu.engine.generators import (
        GENERATION_TASKS, UNDERSTANDING_TASKS, prompt_key_for_task,
    )
    bank = json.load(open(os.path.join(
        os.path.dirname(__file__), "..", "prompts", "audio_tasks_prompts.json"
    )))
    for task in UNDERSTANDING_TASKS + GENERATION_TASKS:
        key = prompt_key_for_task(task)
        assert key in bank and bank[key], task


def test_prompt_bank_is_reference_verbatim():
    # The prompt bank is runtime *data* fed to trained checkpoints — the
    # strings must byte-match the reference's prompts/audio_tasks_prompts.json
    # (paraphrases live in audio_tasks_prompts_paraphrased.json, opt-in only).
    import hashlib
    path = os.path.join(
        os.path.dirname(__file__), "..", "prompts", "audio_tasks_prompts.json"
    )
    digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
    assert digest == (
        "bae3c72e8673102bdeb9ebaa5a68c7fe3b47a6e9ecbfc4a53f901e95b371842b"
    )


def test_find_peer_utts(tmp_path):
    u2s = tmp_path / "utt2spk"
    u2s.write_text("u1 spkA\nu2 spkA\nu3 spkB\n")
    out = str(tmp_path / "peers")
    n = prep.find_peer_utts(str(u2s), out)
    assert n == 3
    peers = {l.split()[0]: l.split()[1:] for l in open(out)}
    assert sorted(peers["u1"]) == ["u1", "u2"]
    assert peers["u3"] == ["u3"]
