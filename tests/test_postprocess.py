"""ASR repetition-cleanup post-processing."""

from uniaudio2_tpu.engine.postprocess import (
    clean_text, cut_at_repeated_phrase, has_excessive_repetition,
    post_process_text, remove_tail_repetition,
)


def test_tail_repetition_removed():
    text = "the quick fox runs runs runs runs runs"
    out = post_process_text(text)
    assert out.count("runs") < 4
    assert out.startswith("the quick fox")


def test_clean_text_spacing():
    assert clean_text("hello ,   world .") == "hello, world."


def test_no_change_on_clean_text():
    text = "a perfectly normal sentence with no repeats"
    assert post_process_text(text) == text


def test_excessive_repetition_detector():
    assert has_excessive_repetition("word word word word word word")
    assert not has_excessive_repetition("all tokens here are unique ones")


def test_repeated_phrase_cut():
    text = "go to the store go to the store go to the store"
    out = cut_at_repeated_phrase(text)
    assert len(out.split()) < len(text.split())


def test_cjk_character_mode():
    text = "你好世界好好好好好好"
    out = remove_tail_repetition(text, max_repeat=3)
    assert len(out) < len(text)
