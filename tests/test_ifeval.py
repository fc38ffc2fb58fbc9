"""IFEval-style instruction-following checkers."""

import json

import pytest

from uniaudio2_tpu.metrics.ifeval import CHECKERS, IFExample, evaluate


def test_keyword_checkers():
    assert CHECKERS["keywords:existence"]("The cat sat.", keywords=["cat"])
    assert not CHECKERS["keywords:existence"]("The dog sat.", keywords=["cat"])
    assert CHECKERS["keywords:forbidden_words"]("all good", forbidden_words=["bad"])
    assert CHECKERS["keywords:frequency"](
        "go go go", keyword="go", frequency=3, relation="at least")
    assert CHECKERS["keywords:letter_frequency"](
        "banana", letter="a", let_frequency=3, let_relation="exactly")


def test_length_and_format_checkers():
    assert CHECKERS["length_constraints:number_words"](
        "one two three", num_words=3, relation="exactly")
    assert CHECKERS["length_constraints:number_sentences"](
        "Hi. There!", num_sentences=2, relation="exactly")
    assert CHECKERS["length_constraints:number_paragraphs"](
        "a\n\nb\n\nc", num_paragraphs=3)
    assert CHECKERS["detectable_format:number_bullet_lists"](
        "* one\n* two", num_bullets=2)
    assert CHECKERS["detectable_format:title"]("<<My Title>>\nbody")
    assert CHECKERS["detectable_format:json_format"]('{"a": 1}')
    assert not CHECKERS["detectable_format:json_format"]("not json")


def test_case_startend_punctuation():
    assert CHECKERS["change_case:english_lowercase"]("all lower here.")
    assert CHECKERS["change_case:english_capital"]("ALL CAPS")
    assert CHECKERS["startend:quotation"]('"quoted"')
    assert CHECKERS["startend:end_checker"]("we are done", end_phrase="done")
    assert CHECKERS["punctuation:no_comma"]("no commas here")
    assert not CHECKERS["punctuation:no_comma"]("a, b")
    assert CHECKERS["detectable_content:postscript"]("text\nP.S. hi")
    assert CHECKERS["detectable_content:number_placeholders"](
        "use [name] and [date]", num_placeholders=2)


def test_evaluate_strict_and_loose():
    examples = [
        IFExample("*all lower*", ["change_case:english_lowercase"], [{}]),
        IFExample("HELLO, WORLD", ["change_case:english_capital",
                                   "punctuation:no_comma"], [{}, {}]),
    ]
    out = evaluate(examples)
    # example 1 strict-passes; example 2 fails the comma check
    assert out["prompt_strict_acc"] == pytest.approx(0.5)
    assert out["inst_strict_acc"] == pytest.approx(2 / 3)
    assert out["prompt_loose_acc"] >= out["prompt_strict_acc"]


def test_evaluate_jsonl(tmp_path):
    from uniaudio2_tpu.metrics.ifeval import evaluate_jsonl

    data = tmp_path / "data.jsonl"
    resp = tmp_path / "resp.jsonl"
    data.write_text(json.dumps({
        "prompt": "p1",
        "instruction_id_list": ["keywords:existence"],
        "kwargs": [{"keywords": ["yes"]}],
    }) + "\n")
    resp.write_text(json.dumps({"prompt": "p1", "response": "yes indeed"}) + "\n")
    out = evaluate_jsonl(str(resp), str(data))
    assert out["prompt_strict_acc"] == 1.0
