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


def test_language_detection():
    from uniaudio2_tpu.metrics.ifeval import detect_language

    assert detect_language("The cat is on the mat and it is happy.") == "en"
    assert detect_language("Le chat est sur le tapis et il est content.") == "fr"
    assert detect_language("Der Hund ist nicht mit der Katze.") == "de"
    assert detect_language("这是一个中文句子。") == "zh"
    assert detect_language("これは日本語の文です。") == "ja"
    assert detect_language("이것은 한국어 문장입니다.") == "ko"
    assert detect_language("Это предложение на русском языке.") == "ru"
    assert detect_language("") is None


def test_response_language_checker():
    c = CHECKERS["language:response_language"]
    assert c("The weather is nice and the sun is out.", language="en")
    assert not c("这是一个中文句子。", language="en")
    assert c("这是一个中文句子。", language="zh")
    assert c("", language="en")   # detection failure counts as followed


def test_constrained_response_and_start():
    c = CHECKERS["detectable_format:constrained_response"]
    assert c("My answer is yes.")
    assert c("  Well... My answer is maybe. ")
    assert not c("Yes.")
    s = CHECKERS["multi-turn:constrained_start"]
    assert s("As an assistant, here you go", starter="As an assistant")
    assert s("preamble\n  As an assistant: sure", starter="As an assistant")
    assert not s("I think so", starter="As an assistant")


def test_nth_paragraph_first_word():
    c = CHECKERS["length_constraints:nth_paragraph_first_word"]
    text = "First paragraph here.\n\nSecond one starts now.\n\nThird."
    assert c(text, num_paragraphs=3, nth_paragraph=2, first_word="second")
    assert not c(text, num_paragraphs=3, nth_paragraph=2, first_word="first")
    assert not c(text, num_paragraphs=2, nth_paragraph=2, first_word="second")
    assert not c(text, num_paragraphs=3, nth_paragraph=9, first_word="x")
    # leading quotes stripped, punctuation terminates the word (reference
    # instructions.py:989-1007)
    assert c('"Hello," she said.', num_paragraphs=1, nth_paragraph=1,
             first_word="hello")


def test_key_sentences():
    c = CHECKERS["keywords:key_sentences"]
    text = "For now, this is fine. Another sentence here."
    assert c(text, key_sentences=["For now, this is fine."], num_sentences=1)
    assert not c(text, key_sentences=["For now, this is fine."],
                 num_sentences=0)
    assert c("Nothing matches.", key_sentences=["Missing."], num_sentences=0)


def test_rephrase_checkers():
    c = CHECKERS["detectable_format:rephrase"]
    assert c("Keep this *changed words* end.",
             original_message="Keep this *original words* end.")
    assert not c("Keep that *changed* end.",
                 original_message="Keep this *original* end.")
    assert not c("no asterisks", original_message="*x*")
    r = CHECKERS["detectable_content:rephrase_paragraph"]
    assert r("the cat sat", original_paragraph="the cat ran", low=2, high=2)
    assert not r("the cat sat", original_paragraph="the cat ran",
                 low=3, high=5)


def test_english_case_requires_english():
    # reference semantics: isupper()/islower() AND detected English
    # (instructions.py:1393-1453)
    assert not CHECKERS["change_case:english_capital"]("这是中文。")
    assert not CHECKERS["change_case:english_lowercase"]("这是中文。")
    assert not CHECKERS["change_case:english_capital"]("lower english text")
    assert CHECKERS["change_case:english_capital"]("12345") # no cased chars -> detection None -> followed


def test_checker_count_parity_with_reference():
    """instructions.py defines 29 concrete Instruction subclasses; every
    one must have a registered equivalent here (VERDICT r3 item 7)."""
    assert len(CHECKERS) >= 29
