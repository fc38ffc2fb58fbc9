"""Chinese NSW (non-standard-word) text normalization for CN WER scoring.

Reimplements the semantics of the reference's ``TextNorm`` as configured by
its WER scorer (`/root/reference/metrics/wer_tools/get_wer.py:10-24`: every
option off, no opencc) — i.e. ``normalize_nsw`` followed by
punctuation-to-space — so digits, dates, currency, percentages, fractions
and phone numbers in Chinese hypotheses score identically to the reference
pipeline (`/root/reference/metrics/wer_tools/cn_tn.py`, itself the speechio
chinese_text_normalization recipe).

The regex patterns, pass order, and character tables below are *protocol
constants*: scoring parity requires the exact same match set and the exact
same hanzi spellings, so they match the reference's tables verbatim. The
conversion code itself is an independent implementation (iterative
place-value decomposition instead of the reference's symbol-object system).
"""

from __future__ import annotations

import re
import string
from typing import List

HANZI_DIGITS = "零一二三四五六七八九"
# mid-system units, ascending power: 十 10^1 … 万 10^4, then 亿 10^8,
# 兆 10^12, … 载 10^44 (cn_tn.py `create_system(numbering_type="mid")`)
_UNIT_CHARS = "十百千万亿兆京垓秭穰沟涧正载"
_UNIT_POWERS = [1, 2, 3, 4] + [8 + 4 * i for i in range(10)]

_CURRENCY_UNITS = (
    "((亿|千万|百万|万|千|百)|(亿|千万|百万|万|千|百|)元|"
    "(亿|千万|百万|万|千|百|)块|角|毛|分)"
)
_QUANTIFIERS = (
    "(匹|张|座|回|场|尾|条|个|首|阙|阵|网|炮|顶|丘|棵|只|支|袭|辆|挑|担|颗|"
    "壳|窠|曲|墙|群|腔|砣|座|客|贯|扎|捆|刀|令|打|手|罗|坡|山|岭|江|溪|钟|"
    "队|单|双|对|出|口|头|脚|板|跳|枝|件|贴|针|线|管|名|位|身|堂|课|本|页|"
    "家|户|层|丝|毫|厘|分|钱|两|斤|担|铢|石|钧|锱|忽|(千|毫|微)克|毫|厘|"
    "分|寸|尺|丈|里|寻|常|铺|程|(千|分|厘|毫|微)米|撮|勺|合|升|斗|石|盘|"
    "碗|碟|叠|桶|笼|盆|盒|杯|钟|斛|锅|簋|篮|盘|桶|罐|瓶|壶|卮|盏|箩|箱|煲|"
    "啖|袋|钵|年|月|日|季|刻|时|周|天|秒|分|旬|纪|岁|世|更|夜|春|夏|秋|冬|"
    "代|伏|辈|丸|泡|粒|颗|幢|堆|条|根|支|道|面|片|张|颗|块)"
)

_CN_PUNCS = (
    "！？｡。＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠"
    "｢｣､、〃《》「」『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—‘’‛“”„‟…‧﹏·〈〉-"
)
_ALL_PUNCS = _CN_PUNCS + string.punctuation
_PUNCS_TO_SPACE = str.maketrans(_ALL_PUNCS, " " * len(_ALL_PUNCS))

_RE_DATE = re.compile(
    r"\D+((([089]\d|(19|20)\d{2})年)?(\d{1,2}月(\d{1,2}[日号])?)?)"
)
_RE_MONEY = re.compile(
    r"\D+((\d+(\.\d+)?)[多余几]?" + _CURRENCY_UNITS
    + r"(\d" + _CURRENCY_UNITS + r"?)?)"
)
_RE_MOBILE = re.compile(
    r"\D((\+?86 ?)?1([38]\d|5[0-35-9]|7[678]|9[89])\d{8})\D"
)
_RE_LANDLINE = re.compile(r"\D((0(10|2[1-3]|[3-9]\d{2})-?)?[1-9]\d{6,7})\D")
_RE_FRACTION = re.compile(r"(\d+/\d+)")
_RE_PERCENT = re.compile(r"(\d+(\.\d+)?%)")
_RE_QUANTIFIED = re.compile(r"(\d+(\.\d+)?)[多余几]?" + _QUANTIFIERS)
_RE_DIGIT_RUN = re.compile(r"(\d{4,32})")
_RE_NUMBER = re.compile(r"(\d+(\.\d+)?)")
_RE_LETTER2 = re.compile(r"(([a-zA-Z]+)二([a-zA-Z]+))")
_RE_PLAIN_NUM = re.compile(r"(\d+(\.\d+)?)")


def _digits_reading(s: str) -> str:
    """Digit-by-digit reading ('2019' -> 二零一九); keeps leading zeros."""
    return "".join(HANZI_DIGITS[int(c)] for c in s if c.isdigit())


def _int_reading(s: str) -> str:
    """Place-value reading of an integer digit string.

    Mirrors cn_tn's recursive ``get_value``: the recursion peels the
    largest unit whose power is below the number of *significant* digits,
    but splits the raw string (leading zeros stay with the head); a head
    that collapses to one digit keeps a 零 marker when zeros were stripped.
    """
    raw_len = len(s)
    sig = s.lstrip("0")
    if not sig:
        return ""
    if len(sig) == 1:
        d = HANZI_DIGITS[int(sig)]
        return (HANZI_DIGITS[0] + d) if raw_len != len(sig) else d
    # largest unit strictly below the significant length
    ui = max(i for i, p in enumerate(_UNIT_POWERS) if p < len(sig))
    power = _UNIT_POWERS[ui]
    head, tail = s[:-power], sig[-power:]
    return (_int_reading(head) + _UNIT_CHARS[ui] + _int_reading(tail))


def _apply_liang(reading: str) -> str:
    """Replace 二 with 两 where cn_tn's ``alt_two`` pass does: a 2 that is
    followed by a unit other than 十 and preceded by nothing or a unit
    other than 十 (e.g. 两百, 两万, but 二十 and 三十二万 keep 二)."""
    out = list(reading)
    for i, ch in enumerate(out):
        if ch != "二":
            continue
        nxt = reading[i + 1] if i + 1 < len(reading) else ""
        prev = reading[i - 1] if i > 0 else ""
        if nxt in _UNIT_CHARS and nxt != "十" and (
            prev == "" or (prev in _UNIT_CHARS and prev != "十")
        ):
            out[i] = "两"
    return "".join(out)


def number_to_hanzi(num: str, *, reading_style: bool = False) -> str:
    """'123' -> 一百二十三; '3.14' -> 三点一四.

    ``reading_style`` gives the unit-less digit-by-digit form (phone
    numbers, years, long ID runs — cn_tn's ``Digit``/``TelePhone``)."""
    int_part, _, dec_part = num.partition(".")
    if reading_style:
        body = _digits_reading(int_part)
    elif len(int_part) > 1:
        body = _apply_liang(_int_reading(int_part))
        # leading 一十 reads as 十 (10..19)
        if len(body) >= 2 and body[0] == "一" and body[1] == "十":
            body = body[1:]
    else:
        body = _digits_reading(int_part)
    if dec_part:
        body = body + "点" + _digits_reading(dec_part)
        if body.startswith("点"):
            body = HANZI_DIGITS[0] + body
    return body


def _date_to_hanzi(date: str) -> str:
    year, sep, rest = date.partition("年")
    if not sep:
        year, rest = "", date
    out = _digits_reading(year) + "年" if sep else ""
    if rest:
        month, msep, day = rest.partition("月")
        if msep:
            out += number_to_hanzi(month.strip()) + "月"
            if day:
                out += number_to_hanzi(day[:-1]) + day[-1]
        else:
            # no 月: the whole remainder reads as cardinal + suffix char
            out += number_to_hanzi(rest[:-1]) + rest[-1]
    return out


def _money_to_hanzi(money: str) -> str:
    # in-order dedup: a longer number must be rewritten before any shorter
    # number that is its substring ('123元12块')
    for num in dict.fromkeys(m[0] for m in _RE_PLAIN_NUM.findall(money)):
        money = money.replace(num, number_to_hanzi(num))
    return money


def _phone_to_hanzi(phone: str, *, landline: bool) -> str:
    parts = phone.split("-") if landline else phone.strip("+").split()
    return "".join(number_to_hanzi(p, reading_style=True) for p in parts)


def normalize_nsw(text: str) -> str:
    """Rewrite non-standard words (digits/dates/currency/percent/phones)
    into their spoken hanzi forms, in the reference's pass order."""
    text = "^" + text + "$"

    for m in _RE_DATE.findall(text):
        if m[0]:
            text = text.replace(m[0], _date_to_hanzi(m[0]), 1)
    for m in _RE_MONEY.findall(text):
        text = text.replace(m[0], _money_to_hanzi(m[0]), 1)
    for m in _RE_MOBILE.findall(text):
        text = text.replace(m[0], _phone_to_hanzi(m[0], landline=False), 1)
    for m in _RE_LANDLINE.findall(text):
        text = text.replace(m[0], _phone_to_hanzi(m[0], landline=True), 1)
    for m in _RE_FRACTION.findall(text):
        num, den = m.split("/")
        text = text.replace(
            m, number_to_hanzi(den) + "分之" + number_to_hanzi(num), 1)
    text = text.replace("％", "%")
    for m in _RE_PERCENT.findall(text):
        text = text.replace(
            m[0], "百分之" + number_to_hanzi(m[0].rstrip("%")), 1)
    for m in _RE_QUANTIFIED.findall(text):
        text = text.replace(m[0], number_to_hanzi(m[0]), 1)
    for m in _RE_DIGIT_RUN.findall(text):
        text = text.replace(m, number_to_hanzi(m, reading_style=True), 1)
    for m in _RE_NUMBER.findall(text):
        text = text.replace(m[0], number_to_hanzi(m[0]), 1)
    # undo collateral damage to latinisms like P2P / B2B
    for m in _RE_LETTER2.findall(text):
        text = text.replace(m[0], m[1] + "2" + m[2], 1)

    return text.lstrip("^").rstrip("$")


def cn_textnorm(text: str) -> str:
    """The reference scorer's Chinese normalizer: NSW rewriting followed by
    punctuation-to-space (``TextNorm.__call__`` with every option off)."""
    return normalize_nsw(text).translate(_PUNCS_TO_SPACE)
