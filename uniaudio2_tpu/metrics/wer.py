"""Word/character error rate with EN/CN text normalization.

Capability parity with the reference WER suite
(`/root/reference/metrics/wer_tools/get_wer.py:99,178,516`, `get_wer_cn.py`):
scp/tsv batch scoring, whisper-style English normalization, CJK
character-level scoring. Self-contained: Levenshtein is implemented here
(the reference pulls in jiwer/editdistance) and the whisper-normalizer
semantics are owned in `en_text_norm.py` (differentially tested against
the `transformers` implementation — no import-time fallback that could
silently change WER).
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple


def edit_distance(ref: Sequence, hyp: Sequence) -> Tuple[int, int, int, int]:
    """Levenshtein alignment counts: (substitutions, deletions, insertions,
    correct)."""
    n, m = len(ref), len(hyp)
    # dp[j] = (cost, subs, dels, ins)
    prev = [(j, 0, 0, j) for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [(i, 0, i, 0)] + [None] * m
        for j in range(1, m + 1):
            if ref[i - 1] == hyp[j - 1]:
                cur[j] = prev[j - 1]
            else:
                sub = (prev[j - 1][0] + 1, prev[j - 1][1] + 1, prev[j - 1][2], prev[j - 1][3])
                dele = (prev[j][0] + 1, prev[j][1], prev[j][2] + 1, prev[j][3])
                ins = (cur[j - 1][0] + 1, cur[j - 1][1], cur[j - 1][2], cur[j - 1][3] + 1)
                cur[j] = min(sub, dele, ins, key=lambda x: x[0])
        prev = cur
    cost, subs, dels, ins = prev[m]
    correct = n - subs - dels
    return subs, dels, ins, correct


_BASIC_DROP = re.compile(r"[^\w\s']")
_WS = re.compile(r"\s+")


def basic_normalize(text: str) -> str:
    """Lowercase, strip punctuation/diacritics, collapse whitespace."""
    text = unicodedata.normalize("NFKD", text)
    text = "".join(c for c in text if not unicodedata.combining(c))
    text = text.lower()
    text = _BASIC_DROP.sub(" ", text)
    return _WS.sub(" ", text).strip()


def english_normalize(text: str) -> str:
    """Whisper-normalizer semantics, owned: contraction/title expansion,
    spelled-out-number -> arabic, currency/percent folding, UK->US spelling
    (reference `wer_tools/whisper_normalizer/english.py` as applied at
    `get_wer.py:99`). Implemented in `en_text_norm.py` and differentially
    tested against the `transformers` port — no silent fallback."""
    from uniaudio2_tpu.metrics.en_text_norm import english_text_normalize

    return english_text_normalize(text)


_CJK = re.compile(r"[一-鿿㐀-䶿]")


def cn_normalize(text: str) -> List[str]:
    """Chinese scoring units: NSW text normalization (digits/dates/currency
    → hanzi, exactly the reference's `cn_tn.TextNorm` semantics as applied
    at `wer_tools/get_wer.py:10-24` — see `cn_text_norm.py`), then CJK chars
    individually, latin words whole (reference `get_wer_cn.py` convention)."""
    from uniaudio2_tpu.metrics.cn_text_norm import cn_textnorm

    text = basic_normalize(cn_textnorm(text))
    units: List[str] = []
    word = ""
    for ch in text:
        if _CJK.match(ch):
            if word:
                units.append(word)
                word = ""
            units.append(ch)
        elif ch.isspace():
            if word:
                units.append(word)
                word = ""
        else:
            word += ch
    if word:
        units.append(word)
    return units


@dataclass
class WERResult:
    wer: float
    subs: int
    dels: int
    ins: int
    n_ref: int
    n_utts: int

    def __str__(self):
        return (
            f"WER {self.wer * 100:.2f}% [{self.n_utts} utts, N={self.n_ref}, "
            f"S={self.subs}, D={self.dels}, I={self.ins}]"
        )


def compute_wer(
    refs: Dict[str, str],
    hyps: Dict[str, str],
    *,
    lang: str = "en",
) -> WERResult:
    """Corpus WER over keyed transcripts (missing hyps count as deletions)."""
    subs = dels = ins = n_ref = n = 0
    for key, ref_text in refs.items():
        if lang == "cn":
            ref_units = cn_normalize(ref_text)
            hyp_units = cn_normalize(hyps.get(key, ""))
        else:
            ref_units = english_normalize(ref_text).split()
            hyp_units = english_normalize(hyps.get(key, "")).split()
        s, d, i, _ = edit_distance(ref_units, hyp_units)
        subs += s
        dels += d
        ins += i
        n_ref += len(ref_units)
        n += 1
    wer = (subs + dels + ins) / max(n_ref, 1)
    return WERResult(wer, subs, dels, ins, n_ref, n)


def read_scp(path: str) -> Dict[str, str]:
    """kaldi-style ``key text...`` file -> dict."""
    out: Dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if len(parts) == 2:
                out[parts[0]] = parts[1]
            elif len(parts) == 1:
                out[parts[0]] = ""
    return out


def score_files(ref_path: str, hyp_path: str, lang: str = "en") -> WERResult:
    return compute_wer(read_scp(ref_path), read_scp(hyp_path), lang=lang)
