"""Speaker audio-prompt sampling for PromptTTS / PromptLTS.

Behavior parity with the reference `AudioPromptTokenizer`
(`/root/reference/tools/tokenizer/AudioPromptTokenizer/
audio_prompt_tokenizer.py:15-75`): builds a speaker->utterances pool from the
prompt-task examples (entries whose ``audio_prompt_seq`` is a speaker-id
string), and samples a ``prompt_length×12.5``-frame clip of another utterance
of the same speaker at a random offset; token inputs are clipped directly.

Numpy + explicit RNG (deterministic under a seed, unlike the reference's
global `random`).
"""

from __future__ import annotations

import random
from typing import Dict, List, Mapping, Optional

import numpy as np

PROMPT_TASKS = ("PromptTTS", "PromptLTS")


def clip_by_length(x: np.ndarray, length: int, rng: random.Random) -> np.ndarray:
    """Random ``length``-frame crop of (T, 8) codes (reference
    `clip_by_length`)."""
    if x.shape[0] <= length:
        return x
    start = rng.randint(0, x.shape[0] - length - 1)
    return x[start : start + length]


class AudioPromptSampler:
    def __init__(
        self,
        data_dict: Mapping[str, Mapping],
        prompt_seconds: float,
        *,
        frame_rate: float = 12.5,
        seed: int = 0,
    ):
        self.data = data_dict
        self.prompt_length = int(prompt_seconds * frame_rate)
        self.rng = random.Random(seed)
        self.spk2utt: Dict[str, List[str]] = {}
        for eid, d in data_dict.items():
            if d.get("task") not in PROMPT_TASKS:
                continue
            spk = d.get("audio_prompt_seq")
            if not isinstance(spk, str):
                continue
            self.spk2utt.setdefault(spk, []).append(eid)

    @property
    def speakers(self) -> List[str]:
        return list(self.spk2utt)

    def find_length(self, _=None) -> int:
        return self.prompt_length

    def sample(self, x) -> np.ndarray:
        """Tokens (T, 8) -> random crop; speaker-id str -> a crop of one of
        that speaker's utterances' semantic codes."""
        if isinstance(x, np.ndarray):
            assert x.shape[1] == 8
            return clip_by_length(x, self.prompt_length, self.rng)
        utt_id = self.rng.choice(self.spk2utt[x])
        codes = np.asarray(self.data[utt_id]["semantic_seq"])
        if codes.shape[0] == 8 and codes.shape[0] != codes.shape[-1]:
            codes = codes.T
        return clip_by_length(codes, self.prompt_length, self.rng)
