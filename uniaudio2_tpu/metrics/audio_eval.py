"""Audio-side evaluation: speaker similarity, transcribe-then-WER, CLAP /
FAD-KL wrappers.

Capability parity with `/root/reference/metrics/tts-eval/compute_sim.py:47`
(WavLM-based speaker cosine similarity), `compute_wer_from_audio.py`
(whisper-transcribe-then-WER), `metrics/audiogen_tools/clap_score.py` and
`fad_kl.py:155` (CLAP cosine, FAD/KL aggregation).

Dependency policy: the speaker-sim path runs on THIS framework's WavLM
tower (no torch needed); whisper-ASR and CLAP use HF `transformers` (baked
into this image — `ClapModel` replaces the reference's laion_clap package,
same architecture); audioldm_eval (FAD/KL computation) is not present, so
only its result aggregation is implemented, mirroring the reference's
optional extras (`pyproject.toml` `[fad]`).
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


def make_whisper_asr(whisper_model_path: str):
    """Build a wav->text transcriber from an HF Whisper checkpoint
    (the reference's transcriber, `compute_wer_from_audio.py`)."""
    try:
        import torch
        from transformers import (
            WhisperForConditionalGeneration, WhisperProcessor,
        )
    except ImportError as e:
        raise RuntimeError(f"whisper ASR eval needs transformers+torch: {e}")

    processor = WhisperProcessor.from_pretrained(whisper_model_path)
    model = WhisperForConditionalGeneration.from_pretrained(whisper_model_path)
    model.eval()

    def asr(wav: np.ndarray) -> str:
        feats = processor(wav, sampling_rate=16000, return_tensors="pt")
        with torch.no_grad():
            ids = model.generate(feats["input_features"])
        return processor.batch_decode(ids, skip_special_tokens=True)[0]

    return asr


def transcribe_then_wer(
    wav_ref_pairs: List[Tuple[str, str]],
    *,
    whisper_model_path: Optional[str] = None,
    asr=None,
    lang: str = "en",
):
    """Generated-wav WER: transcribe each wav, score against its reference
    text (reference `compute_wer_from_audio.py`).

    ``asr`` is any wav(np.float32 @16k)->text callable; by default an HF
    Whisper transcriber is built from ``whisper_model_path``.
    """
    from uniaudio2_tpu.codec.tokenizer import load_wav
    from uniaudio2_tpu.metrics.wer import compute_wer

    if asr is None:
        if whisper_model_path is None:
            raise ValueError("provide whisper_model_path or an asr callable")
        asr = make_whisper_asr(whisper_model_path)
    refs, hyps = {}, {}
    for i, (wav_path, ref_text) in enumerate(wav_ref_pairs):
        wav = load_wav(wav_path, 16000) if isinstance(wav_path, (str, os.PathLike)) \
            else np.asarray(wav_path, np.float32)
        refs[str(i)] = ref_text
        hyps[str(i)] = asr(wav)
    return compute_wer(refs, hyps, lang=lang)


def _int16_roundtrip(wav: np.ndarray) -> np.ndarray:
    """LAION-CLAP's int16 quantization round-trip of input audio
    (reference `clap_score.py:19-25`)."""
    w = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
    return ((w * 32767.0).astype(np.int16) / 32767.0).astype(np.float32)


def clap_score(
    wav_text_pairs,
    *,
    clap_ckpt: Optional[str] = None,
    clap_model=None,
    sr: int = 48000,
    return_all: bool = False,
):
    """Text-audio CLAP cosine (reference `metrics/audiogen_tools/clap_score.py`:
    embed text and 48 kHz int16-roundtripped audio, L2-normalise, dot).

    The reference uses the laion_clap package; this image ships
    `transformers.ClapModel` instead — the same architecture (laion/clap-*
    checkpoints are published in HF format), so scores match the reference
    pipeline given the same checkpoint.

    Args:
        wav_text_pairs: list of (wav, text); wav is a path or a float array
            at ``sr``.
        clap_ckpt: HF checkpoint path/name (e.g. "laion/clap-htsat-unfused").
        clap_model: optional pre-built (model, processor) pair (tests /
            caching across calls).
        return_all: also return the per-pair score list.
    """
    try:
        import torch
        from transformers import ClapModel, ClapProcessor
    except ImportError as e:
        raise RuntimeError(f"clap_score needs transformers+torch: {e}")
    from uniaudio2_tpu.codec.tokenizer import load_wav

    if clap_model is not None:
        model, processor = clap_model
    else:
        if clap_ckpt is None:
            raise ValueError("provide clap_ckpt or a (model, processor) pair")
        model = ClapModel.from_pretrained(clap_ckpt)
        processor = ClapProcessor.from_pretrained(clap_ckpt)
    model.eval()

    scores = []
    for wav, text in wav_text_pairs:
        if isinstance(wav, (str, os.PathLike)):
            wav = load_wav(wav, sr)
        wav = _int16_roundtrip(wav)
        inputs = processor(
            text=[text], audios=[wav], sampling_rate=sr,
            return_tensors="pt", padding=True,
        )
        with torch.no_grad():
            out = model(**inputs)
            a = torch.nn.functional.normalize(out.audio_embeds, dim=-1)
            t = torch.nn.functional.normalize(out.text_embeds, dim=-1)
        scores.append(float((a * t).sum(dim=-1)[0]))
    mean = float(np.mean(scores)) if scores else float("nan")
    return (mean, scores) if return_all else mean


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
