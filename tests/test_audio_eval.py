"""Tiny-weight tests for the audio-side evaluation metrics
(`metrics/audio_eval.py`): speaker similarity on a random WavLM tower,
transcribe-then-WER with a scripted transcriber, and CLAP cosine on a
random tiny `transformers.ClapModel` (the reference scores TTA/TTM this
way, `metrics/audiogen_tools/clap_score.py`)."""

import json
import os

import numpy as np
import pytest

from uniaudio2_tpu.metrics import audio_eval


def test_speaker_similarity_tiny_wavlm():
    import jax
    from uniaudio2_tpu.codec import wavlm_encoder as wl

    cfg = wl.WavLMConfig.tiny_test()
    params = wl.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    wav_a = rng.standard_normal(3200).astype(np.float32) * 0.1
    wav_b = rng.standard_normal(3200).astype(np.float32) * 0.1
    s_self = audio_eval.speaker_similarity(
        wav_a, wav_a, wavlm_params=params, wavlm_cfg=cfg)
    s_cross = audio_eval.speaker_similarity(
        wav_a, wav_b, wavlm_params=params, wavlm_cfg=cfg)
    assert s_self == pytest.approx(1.0, abs=1e-3)
    assert -1.0 <= s_cross <= 1.0 and s_cross < 1.0


def test_transcribe_then_wer_scripted(tmp_path):
    from uniaudio2_tpu.codec.tokenizer import save_wav

    rng = np.random.default_rng(1)
    paths, transcripts = [], {}
    texts = ["hello world", "the cat sat"]
    for i, text in enumerate(texts):
        p = str(tmp_path / f"utt{i}.wav")
        save_wav(p, rng.standard_normal(1600).astype(np.float32) * 0.05, 16000)
        paths.append(p)
        transcripts[p] = text

    def asr(wav):
        # scripted transcriber keyed on signal energy is unstable; key on
        # call order instead (deterministic iteration in transcribe_then_wer)
        asr.calls += 1
        return ["hello world", "the cat hat"][asr.calls - 1]

    asr.calls = 0
    res = audio_eval.transcribe_then_wer(
        list(zip(paths, texts)), asr=asr, lang="en")
    # 1 substitution over 5 reference words
    assert res.wer == pytest.approx(0.2, abs=1e-6)
    assert res.subs == 1 and res.n_ref == 5


def _tiny_clap():
    import torch
    from transformers import (
        ClapConfig, ClapFeatureExtractor, ClapModel, ClapProcessor,
        RobertaTokenizer,
    )
    from transformers.models.clap.configuration_clap import (
        ClapAudioConfig, ClapTextConfig,
    )

    audio_cfg = ClapAudioConfig(
        window_size=4, num_mel_bins=16, spec_size=64, patch_size=4,
        patch_stride=[4, 4], hidden_size=32, depths=[1, 1],
        num_attention_heads=[2, 2], num_hidden_layers=2, projection_dim=16,
        mlp_ratio=2.0, patch_embeds_hidden_size=16,
    )
    text_cfg = ClapTextConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, projection_dim=16,
    )
    cfg = ClapConfig(text_config=text_cfg.to_dict(),
                     audio_config=audio_cfg.to_dict(), projection_dim=16)
    torch.manual_seed(0)
    model = ClapModel(cfg).eval()
    fe = ClapFeatureExtractor(
        feature_size=16, sampling_rate=48000, hop_length=480,
        max_length_s=1, fft_window_size=400, nb_max_samples=48000,
        truncation="rand_trunc",  # tiny config has enable_fusion=False
    )
    import tempfile
    td = tempfile.mkdtemp()
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
    for c in "abcdefghijklmnopqrstuvwxyz":
        vocab[c] = len(vocab)
    vocab["Ġ"] = len(vocab)
    with open(os.path.join(td, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(td, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    tok = RobertaTokenizer(
        os.path.join(td, "vocab.json"), os.path.join(td, "merges.txt"))
    return model, ClapProcessor(feature_extractor=fe, tokenizer=tok)


def test_clap_score_tiny_model():
    model, processor = _tiny_clap()
    rng = np.random.default_rng(2)
    t = np.linspace(0, 1, 48000, dtype=np.float32)
    pairs = [
        (np.sin(2 * np.pi * 440 * t) * 0.5, "dog barking"),
        ((rng.standard_normal(48000) * 0.1).astype(np.float32), "soft music"),
    ]
    mean, scores = audio_eval.clap_score(
        pairs, clap_model=(model, processor), return_all=True)
    assert len(scores) == 2
    assert all(-1.0 <= s <= 1.0 for s in scores)
    assert mean == pytest.approx(np.mean(scores))
    # deterministic across calls
    mean2 = audio_eval.clap_score(pairs, clap_model=(model, processor))
    assert mean2 == pytest.approx(mean, abs=1e-6)
