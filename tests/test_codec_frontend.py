"""Codec encode frontend parity: on-device mel vs HF WhisperFeatureExtractor,
sinc resampler quality, and the JAX Whisper encoder vs HF WhisperModel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import mel as meljax
from uniaudio2_tpu.codec import whisper_encoder as we

torch = pytest.importorskip("torch")


def test_log_mel_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()  # defaults: 80 mels, 16 kHz, 30 s window
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(fe.n_samples) * 0.1).astype(np.float32)
    ref = fe(wav, sampling_rate=16000, return_tensors="np")["input_features"][0]
    ours = np.asarray(meljax.log_mel_spectrogram(jnp.asarray(wav)[None]))[0].T
    assert ours.shape == ref.shape  # (80, 3000)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_resample_preserves_tone():
    sr1, sr2, f0 = 24000, 16000, 440.0
    t = np.arange(sr1) / sr1
    wav = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    out = np.asarray(meljax.resample(jnp.asarray(wav)[None], sr1, sr2))[0]
    assert out.shape[0] == 16000
    ideal = np.sin(2 * np.pi * f0 * np.arange(out.shape[0]) / sr2)
    # ignore filter edge effects
    a, b = out[500:-500], ideal[500:-500]
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert corr > 0.999, corr


def _hf_tiny_whisper():
    from transformers import WhisperConfig, WhisperModel

    cfg = WhisperConfig(
        vocab_size=100, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=2, encoder_ffn_dim=64,
        decoder_layers=1, decoder_attention_heads=2, decoder_ffn_dim=64,
        max_source_positions=32,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, max_target_positions=32,
    )
    torch.manual_seed(0)
    model = WhisperModel(cfg).eval()
    return cfg, model.encoder


def test_whisper_encoder_parity_vs_hf():
    hf_cfg, hf_enc = _hf_tiny_whisper()
    sd = {k: v.detach().numpy() for k, v in hf_enc.state_dict().items()}
    l = hf_cfg.encoder_layers

    def stack(fmt, transpose=False):
        a = np.stack([sd[fmt.format(i)] for i in range(l)])
        return a.transpose(0, 2, 1) if transpose else a

    params = {
        "conv1": {"w": sd["conv1.weight"].transpose(2, 1, 0),
                  "b": sd["conv1.bias"]},
        "conv2": {"w": sd["conv2.weight"].transpose(2, 1, 0),
                  "b": sd["conv2.bias"]},
        "pos_embed": sd["embed_positions.weight"],
        "layers": {
            "ln1_w": stack("layers.{}.self_attn_layer_norm.weight"),
            "ln1_b": stack("layers.{}.self_attn_layer_norm.bias"),
            "q_w": stack("layers.{}.self_attn.q_proj.weight", True),
            "q_b": stack("layers.{}.self_attn.q_proj.bias"),
            "k_w": stack("layers.{}.self_attn.k_proj.weight", True),
            "v_w": stack("layers.{}.self_attn.v_proj.weight", True),
            "v_b": stack("layers.{}.self_attn.v_proj.bias"),
            "out_w": stack("layers.{}.self_attn.out_proj.weight", True),
            "out_b": stack("layers.{}.self_attn.out_proj.bias"),
            "ln2_w": stack("layers.{}.final_layer_norm.weight"),
            "ln2_b": stack("layers.{}.final_layer_norm.bias"),
            "fc1_w": stack("layers.{}.fc1.weight", True),
            "fc1_b": stack("layers.{}.fc1.bias"),
            "fc2_w": stack("layers.{}.fc2.weight", True),
            "fc2_b": stack("layers.{}.fc2.bias"),
        },
        "ln_f_w": sd["layer_norm.weight"], "ln_f_b": sd["layer_norm.bias"],
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    cfg = we.WhisperEncoderConfig(
        n_mels=8, d_model=32, n_layers=2, n_heads=2, ffn_dim=64,
        max_positions=32,
    )
    rng = np.random.default_rng(1)
    mels = rng.standard_normal((1, 8, 64)).astype(np.float32)  # (B, mel, T)
    with torch.no_grad():
        ref = hf_enc(torch.from_numpy(mels)).last_hidden_state.numpy()
    ours = np.asarray(we.forward(params, cfg, jnp.asarray(mels.transpose(0, 2, 1))))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)
