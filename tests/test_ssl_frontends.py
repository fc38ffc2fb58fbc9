"""MERT frontend variants (VERDICT r1 item 4): the melspec frontend vs an
independent torch re-execution of the reference's `model_mel_pred.compute_mel`
(`mert_model.py:523-556`), CQT extra-input sanity, the melspec-forward path,
and fairseq-config-driven frontend selection in the converter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import ssl_encoder as ssl

torch = pytest.importorskip("torch")


def _torch_compute_mel(wav: np.ndarray, sr: int, freq: int, n_bins: int):
    """Independent re-execution of the reference compute_mel with torch.stft
    (torchaudio itself is not in this image; this mirrors
    torchaudio.transforms.MelSpectrogram(n_fft=2048, hop=sr//freq, f_min=32.7,
    hann, center/constant pad, power 2, normalized=True, mel_scale='htk',
    norm=None) op for op)."""
    n_fft, hop = 2048, sr // freq
    x = torch.from_numpy(wav).float()
    window = torch.hann_window(n_fft, periodic=True)
    spec = torch.stft(
        x, n_fft=n_fft, hop_length=hop, win_length=n_fft, window=window,
        center=True, pad_mode="constant", normalized=False,
        onesided=True, return_complex=True,
    )
    power = spec.abs() ** 2 / window.pow(2).sum()  # normalized=True
    # HTK mel filterbank, norm=None (torchaudio melscale_fbanks semantics)
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(hz2mel(32.7), hz2mel(sr / 2.0), n_bins + 2)
    hz_pts = mel2hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    fb = np.maximum(
        0.0, np.minimum(-ramps[:-2] / fdiff[:-1, None],
                        ramps[2:] / fdiff[1:, None]))
    mel = torch.einsum("bft,mf->btm", power, torch.from_numpy(fb).float())
    logmel = torch.log(mel + 1e-5)
    return ((logmel - logmel.mean()) / (logmel.std() + 1e-5)).numpy()


def test_melspec_parity_vs_torch_reference():
    rng = np.random.default_rng(0)
    sr, freq, n_bins = 8000, 25, 24
    wav = (rng.standard_normal((2, 4 * sr)) * 0.2).astype(np.float32)
    want = _torch_compute_mel(wav, sr, freq, n_bins)
    got = np.asarray(ssl.melspec_features(
        jnp.asarray(wav), sample_rate=sr, label_rate=freq, n_bins=n_bins))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_cqt_peak_at_tone_bin():
    """A pure tone at bin k's center frequency must light up bin k."""
    sr, n_bins = 16000, 28  # bins_per_octave = 4
    bpo = n_bins // 7
    rng = np.random.default_rng(1)
    t = np.arange(2 * sr) / sr
    for k in (8, 16, 24):
        f = 32.7 * 2 ** (k / bpo)
        wav = np.sin(2 * np.pi * f * t).astype(np.float32)[None]
        out = np.asarray(ssl.cqt_features(
            jnp.asarray(wav), sample_rate=sr, n_bins=n_bins))
        mid = out[0, out.shape[1] // 2]
        assert abs(int(np.argmax(mid)) - k) <= 1, (k, int(np.argmax(mid)))


def test_melspec_frontend_forward_and_convert():
    """melspec-frontend SSL tower: forward shapes, and the converter maps a
    synthesized fairseq dict with no conv weights onto it key-for-key."""
    import dataclasses

    from uniaudio2_tpu.convert import codec as cvt
    from uniaudio2_tpu.convert.torch_to_jax import to_jax

    cfg = dataclasses.replace(
        ssl.SSLEncoderConfig.tiny_test(), frontend="melspec",
        melspec_n_bins=24, sample_rate=8000, label_rate=25,
        stable_post_proj_ln=True,
    )
    params = ssl.init_params(jax.random.PRNGKey(0), cfg)
    assert params["convs"] == []
    assert params["proj_w"].shape == (24, cfg.hidden_size)
    wav = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 8000)), jnp.float32) * 0.1
    final, outs = ssl.forward(params, cfg, wav)
    assert final.shape[-1] == cfg.hidden_size
    assert final.shape[1] == 1 + 8000 // (8000 // 25)
    assert len(outs) == cfg.num_layers
    assert np.isfinite(np.asarray(final)).all()

    # converter: a fairseq-style state dict without feature_extractor keys
    rng = np.random.default_rng(3)
    d, f, n_l = cfg.hidden_size, cfg.ffn_dim, cfg.num_layers
    sd = {}
    def put(name, shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32)
    pre = "pretrained_model.model."
    put(pre + "layer_norm.weight", (24,)); put(pre + "layer_norm.bias", (24,))
    put(pre + "post_extract_proj.weight", (d, 24))
    put(pre + "post_extract_proj.bias", (d,))
    put(pre + "encoder.pos_conv.0.weight_g", (1, 1, cfg.pos_conv_kernel))
    put(pre + "encoder.pos_conv.0.weight_v",
        (d, d // cfg.pos_conv_groups, cfg.pos_conv_kernel))
    put(pre + "encoder.pos_conv.0.bias", (d,))
    put(pre + "encoder.layer_norm.weight", (d,))
    put(pre + "encoder.layer_norm.bias", (d,))
    for i in range(n_l):
        for nm, shape in [
            ("self_attn.q_proj", (d, d)), ("self_attn.k_proj", (d, d)),
            ("self_attn.v_proj", (d, d)), ("self_attn.out_proj", (d, d)),
            ("fc1", (f, d)), ("fc2", (d, f)),
        ]:
            put(pre + f"encoder.layers.{i}.{nm}.weight", shape)
            put(pre + f"encoder.layers.{i}.{nm}.bias", (shape[0],))
        for nm in ("self_attn_layer_norm", "final_layer_norm"):
            put(pre + f"encoder.layers.{i}.{nm}.weight", (d,))
            put(pre + f"encoder.layers.{i}.{nm}.bias", (d,))
    missing = []
    conv = cvt.convert_fairseq_ssl(sd, pre, n_l, len(cfg.conv_dim), missing,
                                   frontend="melspec")
    assert missing == []
    out2 = ssl.forward(to_jax(conv), cfg, wav)[0]
    assert np.isfinite(np.asarray(out2)).all()


def test_ssl_config_from_fairseq_mapping():
    from uniaudio2_tpu.convert.codec import ssl_config_from_fairseq

    model_cfg = {
        "audio_extract_type": "melspec", "melspec_n_bins": 120,
        "encoder_layers": 12, "encoder_embed_dim": 768,
        "encoder_ffn_embed_dim": 3072, "encoder_attention_heads": 12,
        "layer_norm_first": True, "do_cnn_feat_stable_layernorm": True,
        "conv_feature_layers": "[(512, 10, 5)] + [(512, 3, 2)] * 2",
    }
    task_cfg = {"sample_rate": 24000, "label_rate": 75, "normalize": True}
    cfg = ssl_config_from_fairseq(model_cfg, task_cfg)
    assert cfg.frontend == "melspec" and cfg.melspec_n_bins == 120
    assert cfg.num_layers == 12 and cfg.hidden_size == 768
    assert cfg.ffn_dim == 3072 and cfg.num_heads == 12
    assert cfg.layer_norm_first and cfg.stable_post_proj_ln
    assert cfg.wav_normalize and cfg.sample_rate == 24000
    assert cfg.label_rate == 75
    assert cfg.conv_dim == (512, 512, 512)
    assert cfg.conv_stride == (5, 2, 2)
    assert cfg.feature_dim == 120  # melspec overrides conv width

    cqt_cfg = ssl_config_from_fairseq(
        {"feature_extractor_cqt": True, "feature_extractor_cqt_bins": 84,
         "conv_feature_layers": "[(512, 10, 5)]"}, {})
    assert cqt_cfg.cqt_bins == 84
    assert cqt_cfg.feature_dim == 512 + 84
