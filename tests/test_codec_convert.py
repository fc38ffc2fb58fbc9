"""Codec converter name-map round trips: DiT (diffusers-style names) and
ResidualVQ (vector-quantize-pytorch-style names) reconstruct our params
exactly; whisper-subtree converter matches the HF-prefixed layout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import dit
from uniaudio2_tpu.convert.codec import (
    convert_dit, convert_rvq, convert_whisper_encoder,
)


def _dit_to_sd(params, n_layers, prefix="cfm_wrapper.estimator."):
    """Inverse of convert_dit: our params -> diffusers-named numpy dict."""
    sd = {}
    p = jax.tree_util.tree_map(np.asarray, params)
    sd[prefix + "proj_in.ffn_1.weight"] = p["proj_in"]["conv_w"].transpose(2, 1, 0)
    sd[prefix + "proj_in.ffn_1.bias"] = p["proj_in"]["conv_b"]
    sd[prefix + "proj_in.ffn_2.weight"] = p["proj_in"]["lin_w"].T
    sd[prefix + "proj_in.ffn_2.bias"] = p["proj_in"]["lin_b"]
    sd[prefix + "proj_out.ffn_1.weight"] = p["out"]["conv_w"].transpose(2, 1, 0)
    sd[prefix + "proj_out.ffn_1.bias"] = p["out"]["conv_b"]
    sd[prefix + "proj_out.ffn_2.weight"] = p["out"]["lin_w"].T
    sd[prefix + "proj_out.ffn_2.bias"] = p["out"]["lin_b"]
    sd[prefix + "scale_shift_table"] = p["out"]["sst"]
    t = p["t_embed"]
    sd[prefix + "adaln_single.emb.timestep_embedder.linear_1.weight"] = t["w1"].T
    sd[prefix + "adaln_single.emb.timestep_embedder.linear_1.bias"] = t["b1"]
    sd[prefix + "adaln_single.emb.timestep_embedder.linear_2.weight"] = t["w2"].T
    sd[prefix + "adaln_single.emb.timestep_embedder.linear_2.bias"] = t["b2"]
    sd[prefix + "adaln_single.linear.weight"] = p["adaln"]["w"].T
    sd[prefix + "adaln_single.linear.bias"] = p["adaln"]["b"]
    d = p["blocks"]["qkv_w"].shape[1]
    for i in range(n_layers):
        base = f"{prefix}transformer_blocks.{i}."
        qkv_w = p["blocks"]["qkv_w"][i]
        qkv_b = p["blocks"]["qkv_b"][i]
        for j, name in enumerate(("to_q", "to_k", "to_v")):
            sd[base + f"attn1.{name}.weight"] = qkv_w[:, j * d:(j + 1) * d].T
            sd[base + f"attn1.{name}.bias"] = qkv_b[j * d:(j + 1) * d]
        sd[base + "attn1.to_out.0.weight"] = p["blocks"]["attn_out_w"][i].T
        sd[base + "attn1.to_out.0.bias"] = p["blocks"]["attn_out_b"][i]
        sd[base + "ff.net.0.proj.weight"] = p["blocks"]["ff1_w"][i].T
        sd[base + "ff.net.0.proj.bias"] = p["blocks"]["ff1_b"][i]
        sd[base + "ff.net.2.weight"] = p["blocks"]["ff2_w"][i].T
        sd[base + "ff.net.2.bias"] = p["blocks"]["ff2_b"][i]
        sd[base + "scale_shift_table"] = p["blocks"]["sst"][i]
    return sd


def test_dit_converter_roundtrip():
    cfg = dit.DiTConfig.tiny()
    params = dit.init_params(jax.random.PRNGKey(0), cfg)
    sd = _dit_to_sd(params, cfg.num_layers)
    missing = []
    out = convert_dit(sd, "cfm_wrapper.estimator.", cfg.num_layers, missing)
    assert not missing, missing[:5]
    def flat(tree):
        return sorted(
            ((str(kp), v) for kp, v in
             jax.tree_util.tree_flatten_with_path(tree)[0]),
            key=lambda kv: kv[0],
        )

    for (ka, a), (kb, b) in zip(flat(params), flat(out)):
        assert ka == kb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, err_msg=ka
        )
    # converted params must run
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, cfg.in_channels))
    v1 = dit.forward(params, cfg, x, jnp.array([0.5]))
    out = jax.tree_util.tree_map(jnp.asarray, out)
    v2 = dit.forward(out, cfg, x, jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_rvq_converter():
    from uniaudio2_tpu.codec import rvq as rvqlib

    rng = np.random.default_rng(0)
    sd = {
        "vq.project_in.weight": rng.standard_normal((8, 16)).astype(np.float32),
        "vq.project_in.bias": rng.standard_normal(8).astype(np.float32),
        "vq.project_out.weight": rng.standard_normal((16, 8)).astype(np.float32),
        "vq.project_out.bias": rng.standard_normal(16).astype(np.float32),
        "vq.layers.0._codebook.embed": rng.standard_normal((1, 11, 8)).astype(np.float32),
        "vq.layers.1._codebook.embed": rng.standard_normal((11, 8)).astype(np.float32),
    }
    missing = []
    params = convert_rvq(sd, "vq.", missing)
    assert not missing
    assert params["codebooks"].shape == (2, 11, 8)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    idx = jnp.asarray(rng.integers(0, 11, (1, 4, 2)))
    out = rvqlib.decode(params, idx)
    manual = (sd["vq.layers.0._codebook.embed"][0][np.asarray(idx)[..., 0]]
              + sd["vq.layers.1._codebook.embed"][np.asarray(idx)[..., 1]])
    manual = manual @ sd["vq.project_out.weight"].T + sd["vq.project_out.bias"]
    np.testing.assert_allclose(np.asarray(out), manual, atol=1e-5)


def test_whisper_subtree_converter_matches_test_mapping():
    """convert_whisper_encoder over an HF state dict must equal the manual
    mapping already proven exact in test_codec_frontend."""
    from transformers import WhisperConfig, WhisperModel
    import torch

    cfg = WhisperConfig(
        vocab_size=100, num_mel_bins=8, d_model=32, encoder_layers=2,
        encoder_attention_heads=2, encoder_ffn_dim=64, decoder_layers=1,
        decoder_attention_heads=2, decoder_ffn_dim=64,
        max_source_positions=32, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=1, max_target_positions=32,
    )
    torch.manual_seed(0)
    enc = WhisperModel(cfg).encoder.eval()
    sd = {"whisper_encoder." + k: v.detach().numpy()
          for k, v in enc.state_dict().items()}
    missing = []
    params = convert_whisper_encoder(sd, "whisper_encoder.", 2, missing)
    assert not missing, missing[:5]
    from uniaudio2_tpu.codec import whisper_encoder as we

    jcfg = we.WhisperEncoderConfig(n_mels=8, d_model=32, n_layers=2,
                                   n_heads=2, ffn_dim=64, max_positions=32)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    mels = np.random.default_rng(1).standard_normal((1, 8, 64)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(mels)).last_hidden_state.numpy()
    ours = np.asarray(we.forward(params, jcfg, jnp.asarray(mels.transpose(0, 2, 1))))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)
