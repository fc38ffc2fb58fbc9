"""SSL (BEST-RQ/MERT family) encoder vs HF HubertModel — same fairseq
wav2vec2 lineage, post-norm variant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import ssl_encoder as ssl

torch = pytest.importorskip("torch")


def _hf_tiny_hubert():
    from transformers import HubertConfig, HubertModel

    cfg = HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2, do_stable_layer_norm=False,
        feat_extract_norm="group", layerdrop=0.0, conv_bias=False,
        feat_proj_layer_norm=True,
    )
    torch.manual_seed(0)
    return cfg, HubertModel(cfg).eval()


def _convert(model):
    enc = model.encoder
    convs = []
    for i, cl in enumerate(model.feature_extractor.conv_layers):
        c = {"w": jnp.asarray(cl.conv.weight.detach().numpy().transpose(2, 1, 0))}
        if i == 0:
            c["gn_w"] = jnp.asarray(cl.layer_norm.weight.detach().numpy())
            c["gn_b"] = jnp.asarray(cl.layer_norm.bias.detach().numpy())
        convs.append(c)

    def st(ts, transpose=False):
        a = np.stack([t.detach().numpy() for t in ts])
        return jnp.asarray(a.transpose(0, 2, 1) if transpose else a)

    ls = enc.layers
    return {
        "convs": convs,
        "feat_ln_w": jnp.asarray(model.feature_projection.layer_norm.weight.detach().numpy()),
        "feat_ln_b": jnp.asarray(model.feature_projection.layer_norm.bias.detach().numpy()),
        "proj_w": jnp.asarray(model.feature_projection.projection.weight.detach().numpy().T),
        "proj_b": jnp.asarray(model.feature_projection.projection.bias.detach().numpy()),
        "pos_conv_w": jnp.asarray(
            enc.pos_conv_embed.conv.weight.detach().numpy().transpose(2, 1, 0)
        ),
        "pos_conv_b": jnp.asarray(enc.pos_conv_embed.conv.bias.detach().numpy()),
        "enc_ln_w": jnp.asarray(enc.layer_norm.weight.detach().numpy()),
        "enc_ln_b": jnp.asarray(enc.layer_norm.bias.detach().numpy()),
        "layers": {
            "q_w": st([l.attention.q_proj.weight for l in ls], True),
            "q_b": st([l.attention.q_proj.bias for l in ls]),
            "k_w": st([l.attention.k_proj.weight for l in ls], True),
            "k_b": st([l.attention.k_proj.bias for l in ls]),
            "v_w": st([l.attention.v_proj.weight for l in ls], True),
            "v_b": st([l.attention.v_proj.bias for l in ls]),
            "out_w": st([l.attention.out_proj.weight for l in ls], True),
            "out_b": st([l.attention.out_proj.bias for l in ls]),
            "ln1_w": st([l.layer_norm.weight for l in ls]),
            "ln1_b": st([l.layer_norm.bias for l in ls]),
            "ff1_w": st([l.feed_forward.intermediate_dense.weight for l in ls], True),
            "ff1_b": st([l.feed_forward.intermediate_dense.bias for l in ls]),
            "ff2_w": st([l.feed_forward.output_dense.weight for l in ls], True),
            "ff2_b": st([l.feed_forward.output_dense.bias for l in ls]),
            "ln2_w": st([l.final_layer_norm.weight for l in ls]),
            "ln2_b": st([l.final_layer_norm.bias for l in ls]),
        },
    }


def test_ssl_encoder_parity_vs_hubert():
    hf_cfg, model = _hf_tiny_hubert()
    params = _convert(model)
    cfg = ssl.SSLEncoderConfig.tiny_test()
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((1, 800)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = model(torch.from_numpy(wav), output_hidden_states=True)
    final, outs = ssl.forward(params, cfg, jnp.asarray(wav))
    # HF hidden_states[i+1] == fairseq layer_results[i] (post-norm)
    for i, ours in enumerate(outs):
        np.testing.assert_allclose(
            np.asarray(ours), ref.hidden_states[i + 1].numpy(),
            atol=3e-5, rtol=1e-4, err_msg=f"layer {i}",
        )
    np.testing.assert_allclose(
        np.asarray(final), ref.last_hidden_state.numpy(), atol=3e-5, rtol=1e-4
    )
    ac, se = ssl.acoustic_semantic_features(params, cfg, jnp.asarray(wav), layers=(0, 1))
    assert ac.shape == se.shape
