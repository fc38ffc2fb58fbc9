"""JAX WavLM encoder vs HF transformers WavLMModel (tiny random config):
exact-math parity including the gated relative position bias."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import wavlm_encoder as wl

torch = pytest.importorskip("torch")


def _hf_tiny():
    from transformers import WavLMConfig, WavLMModel

    cfg = WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2, num_buckets=32,
        max_bucket_distance=50, do_stable_layer_norm=False,
        feat_extract_norm="group", layerdrop=0.0,
    )
    torch.manual_seed(0)
    return cfg, WavLMModel(cfg).eval()


def _convert(model, n_layers):
    enc = model.encoder
    convs = []
    for i, cl in enumerate(model.feature_extractor.conv_layers):
        c = {"w": jnp.asarray(cl.conv.weight.detach().numpy().transpose(2, 1, 0))}
        if i == 0:
            c["gn_w"] = jnp.asarray(cl.layer_norm.weight.detach().numpy())
            c["gn_b"] = jnp.asarray(cl.layer_norm.bias.detach().numpy())
        convs.append(c)

    def st(tensors, transpose=False):
        a = np.stack([t.detach().numpy() for t in tensors])
        return jnp.asarray(a.transpose(0, 2, 1) if transpose else a)

    ls = enc.layers
    params = {
        "convs": convs,
        "fp_ln_w": jnp.asarray(model.feature_projection.layer_norm.weight.detach().numpy()),
        "fp_ln_b": jnp.asarray(model.feature_projection.layer_norm.bias.detach().numpy()),
        "fp_w": jnp.asarray(model.feature_projection.projection.weight.detach().numpy().T),
        "fp_b": jnp.asarray(model.feature_projection.projection.bias.detach().numpy()),
        # weight-norm parametrization resolves on attribute access
        "pos_conv_w": jnp.asarray(
            enc.pos_conv_embed.conv.weight.detach().numpy().transpose(2, 1, 0)
        ),
        "pos_conv_b": jnp.asarray(enc.pos_conv_embed.conv.bias.detach().numpy()),
        "ln0_w": jnp.asarray(enc.layer_norm.weight.detach().numpy()),
        "ln0_b": jnp.asarray(enc.layer_norm.bias.detach().numpy()),
        "rel_attn_embed": jnp.asarray(
            ls[0].attention.rel_attn_embed.weight.detach().numpy()
        ),
        "layers": {
            "q_w": st([l.attention.q_proj.weight for l in ls], True),
            "q_b": st([l.attention.q_proj.bias for l in ls]),
            "k_w": st([l.attention.k_proj.weight for l in ls], True),
            "k_b": st([l.attention.k_proj.bias for l in ls]),
            "v_w": st([l.attention.v_proj.weight for l in ls], True),
            "v_b": st([l.attention.v_proj.bias for l in ls]),
            "out_w": st([l.attention.out_proj.weight for l in ls], True),
            "out_b": st([l.attention.out_proj.bias for l in ls]),
            "gru_w": st([l.attention.gru_rel_pos_linear.weight for l in ls], True),
            "gru_b": st([l.attention.gru_rel_pos_linear.bias for l in ls]),
            "gru_const": jnp.asarray(np.stack(
                [l.attention.gru_rel_pos_const.detach().numpy().reshape(-1) for l in ls]
            )),
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
    return params


def test_wavlm_parity_vs_hf():
    hf_cfg, model = _hf_tiny()
    params = _convert(model, hf_cfg.num_hidden_layers)
    cfg = wl.WavLMConfig.tiny_test()
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((1, 800)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = model(torch.from_numpy(wav), output_hidden_states=True)
    ours = wl.forward(params, cfg, jnp.asarray(wav))
    assert len(ours) == len(ref.hidden_states)
    for i, (a, b) in enumerate(zip(ours, ref.hidden_states)):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy(), atol=3e-5, rtol=1e-4,
            err_msg=f"hidden state {i}",
        )
    # layers 6..9 mean helper just composes the list; check with tiny (2 layers)
    feats = wl.feature_extractor(params, cfg, jnp.asarray(wav))
    assert feats.shape[-1] == cfg.conv_dim[-1]
