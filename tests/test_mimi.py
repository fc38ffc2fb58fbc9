"""Mimi codec: causal conv semantics vs torch, RVQ round trip, end-to-end
encode/decode shapes, and causal prefix consistency (the property the
reference's streaming machinery exists to preserve)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import mimi

torch = pytest.importorskip("torch")


def test_causal_conv_matches_torch_left_pad():
    """causal_conv == torch conv1d with (k-1)d-(s-1) left zeros (+frame
    completion on the right)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 20, 3)).astype(np.float32)
    w = rng.standard_normal((5, 3, 4)).astype(np.float32) * 0.1
    b = rng.standard_normal(4).astype(np.float32)
    out = np.asarray(mimi.causal_conv(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2
    ))
    xt = torch.from_numpy(x.transpose(0, 2, 1))
    # padding_total = k - s = 3; extra to complete last frame
    pt = 5 - 2
    extra = mimi._extra_padding(20, 5, 2, pt)
    xt = torch.nn.functional.pad(xt, (pt, extra))
    conv = torch.nn.Conv1d(3, 4, 5, stride=2)
    conv.weight.data = torch.from_numpy(w.transpose(2, 1, 0))
    conv.bias.data = torch.from_numpy(b)
    ref = conv(xt).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_causal_conv_transpose_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 10, 3)).astype(np.float32)
    w = rng.standard_normal((8, 3, 2)).astype(np.float32) * 0.1
    out = np.asarray(mimi.causal_conv_transpose(
        jnp.asarray(x), jnp.asarray(w), None, stride=4
    ))
    tc = torch.nn.ConvTranspose1d(3, 2, 8, stride=4, bias=False)
    tc.weight.data = torch.from_numpy(w.transpose(1, 2, 0))  # (in,out,k)
    ref = tc(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy()
    ref = ref[:, :, : -(8 - 4)]  # trim right padding_total
    np.testing.assert_allclose(out, ref.transpose(0, 2, 1), atol=1e-5)


def test_rvq_roundtrip():
    cfg = mimi.MimiConfig.tiny()
    params = mimi.init_params(jax.random.PRNGKey(0), cfg)
    p = params["rvq_acoustic"]
    codes = jax.random.randint(jax.random.PRNGKey(1), (1, 6, 3), 0,
                               cfg.codebook_size)
    vec = mimi._rvq_decode(p, codes)
    assert vec.shape == (1, 6, cfg.latent_dim)


def test_mimi_encode_decode_shapes():
    cfg = mimi.MimiConfig.tiny()
    params = mimi.init_params(jax.random.PRNGKey(0), cfg)
    hop = cfg.hop_length * cfg.resample_stride  # samples per frame
    wav = jax.random.normal(jax.random.PRNGKey(2), (1, hop * 10)) * 0.1
    codes = mimi.encode(params, cfg, wav)
    assert codes.shape == (1, cfg.rvq_layers, 10)
    out = mimi.decode(params, cfg, codes)
    assert out.shape[0] == 1
    assert out.shape[1] >= hop * 10  # decoder reconstructs at least the input span
    assert np.isfinite(np.asarray(out)).all()


def test_causal_prefix_consistency():
    """Encoding a prefix must give the same leading frames as encoding the
    full signal (causality — what the reference's streaming mode asserts,
    `modules/streaming.py:306`)."""
    cfg = mimi.MimiConfig.tiny()
    params = mimi.init_params(jax.random.PRNGKey(0), cfg)
    hop = cfg.hop_length * cfg.resample_stride
    wav = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (1, hop * 8))) * 0.1
    full = np.asarray(mimi.encode(params, cfg, jnp.asarray(wav)))
    half = np.asarray(mimi.encode(params, cfg, jnp.asarray(wav[:, : hop * 4])))
    np.testing.assert_array_equal(full[:, :, :3], half[:, :, :3])


def test_tokenizer_facade():
    cfg = mimi.MimiConfig.tiny()
    params = mimi.init_params(jax.random.PRNGKey(0), cfg)
    tok = mimi.MimiTokenizer(params, cfg)
    wav = np.sin(np.linspace(0, 40, 2000)).astype(np.float32)
    codes = tok.tokenize(wav)
    assert codes.shape[0] == cfg.rvq_layers
    out = tok.detokenize(codes)
    assert out.ndim == 1 and np.isfinite(out).all()
