"""Feature-decoder (SEANet semantic/pronunciation decoder) parity vs an
independently built torch model following the reference architecture spec
(`llm_models/semantic_decoder.py:247-295`, instantiated at
`AudioDiffusion1D.py:252-253`)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import semantic_decoder as sd


def _torch_decoder(cfg: sd.FeatureDecoderConfig):
    """Reference-spec torch model (independent construction, not a copy):
    conv1(k=3, no bias) -> per-stride block [stride-1: k3 conv / stride>1:
    convT k=2s, p=(s+1)//2, op=s%2; then 2x residual units
    x + 1x1(elu(conv3(elu(x)))) bias-free] -> conv2(k=3, no bias)."""
    mods = {}
    mods["conv1"] = torch.nn.Conv1d(cfg.code_dim, cfg.decode_channels, 3,
                                    padding=1, bias=False)
    blocks = []
    for s in cfg.strides:
        c = cfg.decode_channels
        if s == 1:
            conv = torch.nn.Conv1d(c, c, 3, padding=1)
        else:
            conv = torch.nn.ConvTranspose1d(
                c, c, 2 * s, stride=s, padding=(s + 1) // 2,
                output_padding=s % 2)
        res = []
        for dil in cfg.block_dilations:
            res.append((
                torch.nn.Conv1d(c, c, cfg.unit_kernel_size,
                                padding=(cfg.unit_kernel_size - 1) // 2 * dil,
                                dilation=dil, bias=False),
                torch.nn.Conv1d(c, c, 1, bias=False),
            ))
        blocks.append((conv, res))
    mods["blocks"] = blocks
    mods["conv2"] = torch.nn.Conv1d(cfg.decode_channels, cfg.output_channels,
                                    3, padding=1, bias=False)

    def fwd(z):  # (B, C, T)
        x = mods["conv1"](z)
        for (conv, res), s in zip(blocks, cfg.strides):
            x = conv(x)
            for c1, c2 in res:
                y = c1(torch.nn.functional.elu(x))
                y = c2(torch.nn.functional.elu(y))
                x = x + y
        return mods["conv2"](x)

    return mods, fwd


def _port_weights(mods, cfg, dtype=jnp.float32):
    def w(conv):
        return jnp.asarray(conv.weight.detach().numpy().transpose(2, 1, 0),
                           dtype)

    def b(conv):
        return (jnp.asarray(conv.bias.detach().numpy(), dtype)
                if conv.bias is not None else None)

    def wt(conv):  # ConvTranspose1d stores (in, out, k) -> (k, in, out)
        return jnp.asarray(conv.weight.detach().numpy().transpose(2, 0, 1),
                           dtype)

    blocks = []
    for (conv, res), s in zip(mods["blocks"], cfg.strides):
        blk = {"conv": {"w": wt(conv) if s > 1 else w(conv), "b": b(conv)},
               "res": [{"c1": {"w": w(c1), "b": None},
                        "c2": {"w": w(c2), "b": None}} for c1, c2 in res]}
        blocks.append(blk)
    return {
        "conv1": {"w": w(mods["conv1"]), "b": None},
        "blocks": blocks,
        "conv2": {"w": w(mods["conv2"]), "b": None},
    }


def _reference_sd(mods, cfg, prefix):
    """Reference-true state-dict names (`llm_models/semantic_decoder.py`):
    the Conv1d/ConvTranspose1d wrappers nest `.conv`/`.deconv`; Conv1d1x1
    subclasses nn.Conv1d directly."""
    sd = {}

    def put(name, t):
        sd[prefix + name] = t.detach().numpy()

    put("conv1.conv.weight", mods["conv1"].weight)
    for i, ((conv, res), s) in enumerate(zip(mods["blocks"], cfg.strides)):
        sub = "conv.conv" if s == 1 else "conv.deconv"
        put(f"conv_blocks.{i}.{sub}.weight", conv.weight)
        put(f"conv_blocks.{i}.{sub}.bias", conv.bias)
        for j, (c1, c2) in enumerate(res):
            put(f"conv_blocks.{i}.res_units.{j}.conv1.conv.weight", c1.weight)
            put(f"conv_blocks.{i}.res_units.{j}.conv2.weight", c2.weight)
    put("conv2.conv.weight", mods["conv2"].weight)
    return sd


def test_converter_consumes_reference_keys_and_matches_torch():
    """convert_feature_decoders reads every reference key, reports nothing
    missing, and the converted forward matches torch."""
    from uniaudio2_tpu.convert import codec as cvt

    torch.manual_seed(3)
    s_cfg = sd.FeatureDecoderConfig(code_dim=10, output_channels=16,
                                    decode_channels=16, strides=(1, 2))
    p_cfg = sd.FeatureDecoderConfig(code_dim=10, output_channels=16,
                                    decode_channels=16, strides=(2, 2))
    s_mods, s_fwd = _torch_decoder(s_cfg)
    p_mods, p_fwd = _torch_decoder(p_cfg)
    state = {}
    state.update(_reference_sd(s_mods, s_cfg, "structure_semantic_decoder."))
    state.update(_reference_sd(p_mods, p_cfg, "pronunciation_decoder."))
    read = set()

    class Rec(dict):
        def __getitem__(self, k):
            read.add(k)
            return super().__getitem__(k)

        def get(self, k, default=None):
            if super().__contains__(k):
                read.add(k)
            return super().get(k, default)

    struct, pron, missing = cvt.convert_feature_decoders(Rec(state))
    assert missing == []
    assert read == set(state)
    z = np.random.default_rng(2).standard_normal((1, 9, 10)).astype(np.float32)
    for params, cfg, fwd in ((struct, s_cfg, s_fwd), (pron, p_cfg, p_fwd)):
        params = jax.tree_util.tree_map(jnp.asarray, params)
        with torch.no_grad():
            ref = fwd(torch.from_numpy(z.transpose(0, 2, 1))).numpy() \
                .transpose(0, 2, 1)
        got = np.asarray(sd.forward(params, cfg, jnp.asarray(z)))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("which", ["structure", "pronunciation"])
def test_feature_decoder_torch_parity(which):
    torch.manual_seed(0)
    if which == "structure":
        cfg = sd.FeatureDecoderConfig(code_dim=12, output_channels=20,
                                      decode_channels=20, strides=(1, 2))
    else:
        cfg = sd.FeatureDecoderConfig(code_dim=12, output_channels=24,
                                      decode_channels=24, strides=(2, 2))
    mods, fwd = _torch_decoder(cfg)
    params = _port_weights(mods, cfg)
    z = np.random.default_rng(1).standard_normal((2, 17, cfg.code_dim)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = fwd(torch.from_numpy(z.transpose(0, 2, 1))).numpy() \
            .transpose(0, 2, 1)
    got = np.asarray(sd.forward(params, cfg, jnp.asarray(z)))
    assert got.shape == ref.shape
    import math
    up = math.prod(cfg.strides)
    assert got.shape[1] == 17 * up
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_shipped_configs_shapes():
    cfg = sd.structure_semantic_config(code_dim=8, channels=12)
    p = sd.init_params(jax.random.PRNGKey(0), cfg)
    out = sd.forward(p, cfg, jnp.zeros((1, 10, 8)))
    assert out.shape == (1, 20, 12)  # strides (1,2) -> 2x
    cfg = sd.pronunciation_config(code_dim=8, wavlm_dim=12)
    p = sd.init_params(jax.random.PRNGKey(0), cfg)
    out = sd.forward(p, cfg, jnp.zeros((1, 10, 8)))
    assert out.shape == (1, 40, 12)  # strides (2,2) -> 4x


def test_codec_losses():
    from uniaudio2_tpu.train import codec_losses as cl

    cfg = sd.structure_semantic_config(code_dim=6, channels=8)
    p = sd.init_params(jax.random.PRNGKey(1), cfg)
    z = jnp.ones((2, 5, 6))
    tgt = jnp.zeros((2, 10, 8))
    mask = jnp.array([[1.0] * 10, [1.0] * 4 + [0.0] * 6])
    loss = cl.feature_reconstruction_loss(p, cfg, z, tgt, mask)
    assert loss.shape == () and float(loss) >= 0
    # gradient flows to the decoder
    g = jax.grad(lambda p: cl.feature_reconstruction_loss(p, cfg, z, tgt))(p)
    assert float(jnp.abs(g["conv1"]["w"]).sum()) > 0
    # commitment: zero when input == quantized, positive otherwise
    x = jnp.ones((2, 3, 4))
    assert float(cl.rvq_commitment_loss(x, x)) == 0.0
    assert float(cl.rvq_commitment_loss(x, x * 2)) > 0
