"""SEANet-style feature decoders (codec-training auxiliaries).

JAX port of the reference `Decoder` conv stack
(`/root/reference/llm_models/semantic_decoder.py:247-295`, byte-identical
copy at `tools/tokenizer/ReasoningCodec_film/models/semantic_decoder.py`)
as instantiated by the codec
(`.../models/AudioDiffusion1D.py:252-253`):

    structure_semantic_decoder: code_dim -> 1024,  strides (1, 2)
    pronunciation_decoder:      code_dim -> wavlm_dim, strides (2, 2)

These decode quantized codec features back to frozen-SSL feature space for
auxiliary reconstruction losses during codec training — they are frozen and
never called on the inference token/wav path (the reference constructs them
and only ever `fix_module`s them). Ported for training-capability parity;
`train/codec_losses.py` consumes them.

Semantics (pinned by `tests/test_semantic_decoder.py` against an
independently built torch model):
  * Conv1d: SAME-style symmetric padding ``(k-1)//2 * dilation``.
  * ResidualUnit: ``x + conv1x1(elu(conv_k(elu(x))))`` (convs bias-free).
  * DecoderBlock: stride-1 -> k=3 conv; stride>1 -> ConvTranspose1d with
    k = 2*stride, padding ``(stride+1)//2``, output_padding ``stride % 2``
    (exact ``stride``-fold upsample), then 2 residual units.
  * Decoder: k=3 conv (no bias) -> blocks -> k=3 conv (no bias).

Layout: activations are (B, T, C); torch weights (out, in, k) convert to
(k, in, out) (`convert/codec.py`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass(frozen=True)
class FeatureDecoderConfig:
    code_dim: int
    output_channels: int
    decode_channels: int
    strides: Tuple[int, ...] = (1, 1)
    kernel_size: int = 3
    unit_kernel_size: int = 3
    block_dilations: Tuple[int, ...] = (1, 1)


def _conv_init(key, k, cin, cout, dtype, bias):
    s = (1.0 / (cin * k)) ** 0.5
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (k, cin, cout), dtype, -s, s)}
    p["b"] = jax.random.uniform(kb, (cout,), dtype, -s, s) if bias else None
    return p


def _same_conv(x, p, *, stride=1, dilation=1):
    """(B, T, C) conv with torch-style symmetric padding (k-1)//2*d."""
    k = p["w"].shape[0]
    pad = (k - 1) // 2 * dilation
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return out + p["b"] if p["b"] is not None else out


def _upsample_conv(x, p, *, stride):
    """torch ConvTranspose1d(k=2*stride, padding=(stride+1)//2,
    output_padding=stride%2) — an exact ``stride``-fold upsample.
    Kernel stored (k, C_in, C_out)."""
    k = p["w"].shape[0]
    pad = (stride + 1) // 2
    outpad = stride % 2
    out = jax.lax.conv_transpose(
        x, p["w"].swapaxes(1, 2), strides=(stride,),
        padding=[(k - 1, k - 1)],
        dimension_numbers=("NTC", "TIO", "NTC"), transpose_kernel=True,
    )
    # torch semantics: L_out = (L-1)*s - 2*pad + k + outpad — a crop of the
    # full correlation (outpad <= pad here, so the slice stays in range)
    t_full = out.shape[1]
    out = out[:, pad: t_full - pad + outpad].astype(x.dtype)
    return out + p["b"] if p["b"] is not None else out


def init_params(key: jax.Array, cfg: FeatureDecoderConfig,
                dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 64))
    blocks = []
    for stride in cfg.strides:
        cin = cout = cfg.decode_channels
        k = cfg.kernel_size if stride == 1 else 2 * stride
        blk = {"conv": _conv_init(next(ks), k, cin, cout, dtype, True),
               "res": []}
        for _ in cfg.block_dilations:
            blk["res"].append({
                "c1": _conv_init(next(ks), cfg.unit_kernel_size, cout, cout,
                                 dtype, False),
                "c2": _conv_init(next(ks), 1, cout, cout, dtype, False),
            })
        blocks.append(blk)
    return {
        "conv1": _conv_init(next(ks), cfg.kernel_size, cfg.code_dim,
                            cfg.decode_channels, dtype, False),
        "blocks": blocks,
        "conv2": _conv_init(next(ks), cfg.kernel_size, cfg.decode_channels,
                            cfg.output_channels, dtype, False),
    }


def forward(params: Params, cfg: FeatureDecoderConfig,
            z: jax.Array) -> jax.Array:
    """(B, T, code_dim) quantized features -> (B, T * prod(strides),
    output_channels)."""
    x = _same_conv(z, params["conv1"])
    for blk, stride, in zip(params["blocks"], cfg.strides):
        if stride == 1:
            x = _same_conv(x, blk["conv"])
        else:
            x = _upsample_conv(x, blk["conv"], stride=stride)
        for res, dil in zip(blk["res"], cfg.block_dilations):
            y = _same_conv(jax.nn.elu(x), res["c1"], dilation=dil)
            y = _same_conv(jax.nn.elu(y), res["c2"])
            x = x + y
    return _same_conv(x, params["conv2"])


def structure_semantic_config(code_dim: int = 512,
                              channels: int = 1024) -> FeatureDecoderConfig:
    """`AudioDiffusion1D.py:252`."""
    return FeatureDecoderConfig(code_dim=code_dim, output_channels=channels,
                                decode_channels=channels, strides=(1, 2))


def pronunciation_config(code_dim: int = 512,
                         wavlm_dim: int = 1024) -> FeatureDecoderConfig:
    """`AudioDiffusion1D.py:253`."""
    return FeatureDecoderConfig(code_dim=code_dim, output_channels=wavlm_dim,
                                decode_channels=wavlm_dim, strides=(2, 2))
