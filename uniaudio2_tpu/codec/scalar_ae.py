"""SQ-codec waveform autoencoder (scalar quantization), functional JAX.

Same architecture family as the reference `ScalarModel`
(`/root/reference/tools/tokenizer/ReasoningCodec_film/models/scalar24k.py:
306-448`): symmetric conv pyramids with per-stage residual-unit stacks
(dilations 1/3/5/7/9), PReLU activations, average-pool pre-processing /
repeat post-processing, a tanh latent bottleneck and a straight-through
scalar rounding quantizer (``round(9·x)/9``, `:285-293`). Shipped latent:
136 dims @ 25 Hz from 24 kHz audio (960× total stride).

The exact stage geometry lives in the checkpoint's OmegaConf YAML
(`scalar24k.py:429-430`, not vendored in the repo) — so the architecture here
is fully config-driven; `ScalarAEConfig.default_24k()` carries a 960×
geometry used for shape tests and is overridden by the converter with the
real checkpoint config.

TPU design: 1-D convs map directly to `lax.conv_general_dilated` (XLA lowers
them onto the MXU as implicit GEMMs); weight-norm is folded into plain
kernels at conversion time (inference path — the codec is frozen during LLM
training, `AudioDiffusion1D.py:230-241`). Layout is NTC throughout.

Params pytree (per conv): {"w": (k, C_in, C_out), "b": (C_out,)} plus
per-activation PReLU slopes and per-stage Snake alphas where used.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass(frozen=True)
class ScalarAEConfig:
    num_bands: int = 1
    sample_rate: int = 24000
    causal: bool = False
    num_samples: int = 2                       # pre/post pool factor
    downsample_factors: Tuple[int, ...] = (8, 5, 4, 3)
    downsample_kernel_sizes: Tuple[int, ...] = (16, 10, 8, 6)
    upsample_factors: Tuple[int, ...] = (3, 4, 5, 8)
    upsample_kernel_sizes: Tuple[int, ...] = (6, 8, 10, 16)
    latent_hidden_dim: int = 136
    default_kernel_size: int = 7
    delay_kernel_size: int = 5
    init_channel: int = 48
    res_kernel_size: int = 7
    rounds: int = 9                            # round(N·x)/N quantizer

    @property
    def total_stride(self) -> int:
        s = self.num_samples
        for f in self.downsample_factors:
            s *= f
        return s

    @classmethod
    def default_24k(cls) -> "ScalarAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "ScalarAEConfig":
        return cls(num_samples=1, downsample_factors=(2, 2),
                   downsample_kernel_sizes=(4, 4), upsample_factors=(2, 2),
                   upsample_kernel_sizes=(4, 4), latent_hidden_dim=8,
                   init_channel=4, default_kernel_size=3,
                   delay_kernel_size=3, res_kernel_size=3)


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------


def _conv(
    x: jax.Array, p: Params, *, stride: int = 1, dilation: int = 1,
    causal: bool = False,
) -> jax.Array:
    """1-D conv, NTC layout, torch-style symmetric or causal-left padding."""
    k = p["w"].shape[0]
    if causal:
        pad = (dilation * (k - 1), 0)
    else:
        half = (k * dilation - dilation) // 2
        pad = (half, half)
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding=[pad],
        rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32,
    )
    return (out + p["b"]).astype(x.dtype)


def _conv_transpose(
    x: jax.Array, p: Params, *, stride: int, causal: bool = False
) -> jax.Array:
    """Transposed 1-D conv matching torch ConvTranspose1d semantics
    (padding (k-stride)//2 non-causal; causal crops `stride` right samples)."""
    k = p["w"].shape[0]
    pad = 0 if causal else (k - stride) // 2
    # stored layout is (k, C_in, C_out) like every other conv; lax's
    # transpose_kernel=True wants (k, C_out, C_in) (verified bit-exact
    # against torch ConvTranspose1d)
    out = jax.lax.conv_transpose(
        x, p["w"].swapaxes(1, 2), strides=(stride,),
        padding=[(k - 1 - pad, k - 1 - pad)],
        dimension_numbers=("NTC", "TIO", "NTC"),
        transpose_kernel=True,
    )
    out = (out + p["b"]).astype(x.dtype)
    if causal:
        out = out[:, :-stride, :]
    return out


def _prelu(x: jax.Array, alpha: jax.Array) -> jax.Array:
    return jnp.where(x >= 0, x, alpha * x)


def snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Snake activation (reference `scalar24k.py:21-27`); per-channel alpha."""
    return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2


def scalar_quantize(x: jax.Array, rounds: int = 9) -> jax.Array:
    """Straight-through ``round(N·x)/N`` (reference `round_func9`)."""
    r = jnp.float32(rounds)
    q = jnp.round(x.astype(jnp.float32) * r) / r
    return (x + jax.lax.stop_gradient(q.astype(x.dtype) - x))


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------


def _conv_init(key, k, cin, cout, dtype):
    s = (1.0 / (cin * k)) ** 0.5
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (k, cin, cout), dtype, -s, s),
        "b": jax.random.uniform(kb, (cout,), dtype, -s, s),
    }


def _res_unit_init(key, cin, cout, kres, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": _conv_init(k1, kres, cin, cout, dtype),
        "conv2": _conv_init(k2, 1, cout, cout, dtype),
        "a1": jnp.full((1,), 0.25, dtype), "a2": jnp.full((1,), 0.25, dtype),
    }


def init_params(key: jax.Array, cfg: ScalarAEConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 256))
    nd = len(cfg.downsample_factors)
    ic = cfg.init_channel

    enc: List[Params] = [
        _conv_init(next(keys), cfg.default_kernel_size, cfg.num_bands, ic, dtype)
    ]
    pre = None
    if cfg.num_samples > 1:
        pre = {
            "conv": _conv_init(next(keys), cfg.default_kernel_size, ic, ic, dtype),
            "a": jnp.full((1,), 0.25, dtype),
        }
    enc_blocks = []
    for i, f in enumerate(cfg.downsample_factors):
        cin, cout = ic * 2 ** i, ic * 2 ** (i + 1)
        units = [
            _res_unit_init(next(keys), cin, cin, cfg.res_kernel_size, dtype)
            for _ in range(5)
        ]
        # first unit narrows to cout//2 in the reference; with cout = 2*cin
        # that equals cin, so all five units are (cin -> cin).
        down = {
            "conv": _conv_init(
                next(keys), cfg.downsample_kernel_sizes[i], cin, cout, dtype
            ),
            "a": jnp.full((1,), 0.25, dtype),
        }
        enc_blocks.append({"units": units, "down": down})
    enc_out = _conv_init(
        next(keys), cfg.default_kernel_size, ic * 2 ** nd,
        cfg.latent_hidden_dim, dtype,
    )

    dec_in = _conv_init(
        next(keys), cfg.delay_kernel_size, cfg.latent_hidden_dim,
        ic * 2 ** nd, dtype,
    )
    dec_blocks = []
    for i, f in enumerate(cfg.upsample_factors):
        cin = ic * 2 ** (nd - i)
        cout = ic * 2 ** (nd - i - 1)
        up = {
            "conv": _conv_init(
                next(keys), cfg.upsample_kernel_sizes[i], cin, cout, dtype
            ),
            "a": jnp.full((1,), 0.25, dtype),
        }
        units = [
            _res_unit_init(next(keys), cout, cout, cfg.res_kernel_size, dtype)
            for _ in range(5)
        ]
        dec_blocks.append({"up": up, "units": units})
    post = None
    if cfg.num_samples > 1:
        post = {
            "conv": _conv_init(next(keys), cfg.default_kernel_size, ic, ic, dtype),
            "a": jnp.full((1,), 0.25, dtype),
        }
    dec_out = _conv_init(
        next(keys), cfg.default_kernel_size, ic, cfg.num_bands, dtype
    )
    return {
        "enc_in": enc[0], "pre": pre, "enc_blocks": enc_blocks,
        "enc_out": enc_out, "dec_in": dec_in, "dec_blocks": dec_blocks,
        "post": post, "dec_out": dec_out,
    }


# ---------------------------------------------------------------------------
# Forward passes (x layout: (B, T, C))
# ---------------------------------------------------------------------------


def _res_unit(x: jax.Array, p: Params, cfg: ScalarAEConfig, dilation: int) -> jax.Array:
    h = _prelu(_conv(x, p["conv1"], dilation=dilation, causal=cfg.causal), p["a1"])
    h = _prelu(_conv(h, p["conv2"], causal=cfg.causal), p["a2"])
    return h + x


_DILATIONS = (1, 3, 5, 7, 9)


def encode(params: Params, cfg: ScalarAEConfig, wav: jax.Array) -> jax.Array:
    """(B, T, num_bands) waveform -> (B, T/stride, latent) *pre-quantization*
    embedding (tanh-bounded), matching reference `ScalarModel.encode`
    (`scalar24k.py:392-401` returns the un-rounded embedding; decode
    re-applies rounding)."""
    x = _conv(wav.astype(params["enc_in"]["w"].dtype), params["enc_in"],
              causal=cfg.causal)
    if params["pre"] is not None:
        x = _prelu(_conv(x, params["pre"]["conv"], causal=cfg.causal),
                   params["pre"]["a"])
        # AvgPool1d(kernel=num_samples): non-overlapping mean pooling
        b, t, c = x.shape
        t2 = t - t % cfg.num_samples
        x = x[:, :t2].reshape(b, t2 // cfg.num_samples, cfg.num_samples, c).mean(2)
    for blk, f, in zip(params["enc_blocks"], cfg.downsample_factors):
        for u, d in zip(blk["units"], _DILATIONS):
            x = _res_unit(x, u, cfg, d)
        x = _prelu(
            _conv(x, blk["down"]["conv"], stride=f, causal=cfg.causal),
            blk["down"]["a"],
        )
    return jnp.tanh(_conv(x, params["enc_out"], causal=cfg.causal))


def decode(params: Params, cfg: ScalarAEConfig, latent: jax.Array) -> jax.Array:
    """(B, T_lat, latent) -> (B, T_lat*stride, num_bands). Applies the scalar
    quantizer first (reference `ScalarModel.decode`, `scalar24k.py:403-407`)."""
    x = scalar_quantize(latent, cfg.rounds)
    x = x.astype(params["dec_in"]["w"].dtype)  # match (possibly bf16) params
    x = _conv(x, params["dec_in"])  # look-ahead conv: never causal
    for blk, f in zip(params["dec_blocks"], cfg.upsample_factors):
        x = _prelu(
            _conv_transpose(x, blk["up"]["conv"], stride=f, causal=cfg.causal),
            blk["up"]["a"],
        )
        for u, d in zip(blk["units"], _DILATIONS):
            x = _res_unit(x, u, cfg, d)
    if params["post"] is not None:
        b, t, c = x.shape
        x = jnp.repeat(x, cfg.num_samples, axis=1)
        x = _prelu(_conv(x, params["post"]["conv"], causal=cfg.causal),
                   params["post"]["a"])
    return _conv(x, params["dec_out"], causal=cfg.causal)
