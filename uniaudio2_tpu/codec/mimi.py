"""Mimi codec (alternative tokenizer), functional JAX.

Capability parity with the reference's Moshi-derived Mimi wrapper
(`/root/reference/tools/tokenizer/MimiCodec/model/models/MimiCodec.py:25-115`
with modules from `model/modules/{seanet,transformer,conv,rope,resample}.py`
and `model/quantization/{vq,core_vq}.py`):

encode: wav 24 kHz -> causal SEANet conv pyramid (ratios 8/6/5/4 -> 25 Hz)
        -> 8-layer causal rope transformer (context 250, LayerScale)
        -> learnt stride-2 downsample -> 12.5 Hz
        -> split RVQ (1 semantic + 7 acoustic, 4096×codebook_dim with 1×1
           in/out projections) -> (B, 8, T)
decode: inverse: RVQ decode sum -> depthwise transposed upsample ->
        transformer -> SEANet decoder -> wav.

Convolution padding follows the streaming-conv convention exactly
(`conv.py:50-280`): causal left pad ``(k-1)·d - (s-1)`` plus right
extra-padding to complete the last frame; transposed convs trim the full
``k - s`` from the right (``trim_right_ratio=1``).

This is the *offline* (full-sequence) form: on TPU the whole clip is one
fused program; the reference's streaming state machinery is unnecessary for
batch inference and the causal masks make outputs prefix-consistent by
construction (the property its streaming tests assert).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class MimiConfig:
    sample_rate: int = 24000
    channels: int = 1
    n_filters: int = 64
    ratios: Tuple[int, ...] = (8, 6, 5, 4)   # decoder order (encoder reverses)
    latent_dim: int = 512
    compress: int = 2
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    n_residual_layers: int = 1
    dilation_base: int = 2
    # transformer
    num_heads: int = 8
    num_layers: int = 8
    dim_feedforward: int = 2048
    context: int = 250
    layer_scale: float = 0.01
    max_period: float = 10000.0
    # quantizer
    codebook_size: int = 4096
    codebook_dim: int = 32
    rvq_layers: int = 8
    n_q_semantic: int = 1
    target_frame_rate: float = 12.5

    @property
    def hop_length(self) -> int:
        h = 1
        for r in self.ratios:
            h *= r
        return h

    @property
    def encoder_frame_rate(self) -> float:
        return self.sample_rate / self.hop_length

    @property
    def resample_stride(self) -> int:
        return int(self.encoder_frame_rate / self.target_frame_rate)

    @classmethod
    def tiny(cls) -> "MimiConfig":
        return cls(sample_rate=1000, n_filters=4, ratios=(5, 4),
                   latent_dim=16, num_heads=2, num_layers=1,
                   dim_feedforward=32, codebook_size=16, codebook_dim=8,
                   rvq_layers=4, context=64, target_frame_rate=25.0)


# ---------------------------------------------------------------------------
# Causal conv primitives (moshi streaming-conv padding semantics)
# ---------------------------------------------------------------------------


def _extra_padding(t: int, k: int, stride: int, padding_total: int) -> int:
    n_frames = (t - k + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k - padding_total)
    return max(ideal - t, 0)


def causal_conv(
    x: jax.Array, w: jax.Array, b: Optional[jax.Array], *,
    stride: int = 1, dilation: int = 1, groups: int = 1,
    pad_mode: str = "constant",
) -> jax.Array:
    """(B, T, C_in) with kernel (k, C_in/groups, C_out)."""
    k = w.shape[0]
    eff_k = (k - 1) * dilation + 1
    padding_total = eff_k - stride
    extra = _extra_padding(x.shape[1], eff_k, stride, padding_total)
    mode = {"constant": "constant", "replicate": "edge"}[pad_mode]
    x = jnp.pad(x, ((0, 0), (padding_total, extra), (0, 0)), mode=mode)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def causal_conv_transpose(
    x: jax.Array, w: jax.Array, b: Optional[jax.Array], *,
    stride: int, groups: int = 1,
) -> jax.Array:
    """(B, T, C_in), kernel stored (k, C_in/groups, C_out_total); trims the
    full ``k - stride`` right padding (trim_right_ratio=1)."""
    k = w.shape[0]
    if groups == 1:
        out = jax.lax.conv_transpose(
            x, w.swapaxes(1, 2), strides=(stride,),
            padding=[(k - 1, k - 1)],
            dimension_numbers=("NTC", "TIO", "NTC"), transpose_kernel=True,
        )
    else:
        # depthwise transposed conv: dilate input and convolve per channel
        assert groups == x.shape[-1] and w.shape[1] == 1
        b_, t, c = x.shape
        up = jnp.zeros((b_, t * stride, c), x.dtype)
        up = up.at[:, ::stride].set(x)
        # flipped-kernel correlation == transposed conv
        wk = jnp.flip(w, 0)  # (k, 1, C)
        up = jnp.pad(up, ((0, 0), (k - 1, k - 1 - (stride - 1)), (0, 0)))
        out = jax.lax.conv_general_dilated(
            up, wk, window_strides=(1,), padding="VALID",
            feature_group_count=groups,
            dimension_numbers=("NTC", "TIO", "NTC"),
        )
    out = out.astype(x.dtype)
    if b is not None:
        out = out + b
    padding_total = k - stride
    if padding_total > 0 and groups == 1:
        out = out[:, :-padding_total]
    elif groups != 1:
        out = out[:, : x.shape[1] * stride]
    return out


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _conv_init(key, k, cin, cout, dtype, bias=True):
    s = (1.0 / (cin * k)) ** 0.5
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (k, cin, cout), dtype, -s, s)}
    p["b"] = jax.random.uniform(kb, (cout,), dtype, -s, s) if bias else None
    return p


def init_params(key: jax.Array, cfg: MimiConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 128))
    nf, comp = cfg.n_filters, cfg.compress
    enc_ratios = tuple(reversed(cfg.ratios))

    def seanet_encoder():
        blocks = []
        mult = 1
        stem = _conv_init(next(ks), cfg.kernel_size, cfg.channels, nf, dtype)
        for r in enc_ratios:
            res = []
            for j in range(cfg.n_residual_layers):
                c = mult * nf
                res.append({
                    "c1": _conv_init(next(ks), cfg.residual_kernel_size, c,
                                     c // comp, dtype),
                    "c2": _conv_init(next(ks), 1, c // comp, c, dtype),
                })
            down = _conv_init(next(ks), r * 2, mult * nf, mult * nf * 2, dtype)
            blocks.append({"res": res, "down": down})
            mult *= 2
        head = _conv_init(next(ks), cfg.last_kernel_size, mult * nf,
                          cfg.latent_dim, dtype)
        return {"stem": stem, "blocks": blocks, "head": head}

    def seanet_decoder():
        mult = 2 ** len(cfg.ratios)
        stem = _conv_init(next(ks), cfg.kernel_size, cfg.latent_dim,
                          mult * nf, dtype)
        blocks = []
        for r in cfg.ratios:
            up = _conv_init(next(ks), r * 2, mult * nf, mult * nf // 2, dtype)
            res = []
            for j in range(cfg.n_residual_layers):
                c = mult * nf // 2
                res.append({
                    "c1": _conv_init(next(ks), cfg.residual_kernel_size, c,
                                     c // comp, dtype),
                    "c2": _conv_init(next(ks), 1, c // comp, c, dtype),
                })
            blocks.append({"up": up, "res": res})
            mult //= 2
        head = _conv_init(next(ks), cfg.last_kernel_size, nf, cfg.channels, dtype)
        return {"stem": stem, "blocks": blocks, "head": head}

    d, l, f = cfg.latent_dim, cfg.num_layers, cfg.dim_feedforward

    def transformer():
        s = 0.02

        def n(shape):
            return (jax.random.normal(next(ks), shape, jnp.float32) * s).astype(dtype)

        return {
            "qkv_w": n((l, d, 3 * d)),
            "attn_out_w": n((l, d, d)),
            "ln1_w": jnp.ones((l, d), dtype), "ln1_b": jnp.zeros((l, d), dtype),
            "ln2_w": jnp.ones((l, d), dtype), "ln2_b": jnp.zeros((l, d), dtype),
            "ff1_w": n((l, d, f)), "ff2_w": n((l, f, d)),
            "scale_attn": jnp.full((l, d), cfg.layer_scale, dtype),
            "scale_ff": jnp.full((l, d), cfg.layer_scale, dtype),
        }

    def rvq(n_q):
        return {
            "in_w": (jax.random.normal(next(ks), (d, cfg.codebook_dim)) * 0.02).astype(dtype),
            "out_w": (jax.random.normal(next(ks), (cfg.codebook_dim, d)) * 0.02).astype(dtype),
            "codebooks": jax.random.normal(
                next(ks), (n_q, cfg.codebook_size, cfg.codebook_dim)
            ).astype(dtype),
        }

    stride = cfg.resample_stride
    return {
        "encoder": seanet_encoder(),
        "decoder": seanet_decoder(),
        "enc_transformer": transformer(),
        "dec_transformer": transformer(),
        "downsample": _conv_init(next(ks), 2 * stride, cfg.latent_dim,
                                 cfg.latent_dim, dtype, bias=False),
        "upsample": _conv_init(next(ks), 2 * stride, 1, cfg.latent_dim,
                               dtype, bias=False),  # depthwise (k, 1, C)
        "rvq_semantic": rvq(cfg.n_q_semantic),
        "rvq_acoustic": rvq(cfg.rvq_layers - cfg.n_q_semantic),
    }


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------


def _elu(x):
    return jax.nn.elu(x)


def _resnet(x, blk, dilation: int):
    h = _elu(x)
    h = causal_conv(h, blk["c1"]["w"], blk["c1"]["b"], dilation=dilation)
    h = _elu(h)
    h = causal_conv(h, blk["c2"]["w"], blk["c2"]["b"])
    return x + h


def seanet_encode(p: Params, cfg: MimiConfig, x: jax.Array) -> jax.Array:
    """(B, T, 1) -> (B, T/hop, latent)."""
    h = causal_conv(x, p["stem"]["w"], p["stem"]["b"])
    enc_ratios = tuple(reversed(cfg.ratios))
    for blk, ratio in zip(p["blocks"], enc_ratios):
        for j, res in enumerate(blk["res"]):
            h = _resnet(h, res, cfg.dilation_base ** j)
        h = _elu(h)
        h = causal_conv(h, blk["down"]["w"], blk["down"]["b"], stride=ratio)
    h = _elu(h)
    return causal_conv(h, p["head"]["w"], p["head"]["b"])


def seanet_decode(p: Params, cfg: MimiConfig, z: jax.Array) -> jax.Array:
    h = causal_conv(z, p["stem"]["w"], p["stem"]["b"])
    for blk, ratio in zip(p["blocks"], cfg.ratios):
        h = _elu(h)
        h = causal_conv_transpose(h, blk["up"]["w"], blk["up"]["b"],
                                  stride=ratio)
        for j, res in enumerate(blk["res"]):
            h = _resnet(h, res, cfg.dilation_base ** j)
    h = _elu(h)
    return causal_conv(h, p["head"]["w"], p["head"]["b"])


def _mimi_rope(q, k, max_period):
    """Moshi rope: adjacent (real, imag) pairs (`rope.py:11-70`).
    q/k: (B, H, T, D)."""
    b, h, t, d_ = q.shape
    ds = jnp.arange(d_ // 2, dtype=jnp.float32)
    freqs = jnp.exp(ds * (-math.log(max_period) * 2 / d_))
    ts = jnp.arange(t, dtype=jnp.float32)[:, None]
    cos = jnp.cos(freqs * ts)  # (T, D/2)
    sin = jnp.sin(freqs * ts)

    def rot(x):
        xr = x.reshape(b, h, t, d_ // 2, 2)
        r, i = xr[..., 0].astype(jnp.float32), xr[..., 1].astype(jnp.float32)
        ro = r * cos - i * sin
        io = r * sin + i * cos
        return jnp.stack([ro, io], -1).reshape(b, h, t, d_).astype(x.dtype)

    return rot(q), rot(k)


def transformer_forward(p: Params, cfg: MimiConfig, x: jax.Array) -> jax.Array:
    """(B, T, D) causal windowed-context transformer."""
    b, t, d = x.shape
    heads = cfg.num_heads
    hd = d // heads
    idx = jnp.arange(t)
    mask = (idx[:, None] >= idx[None, :]) & (
        idx[:, None] - idx[None, :] < cfg.context
    )

    def ln(h, w, bb):
        hf = h.astype(jnp.float32)
        mu = hf.mean(-1, keepdims=True)
        var = ((hf - mu) ** 2).mean(-1, keepdims=True)
        return (((hf - mu) * jax.lax.rsqrt(var + 1e-5)) * w + bb).astype(h.dtype)

    def block(h, layer):
        hn = ln(h, layer["ln1_w"], layer["ln1_b"])
        qkv = hn @ layer["qkv_w"]
        q, k, v = jnp.split(qkv, 3, -1)

        def sp(z):
            return z.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)

        q, k, v = sp(q), sp(k), sp(v)
        q, k = _mimi_rope(q, k, cfg.max_period)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, -1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d) @ layer["attn_out_w"]
        h = h + o * layer["scale_attn"]
        hn = ln(h, layer["ln2_w"], layer["ln2_b"])
        ff = jax.nn.gelu(hn @ layer["ff1_w"], approximate=True) @ layer["ff2_w"]
        h = h + ff * layer["scale_ff"]
        return h, None

    x, _ = jax.lax.scan(block, x, p)
    return x


def _rvq_encode(p: Params, z: jax.Array) -> jax.Array:
    """(B, T, D) -> (B, T, Q) nearest-neighbour residual codes."""
    x = z @ p["in_w"]

    def step(residual, codebook):
        dots = jnp.einsum("btd,kd->btk", residual, codebook,
                          preferred_element_type=jnp.float32)
        sq = jnp.sum(codebook.astype(jnp.float32) ** 2, -1)
        idx = jnp.argmin(sq - 2.0 * dots, -1)
        chosen = jnp.take(codebook, idx, axis=0)
        return residual - chosen, idx.astype(jnp.int32)

    _, codes = jax.lax.scan(step, x, p["codebooks"])
    return jnp.moveaxis(codes, 0, -1)


def _rvq_decode(p: Params, codes: jax.Array) -> jax.Array:
    """(B, T, Q) -> (B, T, D)."""
    per_q = [jnp.take(p["codebooks"][i], codes[..., i], axis=0)
             for i in range(p["codebooks"].shape[0])]
    return sum(per_q) @ p["out_w"]


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def encode(params: Params, cfg: MimiConfig, wav: jax.Array) -> jax.Array:
    """(B, T) waveform -> (B, 8, T_frames) codes @ target_frame_rate
    (semantic codebook first, reference `SplitResidualVectorQuantizer.encode`)."""
    z = seanet_encode(params["encoder"], cfg, wav[:, :, None])
    z = transformer_forward(params["enc_transformer"], cfg, z)
    z = causal_conv(z, params["downsample"]["w"], None,
                    stride=cfg.resample_stride, pad_mode="replicate")
    sem = _rvq_encode(params["rvq_semantic"], z)
    ac = _rvq_encode(params["rvq_acoustic"], z)
    return jnp.concatenate([sem, ac], -1).swapaxes(1, 2)


def decode(params: Params, cfg: MimiConfig, codes: jax.Array) -> jax.Array:
    """(B, 8, T_frames) codes -> (B, T_samples) waveform."""
    codes = codes.swapaxes(1, 2)
    nqs = cfg.n_q_semantic
    z = _rvq_decode(params["rvq_semantic"], codes[..., :nqs])
    z = z + _rvq_decode(params["rvq_acoustic"], codes[..., nqs:])
    z = causal_conv_transpose(
        z, params["upsample"]["w"], None, stride=cfg.resample_stride,
        groups=cfg.latent_dim,
    )
    z = transformer_forward(params["dec_transformer"], cfg, z)
    wav = seanet_decode(params["decoder"], cfg, z)
    return wav[:, :, 0]


class MimiTokenizer:
    """AbsTokenizer-style facade (reference `mimi_tokenizer.py:13-60`)."""

    def __init__(self, params: Params, cfg: MimiConfig):
        self.params = params
        self.cfg = cfg
        # params as jit arguments, not closure constants
        self._enc_fn = jax.jit(lambda p, w: encode(p, cfg, w))
        self._dec_fn = jax.jit(lambda p, c: decode(p, cfg, c))

    def _enc(self, w):
        return self._enc_fn(self.params, w)

    def _dec(self, c):
        return self._dec_fn(self.params, c)

    @property
    def is_discrete(self) -> bool:
        return True

    def find_length(self, codes: np.ndarray) -> int:
        return int(codes.shape[-1])

    def tokenize(self, wav) -> np.ndarray:
        if isinstance(wav, str):
            from uniaudio2_tpu.codec.tokenizer import load_wav

            wav = load_wav(wav, self.cfg.sample_rate)
        wav = np.asarray(wav, np.float32).reshape(1, -1)
        return np.asarray(self._enc(jnp.asarray(wav)))[0]

    def detokenize(self, codes: np.ndarray) -> np.ndarray:
        codes = np.asarray(codes, np.int32)
        if codes.ndim == 2:
            codes = codes[None]
        return np.asarray(self._dec(jnp.asarray(codes)))[0]
