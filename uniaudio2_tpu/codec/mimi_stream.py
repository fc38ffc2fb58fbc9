"""O(1)-state streaming Mimi encode/decode.

True per-module streaming state — the TPU-native analog of the reference's
streaming stack (`/root/reference/tools/tokenizer/MimiCodec/model/modules/
conv.py:168-280` streaming convs, `transformer.py:211-281` RingKVCache):

* every causal conv keeps the last ``effective_kernel - stride`` input
  samples (its left-pad history);
* every transposed conv keeps a ``kernel - stride`` overlap-add carry of
  partial output sums;
* each transformer layer keeps a ring KV cache of ``context`` roped
  keys/values plus an absolute-position register.

The whole per-chunk update is ONE jit-compiled function over fixed-shape
state pytrees — per-chunk cost is constant in history length (the state
never grows), unlike the rolling-window recompute this replaces
(`codec/streaming.py` pre-r2), and outputs are exactly the offline
`mimi.encode`/`mimi.decode` values because the math per output sample is
identical (same summands, same windows).

Chunk granularity is fixed at trace time (``chunk_frames`` output frames =
``chunk_frames * hop * resample_stride`` samples) so there is exactly one
compiled program per stream.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec.mimi import MimiConfig, _rvq_decode, _rvq_encode

Params = Dict[str, Any]
State = Dict[str, Any]


# ---------------------------------------------------------------------------
# Streaming conv primitives
# ---------------------------------------------------------------------------


def _conv_hist_init(batch: int, k: int, stride: int, dilation: int,
                    cin: int, dtype) -> jax.Array:
    """Left-pad history: ``(k-1)*dilation + 1 - stride`` input samples of
    zeros (the offline constant left pad)."""
    pad = (k - 1) * dilation + 1 - stride
    return jnp.zeros((batch, pad, cin), dtype)


def _stream_conv(
    x: jax.Array, hist: jax.Array, w: jax.Array, b: Optional[jax.Array], *,
    stride: int = 1, dilation: int = 1, groups: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming form of `mimi.causal_conv`: VALID conv over
    ``[hist | x]``; the new history is the tail of that concatenation.
    Requires ``x.shape[1] % stride == 0`` (frame-aligned chunks) so the
    offline extra right padding is zero — then outputs are exactly the
    offline values for these positions."""
    xf = jnp.concatenate([hist, x], axis=1)
    out = jax.lax.conv_general_dilated(
        xf, w, window_strides=(stride,), padding="VALID",
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b
    new_hist = xf[:, xf.shape[1] - hist.shape[1]:]
    return out, new_hist


def _tconv_carry_init(batch: int, k: int, stride: int, cout: int,
                      dtype) -> jax.Array:
    """Overlap-add carry: the last ``k - stride`` partial output sums."""
    return jnp.zeros((batch, k - stride, cout), dtype)


def _stream_conv_transpose(
    x: jax.Array, carry: jax.Array, w: jax.Array, b: Optional[jax.Array], *,
    stride: int, groups: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming transposed conv with overlap-add.

    The full (untrimmed) transposed conv of a chunk of ``C`` inputs spans
    ``(C-1)*stride + k`` outputs; positions past ``C*stride`` overlap the
    next chunk's head. Emit ``C*stride`` samples (adding the previous carry
    to the first ``k - stride``), keep the tail as the new carry. The final
    carry is never emitted — exactly the offline right-trim of
    ``k - stride`` (`mimi.causal_conv_transpose`, trim_right_ratio=1)."""
    k = w.shape[0]
    c = x.shape[1]
    if groups == 1:
        full = jax.lax.conv_transpose(
            x, w.swapaxes(1, 2), strides=(stride,),
            padding=[(k - 1, k - 1)],
            dimension_numbers=("NTC", "TIO", "NTC"), transpose_kernel=True,
        ).astype(x.dtype)
    else:
        assert groups == x.shape[-1] and w.shape[1] == 1
        b_, t, ch = x.shape
        up = jnp.zeros((b_, (t - 1) * stride + 1, ch), x.dtype)
        up = up.at[:, ::stride].set(x)
        wk = jnp.flip(w, 0)
        up = jnp.pad(up, ((0, 0), (k - 1, k - 1), (0, 0)))
        full = jax.lax.conv_general_dilated(
            up, wk, window_strides=(1,), padding="VALID",
            feature_group_count=groups,
            dimension_numbers=("NTC", "TIO", "NTC"),
        ).astype(x.dtype)
    # full: (B, (C-1)*stride + k, cout)
    ncarry = k - stride
    emit = full[:, : c * stride]
    emit = emit.at[:, :ncarry].add(carry)
    new_carry = full[:, c * stride:]
    if b is not None:
        emit = emit + b
    return emit, new_carry


# ---------------------------------------------------------------------------
# Streaming transformer (ring KV)
# ---------------------------------------------------------------------------


def _ring_init(batch: int, layers: int, heads: int, cap: int, hd: int,
               dtype) -> Dict[str, jax.Array]:
    return {
        "k": jnp.zeros((layers, batch, heads, cap, hd), dtype),
        "v": jnp.zeros((layers, batch, heads, cap, hd), dtype),
        "slot_pos": jnp.full((cap,), -1, jnp.int32),
        "pos": jnp.zeros((), jnp.int32),
    }


def _rope_at(q: jax.Array, positions: jax.Array, max_period: float) -> jax.Array:
    """Moshi rope (adjacent real/imag pairs) at absolute ``positions``
    (matches `mimi._mimi_rope` where offline positions are 0..T-1)."""
    b, h, t, d_ = q.shape
    ds = jnp.arange(d_ // 2, dtype=jnp.float32)
    freqs = jnp.exp(ds * (-math.log(max_period) * 2 / d_))
    ts = positions.astype(jnp.float32)[:, None]
    cos = jnp.cos(freqs * ts)
    sin = jnp.sin(freqs * ts)
    xr = q.reshape(b, h, t, d_ // 2, 2)
    r, i = xr[..., 0].astype(jnp.float32), xr[..., 1].astype(jnp.float32)
    ro = r * cos - i * sin
    io = r * sin + i * cos
    return jnp.stack([ro, io], -1).reshape(b, h, t, d_).astype(q.dtype)


def _stream_transformer(
    p: Params, cfg: MimiConfig, x: jax.Array, ring: Dict[str, jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """(B, F, D) chunk at absolute positions [pos, pos+F) -> output chunk +
    updated ring. Every query attends over the ring's ``cap`` slots with a
    positional validity mask — O(context) per query regardless of total
    stream length."""
    b, f, d = x.shape
    heads = cfg.num_heads
    hd = d // heads
    cap = ring["k"].shape[3]
    pos = ring["pos"]
    q_pos = pos + jnp.arange(f, dtype=jnp.int32)
    idx = q_pos % cap
    slot_pos = ring["slot_pos"].at[idx].set(q_pos)
    # mask: (F, cap) — causal + sliding window + slot validity
    valid = slot_pos >= 0
    mask = (
        valid[None, :]
        & (slot_pos[None, :] <= q_pos[:, None])
        & (q_pos[:, None] - slot_pos[None, :] < cfg.context)
    )

    def ln(h, w, bb):
        hf = h.astype(jnp.float32)
        mu = hf.mean(-1, keepdims=True)
        var = ((hf - mu) ** 2).mean(-1, keepdims=True)
        return (((hf - mu) * jax.lax.rsqrt(var + 1e-5)) * w + bb).astype(h.dtype)

    def block(h, inputs):
        layer, k_ring, v_ring = inputs
        hn = ln(h, layer["ln1_w"], layer["ln1_b"])
        qkv = hn @ layer["qkv_w"]
        q, k, v = jnp.split(qkv, 3, -1)

        def sp(z):
            return z.reshape(b, f, heads, hd).transpose(0, 2, 1, 3)

        q, k, v = sp(q), sp(k), sp(v)
        q = _rope_at(q, q_pos, cfg.max_period)
        k = _rope_at(k, q_pos, cfg.max_period)
        k_ring = k_ring.at[:, :, idx, :].set(k)
        v_ring = v_ring.at[:, :, idx, :].set(v)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_ring, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        scores = jnp.where(mask[None, None], scores, jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, -1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v_ring)
        o = o.transpose(0, 2, 1, 3).reshape(b, f, d) @ layer["attn_out_w"]
        h = h + o * layer["scale_attn"]
        hn = ln(h, layer["ln2_w"], layer["ln2_b"])
        ff = jax.nn.gelu(hn @ layer["ff1_w"], approximate=True) @ layer["ff2_w"]
        h = h + ff * layer["scale_ff"]
        return h, (k_ring, v_ring)

    x, (k_new, v_new) = jax.lax.scan(block, x, (p, ring["k"], ring["v"]))
    return x, {"k": k_new, "v": v_new, "slot_pos": slot_pos, "pos": pos + f}


# ---------------------------------------------------------------------------
# Encoder state + step
# ---------------------------------------------------------------------------


def _seanet_enc_state(params: Params, cfg: MimiConfig, batch: int,
                      dtype) -> State:
    p = params["encoder"]
    nf, comp = cfg.n_filters, cfg.compress
    enc_ratios = tuple(reversed(cfg.ratios))
    blocks: List[State] = []
    mult = 1
    for r, blk in zip(enc_ratios, p["blocks"]):
        res = []
        for j in range(cfg.n_residual_layers):
            c = mult * nf
            res.append({
                "c1": _conv_hist_init(batch, cfg.residual_kernel_size, 1,
                                      cfg.dilation_base ** j, c, dtype),
            })
        blocks.append({
            "res": res,
            "down": _conv_hist_init(batch, 2 * r, r, 1, mult * nf, dtype),
        })
        mult *= 2
    return {
        "stem": _conv_hist_init(batch, cfg.kernel_size, 1, 1, cfg.channels,
                                dtype),
        "blocks": blocks,
        "head": _conv_hist_init(batch, cfg.last_kernel_size, 1, 1, mult * nf,
                                dtype),
    }


def init_encoder_state(params: Params, cfg: MimiConfig, *, batch: int = 1,
                       chunk_frames: int = 1, dtype=None) -> State:
    """Fixed-shape stream state for ``encode_step`` chunks of
    ``chunk_frames`` output frames."""
    dtype = dtype or params["downsample"]["w"].dtype
    d = cfg.latent_dim
    hd = d // cfg.num_heads
    tr_chunk = chunk_frames * cfg.resample_stride
    return {
        "seanet": _seanet_enc_state(params, cfg, batch, dtype),
        "transformer": _ring_init(batch, cfg.num_layers, cfg.num_heads,
                                  cfg.context + tr_chunk, hd, dtype),
        # replicate-pad downsample: history is materialised from the first
        # chunk's first sample (offline pads with the edge value)
        "down": _conv_hist_init(batch, 2 * cfg.resample_stride,
                                cfg.resample_stride, 1, d, dtype),
        "started": jnp.zeros((), bool),
    }


def _seanet_enc_step(p: Params, st: State, cfg: MimiConfig,
                     x: jax.Array) -> Tuple[jax.Array, State]:
    new: State = {"blocks": []}
    h, new["stem"] = _stream_conv(x, st["stem"], p["stem"]["w"], p["stem"]["b"])
    enc_ratios = tuple(reversed(cfg.ratios))
    for blk, stb, ratio in zip(p["blocks"], st["blocks"], enc_ratios):
        nb: State = {"res": []}
        for j, (res, str_) in enumerate(zip(blk["res"], stb["res"])):
            r = jax.nn.elu(h)
            r, h1 = _stream_conv(r, str_["c1"], res["c1"]["w"], res["c1"]["b"],
                                 dilation=cfg.dilation_base ** j)
            r = jax.nn.elu(r)
            # c2 is a 1x1 conv — stateless
            r = jax.lax.conv_general_dilated(
                r, res["c2"]["w"], (1,), "VALID",
                dimension_numbers=("NTC", "TIO", "NTC"),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype) + res["c2"]["b"]
            h = h + r
            nb["res"].append({"c1": h1})
        h = jax.nn.elu(h)
        h, nb["down"] = _stream_conv(h, stb["down"], blk["down"]["w"],
                                     blk["down"]["b"], stride=ratio)
        new["blocks"].append(nb)
    h = jax.nn.elu(h)
    h, new["head"] = _stream_conv(h, st["head"], p["head"]["w"],
                                  p["head"]["b"])
    return h, new


def encode_step(
    params: Params, cfg: MimiConfig, state: State, wav_chunk: jax.Array,
) -> Tuple[jax.Array, State]:
    """One streaming encode step: (B, chunk_frames*hop*stride) samples ->
    ((B, rvq_layers, chunk_frames) codes, new state). Jit this with the
    state donated; outputs equal the offline `mimi.encode` frames."""
    z, seanet_st = _seanet_enc_step(
        params["encoder"], state["seanet"], cfg, wav_chunk[:, :, None]
    )
    z, tr_st = _stream_transformer(
        params["enc_transformer"], cfg, z, state["transformer"]
    )
    # replicate left pad: the first chunk seeds the history with its own
    # first sample (offline "edge" mode pads with z[0])
    hist = jnp.where(
        state["started"], state["down"],
        jnp.broadcast_to(z[:, :1], state["down"].shape),
    )
    z, down_hist = _stream_conv(
        z, hist, params["downsample"]["w"], None, stride=cfg.resample_stride
    )
    sem = _rvq_encode(params["rvq_semantic"], z)
    ac = _rvq_encode(params["rvq_acoustic"], z)
    codes = jnp.concatenate([sem, ac], -1).swapaxes(1, 2)
    new_state = {
        "seanet": seanet_st, "transformer": tr_st, "down": down_hist,
        "started": jnp.ones((), bool),
    }
    return codes, new_state


# ---------------------------------------------------------------------------
# Decoder state + step
# ---------------------------------------------------------------------------


def _seanet_dec_state(params: Params, cfg: MimiConfig, batch: int,
                      dtype) -> State:
    nf, comp = cfg.n_filters, cfg.compress
    mult = 2 ** len(cfg.ratios)
    blocks: List[State] = []
    for r in cfg.ratios:
        res = []
        cout = mult * nf // 2
        for j in range(cfg.n_residual_layers):
            res.append({
                "c1": _conv_hist_init(batch, cfg.residual_kernel_size, 1,
                                      cfg.dilation_base ** j, cout, dtype),
            })
        blocks.append({
            "up": _tconv_carry_init(batch, 2 * r, r, cout, dtype),
            "res": res,
        })
        mult //= 2
    return {
        "stem": _conv_hist_init(batch, cfg.kernel_size, 1, 1, cfg.latent_dim,
                                dtype),
        "blocks": blocks,
        "head": _conv_hist_init(batch, cfg.last_kernel_size, 1, 1, nf, dtype),
    }


def init_decoder_state(params: Params, cfg: MimiConfig, *, batch: int = 1,
                       chunk_frames: int = 1, dtype=None) -> State:
    dtype = dtype or params["upsample"]["w"].dtype
    d = cfg.latent_dim
    hd = d // cfg.num_heads
    tr_chunk = chunk_frames * cfg.resample_stride
    s = cfg.resample_stride
    return {
        "up": _tconv_carry_init(batch, 2 * s, s, d, dtype),
        "transformer": _ring_init(batch, cfg.num_layers, cfg.num_heads,
                                  cfg.context + tr_chunk, hd, dtype),
        "seanet": _seanet_dec_state(params, cfg, batch, dtype),
    }


def _seanet_dec_step(p: Params, st: State, cfg: MimiConfig,
                     z: jax.Array) -> Tuple[jax.Array, State]:
    new: State = {"blocks": []}
    h, new["stem"] = _stream_conv(z, st["stem"], p["stem"]["w"], p["stem"]["b"])
    for blk, stb, ratio in zip(p["blocks"], st["blocks"], cfg.ratios):
        nb: State = {"res": []}
        h = jax.nn.elu(h)
        h, nb["up"] = _stream_conv_transpose(
            h, stb["up"], blk["up"]["w"], blk["up"]["b"], stride=ratio
        )
        for j, (res, str_) in enumerate(zip(blk["res"], stb["res"])):
            r = jax.nn.elu(h)
            r, h1 = _stream_conv(r, str_["c1"], res["c1"]["w"], res["c1"]["b"],
                                 dilation=cfg.dilation_base ** j)
            r = jax.nn.elu(r)
            r = jax.lax.conv_general_dilated(
                r, res["c2"]["w"], (1,), "VALID",
                dimension_numbers=("NTC", "TIO", "NTC"),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype) + res["c2"]["b"]
            h = h + r
            nb["res"].append({"c1": h1})
        new["blocks"].append(nb)
    h = jax.nn.elu(h)
    h, new["head"] = _stream_conv(h, st["head"], p["head"]["w"],
                                  p["head"]["b"])
    return h, new


def decode_step(
    params: Params, cfg: MimiConfig, state: State, codes_chunk: jax.Array,
) -> Tuple[jax.Array, State]:
    """One streaming decode step: (B, rvq_layers, chunk_frames) codes ->
    ((B, chunk_frames*hop*stride) samples, new state)."""
    codes = codes_chunk.swapaxes(1, 2)
    nqs = cfg.n_q_semantic
    z = _rvq_decode(params["rvq_semantic"], codes[..., :nqs])
    z = z + _rvq_decode(params["rvq_acoustic"], codes[..., nqs:])
    z, up_carry = _stream_conv_transpose(
        z, state["up"], params["upsample"]["w"], None,
        stride=cfg.resample_stride, groups=cfg.latent_dim,
    )
    z, tr_st = _stream_transformer(
        params["dec_transformer"], cfg, z, state["transformer"]
    )
    wav, seanet_st = _seanet_dec_step(params["decoder"], state["seanet"],
                                      cfg, z)
    new_state = {"up": up_carry, "transformer": tr_st, "seanet": seanet_st}
    return wav[:, :, 0], new_state
