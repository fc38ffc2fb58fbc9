"""Codec decode path: tokens -> latents -> waveform.

TPU-native re-design of the reference decode pipeline
(`/root/reference/tools/tokenizer/ReasoningCodec_film/models/
AudioDiffusion1D.py:553-624` + the chunk loop in `reason_tokenizer.py:
131-306`):

1. three reconstruction RVQ inverse lookups (phone 1q ‖ structure 1q ‖
   acoustic 6q), summed (`:577-580`);
2. optional reasoning fusion: reasoning-RVQ inverse lookup → linear adaptor →
   ×2.5 nearest-neighbour upsample → additive (`:582-584`, `:440-456`);
3. condition embedding linear + ×2 nearest upsample to 25 Hz (`:588-589`);
4. latent masks (2=generate / 1=in-context / 0=pad) gate the condition
   against a learned zero-condition vector (`:605-611`);
5. Euler CFM solve with CFG over the DiT estimator (`cfm.py`);
6. ScalarAE conv decode to 24 kHz waveform (`scalar_ae.py`).

The whole of (1)-(5) plus the ScalarAE decode is ONE jitted function per
chunk shape (`decode_chunk`); the host driver (`CodecDecoder.decode`) keeps
only the inter-chunk in-context dependency (sequential by construction,
`reason_tokenizer.py:185-203`) and the final overlap-crossfade stitch.

Static shapes: chunks are padded to the 30 s window (the reference pads by
self-repetition — same here), so every chunk reuses one compiled program.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uniaudio2_tpu.codec import cfm, dit, rvq, scalar_ae
from uniaudio2_tpu.codec.dit import DiTConfig
from uniaudio2_tpu.codec.scalar_ae import ScalarAEConfig

Params = Dict[str, Any]


@dataclass(frozen=True)
class CodecConfig:
    """Geometry of the ReasoningCodec (reference `reason_tokenizer.py:27-33`,
    RVQ shapes `AudioDiffusion1D.py:183-187,256-264`)."""

    sample_rate: int = 24000
    codec_dim: int = 768
    latent_dim: int = 136
    sq_hz: float = 25.0
    rec_hz: float = 12.5
    reason_hz: float = 5.0
    num_codebooks: int = 8
    rec_codebook_size: int = 8192
    reason_codebook_size: int = 4096
    rec_codebook_dim: int = 32
    reason_codebook_dim: int = 64
    window_seconds: float = 30.0
    dit: DiTConfig = DiTConfig()
    scalar: ScalarAEConfig = ScalarAEConfig()

    @property
    def window_rec_frames(self) -> int:
        return int(self.window_seconds * self.rec_hz)

    @property
    def window_reason_frames(self) -> int:
        return int(self.window_seconds * self.reason_hz)

    @property
    def window_latent_frames(self) -> int:
        return int(self.window_seconds * self.sq_hz)

    @classmethod
    def tiny(cls) -> "CodecConfig":
        return cls(
            # consistent tiny geometry: 100 Hz audio, 25 Hz latents, and the
            # tiny ScalarAE's 4x total stride (25 Hz x 4 = 100 Hz)
            sample_rate=100,
            codec_dim=16, latent_dim=8, num_codebooks=8,
            rec_codebook_size=32, reason_codebook_size=16,
            rec_codebook_dim=8, reason_codebook_dim=8,
            window_seconds=2.0,
            dit=DiTConfig(in_channels=8 + 8 + 16, out_channels=8,
                          num_layers=2, num_heads=2, head_dim=8,
                          max_positions=256),
            scalar=ScalarAEConfig.tiny(),
        )


def init_decode_params(key: jax.Array, cfg: CodecConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 8)
    d = cfg.codec_dim
    s = 0.02
    return {
        "rvq_phone": rvq.init_params(
            ks[0], dim=d, codebook_size=cfg.rec_codebook_size,
            codebook_dim=cfg.rec_codebook_dim, num_quantizers=1, dtype=dtype),
        "rvq_semantic": rvq.init_params(
            ks[1], dim=d, codebook_size=cfg.rec_codebook_size,
            codebook_dim=cfg.rec_codebook_dim, num_quantizers=1, dtype=dtype),
        "rvq_acoustic": rvq.init_params(
            ks[2], dim=d, codebook_size=cfg.rec_codebook_size,
            codebook_dim=cfg.rec_codebook_dim, num_quantizers=6, dtype=dtype),
        "rvq_reasoning": rvq.init_params(
            ks[3], dim=d, codebook_size=cfg.reason_codebook_size,
            codebook_dim=cfg.reason_codebook_dim, num_quantizers=8, dtype=dtype),
        "reason_adaptor": {
            "w": (jax.random.normal(ks[4], (d, d)) * s).astype(dtype),
            "b": jnp.zeros((d,), dtype)},
        "cond_feature_emb": {
            "w": (jax.random.normal(ks[5], (d, d)) * s).astype(dtype),
            "b": jnp.zeros((d,), dtype)},
        "zero_cond_embedding": jax.random.normal(ks[6], (d,)).astype(dtype),
        "dit": dit.init_params(ks[7], cfg.dit, dtype=dtype),
        "scalar": scalar_ae.init_params(jax.random.fold_in(key, 99), cfg.scalar, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# Conditioning
# ---------------------------------------------------------------------------


def _upsample_nearest(x: jax.Array, scale: float) -> jax.Array:
    """torch ``F.interpolate(mode='nearest', scale_factor=s)`` on the time
    axis of (B, T, C): out[i] = in[floor(i / s)], length floor(T·s)."""
    t = x.shape[1]
    out_t = int(math.floor(t * scale))
    idx = jnp.floor(jnp.arange(out_t, dtype=jnp.float32) / scale).astype(jnp.int32)
    idx = jnp.minimum(idx, t - 1)
    return jnp.take(x, idx, axis=1)


def condition_features(
    params: Params,
    cfg: CodecConfig,
    rec_codes: jax.Array,              # (B, T_rec, 8) int
    reason_codes: Optional[jax.Array],  # (B, T_reason, 8) int or None
) -> jax.Array:
    """Codes -> (B, 2·T_rec, codec_dim) conditioning at 25 Hz (steps 1-3)."""
    feats = (
        rvq.decode(params["rvq_phone"], rec_codes[:, :, 0:1])
        + rvq.decode(params["rvq_semantic"], rec_codes[:, :, 1:2])
        + rvq.decode(params["rvq_acoustic"], rec_codes[:, :, 2:8])
    )
    if reason_codes is not None:
        r = rvq.decode(params["rvq_reasoning"], reason_codes)
        r = r @ params["reason_adaptor"]["w"] + params["reason_adaptor"]["b"]
        r = _upsample_nearest(r, 2.5)
        tl = feats.shape[1]
        r = r[:, :tl]
        if r.shape[1] < tl:  # static-shape guard; windows always divide evenly
            r = jnp.pad(r, ((0, 0), (0, tl - r.shape[1]), (0, 0)))
        feats = feats + r
    feats = feats @ params["cond_feature_emb"]["w"] + params["cond_feature_emb"]["b"]
    return _upsample_nearest(feats, 2.0)


def decode_chunk(
    params: Params,
    cfg: CodecConfig,
    rec_codes: jax.Array,            # (B, T_rec, 8)
    reason_codes: Optional[jax.Array],
    incontext_latent: jax.Array,     # (B, T_lat, latent_dim)
    incontext_len: jax.Array,        # i32 scalar
    key: jax.Array,
    *,
    num_steps: int,
    guidance_scale: float,
) -> jax.Array:
    """One window: codes (+ in-context latent prefix) -> latents
    (B, 2·T_rec, latent_dim). Steps 1-5 of the module docstring."""
    mu = condition_features(params, cfg, rec_codes, reason_codes)
    b, tl, _ = mu.shape
    frame_idx = jnp.arange(tl, dtype=jnp.int32)
    ctx_mask = frame_idx[None, :] < incontext_len          # (B, T)
    # gate condition vs the learned zero-condition (pad frames only; the
    # chunked driver always fills the window so this is the general form)
    gen_or_ctx = frame_idx[None, :] < tl                    # all True here
    mu = jnp.where(
        gen_or_ctx[..., None], mu, params["zero_cond_embedding"][None, None, :]
    )
    ctx_latent = incontext_latent * ctx_mask[..., None].astype(mu.dtype)

    # run the DiT in its parameter dtype (bf16 in production), solver in f32
    dit_dtype = params["dit"]["proj_in"]["conv_w"].dtype

    def estimator(x_cat, t):
        v = dit.forward(params["dit"], cfg.dit, x_cat.astype(dit_dtype), t)
        return v.astype(x_cat.dtype)

    return cfm.solve_euler(
        estimator, key=key, mu=mu, incontext_x=ctx_latent,
        incontext_mask=ctx_mask, num_steps=num_steps,
        guidance_scale=guidance_scale, latent_dim=cfg.latent_dim,
    )


# ---------------------------------------------------------------------------
# Host-side chunked driver
# ---------------------------------------------------------------------------


def _pad_repeat(codes: np.ndarray, target: int) -> np.ndarray:
    """Pad (B, T, K) along T to ``target`` by self-repetition
    (reference `reason_tokenizer.py:157-178`)."""
    while codes.shape[1] < target:
        codes = np.concatenate([codes, codes], axis=1)
    return codes[:, :target]


class CodecDecoder:
    """Tokens -> waveform with 30 s windows, ¾-window hop, in-context latent
    carry-over and linear crossfade (reference `token2audio*`,
    `reason_tokenizer.py:131-306`). The per-chunk solve and the ScalarAE
    decode are jitted once and reused for every chunk."""

    def __init__(self, params: Params, cfg: CodecConfig):
        self.params = params
        self.cfg = cfg
        self._chunk_fn = {}
        # params are jit ARGUMENTS, never closure captures — captured params
        # become giant HLO constants (gigabytes of serialized program)
        self._sq_decode_fn = jax.jit(
            lambda p, lat: scalar_ae.decode(p, cfg.scalar, lat)
        )

    def _sq_decode(self, lat):
        return self._sq_decode_fn(self.params["scalar"], lat)

    def _get_chunk_fn(self, cfg: CodecConfig, with_reason: bool,
                      num_steps: int, guidance: float):
        k = (cfg.window_seconds, with_reason, num_steps, float(guidance))
        if k not in self._chunk_fn:
            def fn(p, rec, reason, ctx, ctx_len, key):
                return decode_chunk(
                    p, cfg, rec,
                    reason if with_reason else None, ctx, ctx_len, key,
                    num_steps=num_steps, guidance_scale=guidance,
                )
            jfn = jax.jit(fn)
            self._chunk_fn[k] = lambda *a: jfn(self.params, *a)
        return self._chunk_fn[k]

    def decode(
        self,
        rec_codes: np.ndarray,                 # (8, T_rec) int
        reason_codes: Optional[np.ndarray] = None,   # (8, T_reason) int
        *,
        num_steps: int = 10,
        guidance_scale: float = 1.5,
        seed: int = 0,
    ) -> np.ndarray:
        """Returns the 24 kHz waveform (1, T_samples) float32."""
        cfg = self.cfg
        if cfg.window_rec_frames < 4 or cfg.window_reason_frames < 4:
            raise ValueError(
                f"window_seconds={cfg.window_seconds} gives a degenerate "
                f"chunk geometry (rec {cfg.window_rec_frames} / reason "
                f"{cfg.window_reason_frames} frames; the ¾-hop needs ≥ 4)"
            )
        t_rec_orig = rec_codes.shape[-1]
        target_samples = int(t_rec_orig / cfg.rec_hz * cfg.sample_rate)

        # short clips: pick the smallest window bucket that fits in ONE chunk
        # (full / half / quarter window) — a 4 s TTS utterance then costs a
        # 7.5 s DiT solve instead of a 30 s one. Multi-chunk audio keeps the
        # full window so the carry-over geometry matches the reference.
        win_s = cfg.window_seconds
        for frac in (4, 2):
            cand = cfg.window_seconds / frac
            if (t_rec_orig <= int(cand * cfg.rec_hz)
                    and int(cand * cfg.rec_hz) >= 4
                    and int(cand * cfg.reason_hz) >= 4):
                win_s = cand
                break
        if win_s != cfg.window_seconds:
            cfg = dataclasses.replace(cfg, window_seconds=win_s)

        rec = np.asarray(rec_codes, np.int32).T[None]          # (1, T, 8)
        win = cfg.window_rec_frames
        hop = win // 4 * 3
        ovlp = win - hop
        ovlp_lat = ovlp * 2
        n = rec.shape[1]
        if n < win:
            rec = _pad_repeat(rec, win)
        elif (rec.shape[1] - ovlp) % hop:
            total = math.ceil((rec.shape[1] - ovlp) / hop) * hop + ovlp
            rec = _pad_repeat(rec, total)

        reason = None
        if reason_codes is not None:
            reason = np.asarray(reason_codes, np.int32).T[None]
            win_q = cfg.window_reason_frames
            hop_q = win_q // 4 * 3
            ovlp_q = win_q - hop_q
            nq = reason.shape[1]
            if nq < win_q:
                reason = _pad_repeat(reason, win_q)
            elif (reason.shape[1] - ovlp_q) % hop_q:
                total_q = math.ceil((reason.shape[1] - ovlp_q) / hop_q) * hop_q + ovlp_q
                reason = _pad_repeat(reason, total_q)

        # latents are exactly 2x the rec frames (25 Hz vs 12.5 Hz); derive
        # from the (possibly fractional-window) rec frame count
        lat_frames = 2 * win
        chunk_fn = self._get_chunk_fn(cfg, reason is not None, num_steps, guidance_scale)
        key = jax.random.PRNGKey(seed)

        latents = []
        cnt = 0
        rng = np.random.default_rng(seed)
        for sinx in range(0, rec.shape[1] - hop, hop):
            rec_in = jnp.asarray(rec[:, sinx : sinx + win])
            if reason is not None:
                sq = hop_q * cnt
                reason_in = jnp.asarray(reason[:, sq : sq + win_q])
            else:
                reason_in = jnp.zeros((1, cfg.window_reason_frames, 8), jnp.int32)
            key, sub = jax.random.split(key)
            if cnt == 0:
                ctx = jnp.zeros((1, lat_frames, cfg.latent_dim), jnp.float32)
                ctx_len = jnp.int32(0)
            else:
                prev_tail = latents[-1][:, -ovlp_lat:]
                pad = jnp.zeros(
                    (1, lat_frames - ovlp_lat, cfg.latent_dim), jnp.float32
                )
                ctx = jnp.concatenate([prev_tail, pad], axis=1)
                ctx_len = jnp.int32(ovlp_lat)
            latents.append(chunk_fn(rec_in, reason_in, ctx, ctx_len, sub))
            cnt += 1

        # ScalarAE decode + linear crossfade stitch (reference :210-226)
        win_samp = int(cfg.window_seconds * cfg.sample_rate)
        hop_samp = win_samp // 4 * 3
        ovlp_samp = win_samp - hop_samp
        out = None
        for lat in latents:
            wav = np.array(self._sq_decode(lat))[0, :, 0][None]  # (1, T), writable
            wav = wav[:, :win_samp]
            if out is None:
                out = wav
            else:
                ramp = np.linspace(0, 1, ovlp_samp, dtype=np.float32)[None]
                out[:, -ovlp_samp:] = (
                    out[:, -ovlp_samp:] * (1.0 - ramp) + wav[:, :ovlp_samp] * ramp
                )
                out = np.concatenate([out, wav[:, ovlp_samp:]], axis=-1)
        return out[:, :target_samples]
