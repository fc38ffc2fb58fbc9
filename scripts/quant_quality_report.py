"""Quantization-quality report: per-matrix SNR + greedy-token divergence.

Produces the table that justifies the serving-quantization default
(VERDICT r2 item 7): with no real checkpoints in this environment (zero
egress), weights are synthesised HEAVY-TAILED — Student-t(df) plus a
sprinkling of per-channel outliers, the regime where per-channel int4
scales collapse (one outlier poisons its whole column's scale) and
group-wise scales recover most of the loss.

Part 1 — per-matrix SNR (dB, higher better) at the REAL serving shapes
(backbone/expert/decoder qkv, attn-proj, MLP, audio head) for int8,
per-channel int4, and group-128 int4.

Part 2 — end-to-end greedy-token divergence vs the bf16 model: decode N
frames greedily from the same prompts under each quantization and report
the fraction of identical tokens and the first divergence step. Scale is
selectable; `--scale tiny` runs on CPU in seconds, `--scale entry` is the
3072-wide reduced-depth topology, `--scale full` the 28-layer model (TPU).

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/quant_quality_report.py --scale tiny

Committed results: docs/quant_quality_r3.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def heavy_tailed(rng, shape, df=4.0, outlier_rate=1e-4, outlier_scale=25.0):
    """Student-t body + rare large outliers (real-checkpoint-like tails)."""
    w = rng.standard_t(df, size=shape).astype(np.float32) * 0.02
    n_out = max(1, int(w.size * outlier_rate))
    idx = rng.integers(0, w.size, n_out)
    w.flat[idx] *= outlier_scale
    return w


def snr_db(w, w_hat):
    err = (w.astype(np.float64) - w_hat.astype(np.float64)) ** 2
    sig = (w.astype(np.float64)) ** 2
    return 10.0 * np.log10(sig.sum() / max(err.sum(), 1e-30))


def per_matrix_snr(rng):
    import jax.numpy as jnp
    from uniaudio2_tpu.ops import quant

    # real serving shapes (config.py:804-899 topology)
    shapes = {
        "backbone qkv (3072->5120)": (3072, 5120),
        "backbone attn_proj (3072->3072)": (3072, 3072),
        "backbone fc (3072->8192)": (3072, 8192),
        "backbone mlp_proj (8192->3072)": (8192, 3072),
        "decoder fc (2048->8192)": (2048, 8192),
        "decoder mlp_proj (8192->2048)": (8192, 2048),
        "audio_head (2048->8192+3)": (2048, 8195),
    }
    rows = []
    for name, shp in shapes.items():
        w = heavy_tailed(rng, shp)
        wj = jnp.asarray(w)
        q8 = quant.dequantize(quant.quantize(wj), jnp.float32)
        q4 = quant.dequantize4(quant.quantize4(wj), jnp.float32)
        if shp[0] % (2 * quant.INT4_GROUP) == 0:
            q4g = quant.dequantize4_grouped(
                quant.quantize4_grouped(wj), jnp.float32)
            g = snr_db(w, np.asarray(q4g))
        else:
            g = float("nan")
        rows.append((name, snr_db(w, np.asarray(q8)),
                     snr_db(w, np.asarray(q4)), g))
    return rows


def greedy_divergence(scale: str, frames: int):
    import jax
    import jax.numpy as jnp
    from uniaudio2_tpu.config import UnifiedModelConfig, register_config
    from uniaudio2_tpu.engine import tasks
    from uniaudio2_tpu.engine.decode import DecodeEngine
    from uniaudio2_tpu.models import unified
    from uniaudio2_tpu.ops.quant import quantize_unified_params

    if scale == "tiny":
        cfg = UnifiedModelConfig.tiny()
    elif scale == "entry":
        register_config(
            "qq-backbone", block_size=131072, vocab_size=128000,
            padded_vocab_size=128256, n_layer=4, n_embd=3072, n_head=24,
            n_query_groups=8, intermediate_size=8192, rope_base=500000.0)
        register_config(
            "qq-decoder", block_size=131072, vocab_size=128000,
            padded_vocab_size=128256, n_layer=2, n_embd=2048, n_head=32,
            n_query_groups=8, intermediate_size=8192, rope_base=500000.0)
        cfg = UnifiedModelConfig(
            llm_name="qq-backbone", decoder_name="qq-decoder",
            understanding_expert_name="Llama-3.2-Understanding",
            generation_expert_name="Llama-3.2-Generation", max_seq_len=512)
    else:
        cfg = UnifiedModelConfig()

    # heavy-tailed init: reuse the normal init, then fatten the tails by
    # cubing a fraction of entries (keeps pytree structure/dtypes)
    params = unified.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16)

    def fatten(a):
        if a.ndim < 2:
            return a
        k = jax.random.fold_in(jax.random.PRNGKey(1), a.size % 9973)
        mask = jax.random.bernoulli(k, 1e-4, a.shape)
        return jnp.where(mask, a * 25.0, a).astype(a.dtype)

    params = jax.tree_util.tree_map(fatten, params)

    prompt = np.arange(1, 24, dtype=np.int64) % 100
    text = np.arange(5, 17, dtype=np.int64) % 100
    grid, mask = tasks.prepare_tts(prompt, text, cfg.tokens)

    def run(p):
        eng = DecodeEngine(p, cfg, max_frames=frames, buckets=(64,),
                           cache_dtype=jnp.bfloat16)
        r, s = eng.generate_audio(grid, mask, topk=1)
        return np.concatenate([np.asarray(r), np.asarray(s)], axis=1)

    all_mods = ("backbone", "decoder", "understanding_expert",
                "generation_expert", "audio_head", "projection_w")
    ref = run(params)
    out = {}
    for name, kwargs in [
        ("int8", dict(int4_modules=())),
        ("int4all", dict(int4_modules=all_mods, grouped=False)),
        ("int4allg", dict(int4_modules=all_mods, grouped=True)),
    ]:
        qp = quantize_unified_params(
            jax.tree_util.tree_map(lambda a: a, params), **kwargs)
        qp = unified.prepare_serving_params(qp, cfg=cfg)
        got = run(qp)
        tmin = min(ref.shape[1], got.shape[1])
        same = (ref[:, :tmin] == got[:, :tmin])
        mism = np.argwhere(~same)
        first = int(mism[:, 1].min()) if mism.size else tmin
        out[name] = {
            "token_match_frac": round(float(same.mean()), 4),
            "first_divergent_frame": first,
            "len_ref": int(ref.shape[1]), "len_q": int(got.shape[1]),
        }
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="tiny",
                   choices=["tiny", "entry", "full"])
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--skip-e2e", action="store_true")
    args = p.parse_args(argv)

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    rows = per_matrix_snr(rng)
    print(f"{'matrix':38s} {'int8':>8s} {'int4':>8s} {'int4g128':>9s}")
    for name, s8, s4, s4g in rows:
        print(f"{name:38s} {s8:8.2f} {s4:8.2f} {s4g:9.2f}")

    if not args.skip_e2e:
        div = greedy_divergence(args.scale, args.frames)
        print(json.dumps({"scale": args.scale, "greedy_divergence": div}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
