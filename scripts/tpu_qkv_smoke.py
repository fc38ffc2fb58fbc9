"""Standalone TPU smoke for the fused QKV step kernel (`ops/qkv_step.py`).

Per the remote-TPU fragility protocol (verify skill): a new Pallas kernel is
compiled in ISOLATION first — backbone (3072d, hd 128) and local-decoder
(2048d, hd 64) shapes, int4 chunk-major (the serving default) — and checked
against the composed chain before any full-bench run.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python scripts/tpu_qkv_smoke.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)

    from uniaudio2_tpu.ops import qkv_step
    from uniaudio2_tpu.ops.norms import rms_norm
    from uniaudio2_tpu.ops.quant import chunk_major, dequantize4, quantize4
    from uniaudio2_tpu.ops.rope import apply_rope, rope_cache

    for name, (k, h, g, hd) in {
        "backbone": (3072, 24, 8, 128),
        "localdec": (2048, 32, 8, 64),
    }.items():
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        n = (h + 2 * g) * hd
        w = jax.random.normal(keys[0], (k, n), jnp.float32) * 0.02
        wq = chunk_major(quantize4(w))
        wd = dequantize4(quantize4(w), jnp.float32)
        x = (jax.random.normal(keys[1], (1, k), jnp.float32) * 0.3
             ).astype(jnp.bfloat16)
        norm_w = jnp.ones((k,), jnp.bfloat16)
        cos_t, sin_t = rope_cache(64, hd)
        cos, sin = cos_t[9:10], sin_t[9:10]
        assert qkv_step.can_fuse(wq, x, h, g, hd), name

        # weights passed as jit ARGUMENTS (never closed over — CLAUDE.md:
        # captured weights become HLO constants through the tunnel)
        fused = jax.jit(lambda x, w, hh=h, gg=g, dd=hd, nw=norm_w,
                        c=cos, s=sin: qkv_step.qkv_rope_step(
                            x, w, nw, 1e-5, c[0], s[0], hh, gg, dd))
        q, kk, v = fused(x, wq)
        q, kk, v = np.asarray(q), np.asarray(kk), np.asarray(v)

        hn = rms_norm(x.astype(jnp.float32), norm_w.astype(jnp.float32), 1e-5)
        qkv = hn @ wd
        qr, kr, vr = np.split(np.asarray(qkv), [h * hd, (h + g) * hd], axis=-1)
        qr = np.asarray(apply_rope(jnp.asarray(qr).reshape(1, h, 1, hd),
                                   cos, sin)).reshape(1, -1)
        kr = np.asarray(apply_rope(jnp.asarray(kr).reshape(1, g, 1, hd),
                                   cos, sin)).reshape(1, -1)
        for tag, a, b in (("q", q, qr), ("k", kk, kr), ("v", v, vr)):
            err = np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)))
            rel = err / (np.max(np.abs(b)) + 1e-9)
            print(f"{name}/{tag}: max abs err {err:.4e} (rel {rel:.3e})")
            assert rel < 2e-2, (name, tag, rel)  # bf16 x + int4 w tolerance
    print("SMOKE OK")


if __name__ == "__main__":
    raise SystemExit(main())
