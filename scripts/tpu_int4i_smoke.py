"""Standalone TPU smoke for the row-interleaved int4 (bitcast) kernels.

Per the remote-TPU fragility protocol (verify skill): new Pallas kernels are
compiled in ISOLATION at the real serving shapes before any full-engine run.
Covers, for per-channel (I4) and grouped (I4G) scales:

  1. `quant._pallas_int4i_matmul`  — attn-proj shape, chunk-major,
     norm+residual folds
  2. `fused_mlp.fused_swiglu`      — backbone MLP shape (3072->8192->3072),
     chunk-major W1/W2, interleaved W3, norm+residual folds
  3. `qkv_step.qkv_rope_step`      — backbone QKV shape, chunk-major

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python scripts/tpu_int4i_smoke.py
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

    from uniaudio2_tpu.ops import fused_mlp, qkv_step
    from uniaudio2_tpu.ops import quant as q
    from uniaudio2_tpu.ops.norms import rms_norm
    from uniaudio2_tpu.ops.rope import apply_rope, rope_cache

    key = jax.random.PRNGKey(0)

    def check(name, out, ref, tol=3e-2):
        o = np.asarray(out, np.float32)
        r = np.asarray(ref, np.float32)
        err = float(np.max(np.abs(o - r) / (np.abs(r) + 1)))
        print(f"{name}: rel err {err:.4f}")
        assert err < tol, name

    for grouped in (False, True):
        tag = "i4g" if grouped else "i4"
        mk12 = (lambda w: q.quantize4_grouped(w, 128)) if grouped \
            else q.quantize4
        mk3 = (lambda w: q.quantize4_cols_grouped(w, 128)) if grouped \
            else q.quantize4_cols
        deq = (q.dequantize4_interleaved_grouped if grouped
               else q.dequantize4_interleaved)

        # 1. plain GEMV kernel at attn-proj shape, chunk-major + folds
        k_dim, n_dim = 3072, 3072
        kk = jax.random.split(key, 6)
        w = jax.random.normal(kk[0], (k_dim, n_dim), jnp.float32) * 0.02
        wi = q.chunk_major(q.to_interleaved(mk12(w)))
        wd = deq(wi, jnp.float32)
        x = (jax.random.normal(kk[1], (1, k_dim)) * 0.3).astype(jnp.bfloat16)
        nw = jnp.ones((k_dim,), jnp.bfloat16)
        res = (jax.random.normal(kk[2], (1, n_dim)) * 0.1
               ).astype(jnp.bfloat16)
        out = jax.jit(lambda x, w, r: q._pallas_int4i_matmul(
            x, w.values, w.scale, pre_norm=(nw, 1e-5), residual=r)
        )(x, wi, res)  # weights as jit args, never closed over (CLAUDE.md)
        ref = (rms_norm(x.astype(jnp.float32), nw.astype(jnp.float32), 1e-5)
               .astype(jnp.bfloat16).astype(jnp.float32) @ wd
               + res.astype(jnp.float32))
        check(f"gemv-{tag}", out, ref)

        # 2. fused SwiGLU at backbone shape
        k_dim, i_dim, n_dim = 3072, 8192, 3072
        w1 = jax.random.normal(kk[0], (k_dim, i_dim), jnp.float32) * 0.02
        w2 = jax.random.normal(kk[1], (k_dim, i_dim), jnp.float32) * 0.02
        w3 = jax.random.normal(kk[2], (i_dim, n_dim), jnp.float32) * 0.02
        i1 = q.chunk_major(q.to_interleaved(mk12(w1)))
        i2 = q.chunk_major(q.to_interleaved(mk12(w2)))
        i3 = q.to_interleaved(mk3(w3))
        d1, d2, d3 = deq(i1, jnp.float32), deq(i2, jnp.float32), \
            deq(i3, jnp.float32)
        x = (jax.random.normal(kk[3], (1, k_dim)) * 0.3).astype(jnp.bfloat16)
        nw = jnp.ones((k_dim,), jnp.bfloat16)
        res = (jax.random.normal(kk[4], (1, n_dim)) * 0.1
               ).astype(jnp.bfloat16)
        assert fused_mlp.can_fuse(i1, i2, i3, x), "fused gate declined"
        out = jax.jit(lambda x, w1, w2, w3, r: fused_mlp.fused_swiglu(
            x, w1, w2, w3, norm_w=nw, residual=r))(x, i1, i2, i3, res)
        hn = rms_norm(x.astype(jnp.float32), nw.astype(jnp.float32), 1e-5
                      ).astype(jnp.bfloat16).astype(jnp.float32)
        h = jax.nn.silu(hn @ d1) * (hn @ d2)
        ref = (h.astype(jnp.bfloat16).astype(jnp.float32) @ d3
               + res.astype(jnp.float32))
        check(f"swiglu-{tag}", out, ref)

        # 3. fused QKV step at backbone shape
        h_, g_, hd = 24, 8, 128
        n_dim = (h_ + 2 * g_) * hd
        w = jax.random.normal(kk[5], (3072, n_dim), jnp.float32) * 0.02
        wi = q.chunk_major(q.to_interleaved(mk12(w)))
        wd = deq(wi, jnp.float32)
        x = (jax.random.normal(kk[3], (1, 3072)) * 0.3).astype(jnp.bfloat16)
        nw = jnp.ones((3072,), jnp.bfloat16)
        cos_t, sin_t = rope_cache(64, hd)
        cos, sin = cos_t[9], sin_t[9]
        assert qkv_step.can_fuse(wi, x, h_, g_, hd), "qkv gate declined"
        qq, kk_, vv = jax.jit(lambda x, w: qkv_step.qkv_rope_step(
            x, w, nw, 1e-5, cos, sin, h_, g_, hd))(x, wi)
        hn = rms_norm(x.astype(jnp.float32), nw.astype(jnp.float32), 1e-5
                      ).astype(jnp.bfloat16)
        qkv = (hn.astype(jnp.float32) @ wd).astype(jnp.bfloat16)
        q_r, k_r, v_r = jnp.split(qkv, [h_ * hd, (h_ + g_) * hd], axis=-1)
        q_r = apply_rope(q_r.reshape(1, h_, 1, hd), cos_t[9:10], sin_t[9:10])
        k_r = apply_rope(k_r.reshape(1, g_, 1, hd), cos_t[9:10], sin_t[9:10])
        check(f"qkv-q-{tag}", qq, q_r.reshape(1, -1))
        check(f"qkv-k-{tag}", kk_, k_r.reshape(1, -1))
        check(f"qkv-v-{tag}", vv, v_r)
    print("OK")


if __name__ == "__main__":
    main()
