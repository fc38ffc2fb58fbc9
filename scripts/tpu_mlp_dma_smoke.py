"""Standalone TPU smoke for the DMA-pipelined SwiGLU (`ops/fused_mlp_dma`).

Per the remote-TPU fragility protocol (verify skill): the new kernel is
compiled in ISOLATION first — backbone (3072d/8192i) and local-decoder
(2048d/8192i) shapes at the serving layouts (chunk-major row-interleaved
int4, grouped int4, int8) — checked against the grid-pipelined kernel, then
timed back to back over a chained-layer loop (microbench numbers through
the tunnel are indicative only; trust the real decode loop).

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python scripts/tpu_mlp_dma_smoke.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _build(bits, k, i, n, key):
    import jax
    import jax.numpy as jnp

    from uniaudio2_tpu.ops import quant

    k1, k2, k3 = jax.random.split(key, 3)
    w1 = jax.random.normal(k1, (k, i), jnp.float32) * 0.02
    w2 = jax.random.normal(k2, (k, i), jnp.float32) * 0.02
    w3 = jax.random.normal(k3, (i, n), jnp.float32) * 0.02
    if bits == "int8":
        q1, q2, q3 = quant.quantize(w1), quant.quantize(w2), quant.quantize(w3)
    elif bits == "int4allg":
        q1 = quant.to_interleaved(quant.quantize4_grouped(w1))
        q2 = quant.to_interleaved(quant.quantize4_grouped(w2))
        q3 = quant.to_interleaved(quant.quantize4_cols_grouped(w3))
    else:
        q1 = quant.to_interleaved(quant.quantize4(w1))
        q2 = quant.to_interleaved(quant.quantize4(w2))
        q3 = quant.to_interleaved(quant.quantize4_cols(w3))
    return quant.chunk_major(q1), quant.chunk_major(q2), q3


def main():
    import jax
    import jax.numpy as jnp

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)

    from uniaudio2_tpu.ops import fused_mlp, fused_mlp_dma

    shapes = {"backbone": (3072, 8192, 3072), "localdec": (2048, 8192, 2048)}
    for bits in ("int4all", "int4allg", "int8"):
        for name, (k, i, n) in shapes.items():
            q1, q2, q3 = _build(bits, k, i, n, jax.random.PRNGKey(0))
            x = (jax.random.normal(jax.random.PRNGKey(1), (1, k), jnp.float32)
                 * 0.3).astype(jnp.bfloat16)
            nw = jnp.ones((k,), jnp.bfloat16)
            res = (jax.random.normal(jax.random.PRNGKey(2), (1, n),
                                     jnp.float32) * 0.1).astype(jnp.bfloat16)
            assert fused_mlp_dma.can_fuse_dma(q1, q2, q3, x), (bits, name)

            dma = jax.jit(lambda x, res: fused_mlp_dma.fused_swiglu_dma(
                x, q1, q2, q3, norm_w=nw, residual=res))
            os.environ["UA2_MLP_DMA"] = "0"
            grid = jax.jit(lambda x, res: fused_mlp.fused_swiglu(
                x, q1, q2, q3, norm_w=nw, residual=res))
            os.environ["UA2_MLP_DMA"] = "1"

            a = np.asarray(dma(x, res), np.float32)
            b = np.asarray(grid(x, res), np.float32)
            err = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
            print(f"{bits:9s} {name:9s} rel_err={err:.2e}", flush=True)
            assert err < 2e-2, (bits, name, err)

            # chained-loop timing (K == N at both shapes; fresh input each
            # call; microbench through the tunnel is indicative only)
            def chain(fn, x0, res, reps=64):
                y = x0
                for _ in range(reps):
                    y = fn(y, res)
                return y

            cd = jax.jit(lambda x, res: chain(
                lambda a, r: fused_mlp_dma.fused_swiglu_dma(
                    a, q1, q2, q3, norm_w=nw, residual=r), x, res))
            os.environ["UA2_MLP_DMA"] = "0"
            cg = jax.jit(lambda x, res: chain(
                lambda a, r: fused_mlp.fused_swiglu(
                    a, q1, q2, q3, norm_w=nw, residual=r), x, res))
            os.environ["UA2_MLP_DMA"] = "1"
            for tag, f in (("dma", cd), ("grid", cg)):
                np.asarray(f(x, res))  # compile
                t0 = time.perf_counter()
                np.asarray(f((x + 1e-3).astype(jnp.bfloat16), res))
                dt = (time.perf_counter() - t0) / 64
                print(f"    {tag:4s} {dt * 1e6:7.1f} us/layer", flush=True)
    print("OK")


if __name__ == "__main__":
    main()
