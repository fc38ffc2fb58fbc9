"""Compare batch-1 GEMV strategies on TPU (the decode hot path is GEMV).

Hypothesis: the current Pallas int8 kernel is MXU-latency-bound at M=1
(each 128x128 MXU pass costs ~latency cycles regardless of M), so per
(K=3072, N=512) tile it burns ~13us of MXU time for one row -> 90-250 GB/s.
A VPU-based multiply+reduce GEMV should be DMA-bound instead.

Variants per shape:
  pallas512 / pallas2048 — current MXU kernel at two tile widths
  xla_bf16              — plain XLA bf16 dot (2x bytes)
  xla_int8              — dynamic-quant x to int8, native s8xs8 dot
  vpu                   — Pallas VPU GEMV (broadcast-mult + K-reduce)
"""


from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uniaudio2_tpu.ops import quant

N_ITER = int(__import__("os").environ.get("UA2_GEMV_ITERS", "400"))


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def chain(step, k, n_iter=N_ITER):
    """Run step (1,K)->(1,N) n_iter times with a serial dependency."""

    @jax.jit
    def run(x):
        def body(i, x):
            y = step(x)
            if y.shape[-1] >= k:
                return (y[:, :k] * 1e-3).astype(jnp.bfloat16)
            reps = -(-k // y.shape[-1])
            return (jnp.tile(y, (1, reps))[:, :k] * 1e-3).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n_iter, body, x)

    return run


# ---- VPU GEMV kernel ----

def _vpu_gemv_kernel(xt_ref, w_ref, s_ref, o_ref):
    xt = xt_ref[:]                                   # (K, 1) bf16
    w = w_ref[:].astype(jnp.bfloat16)                # (K, Nt)
    acc = jnp.sum(w * xt, axis=0, keepdims=True, dtype=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def vpu_gemv(x, w: quant.QuantizedLinear, block_n=2048):
    k, n = w.values.shape
    n_orig = w.scale.shape[-1]
    scale = w.scale
    if n_orig != n:
        scale = jnp.pad(scale, ((0, n - n_orig),), constant_values=1.0)
    bn = min(block_n, n)
    while n % bn or k * bn > 6 * 2**20:
        bn //= 2
    xt = x.reshape(k, 1)
    out = pl.pallas_call(
        _vpu_gemv_kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((k, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n, bytes_accessed=k * n + k * 2 + n * 2,
            transcendentals=0,
        ),
    )(xt, w.values, scale.reshape(1, n))
    return out[:, :n_orig]


def main():
    import os
    if os.environ.get("UA2_GEMV_ALL") == "1":
        shapes = [(3072, 8192), (8192, 3072), (3072, 5120), (2048, 8192),
                  (3072, 3072), (2048, 4096)]
    else:  # keep compile count low through the remote tunnel
        shapes = [(3072, 8192), (8192, 3072), (2048, 8192)]
    for k, n in shapes:
        wq = quant.quantize(
            (jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
             * 0.02).astype(jnp.bfloat16))
        wb = quant.dequantize(wq)  # bf16 (k, n_padded trimmed)
        npad = wq.values.shape[-1]
        x = jnp.ones((1, k), jnp.bfloat16)
        res = {}

        for bn in ((512, 2048) if os.environ.get("UA2_GEMV_ALL") == "1"
                   else (512,)):
            if k * bn > 6 * 2**20:  # scoped vmem limit ~16MB, leave headroom
                continue
            step = lambda x, bn=bn: quant._pallas_int8_matmul(
                x, wq.values, wq.scale, block_n=bn)
            dt = timed(chain(step, k), x)
            res[f"pallas{bn}"] = round(k * npad * N_ITER / dt / 1e9, 1)
            print(json.dumps({"shape": [k, n], "partial": res}), flush=True)

        step = lambda x: jnp.einsum(
            "mk,kn->mn", x, wb, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        dt = timed(chain(step, k), x)
        res["xla_bf16"] = round(k * n * 2 * N_ITER / dt / 1e9, 1)
        print(json.dumps({"shape": [k, n], "partial": res}), flush=True)

        def xla_int8(x):
            amax = jnp.max(jnp.abs(x)) + 1e-6
            xs = amax / jnp.float32(127.0)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127
                          ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq.values, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            nn = wq.scale.shape[-1]
            return (acc[:, :nn].astype(jnp.float32) * xs * wq.scale
                    ).astype(jnp.bfloat16)

        dt = timed(chain(xla_int8, k), x)
        res["xla_int8"] = round(k * npad * N_ITER / dt / 1e9, 1)

        step = lambda x: vpu_gemv(x, wq)
        dt = timed(chain(step, k), x)
        res["vpu"] = round(k * npad * N_ITER / dt / 1e9, 1)

        print(json.dumps({"shape": [k, n], "GBps": res}))


if __name__ == "__main__":
    main()
