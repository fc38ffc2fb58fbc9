"""Does `lax.scan` over stacked weights copy each layer's slice before the
Pallas kernel reads it? (Pallas operands can't fuse a dynamic-slice
producer, so XLA may materialize layer slices — 3x the HBM traffic:
read stack + write scratch + read scratch.)

Three forms of a 28-layer serial int4 GEMV chain at the backbone MLP shape:
  scan      — production form: lax.scan over the stacked (L, K/2, N) values
  unrolled  — Python loop over 28 separate per-layer arrays
  prefetch  — one kernel reading the stacked array directly, the layer index
              delivered via scalar prefetch (zero-copy indexed DMA)
Prints GB/s of true weight bytes per variant.
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

L, K, N = 28, 3072, 8192
ITERS = 256  # large enough to drown the ~30ms tunnel round-trip


import numpy as _np


def timed(fn, w, x):
    # fresh x for the timed run (the remote tunnel caches identical calls)
    # and a host transfer of the result (block_until_ready alone does not
    # synchronize through the tunnel)
    _np.asarray(fn(w, x))
    x2 = x + 1e-6
    _np.asarray(x2)
    t0 = time.perf_counter()
    _np.asarray(fn(w, x2))
    return time.perf_counter() - t0


def report(name, dt):
    weight_bytes = L * (K // 2) * N * ITERS
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2),
                      "GBps": round(weight_bytes / dt / 1e9, 1)}), flush=True)


def main():
    ws = [
        quant.quantize4(jax.random.normal(jax.random.PRNGKey(i), (K, N),
                                          jnp.float32).astype(jnp.bfloat16))
        for i in range(L)
    ]
    stacked = quant.QuantizedLinear4(
        jnp.stack([w.values for w in ws]), jnp.stack([w.scale for w in ws])
    )
    x0 = jnp.ones((1, K), jnp.bfloat16)

    def chain_back(y):
        # (1, N) -> (1, K) dependency without a big matmul
        return y[:, :K] * 1e-3

    @jax.jit
    def run_scan(stacked, x):
        def outer(i, x):
            def body(x, w):
                y = quant.matmul(x, quant.QuantizedLinear4(*w))
                return chain_back(y), None
            x, _ = jax.lax.scan(body, x, (stacked.values, stacked.scale))
            return x
        return jax.lax.fori_loop(0, ITERS, outer, x)

    dt = timed(run_scan, stacked, x0)
    report("scan", dt)

    @jax.jit
    def run_unrolled(ws, x):
        def outer(i, x):
            for w in ws:
                x = chain_back(quant.matmul(x, w))
            return x
        return jax.lax.fori_loop(0, ITERS, outer, x)

    dt = timed(run_unrolled, ws, x0)
    report("unrolled", dt)

    # ---- scalar-prefetch indexed kernel over the stacked array ----
    bn = 512
    k2 = K // 2

    def kernel(l_ref, x_ref, w_ref, s_ref, o_ref):
        x = x_ref[:]
        lo, hi = quant._unpack4(w_ref[0], x.dtype)
        acc = jnp.dot(x[:, :k2], lo, preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, k2:], hi, preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[0].astype(jnp.float32)).astype(o_ref.dtype)

    npad = stacked.values.shape[-1]

    @functools.partial(jax.jit, static_argnums=())
    def run_prefetch(stacked, x0):
        def one_layer(x, li):
            grid = (npad // bn,)
            out = pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=grid,
                    in_specs=[
                        pl.BlockSpec((1, K), lambda j, l: (0, 0)),
                        pl.BlockSpec((1, k2, bn), lambda j, l: (l[0], 0, j)),
                        pl.BlockSpec((1, 1, bn), lambda j, l: (l[0], 0, j)),
                    ],
                    out_specs=pl.BlockSpec((1, bn), lambda j, l: (0, j)),
                ),
                out_shape=jax.ShapeDtypeStruct((1, npad), x.dtype),
                cost_estimate=pl.CostEstimate(
                    flops=2 * K * npad, bytes_accessed=k2 * npad,
                    transcendentals=0,
                ),
            )(li[None], x, stacked.values,
              stacked.scale.reshape(L, 1, -1))
            return out

        def outer(i, x):
            def body(x, li):
                return chain_back(one_layer(x, li)), None
            x, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
            return x
        return jax.lax.fori_loop(0, ITERS, outer, x0)

    try:
        dt = timed(run_prefetch, stacked, x0)
        report("prefetch", dt)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": "prefetch", "error": str(e)[:300]}),
              flush=True)


if __name__ == "__main__":
    main()
