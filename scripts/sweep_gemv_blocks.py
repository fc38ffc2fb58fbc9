"""Sweep Pallas int4-GEMV block sizes / unpack variants at serving shapes.

The decode hot loop is a chain of (1, K) x (K, N) int4 matmuls; effective
weight-stream bandwidth per shape decides the frame rate. Self-contained
pallas_call (no product VMEM caps) so block_n can exceed the kernel's
default limits; also tries an int16-shift unpack (half the register
pressure of the int32 path).

Usage: python scripts/sweep_gemv_blocks.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uniaudio2_tpu.ops import quant

SHAPES = [
    ("bb_qkv", 3072, 5120),
    ("bb_attnproj", 3072, 3072),
    ("dec_qkv", 2048, 4096),
    ("audio_head", 2048, 12300),
]
N_ITER = 300


def _kernel(x_ref, w_ref, s_ref, o_ref, *, mode):
    x = x_ref[:]
    v = w_ref[:]
    if mode == "i32":
        v32 = v.astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(v32, 28), 28).astype(x.dtype)
        hi = jnp.right_shift(v32, 4).astype(x.dtype)
    else:  # i16
        v16 = v.astype(jnp.int16)
        lo = jnp.right_shift(jnp.left_shift(v16, 12), 12).astype(x.dtype)
        hi = jnp.right_shift(v16, 4).astype(x.dtype)
    k2 = lo.shape[0]
    acc = jnp.dot(x[:, :k2], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x[:, k2:], hi, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def matmul_bn(x, values, scale, bn, mode):
    m, k = x.shape
    k2, n = values.shape
    if n % bn:
        return None
    grid = (n // bn,)
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=k2 * n + m * k * 2,
            transcendentals=0,
        ),
    )(x, values, scale.reshape(1, n))


def bench(name, k, n, bn, mode):
    w = quant.quantize4(
        jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
        .astype(jnp.bfloat16))
    halfpad = w.values.shape[-1]
    scale = w.scale
    if halfpad != scale.shape[-1]:
        scale = jnp.pad(scale, ((0, halfpad - scale.shape[-1]),),
                        constant_values=1.0)
    if halfpad % bn:
        return

    @jax.jit
    def chain(x, wv, sc, seed):
        def body(i, x):
            y = matmul_bn(x, wv, sc, bn, mode)
            if y.shape[-1] >= k:
                return (y[:, :k] * 1e-3 + seed * 1e-12).astype(x.dtype)
            reps = -(-k // y.shape[-1])
            return (jnp.tile(y, (1, reps))[:, :k] * 1e-3
                    + seed * 1e-12).astype(x.dtype)

        return jax.lax.fori_loop(0, N_ITER, body, x)

    x = jnp.ones((1, k), jnp.bfloat16)
    np.asarray(chain(x, w.values, scale, jnp.float32(1)))
    t0 = time.perf_counter()
    np.asarray(chain(x, w.values, scale, jnp.float32(2)))
    dt = time.perf_counter() - t0
    gbps = (k // 2 * halfpad) * N_ITER / dt / 1e9
    print(json.dumps({"shape": name, "mode": mode, "block_n": bn,
                      "us": round(dt / N_ITER * 1e6, 1),
                      "GBps": round(gbps, 1)}))


for name, k, n in SHAPES:
    for mode in ("i32", "i16"):
        for bn in (512, 1024, 2048):
            try:
                bench(name, k, n, bn, mode)
            except Exception as e:
                print(json.dumps({"shape": name, "mode": mode, "block_n": bn,
                                  "error": str(e)[:100]}))
