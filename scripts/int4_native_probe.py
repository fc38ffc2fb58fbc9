"""Probe: native jnp.int4 Pallas operands vs the packed-int8 shift chain.

Motivation (r3 profile): UA2_PROBE_NOUNPACK=1 showed the decode kernels
spend ~1.0 ms/frame of VPU time on the int32 nibble-unpack chain
(`quant._unpack4`) that does NOT hide under the weight DMA. If Mosaic
accepts int4 memrefs, `w_ref[:].astype(bf16)` lowers to the hardware
sub-byte unpack (extsi vector<i4> -> sitofp -> truncf) and the shift chain
disappears; int4 HBM traffic also stays half of int8 without manual packing.

Stages (tunnel-fragility protocol, .claude/skills/verify/SKILL.md):
  1. CPU interpret-mode correctness   (default; PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
  2. TPU compile + numerics on tiny shape   (UA2_PROBE_TPU=1)
  3. TPU real-shape timing inside a chained loop   (UA2_PROBE_TPU=2)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TPU = os.environ.get("UA2_PROBE_TPU", "0")
if TPU == "0":
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if TPU == "0":
    jax.config.update("jax_platforms", "cpu")

INTERPRET = TPU == "0"


def _kernel(x_ref, w_ref, s_ref, o_ref, *, via_bitcast=False):
    x = x_ref[:]
    w = w_ref[:]
    if w.ndim == 3:
        w = w[0]
    if via_bitcast:
        # storage is int8 (K/2, bc) with ROW-INTERLEAVED nibbles
        # (row 2r -> low nibble, 2r+1 -> high); bitcast reconstructs (K, bc)
        w = pltpu.bitcast(w, jnp.int4)
    wf = w.astype(x.dtype)                     # i4 -> bf16 (hw unpack path)
    acc = jnp.dot(x, wf, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def int4_native_matmul(x, values, scale, bn=512):
    m, k = x.shape
    via_bitcast = values.dtype == jnp.int8
    rows = k // 2 if via_bitcast else k
    if values.ndim == 3:
        c, k2, bn = values.shape
        n = c * bn
        wspec = pl.BlockSpec((1, rows, bn), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        k2, n = values.shape
        wspec = pl.BlockSpec((rows, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM)
    assert k2 == rows
    grid = (n // bn,)
    return pl.pallas_call(
        functools.partial(_kernel, via_bitcast=via_bitcast),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            wspec,
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=INTERPRET,
    )(x, values, scale.reshape(1, n))


def pack_interleaved(w4: np.ndarray) -> np.ndarray:
    """(K, N) int4-valued int8 -> (K/2, N) bytes: row 2r in the low nibble,
    row 2r+1 in the high nibble (matches pltpu.bitcast(i8 -> i4) order)."""
    lo = w4[0::2].astype(np.uint8) & 0xF
    hi = w4[1::2].astype(np.uint8) & 0xF
    return (lo | (hi << 4)).astype(np.int8)


def main():
    rng = np.random.default_rng(0)
    if TPU == "2":
        shapes = [(3072, 8192)]
    else:
        shapes = [(256, 512), (512, 1024)]
    for k, n in shapes:
        w4 = rng.integers(-8, 8, size=(k, n)).astype(np.int8)
        scale = (rng.random(n).astype(np.float32) + 0.5) / 127.0
        x = (rng.standard_normal((1, k)) * 0.3).astype(np.float32)
        xj = jnp.asarray(x, jnp.bfloat16)
        sj = jnp.asarray(scale)
        ref = (np.asarray(xj, np.float32) @ (w4.astype(np.float32) * scale))
        if TPU == "0":  # S4 args cannot cross a jit boundary on axon
            # (device_put of S4 RecursionErrors through the tunnel)
            v4 = jax.jit(lambda v: v.astype(jnp.int4))(jnp.asarray(w4))
            out = np.asarray(int4_native_matmul(xj, v4, sj))
            err = np.max(np.abs(out.astype(np.float32) - ref)
                         / (np.abs(ref) + 1))
            print(f"int4-native GEMV k={k} n={n}: rel err {err:.4f}")
            assert err < 0.05, "numerics mismatch"

        # int8-storage + in-kernel bitcast-to-int4 variant (axon-safe: no
        # S4 array ever crosses a jit boundary)
        v8i = jnp.asarray(pack_interleaved(w4))
        out = np.asarray(int4_native_matmul(xj, v8i, sj))
        err = np.max(np.abs(out.astype(np.float32) - ref) / (np.abs(ref) + 1))
        print(f"bitcast-int4 GEMV k={k} n={n}: rel err {err:.4f}")
        assert err < 0.05, "bitcast numerics mismatch"

        if TPU == "2":
            # chunk-major bitcast variant + rough chained timing (tunnel
            # caveat: per-shape microbenches inflate ~100us/iter; compare
            # VARIANTS against each other, trust the decode loop for truth)
            p8 = pack_interleaved(w4)
            v3 = jnp.transpose(
                jnp.asarray(p8).reshape(k // 2, n // 512, 512), (1, 0, 2))
            o = int4_native_matmul(xj, v3, sj)
            np.testing.assert_allclose(np.asarray(o, np.float32), ref,
                                       rtol=0.05, atol=0.08)
            print("chunk-major bitcast-int4 ok")

            from uniaudio2_tpu.ops import quant as q
            vq = q.chunk_major(q.quantize4(jnp.asarray(
                w4.astype(np.float32) * scale)))

            def chain(fn, xx):
                for _ in range(50):
                    xx = fn(xx)[:, :k]
                return xx

            # weights as jit ARGS (never closed over — CLAUDE.md rule)
            for name, fn in [
                ("bitcast-i4",
                 lambda xx, w, ss: int4_native_matmul(xx, w, ss)),
                ("shiftchain", lambda xx, w, ss: q.matmul(xx, w)),
            ]:
                def chain_w(xx, w, ss, fn=fn):
                    for _ in range(50):
                        xx = fn(xx, w, ss)[:, :k]
                    return xx

                g = jax.jit(chain_w)
                wop = v3 if name == "bitcast-i4" else vq
                o = g(xj, wop, sj); np.asarray(o)
                t0 = time.perf_counter()
                o = g(xj, wop, sj); np.asarray(o)
                dt = (time.perf_counter() - t0) / 50
                gbs = (k * n / 2) / dt / 1e9
                print(f"{name}: chained 50x {dt*1e6:.1f} us/call "
                      f"~{gbs:.0f} GB/s(int4 bytes)")
    print("OK")


if __name__ == "__main__":
    main()
