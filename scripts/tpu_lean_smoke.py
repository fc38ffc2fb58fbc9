"""Standalone TPU smoke for the fused lean-update Pallas kernel.

Wedge protocol (verify skill / CLAUDE.md): interpret-mode tests pass on
CPU (`test_lean_opt.py`), VMEM is hand-budgeted (~7 MB/block at the
262144-element tile cap), and THIS script compiles+runs the kernel on a
handful of real leaf geometries in its own process before any full bench
touches it. Prints one JSON line per shape with the max |fused - xla|
relative error.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from uniaudio2_tpu.train import lean_opt

SHAPES = [
    (3072, 5120),      # backbone qkv
    (8192, 3072),      # mlp proj (large K)
    (2048, 8192),      # decoder fc
    (4, 1024, 256),    # rank-3 leaf
]


def run_shape(shape):
    key = jax.random.PRNGKey(sum(shape))
    kp, kg = jax.random.split(key)
    p = {"w": jax.random.normal(kp, shape, jnp.float32) * 0.02}
    g = {"w": jax.random.normal(kg, shape, jnp.float32) * 0.01}

    outs = {}
    for mode in ("off", "on"):
        tx = lean_opt.adamw_lean(1e-3, weight_decay=0.01, fused=mode)
        st = jax.jit(tx.init)(p)
        upd, st2 = jax.jit(tx.update)(g, st, p)
        outs[mode] = (np.asarray(upd["w"]),
                      np.asarray(st2.leaves["w"].m_q),
                      np.asarray(st2.leaves["w"].m_scale))
    du = np.max(np.abs(outs["on"][0] - outs["off"][0]))
    su = np.max(np.abs(outs["off"][0]))
    dq = np.max(np.abs(outs["on"][1].astype(np.int32)
                       - outs["off"][1].astype(np.int32)))
    ds = np.max(np.abs(outs["on"][2] - outs["off"][2]))
    print(json.dumps({
        "shape": list(shape),
        "upd_max_rel_err": float(du / (su + 1e-30)),
        "m_q_max_int_diff": int(dq),
        "m_scale_max_diff": float(ds),
    }), flush=True)


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "devices": len(jax.devices())}), flush=True)
    for shape in SHAPES:
        run_shape(shape)


if __name__ == "__main__":
    main()
