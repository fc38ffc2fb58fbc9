"""Full-scale multi-chip SERVING compile check (VERDICT r3 item 8).

`docs/multichip_compile_r3.md` covered the sharded TRAIN step only; this
AOT-compiles the sharded GENERATION program — the real serving topology
(28L/3072 backbone + experts + 4L/2048 local decoder, int4-quantized
weights, real bucket+frames KV caches, tp-sharded kv groups, auto
attn_block) — from abstract (ShapeDtypeStruct) inputs on a virtual
N-device CPU mesh. No weights are materialised and nothing executes;
exit 0 = the full-scale SPMD serving program compiles. Prints compile
time, per-device memory analysis, and the collective-op census.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/check_serving_compile.py [--devices 8] \
        [--mesh 1x4x2] [--frames 500] [--batch 1] [--quant int4all]

Committed results: docs/multichip_compile_r4.md. Reference match:
multi-chip serving is a sanctioned TPU-native addition (the reference
serves strictly single-GPU, `multi_task_inference.py`).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--mesh", type=str, default=None,
                   help="RxFxT replica/fsdp/tp (default 1x4x2 at 8)")
    p.add_argument("--bucket", type=int, default=64)
    p.add_argument("--frames", type=int, default=500)
    p.add_argument("--batch", type=int, default=1,
                   help="rows for the batched program (1 = single path)")
    p.add_argument("--quant", default="int4all",
                   choices=("0", "int8", "int4all"))
    p.add_argument("--mode", default="audio", choices=("audio", "text"))
    args = p.parse_args(argv)

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.engine import decode as dec
    from uniaudio2_tpu.models import unified
    from uniaudio2_tpu.parallel import mesh as meshlib

    n = args.devices
    if args.mesh:
        replica, fsdp, tp = (int(x) for x in args.mesh.split("x"))
        assert replica * fsdp * tp == n
    else:
        tp = 2 if n % 2 == 0 else 1
        fsdp = n // tp
        replica = 1
    m = meshlib.build_mesh(replica=replica, fsdp=fsdp, tp=tp)
    print(f"mesh: replica={replica} fsdp={fsdp} tp={tp} "
          f"({n} virtual CPU devices)")

    cfg = UnifiedModelConfig()           # FULL scale
    use_tp = tp > 1

    def make_params(key):
        params = unified.init_params(key, cfg, dtype=jnp.bfloat16)
        if args.quant != "0":
            from uniaudio2_tpu.ops.quant import quantize_unified_params

            int4 = ("backbone", "decoder", "understanding_expert",
                    "generation_expert", "audio_head", "projection_w") \
                if args.quant == "int4all" else ()
            params = quantize_unified_params(params, int4_modules=int4)
            params = unified.prepare_serving_params(params, cfg=cfg)
        return params

    t0 = time.time()
    abs_params = jax.eval_shape(make_params, jax.random.PRNGKey(0))
    specs = meshlib.fit_specs_to_mesh(
        meshlib.unified_param_specs(abs_params, use_tp=use_tp),
        abs_params, m)
    abs_params = jax.tree_util.tree_map(
        lambda a, s: jax.ShapeDtypeStruct(
            a.shape, a.dtype, sharding=NamedSharding(m, s)),
        abs_params, specs)
    print(f"abstract serving params built in {time.time() - t0:.1f}s "
          f"(quant={args.quant})")

    cache_lists = isinstance(abs_params["backbone"]["layers"], list)
    cache_sharding = {
        5: NamedSharding(m, P(None, None, "tp" if use_tp else None)),
        4: NamedSharding(m, P(None, "tp" if use_tp else None)),
    }
    build = dict(
        cfg=cfg, mode=args.mode, bucket=args.bucket,
        max_frames=args.frames, temperature=0.9, topk=50,
        use_cfg=False, cache_dtype=jnp.bfloat16,
        cache_sharding=cache_sharding, approx_topk=True,
        cache_lists=cache_lists, attn_block=-1,
    )
    if args.batch > 1:
        fn = dec._build_generate_batched(n_rows=args.batch, **build)
        par = cfg.tokens.parallel_number
        abs_in = (
            abs_params,
            jax.ShapeDtypeStruct((args.batch, args.bucket, par), jnp.int32),
            jax.ShapeDtypeStruct((args.batch, args.bucket, par), bool),
            jax.ShapeDtypeStruct((args.batch,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.uint32),
            jax.ShapeDtypeStruct((), jnp.float32),
        )
    else:
        fn = dec._build_generate(**build)
        par = cfg.tokens.parallel_number
        abs_in = (
            abs_params,
            jax.ShapeDtypeStruct((1, args.bucket, par), jnp.int32),
            jax.ShapeDtypeStruct((1, args.bucket, par), bool),
            jax.ShapeDtypeStruct((), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.uint32),
            jax.ShapeDtypeStruct((), jnp.float32),
        )

    t0 = time.time()
    lowered = jax.jit(fn).lower(*abs_in)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print(f"lower {t1 - t0:.1f}s, compile {t2 - t1:.1f}s")

    def shard_bytes(a):
        shp = a.sharding.shard_shape(a.shape) \
            if getattr(a, "sharding", None) else a.shape
        total = a.dtype.itemsize
        for d in shp:
            total *= d
        return total

    pbytes = sum(shard_bytes(a)
                 for a in jax.tree_util.tree_leaves(abs_params))
    print(f"serving params (sharded): {pbytes / 2**30:.3f} GiB/device")

    try:
        mem = compiled.memory_analysis()
        for name in ("argument_size_in_bytes", "output_size_in_bytes",
                     "temp_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, name, None)
            if v is not None:
                print(f"memory_analysis.{name}: {v / 2**30:.3f} GiB")
    except Exception as e:
        print(f"memory_analysis unavailable on this backend: {e!r}")

    txt = compiled.as_text()
    counts = {op: txt.count(op) for op in
              ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all")}
    print(f"compiled HLO: {len(txt.splitlines())} lines, collectives: "
          + ", ".join(f"{k}={v}" for k, v in counts.items()))
    print("FULL-SCALE SHARDED SERVING COMPILE OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
