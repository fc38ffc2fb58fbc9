"""Serving-time PRNG implementation selection.

JAX's default ``threefry2x32`` PRNG is cross-version/cross-backend stable
but compute-heavy on TPU: each small draw (the decode loop makes ~6 k-wide
Gumbel draws per frame) pays a fixed ~24 µs of counter-hash work —
0.15 ms/frame of the serving hot loop (docs/profile_decode_r3.md).
``rbg`` uses the hardware RngBitGenerator instead (measured +1% end-to-end
decode throughput).

Trade-off: rbg streams are NOT guaranteed identical across JAX versions or
backends, so it is enabled only at the SERVING entry points (bench, CLI,
HTTP server) — library code and training never touch the global config.
Within one process, same request + seed still yields the same tokens (the
per-request reproducibility tests hold under either impl), and greedy
decoding is unaffected. ``UA2_PRNG_IMPL=threefry2x32`` restores the
stable-stream default.

Reference: seeding semantics of `multi_task_inference.py:162` (seed 888);
the reference's exponential-race sampler has the same per-process-only
reproducibility property under torch CUDA RNG.
"""

from __future__ import annotations

import os


def configure_serving_prng() -> str:
    """Set the process-global default PRNG impl for a serving entry point.
    Returns the impl chosen. Call BEFORE creating any keys."""
    import jax

    impl = os.environ.get("UA2_PRNG_IMPL", "rbg")
    jax.config.update("jax_default_prng_impl", impl)
    return impl
