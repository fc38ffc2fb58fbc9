"""Observability & numerical tripwires (SURVEY.md §5 aux subsystems).

Covers, TPU-natively, what the reference scatters around:

* NaN/Inf tripwires (`AudioDiffusion1D.py:48-59` `_chk/_safe`) ->
  ``check_finite`` (host) and ``assert_finite`` (in-graph, works under jit
  via ``equation_checkify``-free debug callback), plus ``enable_nan_debug``
  flipping jax's global debug_nans mode;
* deterministic seeding (`train_utils.py:30-51` `seed_everything`) ->
  ``seed_everything`` (python/numpy + a root JAX key; JAX kernels are
  deterministic by construction);
* profiling (absent in the reference beyond tqdm timers) ->
  ``profile_trace`` context manager around `jax.profiler` and a
  ``block_timer`` for honest device timings.
"""

from __future__ import annotations

import contextlib
import logging
import random
import time
from typing import Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp


def check_finite(x, name: str = "tensor") -> None:
    """Host-side NaN/Inf tripwire; raises with stats like the reference's
    `_chk`."""
    arr = np.asarray(x)
    if not np.issubdtype(arr.dtype, np.floating):
        return
    bad = ~np.isfinite(arr)
    if bad.any():
        finite = np.nan_to_num(arr, nan=0.0, posinf=0.0, neginf=0.0)
        raise FloatingPointError(
            f"[NaN DETECT] {name}: shape={arr.shape} bad={int(bad.sum())} "
            f"min={finite.min():.3e} max={finite.max():.3e}"
        )


def assert_finite(x: jax.Array, name: str = "tensor") -> jax.Array:
    """In-graph tripwire: emits a debug callback that raises on non-finite
    values. Identity on the value so it can be threaded into any graph."""

    def cb(a):
        check_finite(a, name)

    jax.debug.callback(cb, x)
    return x


def enable_nan_debug(enable: bool = True) -> None:
    """Global jit-level NaN checking (every primitive output is scanned —
    slow; debugging only)."""
    jax.config.update("jax_debug_nans", enable)


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass
    return jax.random.PRNGKey(seed)


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace window (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def block_timer(name: str, *outputs) -> Iterator[None]:
    """Wall-clock timer that blocks on device results for honest numbers."""
    t0 = time.perf_counter()
    yield
    for o in outputs:
        jax.block_until_ready(o)
    logging.info("[timer] %s: %.3f s", name, time.perf_counter() - t0)
