"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

The environment pins ``JAX_PLATFORMS=axon`` (a remote-TPU tunnel) and a
sitecustomize hook registers that backend at interpreter start, so a
``setdefault`` is not enough — force the platform via both the env var and
the jax config (the config wins even after the axon backend is registered).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# JAX's default matmul precision is reduced (bfloat16-class inputs) even for
# float32 arrays; parity tests compare against torch fp32, so force full
# precision for the test suite. Production TPU code runs bf16 params anyway.
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Serving entry points (bench, CLI, HTTP server) switch the process-global
# default PRNG impl to the rbg hardware generator
# (`utils/prng.configure_serving_prng`); tests that drive them in-process
# must not leak that global into later tests (threefry key shapes/streams).
import pytest


@pytest.fixture(autouse=True)
def _restore_default_prng_impl():
    prev = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != prev:
        jax.config.update("jax_default_prng_impl", prev)
