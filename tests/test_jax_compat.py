"""Regression test for the jax 0.9.0 C++-pjit fastpath guard
(`utils/jax_compat.py`).

Distilled failure (pre-guard): running one jitted train step, then building
a SECOND, structurally similar train step in the same process, crashes the
second step's *second* invocation with

    INVALID_ARGUMENT: Execution supplied N buffers but compiled program
    expected N+k buffers

because jax's linearization machinery leaks dead tracers that the second
trace picks up as jaxpr constants; ``_trace_for_jit`` then hoists ALL
constants into the argument list, and the cached C++ fastpath replays the
executable without them.  This surfaced as a test-ORDERING failure between
``test_lean_opt`` and ``test_training`` (each green alone, red together in
one process).
"""

import numpy as np

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.train import schedule, trainer
from uniaudio2_tpu.utils import jax_compat


def test_guard_installed():
    assert jax_compat._installed
    if jax.__version__.startswith("0.9."):
        from jax._src import pjit as _pjit

        assert hasattr(_pjit._run_python_pjit, "_ua2_orig")


def _make_batch(cfg, b, s, seed):
    par = cfg.tokens.parallel_number
    ncb = cfg.tokens.num_codebooks
    rng = np.random.default_rng(seed)
    grid = rng.integers(0, 50, size=(b, s + 1, par)).astype(np.int32)
    gmask = np.zeros((b, s + 1, par), bool)
    gmask[:, : s // 2, -1] = True
    gmask[:, s // 2 :, :ncb] = True
    tmask = np.zeros((b, s), bool)
    tmask[:, 1 : s // 2] = True
    amask = np.zeros((b, s), bool)
    amask[:, s // 2 : s - 1] = True
    return trainer.Batch(
        grid=jnp.asarray(grid),
        grid_mask=jnp.asarray(gmask),
        text_loss_mask=jnp.asarray(tmask),
        audio_loss_mask=jnp.asarray(amask),
    )


def test_two_sequential_train_steps_same_process():
    """Two distinct train-step jits over the same model must both run for
    several iterations (the pre-guard crash hit phase 2, iteration 1)."""
    cfg = UnifiedModelConfig.tiny()
    for phase, (prefix_lm, seed) in enumerate([(False, 0), (True, 1)]):
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        tx = trainer.make_optimizer(schedule.warmup_lr(2e-3, 10), grad_clip=1.0)
        state = trainer.init_train_state(params, tx)
        step = jax.jit(trainer.build_train_step(cfg, tx, prefix_lm=prefix_lm))
        batch = _make_batch(cfg, 2, 16, seed)
        for _ in range(3):
            state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"])), f"phase {phase}"
