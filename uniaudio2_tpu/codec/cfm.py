"""Conditional flow matching: Euler solver + training loss.

Same math as the reference `BASECFM` (`/root/reference/tools/tokenizer/
ReasoningCodec_film/models/AudioDiffusion1D.py:62-167`):

* ``solve_euler`` — fixed-step Euler ODE integration from noise (t=0) to
  data (t=1). Before every step the in-context prefix of ``x`` is re-noised
  onto the straight-line path ``(1-(1-σ)t)·z + t·x_ctx`` (`:106`), and with
  guidance > 1 the estimator runs a batch-doubled CFG pass where the
  unconditioned row zeroes the condition channels (`:107-117`).
* ``loss`` — masked-MSE flow-matching loss with in-context down-weighting
  (`:131-167`): weight 1 where mask==2 (generate), 0.01 where mask==0,
  0 where mask==1 (in-context frames are clamped, not learned).

TPU design: the step loop is a ``lax.scan`` over the (static) step count —
one compiled program for the whole solve; the CFG batch-doubling happens
inside the scanned body so both branches share one estimator compilation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

SIGMA_MIN = 1e-4

# Estimator signature: (x_cat (B, T, C_in), t (B,)) -> velocity (B, T, C_out)
Estimator = Callable[[jax.Array, jax.Array], jax.Array]


def solve_euler(
    estimator: Estimator,
    *,
    key: jax.Array,
    mu: jax.Array,              # (B, T, C_cond) conditioning features
    incontext_x: jax.Array,     # (B, T, C_lat) in-context latents (zero-padded)
    incontext_mask: jax.Array,  # (B, T) bool — True where in-context
    num_steps: int,
    guidance_scale: float,
    latent_dim: int,
    temperature: float = 1.0,
) -> jax.Array:
    """Returns the solved latents (B, T, C_lat); in-context frames are
    clamped back to ``incontext_x`` at the end (reference `:623`)."""
    b, tl, _ = mu.shape
    # solver state in f32 regardless of (possibly bf16) condition/param dtype
    mu = mu.astype(jnp.float32)
    incontext_x = incontext_x.astype(jnp.float32)
    noise = jax.random.normal(key, (b, tl, latent_dim), jnp.float32) * temperature

    ts = jnp.linspace(0.0, 1.0, num_steps + 1)
    t0, dt_all = ts[:-1], ts[1:] - ts[:-1]
    use_cfg = guidance_scale > 1.0

    def step(x, inp):
        t, dt = inp
        tb = jnp.full((b,), t, mu.dtype)
        # re-noise the in-context prefix onto the conditional path
        path = (1.0 - (1.0 - SIGMA_MIN) * t) * noise + t * incontext_x
        x = jnp.where(incontext_mask[..., None], path, x)
        if use_cfg:
            x2 = jnp.concatenate([x, x], 0)
            ctx2 = jnp.concatenate([incontext_x, incontext_x], 0)
            mu2 = jnp.concatenate([jnp.zeros_like(mu), mu], 0)
            inp_cat = jnp.concatenate([x2, ctx2, mu2], axis=-1)
            v = estimator(inp_cat, jnp.concatenate([tb, tb], 0))
            v_uncond, v_cond = jnp.split(v, 2, axis=0)
            v = v_uncond + guidance_scale * (v_cond - v_uncond)
        else:
            inp_cat = jnp.concatenate([x, incontext_x, mu], axis=-1)
            v = estimator(inp_cat, tb)
        return x + dt * v, None

    x, _ = jax.lax.scan(step, noise, (t0, dt_all))
    return jnp.where(incontext_mask[..., None], incontext_x, x)


def loss(
    estimator: Estimator,
    *,
    key: jax.Array,
    x1: jax.Array,            # (B, T, C_lat) target latents
    mu: jax.Array,            # (B, T, C_cond)
    incontext_x: jax.Array,   # (B, T, C_lat)
    latent_masks: jax.Array,  # (B, T) int: 0 pad / 1 incontext / 2 generate
    validation: bool = False,
) -> jax.Array:
    b = x1.shape[0]
    kt, kz = jax.random.split(key)
    if validation:
        t = jnp.full((b, 1, 1), 0.5, x1.dtype)
    else:
        t = jax.random.uniform(kt, (b, 1, 1), x1.dtype)
    z = jax.random.normal(kz, x1.shape, x1.dtype)
    y = (1.0 - (1.0 - SIGMA_MIN) * t) * z + t * x1
    u = x1 - (1.0 - SIGMA_MIN) * z
    inp = jnp.concatenate([y, incontext_x, mu], axis=-1)
    out = estimator(inp, t[:, 0, 0])
    w = (
        (latent_masks > 1.5).astype(jnp.float32)
        + (latent_masks < 0.5).astype(jnp.float32) * 0.01
    )[..., None]
    w = jnp.broadcast_to(w, out.shape)
    diff = (out.astype(jnp.float32) - u.astype(jnp.float32)) * w
    return (diff ** 2).sum() / jnp.maximum(w.sum(), 1.0)
