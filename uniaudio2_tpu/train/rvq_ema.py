"""EMA codebook updates for RVQ codec training (gradient-free, optax-wired).

The reference trains its four ResidualVQ modules through
``vector-quantize-pytorch`` (`AudioDiffusion1D.py:256-264`: decay 0.9,
commitment_weight 1, threshold_ema_dead_code 2, codebook_dim 32): the
*encoder* learns from the commitment/feature losses while the *codebooks*
are not gradient-trained at all — each forward EMA-accumulates per-code
assignment counts (``cluster_size``) and assigned-vector sums
(``embed_avg``), then rewrites each code as the Laplace-smoothed mean of
its assigned vectors, replacing dead codes with random batch samples.
Without this, TPU codec fine-tuning would train encoders against frozen,
never-adapting codebooks.

JAX shape of the same algorithm:

* `encode_with_stats` — the `codec/rvq.py` encode scan, additionally
  emitting per-quantizer assignment counts (Q, K) and assigned-residual
  sums (Q, K, d) (the sufficient statistics of the EMA update; computed in
  the projected codebook space on each quantizer's *residual* input,
  exactly where vector-quantize-pytorch computes them).
* `ema_update` — pure function: (state, stats) -> (state', codebooks').
* `codebook_ema` — an `optax.GradientTransformationExtraArgs`: zeroes the
  gradient update on the ``codebooks`` leaf and substitutes the EMA
  rewrite (passed the stats via ``update(..., rvq_stats=...)``), so one
  `optax.chain`/`multi_transform` drives encoder grads and codebook EMA in
  the same train step.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

Params = Dict[str, Any]

DECAY = 0.9             # AudioDiffusion1D.py:256-264
EPS = 1e-5
DEAD_CODE_THRESHOLD = 2.0


class EmaState(NamedTuple):
    cluster_size: jax.Array   # (Q, K) f32 — EMA of assignment counts
    embed_avg: jax.Array      # (Q, K, d) f32 — EMA of assigned-vector sums


class RvqStats(NamedTuple):
    counts: jax.Array         # (Q, K) f32 — this batch's assignment counts
    sums: jax.Array           # (Q, K, d) f32 — this batch's assigned sums
    samples: jax.Array        # (S, d) — projected inputs (dead-code refresh)


def init_state(codebooks: jax.Array) -> EmaState:
    """vector-quantize-pytorch inits ``cluster_size`` to zeros and
    ``embed_avg`` to a copy of the codebook."""
    q, k, d = codebooks.shape
    return EmaState(
        cluster_size=jnp.zeros((q, k), jnp.float32),
        embed_avg=codebooks.astype(jnp.float32),
    )


def encode_with_stats(
    params: Params, x: jax.Array, *, n_samples: int = 64,
) -> Tuple[jax.Array, jax.Array, RvqStats]:
    """`codec/rvq.py::encode` plus the EMA sufficient statistics.

    Args:
        x: (B, T, dim) features.
    Returns:
        (indices (B, T, Q), quantized (B, T, dim), stats). ``samples`` is
        the first ``n_samples`` projected frames (dead-code replacement
        pool).
    """
    z = x @ params["project_in_w"] + params["project_in_b"]
    k = params["codebooks"].shape[1]
    flat_len = 1
    for s in z.shape[:-1]:
        flat_len *= s

    def step(residual, codebook):
        dots = jnp.einsum(
            "...td,kd->...tk", residual, codebook,
            preferred_element_type=jnp.float32,
        )
        sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)
        idx = jnp.argmin(sq - 2.0 * dots, axis=-1)
        chosen = jnp.take(codebook, idx, axis=0)
        onehot = jax.nn.one_hot(idx, k, dtype=jnp.float32)   # (..., T, K)
        counts = onehot.reshape(flat_len, k).sum(axis=0)     # (K,)
        sums = jnp.einsum(
            "nk,nd->kd", onehot.reshape(flat_len, k),
            residual.reshape(flat_len, -1).astype(jnp.float32),
        )
        return residual - chosen, (idx.astype(jnp.int32), chosen,
                                   counts, sums)

    _, (indices, chosen, counts, sums) = jax.lax.scan(
        step, z, params["codebooks"])
    indices = jnp.moveaxis(indices, 0, -1)
    quantized_cb = jnp.moveaxis(chosen, 0, -2).sum(-2)
    quantized = quantized_cb @ params["project_out_w"] + params["project_out_b"]
    d = z.shape[-1]
    pool = z.reshape(-1, d)
    n = min(n_samples, pool.shape[0])
    samples = pool[:n].astype(jnp.float32)
    return indices, quantized, RvqStats(counts, sums, samples)


def ema_update(
    state: EmaState,
    stats: RvqStats,
    codebooks: jax.Array,
    *,
    decay: float = DECAY,
    eps: float = EPS,
    dead_threshold: float = DEAD_CODE_THRESHOLD,
    key: Optional[jax.Array] = None,
) -> Tuple[EmaState, jax.Array]:
    """One EMA step (vector-quantize-pytorch EuclideanCodebook semantics):

        cluster_size <- decay * cluster_size + (1 - decay) * counts
        embed_avg    <- decay * embed_avg    + (1 - decay) * sums
        smoothed     = (cluster_size + eps) / (sum + K * eps) * sum
        codebook     = embed_avg / smoothed[:, None]

    Dead codes (EMA count < ``dead_threshold``) are re-seeded from the
    batch sample pool when ``key`` is given (count reset to the threshold,
    matching the package's ``reset_cluster_size``); with ``key=None`` the
    expiry pass is skipped (deterministic unit tests).
    """
    q, k, d = codebooks.shape
    cluster = decay * state.cluster_size + (1.0 - decay) * stats.counts
    avg = decay * state.embed_avg + (1.0 - decay) * stats.sums
    total = cluster.sum(axis=-1, keepdims=True)               # (Q, 1)
    smoothed = (cluster + eps) / (total + k * eps) * total
    new_books = avg / smoothed[..., None]

    if key is not None:
        n_pool = stats.samples.shape[0]
        pick = jax.random.randint(key, (q, k), 0, max(n_pool, 1))
        fresh = jnp.take(stats.samples, pick, axis=0)         # (Q, K, d)
        dead = cluster < dead_threshold                       # (Q, K)
        new_books = jnp.where(dead[..., None], fresh, new_books)
        avg = jnp.where(dead[..., None], fresh * dead_threshold, avg)
        cluster = jnp.where(dead, jnp.float32(dead_threshold), cluster)

    return (EmaState(cluster, avg),
            new_books.astype(codebooks.dtype))


class CodebookEmaState(NamedTuple):
    ema: Any     # pytree of EmaState mirroring the codebook leaves


def codebook_ema(
    *,
    decay: float = DECAY,
    eps: float = EPS,
    dead_threshold: float = DEAD_CODE_THRESHOLD,
) -> optax.GradientTransformationExtraArgs:
    """Optax transform for RVQ ``codebooks`` leaves: ignores their
    gradients and emits the EMA rewrite as the update instead.

    The transform's param tree must contain exactly the codebook arrays
    (partition the model params in the train step — `optax.multi_transform`
    does not work here because its MaskedNode placeholders break the
    parallel ``rvq_stats`` tree). Stats arrive per step via
    ``update(grads, state, params, rvq_stats=..., rvq_key=...)`` where
    ``rvq_stats`` carries one `RvqStats` per codebook array, same tree
    structure (and ``rvq_key`` an optional PRNG key for dead-code refresh).
    """

    def init_fn(params):
        return CodebookEmaState(
            ema=jax.tree_util.tree_map(
                init_state, params,
                is_leaf=lambda a: isinstance(a, jnp.ndarray)),
        )

    def update_fn(updates, state, params=None, *, rvq_stats=None,
                  rvq_key=None, **extra):
        del extra
        assert params is not None and rvq_stats is not None, (
            "codebook_ema needs params and rvq_stats=")
        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_s = treedef.flatten_up_to(rvq_stats)
        flat_e = treedef.flatten_up_to(state.ema)
        keys = (jax.random.split(rvq_key, len(flat_p))
                if rvq_key is not None else [None] * len(flat_p))
        new_e, deltas = [], []
        for p, st, em, kk in zip(flat_p, flat_s, flat_e, keys):
            em2, books = ema_update(
                em, st, p, decay=decay, eps=eps,
                dead_threshold=dead_threshold, key=kk)
            new_e.append(em2)
            deltas.append((books - p).astype(p.dtype))
        return (jax.tree_util.tree_unflatten(treedef, deltas),
                CodebookEmaState(
                    ema=jax.tree_util.tree_unflatten(treedef, new_e)))

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)
