"""RVQ EMA codebook training (VERDICT r2 item 6).

Semantics under test = vector-quantize-pytorch's EuclideanCodebook EMA
(decay/Laplace smoothing/dead-code refresh) as configured by the reference
(`AudioDiffusion1D.py:256-264`). The two-step fixture is computed by hand
in numpy right here — not against the package — so the test pins OUR
documented semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from uniaudio2_tpu.codec import rvq
from uniaudio2_tpu.train import rvq_ema


def _manual_ema(cluster, avg, counts, sums, decay, eps):
    cluster = decay * cluster + (1 - decay) * counts
    avg = decay * avg + (1 - decay) * sums
    total = cluster.sum()
    smoothed = (cluster + eps) / (total + cluster.shape[0] * eps) * total
    return cluster, avg, avg / smoothed[:, None]


def test_two_step_fixture_matches_hand_computation():
    decay, eps = 0.9, 1e-5
    books = jnp.asarray([[[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]]])  # (1,3,2)
    state = rvq_ema.init_state(books)
    np.testing.assert_allclose(np.asarray(state.cluster_size), 0.0)
    np.testing.assert_allclose(np.asarray(state.embed_avg),
                               np.asarray(books))

    # step 1: two vectors land on code 0, one on code 1
    counts1 = jnp.asarray([[2.0, 1.0, 0.0]])
    sums1 = jnp.asarray([[[1.8, 0.2], [0.1, 0.9], [0.0, 0.0]]])
    st1, books1 = rvq_ema.ema_update(
        state, rvq_ema.RvqStats(counts1, sums1, jnp.zeros((4, 2))), books,
        decay=decay, eps=eps, key=None)
    c_exp, a_exp, b_exp = _manual_ema(
        np.zeros(3), np.asarray(books)[0], np.asarray(counts1)[0],
        np.asarray(sums1)[0], decay, eps)
    np.testing.assert_allclose(np.asarray(st1.cluster_size)[0], c_exp,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st1.embed_avg)[0], a_exp,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(books1)[0], b_exp, rtol=1e-5)

    # step 2 chains the EMA state
    counts2 = jnp.asarray([[0.0, 3.0, 1.0]])
    sums2 = jnp.asarray([[[0.0, 0.0], [0.3, 2.7], [-0.5, -0.5]]])
    st2, books2 = rvq_ema.ema_update(
        st1, rvq_ema.RvqStats(counts2, sums2, jnp.zeros((4, 2))), books1,
        decay=decay, eps=eps, key=None)
    c_exp, a_exp, b_exp = _manual_ema(
        c_exp, a_exp, np.asarray(counts2)[0], np.asarray(sums2)[0],
        decay, eps)
    np.testing.assert_allclose(np.asarray(st2.cluster_size)[0], c_exp,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(books2)[0], b_exp, rtol=1e-5)


def test_dead_code_refresh():
    books = jnp.asarray([[[5.0, 5.0], [0.0, 1.0]]])   # code 0 never chosen
    state = rvq_ema.init_state(books)
    counts = jnp.asarray([[0.0, 40.0]])
    sums = jnp.asarray([[[0.0, 0.0], [0.0, 40.0]]])
    pool = jnp.asarray([[0.5, -0.5], [0.25, 0.75]])
    st, new_books = rvq_ema.ema_update(
        state, rvq_ema.RvqStats(counts, sums, pool), books,
        key=jax.random.PRNGKey(0))
    # dead code 0 (EMA count 4 < ... wait: 0.9*0 + 0.1*0 = 0 < 2) resampled
    assert float(st.cluster_size[0, 0]) == rvq_ema.DEAD_CODE_THRESHOLD
    got = np.asarray(new_books)[0, 0]
    assert any(np.allclose(got, p) for p in np.asarray(pool))
    # live code 1 follows the EMA mean, not the pool
    assert float(st.cluster_size[0, 1]) > 2.0


def test_encode_with_stats_matches_encode():
    key = jax.random.PRNGKey(1)
    params = rvq.init_params(key, dim=8, codebook_size=16, codebook_dim=4,
                             num_quantizers=3)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 8))
    idx_ref, q_ref = rvq.encode(params, x)
    idx, q, stats = rvq_ema.encode_with_stats(params, x)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), rtol=1e-6)
    # counts total the number of frames per quantizer
    np.testing.assert_allclose(np.asarray(stats.counts).sum(axis=-1), 20.0)
    # sums aggregate the residual inputs: quantizer 0's sum over all codes
    # equals the projected input sum
    z = x @ params["project_in_w"] + params["project_in_b"]
    np.testing.assert_allclose(
        np.asarray(stats.sums[0].sum(axis=0)),
        np.asarray(z.reshape(-1, 4).sum(axis=0)), rtol=1e-5)


def test_codec_finetune_step_moves_codebooks_and_encoder():
    """One jitted train step: encoder trains by gradient (commitment loss),
    codebooks train by EMA through optax.multi_transform — both move."""
    kp = jax.random.PRNGKey(3)
    params = {
        "encoder_w": jax.random.normal(kp, (6, 8)) * 0.5,
        "rvq": rvq.init_params(jax.random.PRNGKey(4), dim=8,
                               codebook_size=12, codebook_dim=4,
                               num_quantizers=2),
    }

    grad_tx = optax.sgd(1e-2)
    ema_tx = rvq_ema.codebook_ema()

    def split(p):
        books = {"codebooks": p["rvq"]["codebooks"]}
        rest = {"encoder_w": p["encoder_w"],
                "rvq": {k: v for k, v in p["rvq"].items()
                        if k != "codebooks"}}
        return books, rest

    books0, rest0 = split(params)
    opt_state = (grad_tx.init(rest0), ema_tx.init(books0))

    feats = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 6))

    @jax.jit
    def train_step(params, opt_state, key):
        def loss_fn(p):
            h = feats @ p["encoder_w"]
            idx, q, stats = rvq_ema.encode_with_stats(p["rvq"], h)
            commit = ((h - jax.lax.stop_gradient(q)) ** 2).mean()
            return commit, stats

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        books, rest = split(params)
        gbooks, grest = split(grads)
        grad_state, ema_state = opt_state
        up_rest, grad_state = grad_tx.update(grest, grad_state, rest)
        up_books, ema_state = ema_tx.update(
            gbooks, ema_state, books,
            rvq_stats={"codebooks": stats}, rvq_key=key)
        rest = optax.apply_updates(rest, up_rest)
        books = optax.apply_updates(books, up_books)
        new_params = {"encoder_w": rest["encoder_w"],
                      "rvq": dict(rest["rvq"],
                                  codebooks=books["codebooks"])}
        return new_params, (grad_state, ema_state), loss

    p0 = jax.tree_util.tree_map(np.asarray, params)
    p1, opt_state, loss1 = train_step(params, opt_state, jax.random.PRNGKey(6))
    p2, _, loss2 = train_step(p1, opt_state, jax.random.PRNGKey(7))

    assert not np.allclose(p0["encoder_w"], np.asarray(p2["encoder_w"])), \
        "encoder must receive gradients"
    assert not np.allclose(p0["rvq"]["codebooks"],
                           np.asarray(p2["rvq"]["codebooks"])), \
        "codebooks must move under EMA"
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
