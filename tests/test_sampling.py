"""Sampling kernels: distribution correctness of the top-k Gumbel path
(mirrors the reference's inline self-test, `llm_utils/sampling.py:156-174`)."""

import numpy as np
import jax
import jax.numpy as jnp

from uniaudio2_tpu.ops.sampling import sample_topk, sample_topp


def _empirical(fn, n=4000):
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    toks = jax.vmap(fn)(keys)
    return np.bincount(np.asarray(toks), minlength=16) / n


def test_sample_topk_distribution():
    vocab, k, temp = 16, 4, 0.8
    logits = jnp.asarray(np.linspace(0.0, 3.0, vocab), jnp.float32)
    freq = _empirical(lambda key: sample_topk(key, logits, k, temp))
    scaled = np.asarray(logits, np.float64) / temp
    top = np.argsort(scaled)[-k:]
    p = np.zeros(vocab)
    p[top] = np.exp(scaled[top] - scaled[top].max())
    p /= p.sum()
    assert freq[: vocab - k].sum() == 0.0  # below-k never sampled
    np.testing.assert_allclose(freq, p, atol=0.03)


def test_sample_topk_forbid_prefix():
    vocab = 16
    logits = jnp.zeros((vocab,), jnp.float32)
    freq = _empirical(
        lambda key: sample_topk(key, logits, 12, 1.0,
                                forbid_prefix=jnp.int32(8)),
        n=800,
    )
    assert freq[:8].sum() == 0.0
    assert freq[8:].sum() > 0.99


def test_sample_topk_greedy_and_full():
    logits = jnp.asarray([0.1, 2.0, -1.0, 0.5], jnp.float32)
    assert int(sample_topk(jax.random.PRNGKey(0), logits, 1, 1.0)) == 1
    # topk >= vocab degenerates to full sampling; argmax token dominates at
    # low temperature
    tok = sample_topk(jax.random.PRNGKey(1), logits, 10, 0.05)
    assert int(tok) == 1


def test_sample_topk_batched_rows():
    logits = jnp.stack([
        jnp.asarray([10.0, 0.0, 0.0, 0.0], jnp.float32),
        jnp.asarray([0.0, 0.0, 0.0, 10.0], jnp.float32),
    ])
    toks = sample_topk(jax.random.PRNGKey(2), logits, 2, 0.1)
    assert toks.shape == (2,)
    assert int(toks[0]) == 0 and int(toks[1]) == 3


def test_sample_topp_nucleus():
    logits = jnp.asarray([5.0, 4.0, -10.0, -10.0], jnp.float32)
    freq = _empirical(
        lambda key: sample_topp(key, logits, 0.9, 1.0), n=800
    )
    assert freq[2:4].sum() == 0.0


def test_sample_topk_approx_distribution():
    """approx=True (the r3 serving default) must match the exact top-k
    sampling distribution. On CPU `lax.approx_max_k` lowers to an exact
    fallback, so this validates the code path and the distribution shape;
    on TPU the recall-0.95 aggregate maximally shifts total variation by
    ~1e-3 at serving temperatures (opt-out: DecodeEngine(approx_topk=
    False))."""
    vocab, k, temp = 16, 4, 0.8
    logits = jnp.asarray(np.linspace(0.0, 3.0, vocab), jnp.float32)
    freq = _empirical(lambda key: sample_topk(key, logits, k, temp,
                                              approx=True))
    scaled = np.asarray(logits, np.float64) / temp
    top = np.argsort(scaled)[-k:]
    p = np.zeros(vocab)
    p[top] = np.exp(scaled[top] - scaled[top].max())
    p /= p.sum()
    assert freq[: vocab - k].sum() == 0.0
    np.testing.assert_allclose(freq, p, atol=0.03)

    # greedy is unaffected by the approx flag (argmax path)
    ids = sample_topk(jax.random.PRNGKey(0), logits, 1, temp, approx=True)
    assert int(ids) == vocab - 1


def test_sample_topk_distribution_rbg_impl():
    """Serving entry points switch the global PRNG to the hardware `rbg`
    generator (`utils/prng.configure_serving_prng`); the top-k Gumbel
    sampler must stay distribution-correct under rbg keys (they are
    (4,)-shaped raw keys — the (B, ...) per-row logic is shape-agnostic)."""
    vocab, k, temp = 16, 4, 0.8
    logits = jnp.asarray(np.linspace(0.0, 3.0, vocab), jnp.float32)
    n = 4000
    prev = jax.config.jax_default_prng_impl
    try:
        jax.config.update("jax_default_prng_impl", "rbg")
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        assert keys.shape == (n, 4)
        toks = jax.vmap(
            lambda key: sample_topk(key, logits, k, temp))(keys)
    finally:
        jax.config.update("jax_default_prng_impl", prev)
    freq = np.bincount(np.asarray(toks), minlength=vocab) / n
    scaled = np.asarray(logits, np.float64) / temp
    top = np.argsort(scaled)[-k:]
    p = np.zeros(vocab)
    p[top] = np.exp(scaled[top] - scaled[top].max())
    p /= p.sum()
    assert freq[: vocab - k].sum() == 0.0
    np.testing.assert_allclose(freq, p, atol=0.03)


def test_configure_serving_prng_env_override(monkeypatch):
    from uniaudio2_tpu.utils.prng import configure_serving_prng

    monkeypatch.setenv("UA2_PRNG_IMPL", "threefry2x32")
    prev = jax.config.jax_default_prng_impl
    try:
        assert configure_serving_prng() == "threefry2x32"
        assert jax.random.PRNGKey(0).shape == (2,)
    finally:
        jax.config.update("jax_default_prng_impl", prev)
