"""Chunked (logit-free) CE (`train/chunked_ce.py`): float-level equality of
losses, metrics, and GRADIENTS against the dense logits path, incl. the
full fused unified loss and a train-step integration check."""

import numpy as np

import jax
import jax.numpy as jnp

from uniaudio2_tpu.train import chunked_ce, losses


def _dense_ce(h, w, y, mask):
    logits = (h.astype(jnp.float32) @ w.astype(jnp.float32))
    return losses._masked_ce(logits, y, mask)


def test_masked_ce_matches_dense_nondivisible_vocab():
    n, d, v, chunk = 24, 16, 1000, 256          # 1000 % 256 != 0
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    h = jax.random.normal(k1, (n, d), jnp.float32)
    w = jax.random.normal(k2, (d, v), jnp.float32) * 0.3
    y = jax.random.randint(k3, (n,), 0, v)
    mask = jnp.arange(n) % 3 != 0

    loss_c, acc_c = chunked_ce.masked_ce(h, w, y, mask, chunk)
    loss_d, acc_d = _dense_ce(h, w, y, mask)
    np.testing.assert_allclose(float(loss_c), float(loss_d), rtol=1e-6)
    np.testing.assert_allclose(float(acc_c), float(acc_d), rtol=1e-6)

    g_c = jax.grad(lambda h, w: chunked_ce.masked_ce(h, w, y, mask, chunk)[0],
                   argnums=(0, 1))(h, w)
    g_d = jax.grad(lambda h, w: _dense_ce(h, w, y, mask)[0],
                   argnums=(0, 1))(h, w)
    np.testing.assert_allclose(np.asarray(g_c[0]), np.asarray(g_d[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_c[1]), np.asarray(g_d[1]),
                               rtol=1e-5, atol=1e-6)


def test_masked_ce_all_masked_rows():
    n, d, v = 8, 8, 64
    h = jnp.ones((n, d))
    w = jnp.ones((d, v))
    y = jnp.zeros((n,), jnp.int32)
    loss, acc = chunked_ce.masked_ce(h, w, y, jnp.zeros((n,), bool), 32)
    assert float(loss) == 0.0 and float(acc) == 0.0


def test_unified_loss_fused_matches_dense():
    b, s, d, dd, vt, va, ncb = 2, 6, 16, 12, 140, 90, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    h_final = jax.random.normal(ks[0], (b, s, d), jnp.float32)
    lm_w = jax.random.normal(ks[1], (d, vt)) * 0.2
    dec_h = jax.random.normal(ks[2], (b * s, ncb, dd), jnp.float32)
    heads = jax.random.normal(ks[3], (ncb, dd, va)) * 0.2
    tl = jax.random.randint(ks[4], (b, s), 0, vt)
    al = jax.random.randint(ks[5], (b, s, ncb), 0, va)
    tmask = jnp.asarray(np.random.default_rng(0).random((b, s)) > 0.4)
    amask = jnp.asarray(np.random.default_rng(1).random((b, s)) > 0.4)
    wts = tuple(0.5 + 0.1 * i for i in range(ncb - 1))

    def dense(h_final, lm_w, dec_h, heads):
        text_logits = jnp.einsum("bsd,dv->bsv", h_final, lm_w)
        audio_logits = jnp.einsum("ncd,cdv->ncv", dec_h, heads).reshape(
            b, s, ncb, va)
        return losses.unified_loss(text_logits, audio_logits, tl, al,
                                   tmask, amask, wts)

    def fused(h_final, lm_w, dec_h, heads):
        return losses.unified_loss_fused(h_final, lm_w, dec_h, heads,
                                         tl, al, tmask, amask, wts, chunk=64)

    (ld, md) = dense(h_final, lm_w, dec_h, heads)
    (lc, mc) = fused(h_final, lm_w, dec_h, heads)
    np.testing.assert_allclose(float(lc), float(ld), rtol=1e-5)
    for k in md:
        np.testing.assert_allclose(float(mc[k]), float(md[k]), rtol=1e-5,
                                   atol=1e-6, err_msg=k)

    gd = jax.grad(lambda *a: dense(*a)[0], argnums=(0, 1, 2, 3))(
        h_final, lm_w, dec_h, heads)
    gc = jax.grad(lambda *a: fused(*a)[0], argnums=(0, 1, 2, 3))(
        h_final, lm_w, dec_h, heads)
    for a, b_ in zip(gc, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_train_step_chunked_matches_dense():
    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.models import unified
    from uniaudio2_tpu.train import schedule, trainer

    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    tx = trainer.make_optimizer(schedule.warmup_lr(1e-3, warmup_steps=10))
    b, s = 2, 8
    par = cfg.tokens.parallel_number
    ncb = cfg.tokens.num_codebooks
    r = np.random.default_rng(0)
    grid = jnp.asarray(r.integers(0, 30, size=(b, s + 1, par)), jnp.int32)
    gmask = np.zeros((b, s + 1, par), bool)
    gmask[:, : s // 2, -1] = True
    gmask[:, s // 2:, :ncb] = True
    tmask = np.zeros((b, s), bool); tmask[:, 1: s // 2] = True
    amask = np.zeros((b, s), bool); amask[:, s // 2: s - 1] = True
    batch = trainer.Batch(grid=grid, grid_mask=jnp.asarray(gmask),
                          text_loss_mask=jnp.asarray(tmask),
                          audio_loss_mask=jnp.asarray(amask))

    outs = {}
    for mode in (True, False):
        state = trainer.init_train_state(params, tx)
        step = jax.jit(trainer.build_train_step(
            cfg, tx, prefix_lm=True, remat=True, chunked_ce=mode))
        state, metrics = step(state, batch)
        outs[mode] = (state, metrics)
    m_c, m_d = outs[True][1], outs[False][1]
    np.testing.assert_allclose(float(m_c["loss"]), float(m_d["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_c["grad_norm"]),
                               float(m_d["grad_norm"]), rtol=1e-4)
    # parameters after one step agree
    leaves_c = jax.tree_util.tree_leaves(outs[True][0].params)
    leaves_d = jax.tree_util.tree_leaves(outs[False][0].params)
    for a, b_ in zip(leaves_c, leaves_d):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=2e-4, atol=2e-5)


def test_audio_gather_indices():
    from uniaudio2_tpu.train import trainer

    amask = jnp.asarray([[False, True, True, False, True],
                         [True, False, False, False, False]])
    idx, valid = trainer.audio_gather_indices(amask, 3)
    np.testing.assert_array_equal(np.asarray(idx[0]), [1, 2, 4])
    assert np.asarray(valid[0]).all()
    assert np.asarray(idx[1])[0] == 0
    np.testing.assert_array_equal(np.asarray(valid[1]), [True, False, False])
    # capacity is clamped to S
    idx, valid = trainer.audio_gather_indices(amask, 99)
    assert idx.shape == (2, 5)


def test_train_step_audio_capacity_matches_dense():
    """Gathered-local-decoder training (static audio capacity) is loss- and
    update-equivalent to the dense run when capacity covers every row's
    audio count — including ragged per-row counts."""
    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.models import unified
    from uniaudio2_tpu.train import schedule, trainer

    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    tx = trainer.make_optimizer(schedule.warmup_lr(1e-3, warmup_steps=10))
    b, s = 2, 10
    par = cfg.tokens.parallel_number
    ncb = cfg.tokens.num_codebooks
    r = np.random.default_rng(3)
    grid = jnp.asarray(r.integers(0, 30, size=(b, s + 1, par)), jnp.int32)
    gmask = np.zeros((b, s + 1, par), bool)
    gmask[:, : s // 2, -1] = True
    gmask[:, s // 2:, :ncb] = True
    tmask = np.zeros((b, s), bool); tmask[:, 1: s // 2] = True
    amask = np.zeros((b, s), bool)
    amask[0, s // 2: s - 1] = True   # 4 audio steps
    amask[1, s // 2: s - 3] = True   # 2 audio steps (ragged)
    batch = trainer.Batch(grid=grid, grid_mask=jnp.asarray(gmask),
                          text_loss_mask=jnp.asarray(tmask),
                          audio_loss_mask=jnp.asarray(amask))

    outs = {}
    for cap in (None, 4, s):
        state = trainer.init_train_state(params, tx)
        step = jax.jit(trainer.build_train_step(
            cfg, tx, prefix_lm=True, remat=True, audio_capacity=cap))
        state, metrics = step(state, batch)
        outs[cap] = (state, metrics)
    m_d = outs[None][1]
    for cap in (4, s):
        m_g = outs[cap][1]
        for k in m_d:
            np.testing.assert_allclose(
                float(m_g[k]), float(m_d[k]), rtol=1e-5, atol=1e-6,
                err_msg=f"cap={cap} metric={k}")
        leaves_g = jax.tree_util.tree_leaves(outs[cap][0].params)
        leaves_d = jax.tree_util.tree_leaves(outs[None][0].params)
        for a, b_ in zip(leaves_g, leaves_d):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b_, np.float32),
                                       rtol=2e-4, atol=2e-5)


def test_audio_capacity_dropped_metric():
    """An undersized --audio-capacity silently drops audio-loss steps from
    BOTH the loss numerator and denominator, so the loss value alone looks
    normal; the `audio_dropped` metric surfaces it (ADVICE r3 item 1)."""
    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.models import unified
    from uniaudio2_tpu.train import schedule, trainer

    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    tx = trainer.make_optimizer(schedule.warmup_lr(1e-3, warmup_steps=10))
    b, s = 2, 10
    par = cfg.tokens.parallel_number
    ncb = cfg.tokens.num_codebooks
    r = np.random.default_rng(5)
    grid = jnp.asarray(r.integers(0, 30, size=(b, s + 1, par)), jnp.int32)
    gmask = np.zeros((b, s + 1, par), bool)
    gmask[:, : s // 2, -1] = True
    gmask[:, s // 2:, :ncb] = True
    tmask = np.zeros((b, s), bool); tmask[:, 1: s // 2] = True
    amask = np.zeros((b, s), bool)
    amask[0, s // 2: s - 1] = True   # 4 audio steps
    amask[1, s // 2: s - 3] = True   # 2 audio steps
    batch = trainer.Batch(grid=grid, grid_mask=jnp.asarray(gmask),
                          text_loss_mask=jnp.asarray(tmask),
                          audio_loss_mask=jnp.asarray(amask))

    for cap, want in ((4, 0), (3, 1), (2, 2)):
        state = trainer.init_train_state(params, tx)
        step = jax.jit(trainer.build_train_step(
            cfg, tx, prefix_lm=True, remat=True, audio_capacity=cap))
        _, metrics = step(state, batch)
        assert int(metrics["audio_dropped"]) == want, cap
