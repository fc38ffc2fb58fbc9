"""Gemma-family GPT options: attention/final logit softcapping, sliding
window, attention_scores_scalar, and the MoE MLP.

Reference semantics: `lit_model.py:365-367,483-500,516-531,606-631,806-811`
and `config.py:70-93,130-131`. None of the UniAudio shipped configs use
these, but the registry keeps the reference's full architecture surface;
these tests pin the math against independent numpy/torch implementations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uniaudio2_tpu.config import GPTConfig
from uniaudio2_tpu.models import gpt
from uniaudio2_tpu.ops.attention import causal_attention, decode_attention
from uniaudio2_tpu.ops.kv_cache import init_cache


def _np_gqa(q, k, v, scale, mask, softcap=None):
    """Independent numpy GQA: q (B,H,T,hd), k/v (B,G,S,hd), mask (T,S)."""
    b, h, t, hd = q.shape
    g, s = k.shape[1], k.shape[2]
    rep = h // g
    kf = np.repeat(k, rep, axis=1)
    vf = np.repeat(v, rep, axis=1)
    scores = np.einsum("bhtd,bhsd->bhts", q, kf) * scale
    if softcap is not None:
        scores = np.tanh(scores / softcap) * softcap
    scores = np.where(mask, scores, -1e30)
    scores = scores - scores.max(-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("bhts,bhsd->bhtd", p, vf)
    return out.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


@pytest.mark.parametrize("softcap", [None, 30.0])
def test_causal_attention_window_vs_numpy(softcap):
    rng = np.random.default_rng(0)
    b, h, g, t, hd, w = 2, 4, 2, 12, 8, 5
    q = rng.standard_normal((b, h, t, hd)).astype(np.float32)
    k = rng.standard_normal((b, g, t, hd)).astype(np.float32)
    v = rng.standard_normal((b, g, t, hd)).astype(np.float32)
    out = causal_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        logit_softcap=softcap, window=jnp.int32(w),
    )
    idx = np.arange(t)
    # reference mask (lit_model.py:483-500): causal AND q_pos - k_pos < w
    mask = (idx[None, :] <= idx[:, None]) & (idx[:, None] - idx[None, :] < w)
    ref = _np_gqa(q, k, v, 1.0 / np.sqrt(hd), mask, softcap)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_decode_attention_window_vs_numpy():
    rng = np.random.default_rng(1)
    b, h, g, s, hd, w = 1, 4, 2, 16, 8, 4
    pos = 9
    q = rng.standard_normal((b, h, 1, hd)).astype(np.float32)
    kc = rng.standard_normal((b, g, s, hd)).astype(np.float32)
    vc = rng.standard_normal((b, g, s, hd)).astype(np.float32)
    out = decode_attention(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.array([pos], jnp.int32), window=jnp.int32(w),
    )
    idx = np.arange(s)
    mask = ((idx <= pos) & (pos - idx < w))[None, :]
    ref = _np_gqa(q, kc, vc, 1.0 / np.sqrt(hd), mask)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def _tiny_cfg(**kw):
    return GPTConfig(
        name="tiny-opts", block_size=64, vocab_size=97, padding_multiple=8,
        n_layer=3, n_embd=32, n_head=4, n_query_groups=2,
        intermediate_size=48, rope_adjustments=None, **kw,
    )


@pytest.mark.parametrize("unroll", [False, True])
def test_forward_matches_prefill_decode_with_options(unroll):
    """forward (full-sequence masks) and prefill+decode_step (cache masks)
    must agree under sliding window + softcapping + scores_scalar — the two
    code paths build the window mask independently."""
    cfg = _tiny_cfg(
        sliding_window_size=4,
        sliding_window_indices=(1, 0, 1),
        attention_logit_softcapping=25.0,
        attention_scores_scalar=16,
    )
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    if unroll:
        params = gpt.unstack_layers(params)
    s = 10
    x = jax.random.normal(jax.random.PRNGKey(1), (1, s, cfg.n_embd))

    full = gpt.forward(params, cfg, x)

    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    h_pre, cache = gpt.prefill(params, cfg, x[:, :4], cache)
    hs = [h_pre[:, i] for i in range(4)]
    for i in range(4, s):
        h_i, cache = gpt.decode_step(params, cfg, x[:, i : i + 1], cache,
                                     jnp.int32(i))
        hs.append(h_i[:, 0])
    steps = jnp.stack(hs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(steps), rtol=2e-4, atol=2e-4
    )


def test_final_logit_softcapping():
    cfg = _tiny_cfg(final_logit_softcapping=5.0)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    h = jax.random.normal(jax.random.PRNGKey(2), (3, cfg.n_embd)) * 100
    capped = gpt.lm_head(params, h, cfg)
    raw = gpt.lm_head(params, h)
    assert float(jnp.max(jnp.abs(capped))) <= 5.0
    np.testing.assert_allclose(
        np.asarray(capped), np.tanh(np.asarray(raw) / 5.0) * 5.0,
        rtol=1e-5, atol=1e-6,
    )


def test_moe_mlp_matches_reference_torch():
    """Dense-combine MoE vs a direct torch re-execution of the reference
    routing algorithm (`LLaMAMoE.forward`, lit_model.py:614-631)."""
    import torch

    cfg = _tiny_cfg(n_expert=4, n_expert_per_token=2,
                    moe_intermediate_size=40)
    params = gpt.init_params(jax.random.PRNGKey(3), cfg)
    layer0 = jax.tree_util.tree_map(lambda a: a[0], params["layers"])
    b, t = 2, 5
    x = jax.random.normal(jax.random.PRNGKey(4), (b, t, cfg.n_embd))

    ours = gpt._moe_mlp(layer0, x, cfg)

    gate_w = torch.tensor(np.asarray(layer0["moe_gate_w"]))     # (D, E)
    fc1 = torch.tensor(np.asarray(layer0["fc1_w"]))             # (E, D, I)
    fc2 = torch.tensor(np.asarray(layer0["fc2_w"]))
    proj = torch.tensor(np.asarray(layer0["mlp_proj_w"]))       # (E, I, D)
    xt = torch.tensor(np.asarray(x)).reshape(-1, cfg.n_embd)
    router = xt @ gate_w                                         # (N, E)
    probs, indices = torch.topk(router, cfg.n_expert_per_token)
    probs = probs.softmax(dim=1, dtype=torch.float).to(xt.dtype)
    masks = (indices.unsqueeze(-1)
             == torch.arange(cfg.n_expert)).permute(2, 0, 1)
    y = torch.zeros_like(xt)
    for e in range(cfg.n_expert):
        token_idx, expert_idx = torch.where(masks[e])
        xe = xt[token_idx]
        h = torch.nn.functional.silu(xe @ fc1[e]) * (xe @ fc2[e])
        y[token_idx] += probs[token_idx, expert_idx, None] * (h @ proj[e])
    ref = y.reshape(b, t, cfg.n_embd).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_moe_forward_and_decode_run():
    """End-to-end: an MoE config runs through forward and cached decode."""
    cfg = _tiny_cfg(n_expert=4, n_expert_per_token=2)
    params = gpt.init_params(jax.random.PRNGKey(5), cfg)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 6, cfg.n_embd))
    full = gpt.forward(params, cfg, x)
    cache = init_cache(cfg, 1, 8, dtype=jnp.float32)
    h_pre, cache = gpt.prefill(params, cfg, x[:, :3], cache)
    hs = [h_pre[:, i] for i in range(3)]
    for i in range(3, 6):
        h_i, cache = gpt.decode_step(params, cfg, x[:, i : i + 1], cache,
                                     jnp.int32(i))
        hs.append(h_i[:, 0])
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(jnp.stack(hs, axis=1)),
        rtol=2e-4, atol=2e-4,
    )
