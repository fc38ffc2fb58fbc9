"""Numerical parity of the GPT core against an independent implementation
(HuggingFace `transformers` LlamaModel) and internal prefill/decode
consistency.

The reference has no test suite (SURVEY.md §4); these tests implement the
per-module activation-diff strategy it calls for.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import GPTConfig, RoPEAdjustments
from uniaudio2_tpu.models import gpt
from uniaudio2_tpu.ops.kv_cache import init_cache

torch = pytest.importorskip("torch")


def _hf_tiny_llama(rope_scaling=None):
    from transformers import LlamaConfig, LlamaModel

    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attention_bias=False,
        mlp_bias=False,
        rope_scaling=rope_scaling,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaModel(cfg)
    model.eval()
    return cfg, model


def _convert_hf_weights(hf_model, n_layer):
    """HF Llama state-dict -> our stacked-layer param pytree."""
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}

    def stack(fmt):
        return np.stack([sd[fmt.format(i)] for i in range(n_layer)])

    qkv = []
    for i in range(n_layer):
        q = sd[f"layers.{i}.self_attn.q_proj.weight"]  # (h*hd, d)
        k = sd[f"layers.{i}.self_attn.k_proj.weight"]
        v = sd[f"layers.{i}.self_attn.v_proj.weight"]
        qkv.append(np.concatenate([q, k, v], axis=0).T)  # (d, (h+2g)*hd)
    params = {
        "layers": {
            "norm1_w": stack("layers.{}.input_layernorm.weight"),
            "qkv_w": np.stack(qkv),
            "attn_proj_w": stack("layers.{}.self_attn.o_proj.weight").transpose(0, 2, 1),
            "norm2_w": stack("layers.{}.post_attention_layernorm.weight"),
            "fc1_w": stack("layers.{}.mlp.gate_proj.weight").transpose(0, 2, 1),
            "fc2_w": stack("layers.{}.mlp.up_proj.weight").transpose(0, 2, 1),
            "mlp_proj_w": stack("layers.{}.mlp.down_proj.weight").transpose(0, 2, 1),
        },
        "ln_f_w": sd["norm.weight"],
        "wte": sd["embed_tokens.weight"],
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


OUR_CFG = GPTConfig(
    name="parity", block_size=512, vocab_size=256, padded_vocab_size=256,
    n_layer=2, n_embd=64, n_head=4, n_query_groups=2, intermediate_size=128,
    rope_base=10000.0, rope_adjustments=None, has_lm_head=False,
)


def test_forward_matches_hf_llama():
    hf_cfg, hf = _hf_tiny_llama()
    params = _convert_hf_weights(hf, 2)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 10, 64)).astype(np.float32)
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.from_numpy(x)).last_hidden_state.numpy()

    ours = np.asarray(gpt.forward(params, OUR_CFG, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_forward_matches_hf_llama3_rope_scaling():
    scaling = dict(
        rope_type="llama3", factor=32.0, low_freq_factor=1.0,
        high_freq_factor=4.0, original_max_position_embeddings=128,
    )
    hf_cfg, hf = _hf_tiny_llama(rope_scaling=scaling)
    params = _convert_hf_weights(hf, 2)
    cfg = OUR_CFG.replace(
        rope_adjustments=RoPEAdjustments(
            factor=32.0, low_freq_factor=1.0, high_freq_factor=4.0,
            original_max_seq_len=128,
        )
    )
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 16, 64)).astype(np.float32)
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.from_numpy(x)).last_hidden_state.numpy()
    ours = np.asarray(gpt.forward(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)


def test_prefill_decode_matches_full_forward():
    """Cache plumbing: prefill(S-1) + step-by-step decode must reproduce the
    no-cache full forward exactly (same math, different schedule)."""
    cfg = GPTConfig.from_name("tiny-backbone", has_lm_head=False)
    key = jax.random.PRNGKey(0)
    params = gpt.init_params(key, cfg)

    s, b = 12, 2
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, cfg.n_embd))

    full = gpt.forward(params, cfg, x)

    cache = init_cache(cfg, b, max_seq=32, dtype=jnp.float32)
    h_pre, cache = gpt.prefill(params, cfg, x[:, :8], cache)
    np.testing.assert_allclose(
        np.asarray(h_pre), np.asarray(full[:, :8]), atol=1e-5, rtol=1e-5
    )
    for t in range(8, s):
        h_t, cache = gpt.decode_step(params, cfg, x[:, t : t + 1], cache, jnp.int32(t))
        np.testing.assert_allclose(
            np.asarray(h_t[:, 0]), np.asarray(full[:, t]), atol=1e-5, rtol=1e-5
        )


def test_prefill_with_padding_is_consistent():
    """Padded prefill must give identical cache behaviour for valid
    positions: decode after a padded prefill == decode after an exact one."""
    cfg = GPTConfig.from_name("tiny-backbone", has_lm_head=False)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    L, P, b = 6, 16, 1
    x = jax.random.normal(jax.random.PRNGKey(2), (b, L, cfg.n_embd))
    x_pad = jnp.concatenate(
        [x, jnp.zeros((b, P - L, cfg.n_embd), x.dtype)], axis=1
    )

    cache_a = init_cache(cfg, b, 32, jnp.float32)
    _, cache_a = gpt.prefill(params, cfg, x, cache_a)
    cache_b = init_cache(cfg, b, 32, jnp.float32)
    _, cache_b = gpt.prefill(params, cfg, x_pad, cache_b)

    nxt = jax.random.normal(jax.random.PRNGKey(3), (b, 1, cfg.n_embd))
    ha, _ = gpt.decode_step(params, cfg, nxt, cache_a, jnp.int32(L))
    hb, _ = gpt.decode_step(params, cfg, nxt, cache_b, jnp.int32(L))
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), atol=1e-5, rtol=1e-5)
