"""LoRA adapters: zero-init identity, reference scaling, gradient-only-
through-adapters fine-tuning step."""

import numpy as np
import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import GPTConfig
from uniaudio2_tpu.models import gpt
from uniaudio2_tpu.models.lora import (
    apply_lora, apply_lora_unified, init_lora, lora_param_count,
)


def _cfg():
    return GPTConfig(
        name="tiny-lora", block_size=64, vocab_size=97, padding_multiple=8,
        n_layer=2, n_embd=32, n_head=4, n_query_groups=2,
        intermediate_size=48, rope_adjustments=None,
    )


def test_zero_init_is_identity():
    cfg = _cfg()
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, cfg.n_embd))
    base = gpt.forward(params, cfg, x)
    merged = gpt.forward(apply_lora(params, lora), cfg, x)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(merged))


def test_scaling_matches_reference_convention():
    """w' - w must equal (alpha/r) * a @ b (transformer_lora.py:345)."""
    cfg = _cfg()
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    ab = lora["qkv_w"]
    lora["qkv_w"] = {
        "a": ab["a"],
        "b": jax.random.normal(jax.random.PRNGKey(3), ab["b"].shape) * 0.1,
    }
    merged = apply_lora(params, lora, alpha=32.0)
    delta = np.asarray(merged["layers"]["qkv_w"]
                       - params["layers"]["qkv_w"])
    expect = np.einsum(
        "lir,lro->lio", np.asarray(lora["qkv_w"]["a"]),
        np.asarray(lora["qkv_w"]["b"])) * (32.0 / 4)
    np.testing.assert_allclose(delta, expect, rtol=1e-5, atol=1e-6)


def test_lora_finetune_step_trains_only_adapters():
    cfg = _cfg()
    base = gpt.init_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), base, rank=4)
    toks = jnp.asarray(np.arange(12).reshape(1, 12) % 97)

    def loss_fn(lora):
        p = apply_lora(base, lora)
        h = gpt.forward(p, cfg, gpt.embed(p, toks))
        logits = gpt.lm_head(p, h)
        return jnp.mean((logits - 1.0) ** 2)

    loss0, grads = jax.jit(jax.value_and_grad(loss_fn))(lora)
    # only adapter leaves receive gradients; A has zero grad only through
    # b=0, b gets real gradient
    gb = grads["qkv_w"]["b"]
    assert float(jnp.max(jnp.abs(gb))) > 0
    # one SGD step lowers the loss
    import jax.tree_util as jtu
    lr = 1e-2
    lora2 = jtu.tree_map(lambda p, g: p - lr * g, lora, grads)
    loss1 = jax.jit(loss_fn)(lora2)
    assert float(loss1) < float(loss0)
    assert lora_param_count(lora) == 2 * (
        32 * 4 + 4 * (4 + 2 * 2) * 8          # qkv: d*r + r*(h+2g)*hd
    ) + 2 * (32 * 4 + 4 * 32)                 # proj: (h*hd)*r + r*d


def test_apply_lora_unified():
    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.models import unified

    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), params["backbone"], rank=2)
    merged = apply_lora_unified(params, {"backbone": lora})
    # zero-init: numerically identical model
    np.testing.assert_array_equal(
        np.asarray(merged["backbone"]["layers"]["qkv_w"]),
        np.asarray(params["backbone"]["layers"]["qkv_w"]))
    assert merged["decoder"] is params["decoder"]
