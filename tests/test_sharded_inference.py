"""Multi-device inference: decode with FSDP/TP-sharded parameters on the
virtual 8-device CPU mesh (the serving analog of dryrun_multichip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.parallel import mesh as meshlib


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_decode_frame():
    m = meshlib.build_mesh(fsdp=4, tp=2)
    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    params = meshlib.shard_params(params, m, use_tp=True)
    caches = unified.init_caches(cfg, 1, dtype=jnp.float32)
    tokens = jnp.zeros((1, 1, 9), jnp.int32)
    mask = jnp.ones((1, 1, 9), bool)

    @jax.jit
    def step(params, tokens, mask, caches):
        return unified.decode_frame(
            params, cfg, tokens, mask, caches, jnp.int32(0),
            jax.random.PRNGKey(1), temperature=0.9, topk=5,
            forbid_prefix=jnp.int32(0),
        )

    frame, caches2 = step(params, tokens, mask, caches)
    assert frame.shape == (1, 9)
    assert np.isfinite(np.asarray(frame)).all() or frame.dtype == jnp.int32

    # sharded forward (training shape) on the same mesh
    batch_sharding = NamedSharding(m, P())
    toks = jax.device_put(jnp.zeros((2, 6, 9), jnp.int32), batch_sharding)
    msk = jax.device_put(jnp.ones((2, 6, 9), bool), batch_sharding)
    logits = jax.jit(
        lambda p, t, mm: unified.forward_text(p, cfg, t, mm)
    )(params, toks, msk)
    assert logits.shape == (2, 6, cfg.backbone.padded_vocab_size)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_moe_forward():
    """Expert-parallel MoE: expert stacks sharded (E over tp, in-dim over
    fsdp) run a forward + grad step on the mesh."""
    from uniaudio2_tpu.config import GPTConfig
    from uniaudio2_tpu.models import gpt

    m = meshlib.build_mesh(fsdp=4, tp=2)
    cfg = GPTConfig(
        name="tiny-moe", block_size=64, vocab_size=96, padding_multiple=8,
        n_layer=2, n_embd=32, n_head=4, n_query_groups=2,
        intermediate_size=64, rope_adjustments=None,
        n_expert=4, n_expert_per_token=2, moe_intermediate_size=64,
    )
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    specs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: meshlib._gpt_param_spec(
            tuple(p.key if hasattr(p, "key") else str(p) for p in path),
            leaf, True,
        ),
        params,
    )
    params = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(m, s)), params, specs
    )
    x = jnp.ones((2, 6), jnp.int32)

    def loss_fn(p):
        h = gpt.forward(p, cfg, gpt.embed(p, x))
        return jnp.mean(gpt.lm_head(p, h, cfg) ** 2)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    g = grads["layers"]["fc1_w"]
    assert g.shape == params["layers"]["fc1_w"].shape
