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
