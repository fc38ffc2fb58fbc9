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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_serving_engine_matches_single_device():
    """DecodeEngine(mesh=...) — the full compiled generation loop under
    FSDP+TP sharding produces the same greedy tokens as unsharded serving."""
    from uniaudio2_tpu.engine import tasks
    from uniaudio2_tpu.engine.decode import DecodeEngine

    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    g, m1 = tasks.prepare_tts(np.array([1, 5, 6]), np.array([1, 10, 2]),
                              cfg.tokens)

    plain = DecodeEngine(params, cfg, max_frames=6,
                         cache_dtype=jnp.float32, buckets=(32,))
    exp_text = np.asarray(plain.generate_text(g, m1, topk=1))
    exp_audio = plain.generate_audio(g, m1, topk=1)

    mesh = meshlib.build_mesh(fsdp=4, tp=2)
    sharded = DecodeEngine(params, cfg, max_frames=6,
                           cache_dtype=jnp.float32, buckets=(32,),
                           mesh=mesh, use_tp=True)
    np.testing.assert_array_equal(
        np.asarray(sharded.generate_text(g, m1, topk=1)), exp_text)
    got_audio = sharded.generate_audio(g, m1, topk=1)
    np.testing.assert_array_equal(np.asarray(got_audio[0]),
                                  np.asarray(exp_audio[0]))
    batch = sharded.generate_text_batch([(g, m1)] * 3, topk=1)
    for row in batch:
        np.testing.assert_array_equal(np.asarray(row), exp_text)


def test_param_specs_fire_for_quantized_serving_layout():
    """The sharding rules must key on the enclosing weight name, not the
    Quantized* namedtuple field or the unrolled-list index: quantized
    values get the Megatron column/row split, scales stay replicated."""
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from uniaudio2_tpu.ops.quant import QuantizedLinear4, QuantizedLinearC4

    q = lambda k, n: QuantizedLinear4(
        jnp.zeros((k // 2, n), jnp.int8), jnp.zeros((n,), jnp.float32))
    qc = lambda k, n: QuantizedLinearC4(
        jnp.zeros((k, n // 2), jnp.int8), jnp.zeros((n,), jnp.float32))
    params = {
        "backbone": {
            "layers": [{
                "qkv_w": q(1024, 1280),
                "attn_proj_w": q(1024, 1024),
                "fc1_w": q(1024, 2048),
                "fc2_w": q(1024, 2048),
                "mlp_proj_w": qc(2048, 1024),
                "norm1_w": jnp.ones((1024,)),
            }],
            "lm_head_w": q(1024, 4096),
        },
        "audio_head": [qc(1024, 4096)],
    }
    specs = meshlib.unified_param_specs(params, use_tp=True)
    layer = specs["backbone"]["layers"][0]
    assert layer["qkv_w"].values == P("fsdp", "tp")       # column-parallel
    assert layer["qkv_w"].scale == P()                    # replicated
    assert layer["mlp_proj_w"].values == P("tp", "fsdp")  # row-parallel
    assert layer["norm1_w"] == P()
    assert specs["audio_head"][0].values == P("fsdp", "tp")


def test_fit_spec_to_mesh_indivisible_dims():
    """fsdp=8 must not fail on leaves whose sharded dim is indivisible
    (stacked-norm (28, D) — found by the full-scale compile check): the
    offending entry falls back to replication, divisible entries stay."""
    from jax.sharding import PartitionSpec as P

    m = meshlib.build_mesh(replica=1, fsdp=8, tp=1)
    # 28 % 8 != 0 -> replicate dim 0; 3072 % 8 == 0 -> keep
    assert meshlib.fit_spec_to_mesh(P("fsdp"), (28, 3072), m) == P()
    assert meshlib.fit_spec_to_mesh(P(None, "fsdp"), (28, 3072), m) \
        == P(None, "fsdp")
    assert meshlib.fit_spec_to_mesh(P("fsdp", "tp"), (64, 3072), m) \
        == P("fsdp", "tp")
    # tuple entries use the axis-product
    m2 = meshlib.build_mesh(replica=2, fsdp=4, tp=1)
    assert meshlib.fit_spec_to_mesh(P(("replica", "fsdp")), (24,), m2) \
        == P(("replica", "fsdp"))
    assert meshlib.fit_spec_to_mesh(P(("replica", "fsdp")), (28,), m2) == P()

    # end to end: full-depth backbone config shards at fsdp=8
    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    sharded = meshlib.shard_params(params, m)
    jax.block_until_ready(sharded)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_serving_int8_kv_matches_single_device():
    """The int8 KV cache under TP sharding (QuantKV-aware
    `_shard_caches`: values on the kv-group axis, scales follow with the
    trailing head axis dropped) must reproduce the unsharded int8 greedy
    stream exactly — quantization is deterministic and per-head local, so
    head sharding cannot change the rounded values."""
    from uniaudio2_tpu.engine import tasks
    from uniaudio2_tpu.engine.decode import DecodeEngine

    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    g, m1 = tasks.prepare_tts(np.array([1, 5, 6]), np.array([1, 10, 2]),
                              cfg.tokens)

    plain = DecodeEngine(params, cfg, max_frames=6,
                         cache_dtype=jnp.float32, buckets=(32,),
                         kv_quant="on")
    exp_text = np.asarray(plain.generate_text(g, m1, topk=1))

    mesh = meshlib.build_mesh(fsdp=4, tp=2)
    sharded = DecodeEngine(params, cfg, max_frames=6,
                           cache_dtype=jnp.float32, buckets=(32,),
                           mesh=mesh, use_tp=True, kv_quant="on")
    np.testing.assert_array_equal(
        np.asarray(sharded.generate_text(g, m1, topk=1)), exp_text)
    batch = sharded.generate_text_batch([(g, m1)] * 3, topk=1)
    for row in batch:
        np.testing.assert_array_equal(np.asarray(row), exp_text)
