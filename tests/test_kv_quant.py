"""int8 KV cache: write-side quantization, native-int8 attention reads,
prefix-level identity, and engine smoke.

Reference capability match: the KVCache of
`/root/reference/llm_models/lit_model.py:814-860`, extended with int8 cache
compression (standard in TPU serving stacks, absent upstream). Exactness
tests exploit representable values (integers scaled by a power of two) for
which absmax-int8 quantization is lossless, so the int8 read path must agree
with the bf16 path to matmul-association tolerance.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uniaudio2_tpu.config import GPTConfig, UnifiedModelConfig
from uniaudio2_tpu.ops.attention import decode_attention
from uniaudio2_tpu.ops.kv_cache import (
    KVCache, QuantKV, init_cache, quantize_slots, unstack_cache, update_layer,
)


def _geom():
    return GPTConfig(
        name="t", n_layer=2, n_embd=64, n_head=4, n_query_groups=2,
        intermediate_size=128, padded_vocab_size=64, vocab_size=64,
    )


def _representable(key, shape, scale=2.0 ** -6):
    """Values exactly representable by absmax int8 with a per-slot scale
    that is itself exact: random ints in [-127, 127], one slot pinned to
    +-127 so the absmax scale is exactly ``127 * scale / 127``."""
    ints = jax.random.randint(key, shape, -126, 127)
    pinned = ints.at[..., 0].set(127)
    return pinned.astype(jnp.float32) * scale


class TestQuantWrite:
    def test_quantize_slots_roundtrip_representable(self):
        x = _representable(jax.random.PRNGKey(0), (2, 3, 5, 16))
        qkv = quantize_slots(x)
        assert qkv.q.dtype == jnp.int8 and qkv.s.dtype == jnp.float32
        deq = qkv.q.astype(jnp.float32) * qkv.s[..., None]
        np.testing.assert_allclose(np.asarray(deq), np.asarray(x), rtol=1e-6)

    def test_init_cache_int8_shapes(self):
        cfg = _geom()
        c = init_cache(cfg, 2, 32, dtype=jnp.int8)
        assert isinstance(c.k, QuantKV)
        assert c.k.q.shape == (2, 2, 2, 32, 16) and c.k.q.dtype == jnp.int8
        assert c.k.s.shape == (2, 2, 2, 32) and c.k.s.dtype == jnp.float32
        assert c.max_seq == 32
        lists = init_cache(cfg, 2, 32, dtype=jnp.int8, as_lists=True)
        assert isinstance(lists.k, list) and isinstance(lists.k[0], QuantKV)
        assert lists.max_seq == 32
        # stacked -> lists preserves values
        un = unstack_cache(c)
        assert isinstance(un.k[0], QuantKV) and un.k[0].q.shape == (2, 2, 32, 16)

    def test_update_layer_quantizes_at_pos(self):
        cfg = _geom()
        c = init_cache(cfg, 1, 8, dtype=jnp.int8, as_lists=True)
        k_new = _representable(jax.random.PRNGKey(1), (1, 2, 2, 16))
        v_new = _representable(jax.random.PRNGKey(2), (1, 2, 2, 16))
        k_l, v_l = update_layer(c.k[0], c.v[0], k_new, v_new, jnp.int32(3))
        deq = k_l.q.astype(jnp.float32) * k_l.s[..., None]
        np.testing.assert_allclose(
            np.asarray(deq[:, :, 3:5]), np.asarray(k_new), rtol=1e-6)
        assert np.all(np.asarray(k_l.q[:, :, :3]) == 0)
        deqv = v_l.q.astype(jnp.float32) * v_l.s[..., None]
        np.testing.assert_allclose(
            np.asarray(deqv[:, :, 3:5]), np.asarray(v_new), rtol=1e-6)


def _attend_both(key, b=2, g=2, p=2, t=1, s=16, hd=16, pos=9, **kw):
    """Run bf16-path and int8-path decode attention on the same
    representable cache contents; returns (exact, quant) outputs."""
    kk, kv, kq = jax.random.split(key, 3)
    k = _representable(kk, (b, g, s, hd))
    v = _representable(kv, (b, g, s, hd))
    q = _representable(kq, (b, g * p, t, hd))
    positions = pos + jnp.arange(t, dtype=jnp.int32)
    exact = decode_attention(q, k, v, positions, **kw)
    qk, qv = quantize_slots(k), quantize_slots(v)
    quant = decode_attention(q, qk, qv, positions, **kw)
    return exact, quant


class TestQuantRead:
    def test_exact_on_representable(self):
        # q is representable too, so the q-side absmax quantization is
        # lossless; only the probs-side rounding remains -> tight tolerance.
        exact, quant = _attend_both(jax.random.PRNGKey(0))
        scale = float(jnp.max(jnp.abs(exact))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(quant, np.float32), np.asarray(exact, np.float32),
            atol=0.02 * scale,
        )

    def test_close_on_random(self):
        key = jax.random.PRNGKey(3)
        kk, kv, kq = jax.random.split(key, 3)
        b, g, p, t, s, hd = 2, 2, 2, 1, 32, 16
        k = jax.random.normal(kk, (b, g, s, hd), jnp.float32)
        v = jax.random.normal(kv, (b, g, s, hd), jnp.float32)
        q = jax.random.normal(kq, (b, g * p, t, hd), jnp.float32)
        positions = jnp.asarray([20], jnp.int32)
        exact = decode_attention(q, k, v, positions)
        quant = decode_attention(q, quantize_slots(k), quantize_slots(v),
                                 positions)
        err = np.linalg.norm(np.asarray(quant - exact, np.float32))
        ref = np.linalg.norm(np.asarray(exact, np.float32))
        assert err / ref < 0.05, f"relative error {err / ref:.4f}"

    def test_prefix_levels_identical_to_full_read(self):
        # bounded reads must not change the quantized result: the masked
        # tail contributes exact zeros and the probs-quantization scales
        # are unaffected by it.
        kw = dict(prefix_levels=(8, 16, 24, 32))
        key = jax.random.PRNGKey(4)
        _, q8 = _attend_both(key, s=32, pos=5, **kw)
        _, qfull = _attend_both(key, s=32, pos=5)
        np.testing.assert_array_equal(np.asarray(q8), np.asarray(qfull))

    def test_key_valid_and_window(self):
        key = jax.random.PRNGKey(5)
        key_valid = jnp.asarray(
            np.random.default_rng(0).random((2, 16)) > 0.3)
        exact, quant = _attend_both(
            key, key_valid=key_valid, window=jnp.int32(6))
        scale = float(jnp.max(jnp.abs(exact))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(quant, np.float32), np.asarray(exact, np.float32),
            atol=0.03 * scale,
        )


class TestResolve:
    def test_aliases_and_error(self, monkeypatch):
        from uniaudio2_tpu.engine.decode import resolve_kv_quant
        assert resolve_kv_quant("on", 64, jnp.bfloat16) == jnp.int8
        assert resolve_kv_quant("int8", 64, jnp.bfloat16) == jnp.int8
        assert resolve_kv_quant("off", 4096, jnp.bfloat16) == jnp.bfloat16
        monkeypatch.setenv("UA2_KV_QUANT", "1")
        assert resolve_kv_quant(None, 64, jnp.bfloat16) == jnp.int8
        monkeypatch.setenv("UA2_KV_QUANT", "bogus")
        with pytest.raises(ValueError):
            resolve_kv_quant(None, 64, jnp.bfloat16)

    def test_auto_threshold(self):
        """AUTO = on at cache >= 512 OR batch >= 8 (the r5 TPU A/B:
        int8 wins every batched config even at cache 256, and batch-1
        from cache 512 up — docs/kv_quant_r5.md)."""
        from uniaudio2_tpu.engine.decode import resolve_kv_quant
        assert resolve_kv_quant("auto", 256, jnp.bfloat16) == jnp.bfloat16
        assert resolve_kv_quant("auto", 512, jnp.bfloat16) == jnp.int8
        assert resolve_kv_quant("auto", 256, jnp.bfloat16, batch=8) == jnp.int8
        assert resolve_kv_quant("auto", 256, jnp.bfloat16, batch=4) \
            == jnp.bfloat16


@pytest.fixture(scope="module")
def tiny_setup():
    from uniaudio2_tpu.models import unified
    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


class TestEngine:
    def test_generate_audio_and_text_int8(self, tiny_setup):
        from uniaudio2_tpu.engine import tasks
        from uniaudio2_tpu.engine.decode import DecodeEngine
        cfg, params = tiny_setup
        g, m = tasks.prepare_tts(
            np.array([1, 5, 6]), np.array([1, 10, 2]), cfg.tokens)
        eng = DecodeEngine(params, cfg, max_frames=6, buckets=(64,),
                           kv_quant="on")
        reason, semantic = eng.generate_audio(g, m, topk=5)
        assert reason.shape[0] == 8 and semantic.shape[0] == 8
        toks = eng.generate_text(g, m, topk=1)
        assert toks.ndim == 1
        # determinism: same seed -> same tokens
        toks2 = eng.generate_text(g, m, topk=1)
        np.testing.assert_array_equal(toks, toks2)

    def test_generate_batch_int8(self, tiny_setup):
        from uniaudio2_tpu.engine import tasks
        from uniaudio2_tpu.engine.decode import DecodeEngine
        cfg, params = tiny_setup
        items = [
            tasks.prepare_tts(np.array([1, 5, 6]), np.array([1, 10, 2]),
                              cfg.tokens),
            tasks.prepare_tts(np.array([2, 7]), np.array([3, 4, 5, 6]),
                              cfg.tokens),
        ]
        eng = DecodeEngine(params, cfg, max_frames=5, buckets=(64,),
                           kv_quant="on")
        outs = eng.generate_text_batch(items, topk=1)
        assert len(outs) == 2

    def test_beam_reorder_int8(self, tiny_setup):
        from uniaudio2_tpu.engine import tasks
        from uniaudio2_tpu.engine.decode import DecodeEngine
        cfg, params = tiny_setup
        g, m = tasks.prepare_asr(
            np.array([1, 5, 6, 7]),
            np.zeros((3, 8), np.int64), np.zeros((3, 8), np.int64),
            cfg.tokens)
        eng = DecodeEngine(params, cfg, max_frames=4, buckets=(64,),
                           kv_quant="on")
        out = eng.generate_text_beam(g, m, beam_size=2, max_steps=3)
        assert out.ndim == 1

    def test_greedy_token_overlap_vs_bf16(self, tiny_setup):
        """Greedy decode with the int8 cache should track the bf16 cache
        closely even on a random-weight model (flat logits are the
        adversarial case for cache quantization). We assert on the first
        divergence point rather than full identity: the prefix before any
        flip must be identical, and the first token must match (the first
        decode step reads only prefill-written slots)."""
        from uniaudio2_tpu.engine import tasks
        from uniaudio2_tpu.engine.decode import DecodeEngine
        cfg, params = tiny_setup
        g, m = tasks.prepare_asr(
            np.array([1, 5, 6, 7, 9, 2]),
            np.zeros((4, 8), np.int64), np.zeros((4, 8), np.int64),
            cfg.tokens)
        eng_bf = DecodeEngine(params, cfg, max_frames=8, buckets=(64,),
                              cache_dtype=jnp.float32, kv_quant="off")
        eng_q = DecodeEngine(params, cfg, max_frames=8, buckets=(64,),
                             kv_quant="on")
        t_bf = eng_bf.generate_text(g, m, topk=1)
        t_q = eng_q.generate_text(g, m, topk=1)
        n = min(len(t_bf), len(t_q))
        agree = 0
        for a, b in zip(t_bf[:n], t_q[:n]):
            if a != b:
                break
            agree += 1
        assert n == 0 or agree >= 1


class TestContinuousInt8:
    def test_single_request_matches_decode_engine(self, tiny_setup):
        """A request admitted at the fresh position (pos=bucket) has the
        exact absolute-position geometry of the standalone engine, so with
        the same int8 cache the greedy stream is bit-identical."""
        from uniaudio2_tpu.engine import tasks
        from uniaudio2_tpu.engine.continuous import ContinuousEngine
        from uniaudio2_tpu.engine.decode import DecodeEngine
        cfg, params = tiny_setup
        g, m = tasks.prepare_tts(np.array([1, 5, 6]), np.array([1, 10, 2]),
                                 cfg.tokens)
        ref = DecodeEngine(params, cfg, max_frames=8, buckets=(32,),
                           cache_dtype=jnp.float32, kv_quant="on")
        exp = np.asarray(ref.generate_text(g, m, topk=1))
        ce = ContinuousEngine(
            params, cfg, mode="text", rows=2, bucket=32, seg_frames=4,
            cache_len=256, max_frames=8, topk=1,
            cache_dtype=jnp.float32, kv_quant="on")
        assert isinstance(ce._state.caches.backbone.k[0]
                          if isinstance(ce._state.caches.backbone.k, list)
                          else ce._state.caches.backbone.k, QuantKV)
        rid = ce.submit(g, m)
        out = ce.run_until_drained()[rid]
        np.testing.assert_array_equal(out, exp)

    def test_ladder_invariance_under_int8(self, tiny_setup):
        """Segmentation invariance holds under the quantized cache too:
        the same per-frame op sequence runs regardless of boundaries, so
        ladder settings agree bit-for-bit (3 requests / 2 rows exercises
        refill-into-running-batch and the reactive program)."""
        from uniaudio2_tpu.engine import tasks
        from uniaudio2_tpu.engine.continuous import ContinuousEngine
        cfg, params = tiny_setup
        reqs = [tasks.prepare_tts(np.array([1 + i, 5, 6]),
                                  np.array([1, 10 + i, 2]), cfg.tokens)
                for i in range(3)]

        def run(ladder):
            ce = ContinuousEngine(
                params, cfg, mode="text", rows=2, bucket=32, seg_frames=4,
                cache_len=256, max_frames=8, topk=1,
                cache_dtype=jnp.float32, kv_quant="on", seg_ladder=ladder)
            rids = [ce.submit(g, m) for g, m in reqs]
            results = {}
            for _ in range(100):
                results.update(ce.step_online())
                if len(results) == len(rids):
                    break
            return [results[r] for r in rids]

        for a, b in zip(run("off"), run("auto")):
            np.testing.assert_array_equal(a, b)
