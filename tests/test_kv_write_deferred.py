"""Deferred coalesced KV writes (`UA2_KV_WRITE=deferred`).

The inline decode discipline writes every layer's K/V slot before
attending (2 dynamic_update_slices per layer for a bf16 cache, 4 for the
int8 QuantKV cache — 132 small strided writes per frame at the full-scale
33 layer units). The deferred discipline attends over the cache prefix
[0, pos) plus the current token's fresh K/V as one extra softmax column
(`ops/attention.py decode_attention(fresh_kv=...)`), and lands the whole
frame's K/V in ONE stacked `kv_cache.update_stacked` write per field.
Built against the r3 batch-16 glue anatomy
(docs/profile_decode_r3.md:151-154).

Semantics: with an exact (f32) cache the attended values are identical —
the fresh column holds the same vectors the inline path just wrote — so
greedy decode must be token-identical. With the int8 cache the deferred
path is slightly MORE exact (the self column skips the int8 write/read
rounding), so we assert the same prefix-agreement contract as
tests/test_kv_quant.py.

Reference match: KVCache scatter-write semantics of
`/root/reference/llm_models/lit_model.py:814-860`, reorganised for the
TPU write-coalescing win.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uniaudio2_tpu.config import GPTConfig, UnifiedModelConfig
from uniaudio2_tpu.ops.attention import decode_attention
from uniaudio2_tpu.ops.kv_cache import (
    KVCache, QuantKV, init_cache, update_layer, update_stacked,
)


def _geom():
    return GPTConfig(
        name="t", n_layer=3, n_embd=64, n_head=4, n_query_groups=2,
        intermediate_size=128, padded_vocab_size=64, vocab_size=64,
    )


class TestUpdateStacked:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
    def test_matches_per_layer_updates(self, dtype):
        cfg = _geom()
        cache = init_cache(cfg, 2, 16, dtype=dtype)
        key = jax.random.PRNGKey(0)
        kk, kv = jax.random.split(key)
        k_new = jax.random.normal(kk, (cfg.n_layer, 2, 2, 1, 16), jnp.float32)
        v_new = jax.random.normal(kv, (cfg.n_layer, 2, 2, 1, 16), jnp.float32)
        pos = jnp.int32(5)

        k_st, v_st = update_stacked(cache.k, cache.v, k_new, v_new, pos)

        for i in range(cfg.n_layer):
            k_ref, v_ref = update_layer(
                (QuantKV(cache.k.q[i], cache.k.s[i])
                 if isinstance(cache.k, QuantKV) else cache.k[i]),
                (QuantKV(cache.v.q[i], cache.v.s[i])
                 if isinstance(cache.v, QuantKV) else cache.v[i]),
                k_new[i], v_new[i], pos)
            if isinstance(k_st, QuantKV):
                np.testing.assert_array_equal(np.asarray(k_st.q[i]),
                                              np.asarray(k_ref.q))
                np.testing.assert_allclose(np.asarray(k_st.s[i]),
                                           np.asarray(k_ref.s), rtol=1e-6)
                np.testing.assert_array_equal(np.asarray(v_st.q[i]),
                                              np.asarray(v_ref.q))
            else:
                np.testing.assert_array_equal(np.asarray(k_st[i]),
                                              np.asarray(k_ref))
                np.testing.assert_array_equal(np.asarray(v_st[i]),
                                              np.asarray(v_ref))


class TestFreshKvAttention:
    def _setup(self, s=16, pos=9, b=2, g=2, p=2, t=1, hd=16, dtype=jnp.float32):
        key = jax.random.PRNGKey(42)
        ks = jax.random.split(key, 5)
        q = jax.random.normal(ks[0], (b, g * p, t, hd), dtype)
        k_pre = jax.random.normal(ks[1], (b, g, s, hd), dtype)
        v_pre = jax.random.normal(ks[2], (b, g, s, hd), dtype)
        # zero cache beyond the filled prefix [0, pos)
        mask = (jnp.arange(s) < pos)[None, None, :, None]
        k_pre = k_pre * mask
        v_pre = v_pre * mask
        k_f = jax.random.normal(ks[3], (b, g, t, hd), dtype)
        v_f = jax.random.normal(ks[4], (b, g, t, hd), dtype)
        return q, k_pre, v_pre, k_f, v_f

    @pytest.mark.parametrize("levels", [None, (8, 16)])
    def test_matches_inline_write_then_attend_f32(self, levels):
        s, pos = 16, 9
        q, k_pre, v_pre, k_f, v_f = self._setup(s=s, pos=pos)
        qpos = jnp.array([pos], jnp.int32)
        # inline: write the fresh token at `pos`, attend inclusively
        zero = jnp.int32(0)
        k_in = jax.lax.dynamic_update_slice(k_pre, k_f, (zero, zero, jnp.int32(pos), zero))
        v_in = jax.lax.dynamic_update_slice(v_pre, v_f, (zero, zero, jnp.int32(pos), zero))
        ref = decode_attention(q, k_in, v_in, qpos, prefix_levels=levels)
        out = decode_attention(q, k_pre, v_pre, qpos, prefix_levels=levels,
                               fresh_kv=(k_f, v_f))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_key_valid_and_softcap(self):
        s, pos = 16, 9
        q, k_pre, v_pre, k_f, v_f = self._setup(s=s, pos=pos)
        qpos = jnp.array([pos], jnp.int32)
        key_valid = jnp.ones((2, s), bool).at[:, 2:4].set(False)
        zero = jnp.int32(0)
        k_in = jax.lax.dynamic_update_slice(k_pre, k_f, (zero, zero, jnp.int32(pos), zero))
        v_in = jax.lax.dynamic_update_slice(v_pre, v_f, (zero, zero, jnp.int32(pos), zero))
        ref = decode_attention(q, k_in, v_in, qpos, key_valid=key_valid,
                               logit_softcap=30.0)
        out = decode_attention(q, k_pre, v_pre, qpos, key_valid=key_valid,
                               logit_softcap=30.0, fresh_kv=(k_f, v_f))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_quant_cache_close_to_f32(self):
        """int8 cache + fresh column tracks the exact f32 result within
        the int8 rounding budget (the self column itself is exact)."""
        s, pos = 16, 9
        q, k_pre, v_pre, k_f, v_f = self._setup(s=s, pos=pos)
        qpos = jnp.array([pos], jnp.int32)
        from uniaudio2_tpu.ops.kv_cache import quantize_slots
        kq = quantize_slots(k_pre)
        vq = quantize_slots(v_pre)
        exact = decode_attention(q, k_pre, v_pre, qpos, fresh_kv=(k_f, v_f))
        quant = decode_attention(q, kq, vq, qpos, fresh_kv=(k_f, v_f))
        err = np.abs(np.asarray(quant) - np.asarray(exact))
        ref = np.abs(np.asarray(exact)).mean()
        assert err.mean() < 0.05 * max(ref, 1e-6)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = UnifiedModelConfig.tiny()
    from uniaudio2_tpu.models import unified
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


class TestEngineDeferred:
    def test_greedy_identity_f32(self, tiny_setup):
        """Exact cache: deferred and inline attend over identical values,
        so greedy decode is token-identical."""
        from uniaudio2_tpu.engine import tasks
        from uniaudio2_tpu.engine.decode import DecodeEngine
        cfg, params = tiny_setup
        g, m = tasks.prepare_tts(np.array([1, 5, 6]), np.array([1, 10, 2]),
                                 cfg.tokens)
        eng_in = DecodeEngine(params, cfg, max_frames=8, buckets=(64,),
                              cache_dtype=jnp.float32, kv_quant="off",
                              kv_write="inline")
        eng_df = DecodeEngine(params, cfg, max_frames=8, buckets=(64,),
                              cache_dtype=jnp.float32, kv_quant="off",
                              kv_write="deferred")
        r_in, s_in = eng_in.generate_audio(g, m, topk=1)
        r_df, s_df = eng_df.generate_audio(g, m, topk=1)
        np.testing.assert_array_equal(np.asarray(r_in), np.asarray(r_df))
        np.testing.assert_array_equal(np.asarray(s_in), np.asarray(s_df))

    def test_greedy_overlap_int8(self, tiny_setup):
        """int8 cache: the deferred self column skips one rounding, so we
        assert the prefix-agreement contract (first token must match; the
        first decode step reads only prefill-written slots)."""
        from uniaudio2_tpu.engine import tasks
        from uniaudio2_tpu.engine.decode import DecodeEngine
        cfg, params = tiny_setup
        g, m = tasks.prepare_asr(
            np.array([1, 5, 6, 7, 9, 2]),
            np.zeros((4, 8), np.int64), np.zeros((4, 8), np.int64),
            cfg.tokens)
        eng_in = DecodeEngine(params, cfg, max_frames=8, buckets=(64,),
                              kv_quant="on", kv_write="inline")
        eng_df = DecodeEngine(params, cfg, max_frames=8, buckets=(64,),
                              kv_quant="on", kv_write="deferred")
        t_in = eng_in.generate_text(g, m, topk=1)
        t_df = eng_df.generate_text(g, m, topk=1)
        n = min(len(t_in), len(t_df))
        agree = 0
        for a, b in zip(t_in[:n], t_df[:n]):
            if a != b:
                break
            agree += 1
        assert n == 0 or agree >= 1

    def test_batched_greedy_identity_f32(self, tiny_setup):
        from uniaudio2_tpu.engine import tasks
        from uniaudio2_tpu.engine.decode import DecodeEngine
        cfg, params = tiny_setup
        reqs = [tasks.prepare_tts(np.array([1, 5, 6]),
                                  np.array([1, 10, 2]), cfg.tokens),
                tasks.prepare_tts(np.array([1, 7, 8, 3]),
                                  np.array([1, 11, 4, 2]), cfg.tokens)]
        eng_in = DecodeEngine(params, cfg, max_frames=6, buckets=(64,),
                              cache_dtype=jnp.float32, kv_quant="off",
                              kv_write="inline")
        eng_df = DecodeEngine(params, cfg, max_frames=6, buckets=(64,),
                              cache_dtype=jnp.float32, kv_quant="off",
                              kv_write="deferred")
        out_in = eng_in.generate_audio_batch(reqs, topk=1)
        out_df = eng_df.generate_audio_batch(reqs, topk=1)
        for (r_i, s_i), (r_d, s_d) in zip(out_in, out_df):
            np.testing.assert_array_equal(np.asarray(r_i), np.asarray(r_d))
            np.testing.assert_array_equal(np.asarray(s_i), np.asarray(s_d))

    def test_unrolled_params_greedy_identity_f32(self, tiny_setup):
        """The production serving layout: unrolled per-layer weight lists
        + STACKED deferred cache (the engine forces stacked whenever
        kv_write=deferred, regardless of the unrolled params)."""
        from uniaudio2_tpu.engine import tasks
        from uniaudio2_tpu.engine.decode import DecodeEngine
        from uniaudio2_tpu.models.unified import prepare_serving_params
        cfg, params = tiny_setup
        sp = prepare_serving_params(params, dtype=jnp.float32)
        g, m = tasks.prepare_tts(np.array([1, 5, 6]), np.array([1, 10, 2]),
                                 cfg.tokens)
        eng_in = DecodeEngine(sp, cfg, max_frames=8, buckets=(64,),
                              cache_dtype=jnp.float32, kv_quant="off",
                              kv_write="inline")
        assert eng_in._cache_lists
        eng_df = DecodeEngine(sp, cfg, max_frames=8, buckets=(64,),
                              cache_dtype=jnp.float32, kv_quant="off",
                              kv_write="deferred")
        assert not eng_df._cache_lists
        r_in, s_in = eng_in.generate_audio(g, m, topk=1)
        r_df, s_df = eng_df.generate_audio(g, m, topk=1)
        np.testing.assert_array_equal(np.asarray(r_in), np.asarray(r_df))
        np.testing.assert_array_equal(np.asarray(s_in), np.asarray(s_df))

    def test_resolver_rejects_unknown(self):
        from uniaudio2_tpu.engine.decode import resolve_kv_write
        assert resolve_kv_write("inline") == "inline"
        assert resolve_kv_write("DEFERRED") == "deferred"
        with pytest.raises(ValueError):
            resolve_kv_write("maybe")


class TestContinuousDeferred:
    def test_online_results_match_inline(self, tiny_setup):
        """The continuous-batching scheduler produces identical streams
        under deferred writes (f32 cache: exact values either way). The
        refill prefill stays inline (T>1 bulk write); only frame bodies
        defer."""
        from uniaudio2_tpu.engine import tasks
        from uniaudio2_tpu.engine.continuous import ContinuousEngine
        cfg, params = tiny_setup
        reqs = [tasks.prepare_tts(np.array([1, 5, 6]),
                                  np.array([1, 10, 2]), cfg.tokens),
                tasks.prepare_tts(np.array([1, 7, 8, 3]),
                                  np.array([1, 11, 4, 2]), cfg.tokens)]

        def run(kv_write):
            eng = ContinuousEngine(
                params, cfg, mode="audio", rows=2, bucket=32, seg_frames=4,
                cache_len=256, max_frames=6, topk=1,
                cache_dtype=jnp.float32, kv_quant="off", seg_ladder="off",
                kv_write=kv_write)
            for g, m in reqs:
                eng.submit(g, m)
            return eng.run_until_drained()

        out_in = run("inline")
        out_df = run("deferred")
        assert out_in.keys() == out_df.keys()
        for rid in out_in:
            r_i, s_i = out_in[rid]
            r_d, s_d = out_df[rid]
            np.testing.assert_array_equal(np.asarray(r_i), np.asarray(r_d))
            np.testing.assert_array_equal(np.asarray(s_i), np.asarray(s_d))
