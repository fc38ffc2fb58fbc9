"""HTTP serving endpoint: results match direct engine calls; concurrent
requests batch; malformed requests get 4xx."""

import http.client
import json
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine import tasks
from uniaudio2_tpu.engine.decode import DecodeEngine
from uniaudio2_tpu.engine.http_server import InferenceHTTPServer
from uniaudio2_tpu.models import unified


@pytest.fixture(scope="module")
def served():
    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    engine = DecodeEngine(params, cfg, max_frames=6,
                          cache_dtype=jnp.float32, buckets=(32,))
    srv = InferenceHTTPServer(engine, max_batch=4, max_wait_ms=30.0)
    srv.start()
    yield srv, engine
    srv.stop()


def _post(port, path, payload, timeout=300):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", path, json.dumps(payload),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def test_healthz(served):
    srv, _ = served
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    assert resp.status == 200 and body["ok"] is True


def test_tts_roundtrip_matches_engine(served):
    srv, engine = served
    ts = engine.cfg.tokens
    prompt = [3, 1, 4]
    text = [1, 5, 9, 2]
    status, body = _post(srv.port, "/v1/tts", {
        "prompt_tokens": prompt, "text_tokens": text,
        "topk": 1, "seed": 7,
    })
    assert status == 200, body
    g, m = tasks.prepare_tts(np.asarray(prompt), np.asarray(text), ts)
    reason, semantic = engine.generate_audio(g, m, topk=1, seed=7)
    np.testing.assert_array_equal(np.asarray(body["reason"]),
                                  np.asarray(reason))
    np.testing.assert_array_equal(np.asarray(body["semantic"]),
                                  np.asarray(semantic))


def test_asr_roundtrip_matches_engine(served):
    srv, engine = served
    ts = engine.cfg.tokens
    rng = np.random.default_rng(0)
    ncb = ts.num_codebooks
    reason = rng.integers(0, 50, (ncb, 5))
    semantic = rng.integers(0, 50, (ncb, 9))
    prompt = [2, 7]
    status, body = _post(srv.port, "/v1/asr", {
        "prompt_tokens": prompt,
        "reason": reason.tolist(), "semantic": semantic.tolist(),
        "topk": 1,
    })
    assert status == 200, body
    g, m = tasks.prepare_asr(np.asarray(prompt), reason.T, semantic.T, ts)
    expected = engine.generate_text(g, m, topk=1, seed=888)
    np.testing.assert_array_equal(np.asarray(body["tokens"]),
                                  np.asarray(expected))


def test_concurrent_requests_batch(served):
    srv, engine = served
    before = srv.batcher.stats["batches"]
    results = [None] * 3

    def worker(i):
        results[i] = _post(srv.port, "/v1/tts", {
            "text_tokens": [1 + i, 5, 9], "topk": 1, "seed": 7,
        })

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results)
    # all three identical-param requests rode at most 2 batched launches
    assert srv.batcher.stats["batches"] - before <= 2


def test_bad_requests(served):
    srv, _ = served
    assert _post(srv.port, "/v1/tts", {})[0] == 400        # missing field
    assert _post(srv.port, "/v1/asr", {
        "reason": [[1, 2]], "semantic": [[3]],
    })[0] == 400                                           # wrong rows
    assert _post(srv.port, "/v1/nope", {})[0] == 404
