"""Golden tests of the two-phase decode-loop semantics.

The reference's audio generation loop (`tts_task.py:253-282`) has intricate
stateful rules: frames accumulate as *reasoning* until an all-`reason_eos`
frame, which is dropped and flips the phase (and suppresses saving for that
frame via `save_flag`); subsequent frames accumulate as *semantic* minus the
reasoning-card offset; an all-`semantic_eos+card` frame stops. The generated
BOS frame of each phase is dropped by the host split.

Here the model is stubbed with a scripted frame sequence so the compiled
loop's transitions can be checked exactly against those rules.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.engine import decode as dec
from uniaudio2_tpu.models import unified


@pytest.fixture()
def scripted_engine(monkeypatch):
    cfg = UnifiedModelConfig.tiny()
    ts = cfg.tokens
    R = ts.audio_reason_card

    # scripted frames, indexed by decode step (pos - (L-1)):
    # [reason_bos*, r1, r2, REOS, sem_bos(+R), s1(+R), s2(+R), SEOS(+R)]
    script = np.array([
        [ts.reason_bos] * 8,             # generated reasoning BOS (dropped by split)
        [5] * 8,                         # r1
        [6] * 8,                         # r2
        [ts.reason_eos] * 8,             # phase switch (dropped)
        [ts.semantic_bos + R] * 8,       # semantic BOS (dropped by split)
        [7 + R] * 8,                     # s1
        [8 + R] * 8,                     # s2
        [ts.semantic_eos + R] * 8,       # stop
    ], np.int32)
    script_j = jnp.asarray(script)

    real_decode_frame = unified.decode_frame

    def scripted_decode_frame(params, cfg_, tokens, tokens_mask, caches, pos,
                              key, **kw):
        # keep cache plumbing alive but overwrite the sampled frame
        frame, caches = real_decode_frame(
            params, cfg_, tokens, tokens_mask, caches, pos, key, **kw)
        step = jnp.clip(pos - (prompt_len - 1), 0, script.shape[0] - 1)
        audio = script_j[step]
        text = jnp.zeros_like(frame[:, 0])
        out = jnp.concatenate(
            [text[:, None], jnp.broadcast_to(audio, frame[:, 1:].shape)], 1)
        return out, caches

    prompt_len = 3
    monkeypatch.setattr(dec.unified, "decode_frame", scripted_decode_frame)
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    eng = dec.DecodeEngine(params, cfg, max_frames=10,
                           cache_dtype=jnp.float32, buckets=(64,))
    return eng, ts, prompt_len


def test_two_phase_split_rules(scripted_engine):
    eng, ts, L = scripted_engine
    grid = np.zeros((L, 9), np.int64)
    grid[:, -1] = [1, 2, 3]
    mask = np.zeros((L, 9), bool)
    mask[:, -1] = True
    reason, semantic = eng.generate_audio(grid, mask, topk=1)
    # reasoning kept: r1, r2 (generated BOS frame dropped by the split,
    # REOS switch frame dropped by save_flag)
    np.testing.assert_array_equal(reason, np.asarray([[5, 6]] * 8))
    # semantic kept: s1, s2 minus the reasoning card offset (semantic BOS
    # frame dropped by the split; SEOS stops without being saved)
    np.testing.assert_array_equal(semantic, np.asarray([[7, 8]] * 8))
