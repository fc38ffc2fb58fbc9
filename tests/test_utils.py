"""Audio utils (loudness/clip/specaug), debug tripwires, safetensors merge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.codec import audio_utils as au
from uniaudio2_tpu.utils import debug


def test_clip_by_length_alignment():
    import random

    x = np.arange(100)
    rng = random.Random(0)
    out = au.clip_by_length(x, 20, factor=8, rng=rng)
    assert len(out) == 20
    assert out[0] % 8 == 0
    assert (au.clip_by_length(np.arange(5), 20) == np.arange(5)).all()


def test_codec_specaug_masks():
    import random

    codec = np.zeros((100, 8), np.int64) + 7
    out = au.codec_specaug(codec, mask_id=-1, rng=random.Random(0))
    assert out.shape == (800,)
    assert (out == -1).any()


def test_loudness_and_volume_norm():
    sr = 24000
    t = np.arange(sr * 2) / sr
    sig = (0.1 * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    lufs = au.loudness_lufs(sig, sr)
    assert -40 < lufs < -10
    vn = au.VolumeNorm(params=(-16, 0), sample_rate=sr, seed=0)
    out = vn(sig)
    lufs2 = au.loudness_lufs(out, sr)
    assert abs(lufs2 - (-16)) < 1.0
    assert np.max(np.abs(out)) < 1.0
    # silence passes through
    silence = np.zeros(1000, np.float32)
    assert (vn(silence) == silence).all()


def test_speech_edit_time_stamp():
    import random

    token_list = ["SIL", "k_B", "ae_I", "t_E", "s_S"]
    phones = [0, 0, 1, 1, 2, 3, 3, 4, 0]
    start, end = au.speech_edit_find_time_stamp(
        phones, token_list, rng=random.Random(0)
    )
    assert 0 <= start < end <= len(phones)


def test_check_finite():
    debug.check_finite(np.ones(3), "ok")
    with pytest.raises(FloatingPointError):
        debug.check_finite(np.array([1.0, np.nan]), "bad")
    x = jnp.ones(3)
    y = debug.assert_finite(x, "graph")
    np.testing.assert_array_equal(np.asarray(y), np.ones(3))


def test_seed_everything():
    key = debug.seed_everything(7)
    assert key.shape == (2,)
    a = np.random.rand()
    debug.seed_everything(7)
    assert np.random.rand() == a


def test_merge_safetensors(tmp_path):
    st = pytest.importorskip("safetensors.numpy")
    d = tmp_path / "ckpt"
    d.mkdir()
    st.save_file({"a": np.ones(3, np.float32)}, str(d / "m-00001.safetensors"))
    st.save_file({"b": np.zeros(2, np.float32)}, str(d / "m-00002.safetensors"))
    from uniaudio2_tpu.convert.merge_safetensors import merge_safetensors

    merged = merge_safetensors(str(d))
    assert set(merged) == {"a", "b"}
