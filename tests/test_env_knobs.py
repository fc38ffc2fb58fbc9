"""Env-knob parsing hardening (r4 advisor findings): UA2_LEAN_FUSED
accepts on/off/auto aliases and rejects garbage; UA2_XLA_OPTS rejects
malformed segments near the env var instead of at backend compile time
and coerces numeric values."""

import os

import pytest

from uniaudio2_tpu.engine import decode as decode_mod
from uniaudio2_tpu.train import lean_opt


@pytest.fixture
def clean_env(monkeypatch):
    monkeypatch.delenv("UA2_LEAN_FUSED", raising=False)
    monkeypatch.delenv("UA2_XLA_OPTS", raising=False)
    return monkeypatch


def test_lean_fused_env_aliases(clean_env):
    # tests run on the 8-device CPU mesh: cpu AND multi-device, so both
    # "auto" arms resolve to off; "on" stays on (interpret-mode on CPU).
    for raw, expected_use in [
        ("0", False), ("off", False), ("OFF", False),
        ("1", True), ("on", True), (" On ", True),
        ("auto", False), ("AUTO", False),
    ]:
        clean_env.setenv("UA2_LEAN_FUSED", raw)
        if expected_use:
            with pytest.warns(RuntimeWarning, match="single-device"):
                use, interp = lean_opt._resolve_fused(None)
        else:
            use, interp = lean_opt._resolve_fused(None)
        assert use is expected_use, raw
        if expected_use:
            assert interp  # CPU backend -> interpret-mode pallas


def test_lean_fused_env_rejects_garbage(clean_env):
    clean_env.setenv("UA2_LEAN_FUSED", "maybe")
    with pytest.raises(ValueError, match="UA2_LEAN_FUSED"):
        lean_opt._resolve_fused(None)


def test_lean_fused_explicit_arg_rejects_garbage(clean_env):
    with pytest.raises(ValueError, match="on/off/auto"):
        lean_opt._resolve_fused("sideways")


def test_xla_opts_parsing(clean_env):
    calls = {}

    def fake_jit(fn, compiler_options=None):
        calls["opts"] = compiler_options
        return fn

    real_jit = decode_mod.jax.jit
    decode_mod.jax.jit = fake_jit
    try:
        clean_env.setenv(
            "UA2_XLA_OPTS",
            "xla_flag_a=true, xla_flag_b=17,xla_flag_c=0.5,"
            "xla_flag_d=text,",  # trailing comma tolerated
        )
        decode_mod._serving_jit(lambda x: x)
        assert calls["opts"] == {
            "xla_flag_a": True,
            "xla_flag_b": 17,
            "xla_flag_c": 0.5,
            "xla_flag_d": "text",
        }
    finally:
        decode_mod.jax.jit = real_jit


def test_xla_opts_malformed_segment_raises(clean_env):
    for bad in ("justakey", "k=", "=v", "a=1,oops"):
        clean_env.setenv("UA2_XLA_OPTS", bad)
        with pytest.raises(ValueError, match="UA2_XLA_OPTS"):
            decode_mod._serving_jit(lambda x: x)


def test_xla_opts_empty_is_plain_jit(clean_env):
    clean_env.setenv("UA2_XLA_OPTS", "  ")
    fn = decode_mod._serving_jit(lambda x: x + 1)
    assert fn(1) == 2  # plain jit path
