"""Checkpoint converters: weight-norm folding vs torch, and a synthetic
litgpt-named state-dict round trip through convert_gpt/convert_unified."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import GPTConfig, UnifiedModelConfig
from uniaudio2_tpu.convert import torch_to_jax as cvt
from uniaudio2_tpu.convert.codec import fold_weight_norm
from uniaudio2_tpu.models import gpt, unified

torch = pytest.importorskip("torch")


def test_fold_weight_norm_matches_torch():
    conv = torch.nn.Conv1d(3, 5, 4)
    wn = torch.nn.utils.weight_norm(conv)
    expected = wn.weight.detach().numpy()
    sd = {"m." + k: v.detach().numpy() for k, v in wn.state_dict().items()}
    folded = fold_weight_norm(sd, "m")
    assert folded is not None
    np.testing.assert_allclose(folded, expected, atol=1e-6)
    # parametrizations naming style
    pn = torch.nn.utils.parametrizations.weight_norm(torch.nn.Conv1d(3, 5, 4))
    sd2 = {"p." + k: v.detach().numpy() for k, v in pn.state_dict().items()}
    folded2 = fold_weight_norm(sd2, "p")
    assert folded2 is not None
    np.testing.assert_allclose(folded2, pn.weight.detach().numpy(), atol=1e-6)


def _gpt_to_litgpt_sd(params, cfg, prefix):
    """Inverse of convert_gpt: our params -> litgpt-named numpy dict."""
    sd = {}
    lp = params["layers"]
    for i in range(cfg.n_layer):
        base = f"{prefix}transformer.h.{i}."
        sd[base + "attn.qkv.weight"] = np.asarray(lp["qkv_w"][i]).T
        sd[base + "attn.proj.weight"] = np.asarray(lp["attn_proj_w"][i]).T
        sd[base + "norm_1.weight"] = np.asarray(lp["norm1_w"][i])
        sd[base + "norm_2.weight"] = np.asarray(lp["norm2_w"][i])
        sd[base + "mlp.fc_1.weight"] = np.asarray(lp["fc1_w"][i]).T
        sd[base + "mlp.fc_2.weight"] = np.asarray(lp["fc2_w"][i]).T
        sd[base + "mlp.proj.weight"] = np.asarray(lp["mlp_proj_w"][i]).T
    sd[prefix + "transformer.ln_f.weight"] = np.asarray(params["ln_f_w"])
    if "wte" in params:
        sd[prefix + "transformer.wte.weight"] = np.asarray(params["wte"])
    if "lm_head_w" in params:
        sd[prefix + "lm_head.weight"] = np.asarray(params["lm_head_w"]).T
    return sd


def test_convert_gpt_roundtrip():
    cfg = GPTConfig.from_name("tiny-backbone")
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    sd = _gpt_to_litgpt_sd(params, cfg, "")
    out, missing = cvt.convert_gpt(sd, "", cfg)
    assert not missing
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(out)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_convert_unified_roundtrip_and_forward():
    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(1), cfg)
    sd = {}
    sd.update(_gpt_to_litgpt_sd(params["backbone"], cfg.backbone, "backbone."))
    sd.update(_gpt_to_litgpt_sd(params["decoder"], cfg.decoder, "decoder."))
    sd.update(_gpt_to_litgpt_sd(
        params["understanding_expert"], cfg.understanding_expert,
        "audio_understanding_expert."))
    sd.update(_gpt_to_litgpt_sd(
        params["generation_expert"], cfg.generation_expert,
        "audio_generation_expert."))
    sd["audio_embeddings.weight"] = np.asarray(params["audio_embeddings"])
    sd["projection.weight"] = np.asarray(params["projection_w"]).T
    sd["audio_head"] = np.asarray(params["audio_head"])
    # module.-prefixed envelope like FSDP checkpoints
    sd = {"module." + k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pt")
        torch.save({"model": sd}, path)
        loaded = cvt.load_torch_state_dict(path)
    out, missing = cvt.convert_unified(loaded, cfg)
    assert not missing, missing[:5]
    out = cvt.to_jax(out)
    # converted params must be numerically identical -> identical forward
    tokens = jnp.zeros((1, 4, 9), jnp.int32)
    mask = jnp.ones((1, 4, 9), bool)
    ref = unified.forward_text(params, cfg, tokens, mask)
    got = unified.forward_text(out, cfg, tokens, mask)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)


def test_npz_roundtrip(tmp_path):
    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(2), cfg)
    path = str(tmp_path / "p.npz")
    cvt.save_npz(path, params)
    loaded = cvt.load_npz(path, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
