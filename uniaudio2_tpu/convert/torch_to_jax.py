"""Checkpoint conversion: reference PyTorch state dicts -> JAX param pytrees.

One-time offline converters so the published HF checkpoints load directly
(SURVEY.md §7 build plan, "checkpoints" bullet). Name maps target the
reference's module trees:

* unified LLM `Model_stage3` (`/root/reference/llm_models/model_new.py:
  334-355`) over litgpt-style GPTs (`lit_model.py:22-60`: ``transformer.wte``,
  ``transformer.h.{i}.{norm_1,attn.qkv,attn.proj,norm_2,mlp.{fc_1,fc_2,
  proj}}``, ``transformer.ln_f``, ``lm_head``), including the legacy fused
  ``attn.attn`` layout (grouped-interleaved) which is reassembled to the
  contiguous q|k|v layout exactly like `lit_model.py:735-776`;
* checkpoint envelopes: ``{"model": sd}`` / ``{"state_dict": sd}`` / bare,
  with ``module.`` prefix stripping (`train_utils.py:173-175`).

All weights transpose from torch ``(out, in)`` to our ``(in, out)``; per-layer
tensors stack on a leading layer axis for `lax.scan`.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple

import numpy as np

from uniaudio2_tpu.config import GPTConfig, UnifiedModelConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a checkpoint file and normalise to {name: float32 ndarray}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        sd = ckpt["model"]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    else:
        sd = ckpt
    out = {}
    for k, v in sd.items():
        k = k[len("module."):] if k.startswith("module.") else k
        if hasattr(v, "detach"):
            v = v.detach().float().numpy()
        out[k] = np.asarray(v)
    return out


def qkv_reassemble(w: np.ndarray, cfg: GPTConfig) -> np.ndarray:
    """Legacy litgpt fused-qkv layout (per-group interleaved
    [q_0..q_{qpk-1}, k, v] blocks) -> contiguous [Q | K | V]
    (reference `qkv_reassemble`, `lit_model.py:735-776` inverse mapping)."""
    hs, g, qpk = cfg.head_size, cfg.n_query_groups, cfg.q_per_kv
    blocks = w.reshape(g, (qpk + 2) * hs, -1)
    q = blocks[:, : qpk * hs].reshape(g * qpk * hs, -1)
    k = blocks[:, qpk * hs : (qpk + 1) * hs].reshape(g * hs, -1)
    v = blocks[:, (qpk + 1) * hs :].reshape(g * hs, -1)
    return np.concatenate([q, k, v], axis=0)


def convert_gpt(
    sd: Mapping[str, np.ndarray], prefix: str, cfg: GPTConfig
) -> Tuple[Dict[str, Any], List[str]]:
    """litgpt GPT subtree -> our stacked-layer params. Returns
    (params, missing_keys)."""
    missing: List[str] = []

    def get(name):
        key = prefix + name
        if key not in sd:
            missing.append(key)
            return None
        return sd[key]

    n_l = cfg.n_layer
    qkv, attn_proj, n1, n2, fc1, fc2, mproj = [], [], [], [], [], [], []
    for i in range(n_l):
        base = f"transformer.h.{i}."
        w = get(base + "attn.qkv.weight")
        if w is None and (prefix + base + "attn.attn.weight") in sd:
            missing.pop()
            w = qkv_reassemble(sd[prefix + base + "attn.attn.weight"], cfg)
        qkv.append(w.T if w is not None else np.zeros(
            (cfg.n_embd, (cfg.n_head + 2 * cfg.n_query_groups) * cfg.head_size),
            np.float32))
        for lst, name, tr in (
            (attn_proj, base + "attn.proj.weight", True),
            (n1, base + "norm_1.weight", False),
            (n2, base + "norm_2.weight", False),
            (fc1, base + "mlp.fc_1.weight", True),
            (fc2, base + "mlp.fc_2.weight", True),
            (mproj, base + "mlp.proj.weight", True),
        ):
            w = get(name)
            if w is None:
                w = np.zeros((1,), np.float32)
            lst.append(w.T if tr and w.ndim == 2 else w)

    params: Dict[str, Any] = {
        "layers": {
            "norm1_w": np.stack(n1),
            "qkv_w": np.stack(qkv),
            "attn_proj_w": np.stack(attn_proj),
            "norm2_w": np.stack(n2),
            "fc1_w": np.stack(fc1),
            "fc2_w": np.stack(fc2),
            "mlp_proj_w": np.stack(mproj),
        },
        "ln_f_w": get("transformer.ln_f.weight"),
    }
    if cfg.has_wte:
        params["wte"] = get("transformer.wte.weight")
    if cfg.has_lm_head:
        w = get("lm_head.weight")
        params["lm_head_w"] = w.T if w is not None else None
    return params, missing


def convert_unified(
    sd: Mapping[str, np.ndarray], cfg: UnifiedModelConfig
) -> Tuple[Dict[str, Any], List[str]]:
    """Reference `Model_stage3` state dict -> unified-model params."""
    missing: List[str] = []
    backbone, m = convert_gpt(sd, "backbone.", cfg.backbone)
    missing += m
    decoder, m = convert_gpt(sd, "decoder.", cfg.decoder)
    missing += m
    und, m = convert_gpt(sd, "audio_understanding_expert.", cfg.understanding_expert)
    missing += m
    gen, m = convert_gpt(sd, "audio_generation_expert.", cfg.generation_expert)
    missing += m

    def get(name):
        if name not in sd:
            missing.append(name)
            return None
        return sd[name]

    proj = get("projection.weight")
    params = {
        "backbone": backbone,
        "decoder": decoder,
        "understanding_expert": und,
        "generation_expert": gen,
        "audio_embeddings": get("audio_embeddings.weight"),
        "projection_w": proj.T if proj is not None else None,
        "audio_head": get("audio_head"),
    }
    return params, missing


def to_jax(params, dtype=None):
    """numpy pytree -> jax arrays (optionally casting floats)."""
    import jax
    import jax.numpy as jnp

    def conv(x):
        a = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        return a

    return jax.tree_util.tree_map(conv, params)


def save_npz(path: str, params) -> None:
    """Flatten a pytree to an .npz archive (portable, no orbax needed)."""
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {
        "/".join(str(getattr(p, "key", p)) for p in kp): np.asarray(v)
        for kp, v in flat
    }
    np.savez(path, **arrays)


def load_npz(path: str, like) -> Any:
    """Load an .npz archive back into the structure of ``like``."""
    import jax

    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for kp, v in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in kp)
        arr = np.asarray(data[name])
        if arr.shape != np.shape(v):
            raise ValueError(
                f"checkpoint leaf {name!r} has shape {arr.shape}, model "
                f"expects {np.shape(v)} — config/checkpoint mismatch"
            )
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)
