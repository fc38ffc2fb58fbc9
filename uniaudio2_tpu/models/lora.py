"""LoRA adapters for the GPT stacks (fine-tuning capability).

The reference carries LoRA in two places: a LoRA-augmented streaming
transformer (`llm_modules/transformer_lora.py:293-345`: per-projection
`lora_A (r, d)` / `lora_B (d, r)` pairs, `scaling = lora_alpha / r`,
kaiming-init A / zero-init B so training starts at the base model) and
peft-wrapped LLaMA inside the codec's reasoning-text head. Neither is on
the shipped inference path, but both define the fine-tuning surface a
user of the reference expects.

TPU-native design: adapters are a SEPARATE pytree mirroring the target
weights, and `apply_lora` merges them functionally —
``w + (alpha/r) * a @ b`` — producing an ordinary params tree. Training
differentiates through the merge with the base frozen
(``grad(lambda lora: loss(apply_lora(base, lora)))``), so every existing
forward/decode/sharding path works unchanged; serving merges once and
pays zero overhead. The merge is one small einsum per target per step
(r x d x n FLOPs, negligible next to the forward).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

DEFAULT_TARGETS = ("qkv_w", "attn_proj_w")


def init_lora(
    key: jax.Array,
    params: Params,
    *,
    rank: int = 8,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Params:
    """Zero-effect adapters for every stacked layer weight named in
    ``targets``: A ~ kaiming-uniform, B = 0 (reference
    `transformer_lora.py:349-357`). Returns a pure-array pytree
    {name: {"a": (L, in, r), "b": (L, r, out)}} — rank/alpha are static
    arguments of `apply_lora` so the whole tree is differentiable.
    """
    layers = params["layers"]
    assert not isinstance(layers, list), (
        "init_lora expects the stacked training layout (not serving form)")
    out: Params = {}
    for name in targets:
        w = layers[name]
        assert w.ndim == 3, f"{name}: expected stacked (L, in, out)"
        n_l, d_in, d_out = w.shape
        key, sub = jax.random.split(key)
        # torch kaiming_uniform_(a=sqrt(5)) on (r, d): gain sqrt(1/3),
        # bound = gain * sqrt(3 / fan_in) = 1/sqrt(d_in)
        bound = 1.0 / math.sqrt(d_in)
        a = jax.random.uniform(
            sub, (n_l, d_in, rank), dtype, minval=-bound, maxval=bound)
        out[name] = {
            "a": a,
            "b": jnp.zeros((n_l, rank, d_out), dtype),
        }
    return out


def apply_lora(params: Params, lora: Params, *, alpha: float = 32.0) -> Params:
    """Merge adapters into a new params tree:
    ``w' = w + (alpha / rank) * a @ b`` per target (reference scaling,
    `transformer_lora.py:345`; rank is read off the adapter shape).
    Differentiable in ``lora``."""
    layers = dict(params["layers"])
    for name, ab in lora.items():
        scaling = alpha / ab["a"].shape[-1]
        delta = jnp.einsum("lir,lro->lio", ab["a"], ab["b"]) * scaling
        layers[name] = layers[name] + delta.astype(layers[name].dtype)
    out = dict(params)
    out["layers"] = layers
    return out


def apply_lora_unified(params: Params, loras: Dict[str, Params], *,
                       alpha: float = 32.0) -> Params:
    """Merge per-submodule adapters into a unified-model params tree,
    e.g. ``{"backbone": lora_b, "decoder": lora_d}``."""
    out = dict(params)
    for sub, lora in loras.items():
        out[sub] = apply_lora(params[sub], lora, alpha=alpha)
    return out


def lora_param_count(lora: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(lora))
