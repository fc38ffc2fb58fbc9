"""Device meshes and parameter sharding rules.

The reference's distributed story is FSDP/SDP/HSDP via torch wrappers
(`llm_utils/arguments.py:65`, `llm_utils/train_utils.py:19-21,109-205`). The
TPU-native equivalent (SURVEY.md §2.9) is declarative: build a
`jax.sharding.Mesh`, annotate parameter shardings with `NamedSharding`, and
let XLA SPMD insert the collectives.

Axes:
    * ``replica`` — pure data parallelism (gradients all-reduced). Maps to
      DCN between slices in HSDP mode.
    * ``fsdp``    — parameter/optimizer sharding with all-gather-on-use
      (≡ torch FSDP/ZeRO-3). Rides ICI.
    * ``tp``      — tensor parallelism over attention heads / MLP hidden
      (the reference has none — SURVEY §2.9 — we provide it as an upgrade).

Strategy mapping (reference `--data-parallel {fsdp,sdp,hsdp}`):
    * ``sdp``  -> mesh (replica=N): replicate params, shard batch.
    * ``fsdp`` -> mesh (fsdp=N): shard params on dim 0, shard batch.
    * ``hsdp`` -> mesh (replica=A, fsdp=B): shard params within a slice,
      replicate across slices.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(
    *,
    replica: int = 1,
    fsdp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = replica * fsdp * tp
    if need != len(devices):
        raise ValueError(
            f"mesh ({replica}x{fsdp}x{tp}={need}) != #devices ({len(devices)})"
        )
    arr = np.asarray(devices).reshape(replica, fsdp, tp)
    return Mesh(arr, axis_names=("replica", "fsdp", "tp"))


def mesh_for_strategy(strategy: str, n_devices: Optional[int] = None,
                      replica: Optional[int] = None) -> Mesh:
    """Build a mesh matching a reference `--data-parallel` strategy name."""
    n = n_devices or len(jax.devices())
    if strategy == "sdp":
        return build_mesh(replica=n)
    if strategy == "fsdp":
        return build_mesh(fsdp=n)
    if strategy == "hsdp":
        r = replica or _largest_divisor_leq(n, int(np.sqrt(n)))
        return build_mesh(replica=r, fsdp=n // r)
    raise ValueError(f"unknown data-parallel strategy: {strategy!r}")


def _largest_divisor_leq(n: int, k: int) -> int:
    for d in range(k, 0, -1):
        if n % d == 0:
            return d
    return 1


# ---------------------------------------------------------------------------
# Parameter sharding rules
# ---------------------------------------------------------------------------

_FSDP_MIN_SIZE = 2 ** 16  # don't shard tiny leaves (norm weights etc.)


def _weight_name(path: Tuple[str, ...]) -> Tuple[str, bool]:
    """Resolve a leaf path to its weight name.

    Serving params wrap weights in Quantized* namedtuples (leaf path ends
    with 'values'/'scale') and `prepare_serving_params` unstacks layers
    into lists (an integer index appears in the path) — the name rule must
    key on the enclosing weight field, not the raw last path entry.
    Returns (name, is_quant_scale)."""
    parts = [p for p in path if not p.isdigit()]
    if parts and parts[-1] in ("values", "scale"):
        return (parts[-2] if len(parts) > 1 else parts[-1],
                parts[-1] == "scale")
    return (parts[-1] if parts else "", False)


def _gpt_param_spec(path: Tuple[str, ...], leaf: jax.Array, tp: bool) -> P:
    """PartitionSpec for one GPT parameter leaf.

    Per-layer stacked leaves have shape (n_layer, in, out): FSDP shards the
    *second* axis (a true dimension of each layer matrix) so all-gathers
    stay per-layer; TP shards the output-feature axis of qkv/fc and the
    input-feature axis of the projections (Megatron column/row split).
    Unrolled serving layers (2-D per-layer matrices) get the same rules
    without the leading layer axis. Quantization scales stay replicated
    (small, and the Pallas kernels consume them whole)."""
    name, is_scale = _weight_name(path)
    if is_scale or leaf.size < _FSDP_MIN_SIZE or leaf.ndim < 2:
        return P()
    if name in ("wte", "lm_head_w"):
        # (V, D) / (D, V): shard the vocab axis over fsdp, D over tp
        if name == "wte":
            return P("fsdp", "tp" if tp else None)
        return P("fsdp", "tp" if tp else None) if not tp else P("fsdp", "tp")
    if leaf.ndim == 4:  # stacked MoE experts (L, E, in, out)
        # expert parallelism: experts over tp, matrices over fsdp — each
        # device computes its expert shard of the dense combine and the
        # weighted sum all-reduces over tp (one psum XLA inserts itself)
        return P(None, "tp" if tp else None, "fsdp", None)
    if name == "moe_gate_w":  # (L, D, E) / (D, E): router replicated on tp
        return P(None, "fsdp", None) if leaf.ndim == 3 else P("fsdp", None)
    if name in ("qkv_w", "fc1_w", "fc2_w"):     # column-parallel
        lead = (None,) * (leaf.ndim - 2)
        return P(*lead, "fsdp", "tp" if tp else None)
    if name in ("attn_proj_w", "mlp_proj_w"):   # row-parallel
        lead = (None,) * (leaf.ndim - 2)
        return P(*lead, "tp" if tp else None, "fsdp")
    if leaf.ndim == 3:
        return P(None, "fsdp")
    if leaf.ndim == 2:
        return P("fsdp")
    return P()


def unified_param_specs(params: Dict[str, Any], use_tp: bool = False):
    """PartitionSpec pytree for the unified model's parameters."""

    def spec_fn(path, leaf):
        # DictKey has .key, SequenceKey .idx, GetAttrKey (namedtuples) .name
        keys = tuple(
            p.key if hasattr(p, "key") else
            p.name if hasattr(p, "name") else
            (str(p.idx) if hasattr(p, "idx") else str(p)) for p in path
        )
        name, is_scale = _weight_name(keys)
        if is_scale:
            return P()
        if name in ("audio_embeddings", "audio_embeddings_proj"):
            return P("fsdp", "tp" if use_tp else None)
        if name == "audio_head":  # (ncb, D_dec, V_audio); list form: 2-D
            if leaf.ndim == 3:
                return P(None, "fsdp", "tp" if use_tp else None)
            return P("fsdp", "tp" if use_tp else None)
        if name == "projection_w":
            return P("fsdp", None)
        return _gpt_param_spec(keys, leaf, use_tp)

    return jax.tree_util.tree_map_with_path(spec_fn, params)


def fit_spec_to_mesh(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Replicate any spec entry whose mesh-axis product does not divide its
    dimension, instead of failing at placement (e.g. the stacked-norm
    (n_layer, D) leaf under fsdp=8 with n_layer=28 — the rules are written
    mesh-agnostically, so indivisible dims fall back toward replication)."""
    entries = tuple(spec) + (None,) * (len(shape) - len(spec))
    out = []
    for dim, entry in zip(shape, entries):
        if entry is None:
            out.append(None)
            continue
        names = entry if isinstance(entry, tuple) else (entry,)
        prod = 1
        for nm in names:
            prod *= mesh.shape[nm]
        out.append(entry if dim % prod == 0 else None)
    while out and out[-1] is None:
        out.pop()
    return P(*out)


def fit_specs_to_mesh(specs, params, mesh: Mesh):
    """Apply `fit_spec_to_mesh` across a spec pytree (leaves aligned with
    ``params`` — arrays or ShapeDtypeStructs)."""
    return jax.tree_util.tree_map(
        lambda p, s: fit_spec_to_mesh(s, p.shape, mesh), params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Dict[str, Any], mesh: Mesh, use_tp: bool = False):
    """Place parameters on the mesh according to the spec rules."""
    specs = fit_specs_to_mesh(
        unified_param_specs(params, use_tp), params, mesh)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def batch_spec() -> P:
    """Input batch sharding: batch over (replica, fsdp)."""
    return P(("replica", "fsdp"))
