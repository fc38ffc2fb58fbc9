"""Memory-lean AdamW-family optimizer for single-chip training.

Why this exists (VERDICT r3 item 1 / docs/bench_train_r3.md): full AdamW
keeps two full moments — with bf16 params/grads/moments that is an
8 byte/param state+grad floor, which puts any backbone depth beyond ~2
layers past one 16 GiB chip for this model (the non-backbone embedding /
audio tables alone are ~1.4-2 B params). optax's `adafactor` shrinks the
*state* but its update materialises f32 temporaries for every parameter in
one scheduling window (measured 42.3 G planned at 8L/b4/s1024,
docs/bench_train_r3.md:66-70), so it OOMs anyway.

`adamw_lean` keeps AdamW's update *shape* with a fraction of the bytes:

* first moment: **int8 block-quantized** (absmax per 256-value block,
  bitsandbytes-style) — 1 byte/param + 4/256 scale overhead;
* second moment: **factored** row/column statistics (Adafactor's rank-1
  reconstruction, Shazeer & Stern 2018 §3) for every rank>=2 leaf — a few
  KB instead of 4 bytes/param; rank-1 leaves (norm gains) keep an exact
  f32 second moment (negligible);
* Adam-style bias correction on both moments; decoupled weight decay.

State+grad floor: bf16 p (2) + bf16 g (2) + int8 m (~1) ≈ 5 bytes/param —
an 8-layer-backbone geometry fits one 16 GiB chip (measured in
docs/bench_train_r4.md).

The update is built from per-leaf elementwise chains only (no full-tree
f32 temporaries); leaf updates are chained through
`jax.lax.optimization_barrier` so XLA schedules them sequentially — peak
temp memory is ONE leaf's f32 working set, not the whole tree's. This is
the "chunked, donated update" the round-3 verdict asked for.

Reference match: the training capability implied by the reference's FSDP
utilities (`llm_utils/train_utils.py:109-205`, `arguments.py:56-68`); the
optimizer itself is a TPU-native memory optimization with no reference
counterpart (the reference trains multi-GPU where plain AdamW fits).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

M_BLOCK = 256  # int8 first-moment quantization block (absmax scaling)


class _FactoredV(NamedTuple):
    """Factored second moment of one rank>=2 leaf: means of g**2 over the
    last axis (`row`, shape[:-1]) and second-to-last axis (`col`,
    shape[:-2] + shape[-1:]). Reconstruction:
    v[..., i, j] ~= row[..., i] * col[..., j] / mean(row[..., :])."""
    row: jax.Array
    col: jax.Array


class _LeafState(NamedTuple):
    m_q: jax.Array                      # int8, leaf shape
    m_scale: jax.Array                  # f32 (ceil(n / M_BLOCK),)
    v: Any                              # _FactoredV (rank>=2) or f32 leaf


class AdamWLeanState(NamedTuple):
    count: jax.Array                    # int32 step counter
    leaves: Any                         # tree of _LeafState


def _m_blocks(shape: Tuple[int, ...]) -> Optional[Tuple[int, ...]]:
    """Blocked view of a leaf for moment quantization: contiguous
    M_BLOCK-wide blocks along the LAST axis (a free reshape — no pad, no
    slice, no copy), or None when the last axis is not block-divisible
    (those leaves use one scale per last-axis row instead). The first
    version of this code quantized over a padded flat view; the
    pad/reshape/slice chains materialised full f32 copies of every leaf
    and cost ~200 ms/step at the bench geometry (traced r4) — the
    layout-aligned view fuses into the update kernel."""
    if shape and shape[-1] % M_BLOCK == 0:
        return shape[:-1] + (shape[-1] // M_BLOCK, M_BLOCK)
    return None


def _quant_m(m: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Blockwise-absmax int8 quantization of the first moment."""
    x = m.astype(jnp.float32)
    blocks = _m_blocks(m.shape)
    if blocks is None:
        if m.ndim == 0:
            scale = jnp.abs(x) / 127.0
        else:
            scale = jnp.max(jnp.abs(x), axis=-1) / 127.0
        q = jnp.round(x / jnp.maximum(scale[..., None] if m.ndim else scale,
                                      1e-30))
        return q.astype(jnp.int8), scale
    xb = x.reshape(blocks)
    scale = jnp.max(jnp.abs(xb), axis=-1) / 127.0
    q = jnp.round(xb / jnp.maximum(scale[..., None], 1e-30))
    return q.astype(jnp.int8).reshape(m.shape), scale


def _dequant_m(m_q: jax.Array, scale: jax.Array) -> jax.Array:
    x = m_q.astype(jnp.float32)
    blocks = _m_blocks(m_q.shape)
    if blocks is None:
        if m_q.ndim == 0:
            return x * scale
        return x * scale[..., None]
    return (x.reshape(blocks) * scale[..., None]).reshape(m_q.shape)


def _v_init(p: jax.Array):
    if p.ndim >= 2:
        return _FactoredV(
            row=jnp.zeros(p.shape[:-1], jnp.float32),
            col=jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32),
        )
    return jnp.zeros(p.shape, jnp.float32)


def _v_update(v, g2: jax.Array, b2: float):
    if isinstance(v, _FactoredV):
        return _FactoredV(
            row=b2 * v.row + (1.0 - b2) * jnp.mean(g2, axis=-1),
            col=b2 * v.col + (1.0 - b2) * jnp.mean(g2, axis=-2),
        )
    return b2 * v + (1.0 - b2) * g2


def _v_rsqrt(v, bias_corr: jax.Array, eps: float) -> jax.Array:
    """rsqrt of the (bias-corrected) second-moment estimate, broadcastable
    to the leaf shape. Kept as an elementwise expression so XLA fuses the
    rank-1 reconstruction into the update kernel without materialising a
    full f32 v-hat."""
    if isinstance(v, _FactoredV):
        row_mean = jnp.mean(v.row, axis=-1, keepdims=True)
        vhat = (v.row[..., :, None] * v.col[..., None, :]
                / jnp.maximum(row_mean[..., None], 1e-30)) / bias_corr
        return 1.0 / (jnp.sqrt(vhat) + eps)
    return 1.0 / (jnp.sqrt(v / bias_corr) + eps)


def _resolve_fused(fused) -> Tuple[bool, bool]:
    """(use_fused, interpret). ``fused``: "auto" (on for single-device
    TPU-class backends, off on CPU), "on"/"off", or None (= env
    UA2_LEAN_FUSED; "0"/"off" and "1"/"on" accepted, unrecognized values
    raise). The fused kernel is a single-device op — the XLA SPMD
    partitioner cannot shard a pallas_call and would silently replicate
    the leaf — so "auto" also turns itself off when the process sees more
    than one device (multi-chip training composes adamw_lean under
    sharding); an explicit "on" keeps the kernel but warns."""
    if fused is None:
        import os
        raw = os.environ.get("UA2_LEAN_FUSED", "auto").strip().lower()
        aliases = {"0": "off", "off": "off", "1": "on", "on": "on",
                   "auto": "auto"}
        if raw not in aliases:
            raise ValueError(
                f"UA2_LEAN_FUSED={raw!r}: expected on/1, off/0, or auto")
        fused = aliases[raw]
    if fused == "off":
        return False, False
    cpu = jax.default_backend() == "cpu"
    multi = len(jax.devices()) > 1
    if fused == "on":
        if multi:
            import warnings

            warnings.warn(
                "adamw_lean fused=on with >1 visible device: the Pallas "
                "update kernel is single-device only; sharded leaves would "
                "be replicated by the SPMD partitioner. Use fused='off' "
                "for sharded training.",
                RuntimeWarning,
            )
        return True, cpu  # interpret-mode pallas on CPU (tests)
    if fused != "auto":
        raise ValueError(f"adamw_lean fused={fused!r}: expected on/off/auto")
    return (not cpu and not multi), False


def adamw_lean(
    learning_rate: optax.ScalarOrSchedule,
    *,
    b1: float = 0.9,
    b2: float = 0.95,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    fused: Optional[str] = None,
) -> optax.GradientTransformation:
    """AdamW with int8 first moment + factored second moment (~1 byte of
    optimizer state per parameter). Composes like any optax transform
    (pairs with `clip_by_global_norm` / `MultiSteps` in
    `trainer.make_optimizer`).

    ``fused`` selects the Pallas fused per-leaf update
    (`ops/lean_update.py`) for rank>=2 block-divisible leaves — one
    VMEM-resident pass instead of the XLA quant/dequant chains that
    materialise f32 leaf copies (measured +113 ms/step at the r4 bench
    geometry, docs/bench_train_r4.md). See `_resolve_fused`."""

    def init_fn(params):
        def leaf(p):
            m_q, m_scale = _quant_m(jnp.zeros(p.shape, jnp.float32))
            return _LeafState(m_q=m_q, m_scale=m_scale, v=_v_init(p))
        return AdamWLeanState(
            count=jnp.zeros([], jnp.int32),
            leaves=jax.tree.map(leaf, params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("adamw_lean requires params (weight decay)")
        count = state.count + 1
        t = count.astype(jnp.float32)
        mc = 1.0 - b1 ** t
        vc = 1.0 - b2 ** t
        lr = (learning_rate(count) if callable(learning_rate)
              else learning_rate)

        flat_g, treedef = jax.tree.flatten(updates)
        flat_s = treedef.flatten_up_to(state.leaves)
        flat_p = treedef.flatten_up_to(params)

        import os
        barrier = os.environ.get("UA2_LEAN_BARRIER", "1") != "0"
        use_fused, interpret = _resolve_fused(fused)
        if use_fused:
            from uniaudio2_tpu.ops import lean_update as _lu
        new_updates, new_states = [], []
        token = None
        for g, s, p in zip(flat_g, flat_s, flat_p):
            if token is not None and barrier:
                # serialize leaf updates: peak temp = one leaf's f32 set
                g = jax.lax.optimization_barrier((g, token))[0]
            if (use_fused and isinstance(s.v, _FactoredV)
                    and _m_blocks(p.shape) is not None
                    and _lu.tile_sizes(p.shape[-2], p.shape[-1])):
                gf = g.astype(jnp.float32)
                v = _v_update(s.v, jnp.square(gf), b2)
                rm = jnp.maximum(
                    jnp.mean(v.row, axis=-1, keepdims=True), 1e-30)
                a_row = jnp.sqrt(v.row / (rm * vc))
                b_col = jnp.sqrt(v.col)
                upd, m_q, m_scale = _lu.fused_lean_update(
                    g, s.m_q, s.m_scale, p, a_row, b_col,
                    1.0 / mc, lr, b1=b1, wd=weight_decay, eps=eps,
                    interpret=interpret)
                new_updates.append(upd)
                new_states.append(_LeafState(m_q=m_q, m_scale=m_scale, v=v))
                token = m_scale
                continue
            gf = g.astype(jnp.float32)
            m = b1 * _dequant_m(s.m_q, s.m_scale) + (1.0 - b1) * gf
            v = _v_update(s.v, jnp.square(gf), b2)
            upd = (m / mc) * _v_rsqrt(v, vc, eps)
            upd = upd + weight_decay * p.astype(jnp.float32)
            upd = (-lr * upd).astype(p.dtype)
            m_q, m_scale = _quant_m(m)
            new_updates.append(upd)
            new_states.append(_LeafState(m_q=m_q, m_scale=m_scale, v=v))
            # Serialization token: anything small computed AFTER this leaf's
            # f32 temporaries. Using `upd` itself (the first version) forced
            # every leaf's full update buffer to materialise as a fusion
            # output just to feed the next barrier — a traced r4 cost of
            # ~2x the param bytes in paired (update, new_param) weight-shaped
            # buffers. `m_scale` is ~1/256 the size and carries the same
            # transitive dependency (it is computed from this leaf's m).
            token = m_scale
        return (
            jax.tree.unflatten(treedef, new_updates),
            AdamWLeanState(count=count,
                           leaves=jax.tree.unflatten(treedef, new_states)),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def state_bytes(state: AdamWLeanState) -> int:
    """Total optimizer-state bytes (for memory accounting in benches)."""
    return sum(
        a.size * a.dtype.itemsize
        for a in jax.tree.leaves(state)
        if hasattr(a, "dtype")
    )
