"""Checkpoint save / auto-resume for training.

Capability parity with the reference FSDP checkpointing
(`/root/reference/llm_utils/train_utils.py:109-205`): per-epoch
``ep{N}.checkpoint`` artifacts holding {model, optimizer state, step,
reporter state}; auto-resume picks the newest by epoch number; inference
restore loads params only.

Storage: Orbax (`ocp.PyTreeCheckpointer`) for the array pytrees — on TPU
pods this gives sharded, multi-host-safe IO (each host writes its shards,
the TPU equivalent of the reference's rank-0 FULL_STATE_DICT gather) — plus
a small JSON sidecar for scalars.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax


def _ckpt_dirs(exp_dir: str):
    out = []
    if not os.path.isdir(exp_dir):
        return out
    for name in os.listdir(exp_dir):
        m = re.fullmatch(r"ep(\d+)\.checkpoint", name)
        if m:
            out.append((int(m.group(1)), os.path.join(exp_dir, name)))
    return sorted(out)


def save_checkpoint(
    exp_dir: str,
    epoch: int,
    state,                      # trainer.TrainState
    reporter_state: Optional[Dict] = None,
) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(exp_dir, f"ep{epoch}.checkpoint"))
    os.makedirs(exp_dir, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        os.path.join(path, "tree"),
        {"params": state.params, "opt_state": state.opt_state,
         "step": state.step},
        force=True,
    )
    meta = {"epoch": epoch, "reporter": reporter_state or {}}
    with open(os.path.join(path, "meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f)
    return path


def maybe_resume(
    exp_dir: str,
    init_state,
) -> Tuple[Any, int, Optional[Dict]]:
    """Restore the newest epoch checkpoint if one exists.

    Returns (state, start_epoch, reporter_state). ``init_state`` provides the
    pytree structure/shardings to restore into.
    """
    import orbax.checkpoint as ocp

    ckpts = _ckpt_dirs(exp_dir)
    if not ckpts:
        return init_state, 0, None
    epoch, path = ckpts[-1]
    ckptr = ocp.PyTreeCheckpointer()
    target = {
        "params": init_state.params, "opt_state": init_state.opt_state,
        "step": init_state.step,
    }
    restored = ckptr.restore(os.path.join(path, "tree"), item=target)
    with open(os.path.join(path, "meta.json"), encoding="utf-8") as f:
        meta = json.load(f)
    state = type(init_state)(
        params=restored["params"], opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return state, epoch + 1, meta.get("reporter")


def load_params_for_inference(exp_dir: str, like_params) -> Any:
    """Newest checkpoint -> params only (reference `resume_for_inference`,
    `train_utils.py:159-177`)."""
    import orbax.checkpoint as ocp

    ckpts = _ckpt_dirs(exp_dir)
    if not ckpts:
        raise FileNotFoundError(f"no ep*.checkpoint under {exp_dir}")
    _, path = ckpts[-1]
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.join(path, "tree"),
        args=ocp.args.PyTreeRestore(
            item={"params": like_params}, partial_restore=True
        ),
    )
    return restored["params"]
