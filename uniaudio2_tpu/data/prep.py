"""Offline data-prep tooling.

Equivalents of `/root/reference/tools/data_scripts/`:
``create_data_json.py:5-40`` (task-dataset json builder), ``filter_scp.py``,
``merge_then_split.py``, ``select_spk2utt.py`` — as importable functions plus
a small CLI (``python -m uniaudio2_tpu.data.prep <subcommand>``).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
from typing import Dict, List, Optional, Sequence

from uniaudio2_tpu.engine.tasks import TASK_FORMATS


def create_data_json(
    task: str, out_json: str, key_files: Dict[str, str],
    repeat_num: int = 1,
) -> Dict:
    """Build a dataset json binding each task-format key to its data file."""
    fmt = TASK_FORMATS[task]
    missing = [k for k in fmt["keys"] if k not in key_files]
    if missing:
        raise ValueError(f"task {task}: missing key files {missing}")
    obj = {
        "task": task,
        "keys": {k: key_files[k] for k in fmt["keys"]},
        "type": list(fmt["type"]),
        "features": {},
        "loss_key": list(fmt["loss_key"]),
    }
    if repeat_num > 1:
        obj["repeat_num"] = repeat_num
    with open(out_json, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=4, ensure_ascii=False)
    return obj


def read_scp(path: str) -> Dict[str, str]:
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if parts:
                out[parts[0]] = parts[1] if len(parts) > 1 else ""
    return out


def write_scp(path: str, data: Dict[str, str]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for k, v in data.items():
            f.write(f"{k} {v}\n")


def filter_scp(scp: str, keep_keys: str, out: str, exclude: bool = False) -> int:
    """Keep (or drop) scp entries whose key appears in ``keep_keys``."""
    data = read_scp(scp)
    keys = set(read_scp(keep_keys))
    kept = {
        k: v for k, v in data.items() if (k in keys) != exclude
    }
    write_scp(out, kept)
    return len(kept)


def merge_then_split(
    scps: Sequence[str], out_prefix: str, n_splits: int, seed: int = 0
) -> List[str]:
    """Merge scp files, shuffle, split into N shards (rank-shardable data)."""
    merged: Dict[str, str] = {}
    for s in scps:
        merged.update(read_scp(s))
    items = list(merged.items())
    random.Random(seed).shuffle(items)
    outs = []
    for i in range(n_splits):
        path = f"{out_prefix}.{i}.scp"
        write_scp(path, dict(items[i::n_splits]))
        outs.append(path)
    return outs


def select_spk2utt(
    spk2utt: str, out: str, min_utts: int = 2, max_utts: Optional[int] = None
) -> int:
    """Filter a spk2utt file to speakers with enough utterances (prompt-pool
    construction for PromptTTS/PromptLTS)."""
    kept = {}
    for spk, utts in read_scp(spk2utt).items():
        utt_list = utts.split()
        if len(utt_list) < min_utts:
            continue
        if max_utts:
            utt_list = utt_list[:max_utts]
        kept[spk] = " ".join(utt_list)
    write_scp(out, kept)
    return len(kept)


def find_peer_utts(
    utt2spk: str, out: str, subset_list: Optional[str] = None
) -> int:
    """For each utterance, list every utterance by the same speaker
    (speaker-prompt pool construction — reference
    `tools/data_scripts/find_peer_utts.py`)."""
    u2s = {k: v.split()[0] for k, v in read_scp(utt2spk).items()}
    if subset_list:
        keep = set(read_scp(subset_list))
        u2s = {k: v for k, v in u2s.items() if k in keep}
    s2u: Dict[str, List[str]] = {}
    for utt, spk in u2s.items():
        s2u.setdefault(spk, []).append(utt)
    with open(out, "w", encoding="utf-8") as f:
        for utt, spk in u2s.items():
            f.write(" ".join([utt] + s2u[spk]) + "\n")
    return len(u2s)


def main(argv=None):
    p = argparse.ArgumentParser(description="data prep tooling")
    sub = p.add_subparsers(dest="cmd", required=True)

    cj = sub.add_parser("create_data_json")
    cj.add_argument("--task", required=True, choices=sorted(TASK_FORMATS))
    cj.add_argument("--out-json", required=True)
    cj.add_argument("--repeat_num", type=int, default=1)
    args, rest = p.parse_known_args(argv)
    if args.cmd == "create_data_json":
        fmt = TASK_FORMATS[args.task]
        cj2 = argparse.ArgumentParser()
        for k in fmt["keys"]:
            cj2.add_argument(f"--{k}", required=True)
        kv = vars(cj2.parse_args(rest))
        create_data_json(args.task, args.out_json, kv, args.repeat_num)
        print(f"wrote {args.out_json}")


if __name__ == "__main__":
    main()
