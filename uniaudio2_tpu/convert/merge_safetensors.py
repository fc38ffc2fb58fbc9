"""Merge sharded HF safetensors into one state dict / converted artifact.

Working replacement for the reference's broken `convert_ckpt.py`
(`/root/reference/llm_utils/convert_ckpt.py:4-16` — its `torch.save` call is
missing the output path; SURVEY.md §7 known defects). Usage:

    python -m uniaudio2_tpu.convert.merge_safetensors \
        --input_dir hf_ckpt/ --output merged.pt
    python -m uniaudio2_tpu.convert.merge_safetensors \
        --input_dir hf_ckpt/ --output model.npz --to_jax --llm_train_config cfg.yaml
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Dict

import numpy as np


def merge_safetensors(input_dir: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(input_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {input_dir}")
    merged: Dict[str, np.ndarray] = {}
    for path in files:
        with safe_open(path, framework="np") as f:
            for key in f.keys():
                merged[key] = np.asarray(f.get_tensor(key))
    return merged


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--to_jax", action="store_true",
                   help="convert to a uniaudio2_tpu params .npz instead of a "
                        "torch .pt state dict")
    p.add_argument("--llm_train_config", default=None)
    args = p.parse_args(argv)

    sd = merge_safetensors(args.input_dir)
    if args.to_jax:
        import yaml

        from uniaudio2_tpu.config import UnifiedModelConfig
        from uniaudio2_tpu.convert import torch_to_jax as cvt

        if args.llm_train_config:
            with open(args.llm_train_config, encoding="utf-8") as f:
                cfg = UnifiedModelConfig.from_train_yaml(yaml.safe_load(f))
        else:
            cfg = UnifiedModelConfig()
        params, missing = cvt.convert_unified(sd, cfg)
        if missing:
            print(f"{len(missing)} missing keys (first: {missing[:3]})")
        cvt.save_npz(args.output, params)
    else:
        import torch

        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            args.output,
        )
    print(f"wrote {args.output} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
