"""Batch-eval harness end-to-end on a tiny pre-tokenized ASR test set."""

import json
import os

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")


def test_batch_eval_asr(tmp_path):
    # tokenizer + config + checkpoint (reuse the CLI fixtures' recipe)
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<unk>": 0, "<bos>": 1, "<eos>": 2}
    for i, w in enumerate(["hello", "world", "go"]):
        vocab[w] = i + 3
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    tok.save(str(tok_dir / "tokenizer.json"))
    (tok_dir / "tokenizer_config.json").write_text(
        json.dumps({"bos_token": "<bos>", "eos_token": "<eos>"})
    )
    yaml_path = tmp_path / "train.yaml"
    yaml_path.write_text(
        "llm_name: tiny-backbone\nlocal_model: tiny-decoder\n"
        "understanding_expert: tiny-expert\ngeneration_expert: tiny-expert\n"
        "max_seq_len: 128\naudio_reason_card: 40\naudio_semantic_card: 70\n"
        "reason_bos: 32\nreason_eos: 33\nreason_pad_token: 34\n"
        "semantic_bos: 64\nsemantic_eos: 65\nsemantic_pad_token: 66\n"
        "text_pad_token: 900\n"
    )
    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.convert.torch_to_jax import save_npz
    from uniaudio2_tpu.models import unified

    cfg = UnifiedModelConfig.tiny()
    save_npz(str(tmp_path / "m.npz"),
             unified.init_params(jax.random.PRNGKey(0), cfg))

    rng = np.random.default_rng(0)
    reason = {f"u{i}": torch.from_numpy(rng.integers(0, 30, (8, 4)))
              for i in range(3)}
    semantic = {f"u{i}": torch.from_numpy(rng.integers(0, 60, (8, 6)))
                for i in range(3)}
    torch.save(reason, str(tmp_path / "reason.pt"))
    torch.save(semantic, str(tmp_path / "semantic.pt"))
    (tmp_path / "refs.scp").write_text(
        "u0 hello world\nu1 go go\nu2 hello\n"
    )
    (tmp_path / "test.json").write_text(json.dumps({
        "task": "ASR",
        "keys": {
            "reason_seq": str(tmp_path / "reason.pt"),
            "semantic_seq": str(tmp_path / "semantic.pt"),
            "transcription_seq": str(tmp_path / "refs.scp"),
        },
    }))

    from uniaudio2_tpu.engine import batch_eval

    results = str(tmp_path / "asr.tsv")
    batch_eval.main([
        "--task", "ASR", "--test_data_json", str(tmp_path / "test.json"),
        "--results", results,
        "--llm_train_config", str(yaml_path),
        "--resume", str(tmp_path / "m.npz"),
        "--text_tokenizer_path", str(tok_dir),
        "--prompt_text", "go",
        "--model_dtype", "float32", "--max_frames", "5",
        "--batch_size", "2", "--score",
    ])
    lines = open(results).read().strip().split("\n")
    assert len(lines) == 3
    assert lines[0].split("\t")[0] == "u0"
    assert lines[0].split("\t")[2] == "hello world"

    # continuous decode type: same test set through the in-graph offline
    # continuous-batching path must give identical greedy hypotheses
    results_c = str(tmp_path / "asr_cont.tsv")
    batch_eval.main([
        "--task", "ASR", "--test_data_json", str(tmp_path / "test.json"),
        "--results", results_c,
        "--llm_train_config", str(yaml_path),
        "--resume", str(tmp_path / "m.npz"),
        "--text_tokenizer_path", str(tok_dir),
        "--prompt_text", "go",
        "--model_dtype", "float32", "--max_frames", "5",
        "--batch_size", "2", "--decode_type", "continuous",
    ])
    assert open(results_c).read() == open(results).read()
