"""Training stack: data DSL loading, grid/loss-mask building, length
batching, loss decrease over steps, reporter, checkpoint save/resume, and
the train CLI end-to-end on a tiny synthetic dataset."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniaudio2_tpu.config import UnifiedModelConfig
from uniaudio2_tpu.data import batching, loading
from uniaudio2_tpu.models import unified
from uniaudio2_tpu.train import schedule, trainer
from uniaudio2_tpu.train.reporter import Reporter

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """A synthetic ASR-task dataset json in the reference schema."""
    d = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    reason = {f"utt{i}": torch.from_numpy(
        rng.integers(0, 30, (8, 3 + i % 3))) for i in range(6)}
    semantic = {f"utt{i}": torch.from_numpy(
        rng.integers(0, 60, (8, 5 + i % 4))) for i in range(6)}
    torch.save(reason, str(d / "reason.pt"))
    torch.save(semantic, str(d / "semantic.pt"))
    with open(d / "trans.txt", "w") as f:
        for i in range(6):
            f.write(f"utt{i} 7 8 9\n")
    ds = {
        "task": "ASR",
        "keys": {
            "reason_seq": str(d / "reason.pt"),
            "semantic_seq": str(d / "semantic.pt"),
            "transcription_seq": str(d / "trans.txt"),
        },
    }
    jpath = d / "asr_task.json"
    jpath.write_text(json.dumps(ds))
    return d, str(jpath)


class SplitTok:
    def tokenize(self, text):
        return [int(t) for t in text.split()]


def test_load_task_dataset(tiny_dataset):
    _, jpath = tiny_dataset
    data = loading.load_task_dataset(json.load(open(jpath)))
    assert len(data) == 6
    ex = data["ASR_utt0"]
    assert ex["task"] == "ASR"
    assert ex["loss_key"] == ["transcription_seq"]
    assert ex["reason_seq"].shape[0] == 8


def test_find_data_jsons(tiny_dataset):
    d, _ = tiny_dataset
    files = loading.find_data_jsons([str(d / "*.json")], rank=0, world_size=1)
    assert len(files) == 1
    with pytest.raises(ValueError):
        loading.find_data_jsons([str(d / "*.json")], rank=0, world_size=2)


def test_build_training_grid(tiny_dataset):
    _, jpath = tiny_dataset
    cfg = UnifiedModelConfig.tiny()
    data = loading.load_task_dataset(json.load(open(jpath)))
    b = batching.build_training_grid(
        data["ASR_utt0"], cfg.tokens, text_tokenizer=SplitTok()
    )
    s = b["grid"].shape[0]
    assert b["grid"].shape == (s, 9)
    # ASR: loss_key is transcription only -> text loss set, audio loss empty
    assert b["text_loss_mask"].any()
    assert not b["audio_loss_mask"].any()
    # TTS-format example: audio targets -> audio loss set
    rng = np.random.default_rng(1)
    ex = {
        "task": "TTS",
        "loss_key": ["reason_seq", "semantic_seq"],
        "transcription_seq": "7 8 9",
        "reason_seq": rng.integers(0, 30, (8, 4)),
        "semantic_seq": rng.integers(0, 60, (8, 6)),
    }
    b2 = batching.build_training_grid(ex, cfg.tokens, text_tokenizer=SplitTok())
    assert b2["audio_loss_mask"].any()
    assert not (b2["audio_loss_mask"] & b2["text_loss_mask"]).any()
    amask_next = b2["grid_mask"][1:, 0]
    assert (b2["audio_loss_mask"] <= amask_next).all()


def test_length_batcher(tiny_dataset):
    _, jpath = tiny_dataset
    cfg = UnifiedModelConfig.tiny()
    data = loading.load_task_dataset(json.load(open(jpath)))
    batcher = batching.LengthBatcher(
        data, cfg.tokens, batch_scale=64, text_tokenizer=SplitTok(),
        max_length=128, pad_multiple=16,
    )
    batches = list(batcher.batches(epoch=0))
    assert batches
    total = sum(len(b["ids"]) for b in batches)
    assert total == 6
    for b in batches:
        assert b["grid"].shape[1] % 16 == 0
        assert b["grid"].shape[2] == 9


def test_train_step_decreases_loss(tiny_dataset):
    _, jpath = tiny_dataset
    cfg = UnifiedModelConfig.tiny()
    data = loading.load_task_dataset(json.load(open(jpath)))
    batcher = batching.LengthBatcher(
        data, cfg.tokens, batch_scale=200, text_tokenizer=SplitTok(),
        pad_multiple=16,
    )
    batch_raw = next(batcher.batches(epoch=0))
    batch = trainer.Batch(
        grid=jnp.asarray(batch_raw["grid"]),
        grid_mask=jnp.asarray(batch_raw["grid_mask"]),
        text_loss_mask=jnp.asarray(batch_raw["text_loss_mask"]),
        audio_loss_mask=jnp.asarray(batch_raw["audio_loss_mask"]),
    )
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    tx = trainer.make_optimizer(schedule.warmup_lr(2e-3, 10), grad_clip=1.0)
    state = trainer.init_train_state(params, tx)
    step = jax.jit(trainer.build_train_step(cfg, tx, prefix_lm=True))
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_reporter_roundtrip():
    rep = Reporter()
    sub = rep.start_epoch("train", 0)
    sub.register({"loss": 2.0})
    sub.register({"loss": 1.0})
    stats = rep.finish_epoch(sub)
    assert stats["loss"] == pytest.approx(1.5)
    sub = rep.start_epoch("train", 1)
    sub.register({"loss": 0.5})
    rep.finish_epoch(sub)
    assert rep.best_epoch("train", "loss", "min") == 1
    rep2 = Reporter()
    rep2.load_state_dict(rep.state_dict())
    assert rep2.get(0, "train", "loss") == pytest.approx(1.5)


def test_checkpoint_save_resume(tmp_path, tiny_dataset):
    from uniaudio2_tpu.train import checkpoint as ckpt

    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    tx = trainer.make_optimizer(schedule.warmup_lr(1e-3, 10))
    state = trainer.init_train_state(params, tx)
    exp = str(tmp_path / "exp")
    ckpt.save_checkpoint(exp, 0, state, {"epochs": {}, "epoch": 0})
    state2, start_epoch, rep = ckpt.maybe_resume(exp, state)
    assert start_epoch == 1
    np.testing.assert_array_equal(
        np.asarray(state2.params["audio_head"]),
        np.asarray(state.params["audio_head"]),
    )
    restored = ckpt.load_params_for_inference(exp, params)
    np.testing.assert_array_equal(
        np.asarray(restored["projection_w"]),
        np.asarray(state.params["projection_w"]),
    )


@pytest.mark.parametrize("optimizer", ["adamw", "adamw_lean"])
def test_train_cli_end_to_end(tmp_path, tiny_dataset, optimizer):
    """adamw_lean also covers Orbax save of the int8/factored optimizer
    state and the FSDP-sharded leaf-serialized update (train/lean_opt.py)."""
    d, jpath = tiny_dataset
    from uniaudio2_tpu.train import train as train_cli

    yaml_path = tmp_path / "train.yaml"
    yaml_path.write_text(
        "llm_name: tiny-backbone\nlocal_model: tiny-decoder\n"
        "understanding_expert: tiny-expert\ngeneration_expert: tiny-expert\n"
        "max_seq_len: 128\n"
        "audio_reason_card: 40\naudio_semantic_card: 70\n"
        "reason_bos: 32\nreason_eos: 33\nreason_pad_token: 34\n"
        "semantic_bos: 64\nsemantic_eos: 65\nsemantic_pad_token: 66\n"
        "text_pad_token: 900\n"
    )
    exp = str(tmp_path / f"exp_{optimizer}")
    train_cli.main([
        "--train_data_jsons", str(d / "asr_task.json"),
        "--exp_dir", exp,
        "--llm_train_config", str(yaml_path),
        "--n_epoch", "1", "--batch_scale", "64", "--debug_steps", "2",
        "--learning_rate", "1e-3", "--warmup_steps", "10",
        "--data-parallel", "fsdp", "--mixed-precision", "fp32",
        "--print_freq", "1", "--optimizer", optimizer,
    ])
    assert os.path.isdir(os.path.join(exp, "ep0.checkpoint"))


def test_selective_remat_matches_full_remat():
    """Selective remat (k of n backbone layers + no-remat small stacks)
    is a pure memory/time trade: loss and grads match the full-remat
    step (checkpointing recomputes the identical ops)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.models import unified
    from uniaudio2_tpu.train import trainer, schedule

    cfg = UnifiedModelConfig.tiny()
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    tx = trainer.make_optimizer(schedule.warmup_lr(1e-4, warmup_steps=10))

    b, s = 2, 16
    par = cfg.tokens.parallel_number
    ncb = cfg.tokens.num_codebooks
    r = np.random.default_rng(0)
    grid = r.integers(0, 50, size=(b, s + 1, par)).astype(np.int32)
    gmask = np.zeros((b, s + 1, par), bool)
    gmask[:, : s // 2, -1] = True
    gmask[:, s // 2 :, :ncb] = True
    tmask = np.zeros((b, s), bool)
    tmask[:, 1 : s // 2] = True
    amask = np.zeros((b, s), bool)
    amask[:, s // 2 : s - 1] = True
    batch = trainer.Batch(
        grid=jnp.asarray(grid), grid_mask=jnp.asarray(gmask),
        text_loss_mask=jnp.asarray(tmask), audio_loss_mask=jnp.asarray(amask))

    def run(**kw):
        step = jax.jit(trainer.build_train_step(cfg, tx, prefix_lm=True,
                                                remat=True, **kw))
        state = trainer.init_train_state(params, tx)
        state, metrics = step(state, batch)
        return float(metrics["loss"]), state.params

    loss_full, p_full = run()
    loss_sel, p_sel = run(remat_backbone=1, remat_small=False)
    assert abs(loss_full - loss_sel) < 1e-5
    for a, b_ in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_sel)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=2e-4, atol=2e-5)
