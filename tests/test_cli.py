"""CLI end-to-end smoke on tiny configs: TTS stage 1 (text -> token .pt) and
ASR from pre-tokenized inputs — the minimum end-to-end slice of SURVEY.md §7
step 3, via the real argv surface."""

import json
import os

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    # --- tiny HF tokenizer dir ---
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<unk>": 0, "<bos>": 1, "<eos>": 2}
    for i, w in enumerate(
        ["hello", "world", "this", "is", "a", "test", "transcribe", "speak"]
    ):
        vocab[w] = i + 3
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok_dir = d / "tok"
    tok_dir.mkdir()
    tok.save(str(tok_dir / "tokenizer.json"))
    (tok_dir / "tokenizer_config.json").write_text(
        json.dumps({"bos_token": "<bos>", "eos_token": "<eos>"})
    )
    # --- tiny train yaml matching UnifiedModelConfig.tiny token space ---
    yaml_path = d / "train.yaml"
    yaml_path.write_text(
        "llm_name: tiny-backbone\n"
        "local_model: tiny-decoder\n"
        "audio_reason_card: 40\naudio_semantic_card: 70\n"
        "reason_bos: 32\nreason_eos: 33\nreason_pad_token: 34\n"
        "semantic_bos: 64\nsemantic_eos: 65\nsemantic_pad_token: 66\n"
        "audio_prompt_bos: 67\naudio_prompt_eos: 68\n"
        "text_pad_token: 900\n"
    )
    # --- tiny expert names: from_train_yaml uses the default expert names;
    # patch the registry so they resolve to tiny shapes ---
    from uniaudio2_tpu import config as cfgmod

    cfgmod.register_config(
        "Llama-3.2-Understanding", block_size=512, vocab_size=1000,
        padded_vocab_size=1024, n_layer=1, n_embd=64, n_head=4,
        n_query_groups=2, intermediate_size=128, rope_base=10000.0,
        rope_adjustments=None,
    )
    cfgmod.register_config(
        "Llama-3.2-Generation", block_size=512, vocab_size=1000,
        padded_vocab_size=1024, n_layer=1, n_embd=64, n_head=4,
        n_query_groups=2, intermediate_size=128, rope_base=10000.0,
        rope_adjustments=None,
    )
    # tiny-backbone/tiny-decoder vocab (1024) must cover the text ids; fine.
    # --- a converted checkpoint (npz) so --resume exercises loading ---
    from uniaudio2_tpu.config import UnifiedModelConfig
    from uniaudio2_tpu.convert.torch_to_jax import save_npz
    from uniaudio2_tpu.models import unified

    ucfg = UnifiedModelConfig.from_train_yaml({
        "llm_name": "tiny-backbone", "local_model": "tiny-decoder",
        "audio_reason_card": 40, "audio_semantic_card": 70,
        "reason_bos": 32, "reason_eos": 33, "reason_pad_token": 34,
        "semantic_bos": 64, "semantic_eos": 65, "semantic_pad_token": 66,
        "audio_prompt_bos": 67, "audio_prompt_eos": 68,
        "text_pad_token": 900,
    })
    params = unified.init_params(jax.random.PRNGKey(0), ucfg)
    npz = d / "model.npz"
    save_npz(str(npz), params)
    return {
        "dir": d, "tok_dir": str(tok_dir), "yaml": str(yaml_path),
        "npz": str(npz),
    }


def test_cli_tts_stage1(env):
    from uniaudio2_tpu import cli

    out_dir = str(env["dir"] / "tts_out")
    cli.main([
        "--task", "TTS", "--stage", "1",
        "--text", "hello world",
        "--prompt_text", "speak this",
        "--llm_train_config", env["yaml"],
        "--text_tokenizer_path", env["tok_dir"],
        "--resume", env["npz"],
        "--output_dir", out_dir,
        "--model_dtype", "float32",
        "--max_frames", "6", "--topk", "5",
    ])
    assert os.path.isfile(os.path.join(out_dir, "utt_0_reason.pt"))
    assert os.path.isfile(os.path.join(out_dir, "utt_0_semantic.pt"))
    r = torch.load(os.path.join(out_dir, "utt_0_reason.pt"))
    assert r.shape[0] == 8


def test_cli_tts_stage_all_text_to_wav(env, monkeypatch):
    """One in-process text->wav run: LLM decode (stage 1) wired into codec
    decode (stage 2) through the real CLI artifact layout. The codec is a
    tiny random-weight decoder injected via load_codec_tokenizer (the full
    converter path is covered by tests/test_codec_convert.py)."""
    import jax
    from uniaudio2_tpu import cli
    from uniaudio2_tpu.codec.decoder import CodecConfig, init_decode_params
    from uniaudio2_tpu.codec.encoder import EncoderConfig
    from uniaudio2_tpu.codec.tokenizer import ReasoningCodecTokenizer

    codec_cfg = CodecConfig.tiny()
    dec_params = init_decode_params(jax.random.PRNGKey(0), codec_cfg)
    real = ReasoningCodecTokenizer(
        None, dec_params, EncoderConfig.tiny_test(), codec_cfg)

    class _ModCodec:
        """Folds LLM token ids into the tiny codec's codebook range and pads
        empty streams (an untrained tiny model may emit no semantic frames —
        the wiring, not the audio, is under test)."""

        def __init__(self, tok):
            self._tok = tok
            self.cfg = tok.cfg

        def detokenize_no_reason(self, semantic, **kw):
            sem = np.asarray(semantic)
            if sem.shape[-1] == 0:
                sem = np.zeros((8, 4), np.int64)
            return self._tok.detokenize_no_reason(
                sem % self.cfg.rec_codebook_size, **kw)

    monkeypatch.setattr(
        cli, "load_codec_tokenizer", lambda args, need_decode: _ModCodec(real))

    out_dir = str(env["dir"] / "tts_all_out")
    cli.main([
        "--task", "TTS", "--stage", "all",
        "--text", "hello world",
        "--prompt_text", "speak this",
        "--llm_train_config", env["yaml"],
        "--text_tokenizer_path", env["tok_dir"],
        "--resume", env["npz"],
        "--output_dir", out_dir,
        "--model_dtype", "float32",
        "--max_frames", "6", "--topk", "5",
        "--codec_steps", "2",
    ])
    assert os.path.isfile(os.path.join(out_dir, "utt_0_semantic.pt"))
    wav_path = os.path.join(out_dir, "wavs", "utt_0.wav")
    assert os.path.isfile(wav_path)
    from uniaudio2_tpu.codec.tokenizer import load_wav
    wav = load_wav(wav_path, real.cfg.sample_rate)
    assert wav.size > 0 and np.isfinite(wav).all()


def test_cli_asr_from_tokens(env):
    from uniaudio2_tpu import cli

    d = env["dir"]
    token_dir = d / "tokens"
    token_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    torch.save(torch.from_numpy(rng.integers(0, 30, (8, 5))),
               str(token_dir / "x_reason.pt"))
    torch.save(torch.from_numpy(rng.integers(0, 60, (8, 8))),
               str(token_dir / "x_semantic.pt"))
    out_dir = str(d / "asr_out")
    cli.main([
        "--task", "ASR",
        "--reason_pt", str(token_dir / "x_reason.pt"),
        "--semantic_pt", str(token_dir / "x_semantic.pt"),
        "--prompt_text", "transcribe this",
        "--llm_train_config", env["yaml"],
        "--text_tokenizer_path", env["tok_dir"],
        "--resume", env["npz"],
        "--output_dir", out_dir,
        "--model_dtype", "float32",
        "--max_frames", "6",
    ])
    results = os.path.join(out_dir, "asr_results.txt")
    assert os.path.isfile(results)
    line = open(results).read()
    assert line.startswith("x\t")


def test_cli_tts_streaming(env, monkeypatch):
    """--stream wiring: ContinuousEngine frame streaming + incremental
    codec decode through the real CLI (chunk-level correctness is pinned
    in tests/test_stream_tts.py; the untrained tiny model emits no
    semantic frames, so this smokes the pipeline + empty-stream path)."""
    import jax
    from uniaudio2_tpu import cli
    from uniaudio2_tpu.codec.decoder import CodecConfig, init_decode_params
    from uniaudio2_tpu.codec.encoder import EncoderConfig
    from uniaudio2_tpu.codec.tokenizer import ReasoningCodecTokenizer

    codec_cfg = CodecConfig.tiny()
    dec_params = init_decode_params(jax.random.PRNGKey(0), codec_cfg)
    real = ReasoningCodecTokenizer(
        None, dec_params, EncoderConfig.tiny_test(), codec_cfg)
    monkeypatch.setattr(
        cli, "load_codec_tokenizer", lambda args, need_decode: real)

    out_dir = str(env["dir"] / "tts_stream_out")
    cli.main([
        "--task", "TTS", "--stage", "all", "--stream", "true",
        "--text", "hello world",
        "--prompt_text", "speak this",
        "--llm_train_config", env["yaml"],
        "--text_tokenizer_path", env["tok_dir"],
        "--resume", env["npz"],
        "--output_dir", out_dir,
        "--model_dtype", "float32",
        "--max_frames", "6", "--topk", "5",
        "--codec_steps", "2",
    ])
    assert os.path.isfile(os.path.join(out_dir, "wavs", "utt_0.wav"))
